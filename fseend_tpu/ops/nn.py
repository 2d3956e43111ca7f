"""Core neural building blocks as pure JAX functions.

Design stance (SURVEY.md §7): parameters are plain pytrees (nested dicts of
jnp arrays), every module is an ``init_*``/``*_apply`` pair, and all state
(batch-norm statistics, streaming caches) is threaded explicitly.  This is
what makes the three compile modes (batch / chunkwise / per-frame scan) share
one parameter set with no "copy_params" transplant step, unlike the reference
(/root/reference/FS-EEND/nnet/utils/copy_params.py:7-62).

Numerical semantics intentionally match the torch modules used by the
reference (nn.MultiheadAttention, nn.TransformerEncoderLayer post-norm,
nn.BatchNorm1d, nn.Conv1d) so that released PyTorch checkpoints can be
converted 1:1 (see fseend_tpu/utils/torch_convert.py).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict
NEG_INF = float("-inf")


class static_int(int):
    """An int stored inside a param pytree as *static metadata* (not a leaf):
    invisible to grads/optimizers, hashable for jit."""


jax.tree_util.register_pytree_node(
    static_int, lambda x: ((), int(x)), lambda aux, _: static_int(aux)
)


# ---------------------------------------------------------------------------
# initializers (torch-default-compatible)
# ---------------------------------------------------------------------------


def torch_linear_init(key, in_dim: int, out_dim: int, bias: bool = True) -> Params:
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"kernel": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound)
    return p


def xavier_linear_init(key, in_dim: int, out_dim: int, gain: float = 1.0,
                       bias: bool = True, bias_value: float = 0.0) -> Params:
    kw, _ = jax.random.split(key)
    a = gain * math.sqrt(6.0 / (in_dim + out_dim))
    p = {"kernel": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -a, a)}
    if bias:
        p["bias"] = jnp.full((out_dim,), bias_value, jnp.float32)
    return p


def uniform_linear_init(key, in_dim: int, out_dim: int, initrange: float = 0.1) -> Params:
    """Reference encoder-projection init: U(+-0.1) weights, zero bias
    (FS-EEND/nnet/model/onl_tfm...py:157-160)."""
    return {
        "kernel": jax.random.uniform(key, (in_dim, out_dim), jnp.float32, -initrange, initrange),
        "bias": jnp.zeros((out_dim,), jnp.float32),
    }


def layer_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


# ---------------------------------------------------------------------------
# primitive appliers
# ---------------------------------------------------------------------------


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def layer_norm(p: Params | None, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    if p is not None:
        y = y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return y


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    """x / ||x||; matches torch.norm division (no eps in the reference)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)
    return x / n


def dropout(rng, x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# batch norm (torch.nn.BatchNorm1d semantics over the feature axis)
# ---------------------------------------------------------------------------


def batch_norm_init(dim: int):
    params = {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}
    state = {"mean": jnp.zeros((dim,), jnp.float32), "var": jnp.ones((dim,), jnp.float32)}
    return params, state


def batch_norm(p: Params, state: Params, x: jnp.ndarray, *, train: bool,
               momentum: float = 0.1, eps: float = 1e-5):
    """BatchNorm over the last axis of (..., D) using batch stats in train
    mode (biased var for normalization, unbiased for the running update —
    exactly torch). Returns (y, new_state).

    NOTE the reference normalizes *padded* batches (pad value -1 included in
    the stats, FS-EEND/nnet/model/onl_tfm...py:165-166); callers who want
    that behavior simply pass the padded tensor.
    """
    if train:
        axes = tuple(range(x.ndim - 1))
        n = math.prod([x.shape[a] for a in axes])
        mean = jnp.mean(x, axis=axes)
        var = jnp.mean(jnp.square(x - mean), axis=axes)  # biased
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean.astype(jnp.float32),
            "var": (1 - momentum) * state["var"] + momentum * unbiased.astype(jnp.float32),
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype), new_state


# ---------------------------------------------------------------------------
# multi-head attention (torch.nn.MultiheadAttention packed-projection layout)
# ---------------------------------------------------------------------------


def mha_init(key, d_model: int, n_heads: int) -> Params:
    """Packed q/k/v in-projection (xavier_uniform, like torch) + out proj."""
    k1, k2, k3 = jax.random.split(key, 3)
    a = math.sqrt(6.0 / (d_model + d_model))  # xavier on each (D,D) block
    in_kernel = jax.random.uniform(k1, (d_model, 3 * d_model), jnp.float32, -a, a)
    return {
        "in_proj": {"kernel": in_kernel, "bias": jnp.zeros((3 * d_model,), jnp.float32)},
        "out_proj": torch_linear_init(k2, d_model, d_model),
        "_n_heads": static_int(n_heads),
    }


def _split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    *lead, T, D = x.shape
    return x.reshape(*lead, T, n_heads, D // n_heads).swapaxes(-3, -2)  # (..., H, T, hd)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    *lead, H, T, hd = x.shape
    return x.swapaxes(-3, -2).reshape(*lead, T, H * hd)


def mha_project_qkv(p: Params, q_in, k_in, v_in):
    """Project inputs into per-head q/k/v: (..., H, T, hd) each."""
    D = q_in.shape[-1]
    wk = p["in_proj"]["kernel"]
    bk = p["in_proj"]["bias"]
    n_heads = int(p["_n_heads"])
    q = q_in @ wk[:, :D] + bk[:D]
    k = k_in @ wk[:, D : 2 * D] + bk[D : 2 * D]
    v = v_in @ wk[:, 2 * D :] + bk[2 * D :]
    return (_split_heads(q, n_heads), _split_heads(k, n_heads), _split_heads(v, n_heads))


def mha_core(q, k, v, mask: jnp.ndarray | None, *, rng=None,
             dropout_rate: float = 0.0, train: bool = False):
    """softmax(q k^T / sqrt(hd) + mask) v on pre-split heads. Train-mode
    dropout is applied to the softmax WEIGHT matrix (inverted dropout, rows
    no longer summing to 1) — exactly nn.MultiheadAttention(dropout=...)
    used at merge_tfm_encoder.py:207-211."""
    hd = q.shape[-1]
    logits = jnp.einsum("...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(hd)
    if mask is not None:
        logits = logits + mask
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    w = dropout(rng, w, dropout_rate, train)
    return jnp.einsum("...qk,...kd->...qd", w, v)


def mha(p: Params, query, key_, value, mask: jnp.ndarray | None = None,
        *, rng=None, dropout_rate: float = 0.0, train: bool = False) -> jnp.ndarray:
    """torch-compatible MHA. query/key_/value: (..., T, D); mask additive
    (broadcastable to (..., H, Tq, Tk)) with -inf for disallowed."""
    q, k, v = mha_project_qkv(p, query, key_, value)
    out = mha_core(q, k, v, mask, rng=rng, dropout_rate=dropout_rate,
                   train=train)
    out = _merge_heads(out)
    return linear(p["out_proj"], out)


def causal_mask(T: int, mask_delay: int = 0, dtype=jnp.float32) -> jnp.ndarray:
    """(T, T) additive mask: position i may attend j <= i + mask_delay
    (reference _generate_square_subsequent_mask, onl_tfm...py:152-155)."""
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    return jnp.where(j <= i + mask_delay, 0.0, NEG_INF).astype(dtype)


# ---------------------------------------------------------------------------
# transformer encoder layer (torch post-norm semantics)
# ---------------------------------------------------------------------------


def transformer_layer_init(key, d_model: int, n_heads: int, dim_ff: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "self_attn": mha_init(k1, d_model, n_heads),
        "linear1": torch_linear_init(k2, d_model, dim_ff),
        "linear2": torch_linear_init(k3, dim_ff, d_model),
        "norm1": layer_norm_init(d_model),
        "norm2": layer_norm_init(d_model),
    }


def ff_block(p: Params, x, *, rng=None, rate: float = 0.0, train: bool = False,
             activation=jax.nn.relu):
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    h = dropout(r1, activation(linear(p["linear1"], x)), rate, train)
    return dropout(r2, linear(p["linear2"], h), rate, train)


def transformer_layer(p: Params, x, mask=None, *, rng=None, rate: float = 0.0,
                      train: bool = False) -> jnp.ndarray:
    """Post-norm: x = LN1(x + attn(x)); x = LN2(x + FF(x)).
    Matches nn.TransformerEncoderLayer(norm_first=False) used by the
    FS encoder (onl_tfm...py:147)."""
    r1, r2, r3 = (jax.random.split(rng, 3) if rng is not None else (None, None, None))
    a = mha(p["self_attn"], x, x, x, mask, rng=r1, dropout_rate=rate, train=train)
    x = layer_norm(p["norm1"], x + dropout(r2, a, rate, train))
    x = layer_norm(p["norm2"], x + ff_block(p, x, rng=r3, rate=rate, train=train))
    return x


# ---------------------------------------------------------------------------
# 1-D convolutions
# ---------------------------------------------------------------------------


def conv1d_init(key, in_ch: int, out_ch: int, kernel_size: int, *,
                groups: int = 1, bias: bool = True) -> Params:
    """torch.nn.Conv1d default init; kernel stored (width, in/groups, out)."""
    kw, kb = jax.random.split(key)
    fan_in = (in_ch // groups) * kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    p = {
        "kernel": jax.random.uniform(
            kw, (kernel_size, in_ch // groups, out_ch), jnp.float32, -bound, bound
        ),
        "_groups": static_int(groups),
    }
    if bias:
        p["bias"] = jax.random.uniform(kb, (out_ch,), jnp.float32, -bound, bound)
    return p


def conv1d(p: Params, x: jnp.ndarray, *, padding) -> jnp.ndarray:
    """x: (B, T, C_in) -> (B, T', C_out). padding: int pad-both-sides (torch
    style) or explicit ((lo, hi),)."""
    if isinstance(padding, int):
        padding = [(padding, padding)]
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(1,),
        padding=padding,
        dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=int(p["_groups"]),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def lookahead_conv(p: Params, x: jnp.ndarray, delay: int) -> jnp.ndarray:
    """The k=2*delay+1, pad=delay smoothing conv between encoder and decoder
    (onl_tfm...py:30,40): +-delay frames of context => `delay` frames of
    algorithmic latency in streaming mode."""
    return conv1d(p, x, padding=delay)


def causal_depthwise_conv(p: Params, x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Left-pad k-1 then truncate to T: the causal depthwise conv of the
    conformer conv module (LS-EEND/nnet/conformer/convolution.py:65-68,144)."""
    return conv1d(p, x, padding=[(kernel_size - 1, 0)])


# ---------------------------------------------------------------------------
# sinusoidal table (speaker-slot positional encoding)
# ---------------------------------------------------------------------------


def sinusoidal_table(max_len: int, d_model: int) -> jnp.ndarray:
    """(max_len, d_model) sin/cos table; used as *speaker-slot queries*
    (returned instead of added — onl_tfm...py:218-224)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model))
    pe = jnp.zeros((max_len, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe


def tree_size(params: Any) -> int:
    return sum(x.size for x in jax.tree.leaves(params) if hasattr(x, "size"))
