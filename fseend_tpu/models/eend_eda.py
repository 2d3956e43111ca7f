"""Offline EEND-EDA baseline: transformer encoder + LSTM encoder-decoder
attractors (reference F13,
/root/reference/FS-EEND/nnet/model/offl_tfm_enc_lstm_enc_dec.py:10-127).

Also the backbone for the FLEX-STB block-wise streaming baseline
(fseend_tpu/serving/flex_stb.py)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from fseend_tpu.ops import nn

Params = dict


@dataclasses.dataclass(frozen=True)
class EDAConfig:
    in_size: int = 345
    n_units: int = 256
    n_heads: int = 4
    n_layers: int = 4
    dim_feedforward: int = 2048
    dropout: float = 0.1
    attractor_loss_ratio: float = 1.0
    max_attractors: int = 15  # estimate() cap (offl model :94)


# ---------------------------------------------------------------------------
# LSTM (torch layout: gates ordered i, f, g, o)
# ---------------------------------------------------------------------------


def lstm_init(key, in_dim: int, hidden: int) -> Params:
    import math

    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hidden)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -bound, bound)
    return {
        "w_ih": u(k1, (in_dim, 4 * hidden)),
        "w_hh": u(k2, (hidden, 4 * hidden)),
        "b_ih": u(k3, (4 * hidden,)),
        "b_hh": u(k4, (4 * hidden,)),
    }


def lstm_cell(p: Params, x, h, c):
    H = h.shape[-1]
    z = x @ p["w_ih"] + p["b_ih"] + h @ p["w_hh"] + p["b_hh"]
    i, f, g, o = (jax.nn.sigmoid(z[..., :H]), jax.nn.sigmoid(z[..., H:2 * H]),
                  jnp.tanh(z[..., 2 * H:3 * H]), jax.nn.sigmoid(z[..., 3 * H:]))
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c


def lstm_scan(p: Params, xs, h0=None, c0=None, lens=None):
    """xs: (B, T, D) -> (outputs (B, T, H), (h_T, c_T)).

    With `lens` (B,), state updates freeze at t >= len: (h_T, c_T) equal the
    state after the last VALID frame — the static-shape equivalent of
    running each sequence to its true length (torch pack_padded_sequence)."""
    B, T, _ = xs.shape
    H = p["w_hh"].shape[0]
    h = jnp.zeros((B, H), xs.dtype) if h0 is None else h0
    c = jnp.zeros((B, H), xs.dtype) if c0 is None else c0

    def step(carry, x_t):
        h, c, t = carry
        hn, cn = lstm_cell(p, x_t, h, c)
        if lens is not None:
            valid = (t < lens)[:, None]
            hn = jnp.where(valid, hn, h)
            cn = jnp.where(valid, cn, c)
        return (hn, cn, t + 1), hn

    (h, c, _), ys = jax.lax.scan(step, (h, c, jnp.zeros((), jnp.int32)),
                                 xs.swapaxes(0, 1))
    return ys.swapaxes(0, 1), (h, c)


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


def init_eend_eda(key, cfg: EDAConfig):
    keys = jax.random.split(key, 5 + cfg.n_layers)
    params = {
        "enc": {
            "proj": nn.uniform_linear_init(keys[0], cfg.in_size, cfg.n_units),
            "norm": nn.layer_norm_init(cfg.n_units),
            "layers": [
                nn.transformer_layer_init(keys[5 + i], cfg.n_units, cfg.n_heads,
                                          cfg.dim_feedforward)
                for i in range(cfg.n_layers)
            ],
        },
        "eda": {
            "encoder": lstm_init(keys[1], cfg.n_units, cfg.n_units),
            "decoder": lstm_init(keys[2], cfg.n_units, cfg.n_units),
            "counter": nn.torch_linear_init(keys[3], cfg.n_units, 1),
        },
    }
    return params, {}


def encode(params: Params, cfg: EDAConfig, xs: jnp.ndarray, *, train=False,
           rngs=None, lens=None) -> jnp.ndarray:
    """Unmasked (offline) transformer encoder (offl...py:169-193; no BN).

    With `lens` (B,), frames at t >= len are masked out of every attention's
    KEY set, so valid frames are scored exactly as if the pad were absent —
    lets one fixed-shape compiled program serve any true length."""
    h = nn.layer_norm(params["enc"]["norm"], nn.linear(params["enc"]["proj"], xs))
    mask = None
    if lens is not None:
        T = xs.shape[1]
        valid = jnp.arange(T)[None, :] < lens[:, None]          # (B, Tk)
        mask = jnp.where(valid, 0.0, nn.NEG_INF)[:, None, None, :]
    rs = (jax.random.split(rngs, cfg.n_layers) if rngs is not None
          else [None] * cfg.n_layers)
    for i, lp in enumerate(params["enc"]["layers"]):
        h = nn.transformer_layer(lp, h, mask, rng=rs[i], rate=cfg.dropout,
                                 train=train)
    return h


def eda_attractors(params: Params, emb: jnp.ndarray, n_attractors: int,
                   lens=None):
    """LSTM encoder over emb -> (h, c); LSTM decoder unrolled from zero
    inputs emits attractors (offl...py:87-92). Returns
    (attractors (B, n, D), exist_logits (B, n)). `lens` stops the encoder
    state at each sequence's true length."""
    p = params["eda"]
    _, (h, c) = lstm_scan(p["encoder"], emb, lens=lens)
    B, D = h.shape
    zeros = jnp.zeros((B, n_attractors, D), emb.dtype)
    attractors, _ = lstm_scan(p["decoder"], zeros, h, c)
    exist_logits = nn.linear(p["counter"], attractors)[..., 0]
    return attractors, exist_logits


def eda_forward(params: Params, cfg: EDAConfig, xs: jnp.ndarray,
                n_speakers_max: int, *, train=False, rngs=None):
    """Training pass with known speaker count: n_attractors = max_nspk + 1
    (last = non-existent, offl...py:109-127). Returns dict(logits, emb,
    attractors, exist_logits)."""
    emb = encode(params, cfg, xs, train=train, rngs=rngs)
    attractors, exist = eda_attractors(params, emb, n_speakers_max + 1)
    logits = jnp.einsum("btd,bcd->btc", emb, attractors[:, :-1],
                        preferred_element_type=jnp.float32)
    return {"logits": logits, "emb": emb, "attractors": attractors,
            "exist_logits": exist}


def eda_test(params: Params, cfg: EDAConfig, xs: jnp.ndarray, *,
             shuffle_rng=None, n_attractors: int | None = None, lens=None):
    """Inference: time-shuffled emb feeds the EDA (offl...py:62-65);
    caller thresholds exist probs to pick active attractors. `lens` (B,)
    masks pad frames out of attention and the attractor LSTM so a
    fixed-shape program scores true-length sequences exactly (the FLEX-STB
    serving path); logits at t >= len are garbage — slice them off."""
    assert not (shuffle_rng is not None and lens is not None), \
        "time-shuffle would scatter pad frames into the valid range"
    emb = encode(params, cfg, xs, lens=lens)
    if shuffle_rng is not None:
        order = jax.random.permutation(shuffle_rng, emb.shape[1])
        emb_in = emb[:, order]
    else:
        emb_in = emb
    n = n_attractors if n_attractors is not None else cfg.max_attractors
    attractors, exist = eda_attractors(params, emb_in, n, lens=lens)
    logits = jnp.einsum("btd,bcd->btc", emb, attractors,
                        preferred_element_type=jnp.float32)
    return {"logits": logits, "emb": emb, "attractors": attractors,
            "exist_probs": jax.nn.sigmoid(exist)}
