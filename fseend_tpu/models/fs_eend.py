"""FS-EEND: frame-wise streaming EEND with non-autoregressive attractors.

TPU-native re-design of the reference model family
(/root/reference/FS-EEND/nnet/model/onl_tfm_enc_1dcnn_enc_linear_non_autoreg_pos_enc_l2norm.py
and .../streaming_tfm_enc_1dcnn_enc_linear_non_autoreg_pos_enc_l2norm.py):

  masked batch mode and per-frame streaming mode share ONE parameter pytree
  (the reference needs a weight transplant between two different nn.Modules,
  copy_params.py:7-62 — here they are the same params applied differently).

Architecture (reference onl_tfm...py:10-224):
  enc:  BatchNorm1d(345) -> Linear(345,256) -> LayerNorm
        -> 4x causal TransformerEncoderLayer (post-norm)
  cnn:  Conv1d(k=2*delay+1, pad=delay): +-delay look-ahead => `delay` frames
        of algorithmic latency
  dec:  speaker-slot sinusoidal PE as queries, convert=Linear(512,256) on
        concat(emb, PE), then dec_n_layers x fusion layers
        (causal time-attention per slot + unmasked speaker-attention per
        frame + shared FFN, merge_tfm_encoder.py:356-399)
  out:  logits[b,t,s] = <emb[b,t], attractor[b,t,s]> after L2 norm of both.

Streaming is a `lax.scan` over frames carrying a `FSStreamState` pytree with
*fixed-capacity* per-layer KV caches (static shapes for XLA; the reference
grows python deques, streaming_tfm.py:28-37).  Caches hold post-projection
per-head k/v so each step is O(t * d) attention + O(d^2) projections.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from fseend_tpu.ops import nn

Params = dict


@dataclasses.dataclass(frozen=True)
class FSEENDConfig:
    in_size: int = 345
    n_units: int = 256
    n_heads: int = 4
    enc_n_layers: int = 4
    dec_n_layers: int = 2
    enc_dim_feedforward: int = 2048
    dec_dim_feedforward: int = 2048
    dropout: float = 0.1
    conv_delay: int = 9
    mask_delay: int = 0
    max_nspks: int = 6  # attractor slots incl. silence(0) and none(last) = max_speakers + 2
    pe_max_len: int = 5000
    use_flash_attn: bool = False  # flash cached-attention Pallas kernel in
                                  # blockwise serving (forward-only;
                                  # kernels/cached_attention_pallas.py)

    @property
    def conv_kernel_size(self) -> int:
        return 2 * self.conv_delay + 1


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_fs_eend(key, cfg: FSEENDConfig):
    """Returns (params, state). state = batch-norm running statistics."""
    keys = jax.random.split(key, 6 + cfg.enc_n_layers + cfg.dec_n_layers)
    bn_p, bn_s = nn.batch_norm_init(cfg.in_size)
    enc_layers = [
        nn.transformer_layer_init(keys[6 + i], cfg.n_units, cfg.n_heads, cfg.enc_dim_feedforward)
        for i in range(cfg.enc_n_layers)
    ]
    dec_layers = [
        init_fusion_layer(keys[6 + cfg.enc_n_layers + i], cfg.n_units, cfg.n_heads,
                          cfg.dec_dim_feedforward)
        for i in range(cfg.dec_n_layers)
    ]
    params = {
        "enc": {
            "bn": bn_p,
            "proj": nn.uniform_linear_init(keys[0], cfg.in_size, cfg.n_units),
            "norm": nn.layer_norm_init(cfg.n_units),
            "layers": enc_layers,
        },
        "cnn": nn.conv1d_init(keys[1], cfg.n_units, cfg.n_units, cfg.conv_kernel_size),
        "dec": {
            "convert": nn.torch_linear_init(keys[2], 2 * cfg.n_units, cfg.n_units),
            "layers": dec_layers,
        },
    }
    state = {"bn": bn_s}
    return params, state


def init_fusion_layer(key, d_model: int, n_heads: int, dim_ff: int) -> Params:
    """Joint time+speaker attention layer (merge_tfm_encoder.py:197-233)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "time_attn": nn.mha_init(k1, d_model, n_heads),
        "spk_attn": nn.mha_init(k2, d_model, n_heads),
        "linear1": nn.torch_linear_init(k3, d_model, dim_ff),
        "linear2": nn.torch_linear_init(k4, dim_ff, d_model),
        "norm11": nn.layer_norm_init(d_model),
        "norm12": nn.layer_norm_init(d_model),  # allocated-but-unused, like the ref
        "norm21": nn.layer_norm_init(d_model),
        "norm22": nn.layer_norm_init(d_model),
    }


# ---------------------------------------------------------------------------
# batch (masked) mode
# ---------------------------------------------------------------------------


def fusion_layer(p: Params, x: jnp.ndarray, t_mask: jnp.ndarray, *,
                 rng=None, rate: float = 0.0, train: bool = False) -> jnp.ndarray:
    """x: (B, T, C, D). Causal attention over T per slot, full attention over
    C per frame, shared FFN; post-norm (merge_tfm_encoder.py:356-374)."""
    r = jax.random.split(rng, 4) if rng is not None else [None] * 4
    B, T, C, D = x.shape
    # time attention: treat (B, C) as batch dims
    xt = x.swapaxes(1, 2)  # (B, C, T, D)
    a = nn.mha(p["time_attn"], xt, xt, xt, t_mask, rng=r[0], dropout_rate=rate, train=train)
    xt = nn.layer_norm(p["norm11"], xt + nn.dropout(r[1], a, rate, train))
    x = xt.swapaxes(1, 2)  # (B, T, C, D)
    # speaker attention: treat (B, T) as batch dims
    a = nn.mha(p["spk_attn"], x, x, x, None, rng=r[2], dropout_rate=rate, train=train)
    x = nn.layer_norm(p["norm21"], x + nn.dropout(r[3], a, rate, train))
    x = nn.layer_norm(p["norm22"], x + nn.ff_block(p, x, rng=None, rate=rate, train=train))
    return x


def encode(params: Params, state, cfg: FSEENDConfig, xs: jnp.ndarray, lens: jnp.ndarray,
           *, train: bool = False, rngs=None):
    """xs: (B, T, in_size) padded; lens: (B,). Returns (emb (B,T,D), new_state).

    Padding protocol mirrors the reference: BN sees pad value -1
    (onl_tfm...py:165), encoder output is re-padded with 0 before the conv
    (onl_tfm...py:38-39).
    """
    B, T, _ = xs.shape
    len_mask = (jnp.arange(T)[None, :] < lens[:, None])  # (B, T)
    xs = jnp.where(len_mask[..., None], xs, -1.0)
    h, bn_state = nn.batch_norm(params["enc"]["bn"], state["bn"], xs, train=train)
    h = nn.layer_norm(params["enc"]["norm"], nn.linear(params["enc"]["proj"], h))
    t_mask = nn.causal_mask(T, cfg.mask_delay)
    rs = jax.random.split(rngs, cfg.enc_n_layers) if rngs is not None else [None] * cfg.enc_n_layers
    for i, lp in enumerate(params["enc"]["layers"]):
        h = nn.transformer_layer(lp, h, t_mask, rng=rs[i], rate=cfg.dropout, train=train)
    h = jnp.where(len_mask[..., None], h, 0.0)
    return h, {"bn": bn_state}


def decode(params: Params, cfg: FSEENDConfig, emb: jnp.ndarray, n_slots: int, *,
           train: bool = False, rngs=None) -> jnp.ndarray:
    """emb: (B, T, D) -> attractors (B, T, n_slots, D) (pre-L2norm)."""
    B, T, D = emb.shape
    pe = nn.sinusoidal_table(cfg.pe_max_len, cfg.n_units)[:n_slots].astype(emb.dtype)  # (C, D)
    x = jnp.concatenate(
        [jnp.broadcast_to(emb[:, :, None, :], (B, T, n_slots, D)),
         jnp.broadcast_to(pe[None, None], (B, T, n_slots, D))], axis=-1)
    x = nn.linear(params["dec"]["convert"], x)
    t_mask = nn.causal_mask(T, cfg.mask_delay)
    rs = jax.random.split(rngs, cfg.dec_n_layers) if rngs is not None else [None] * cfg.dec_n_layers
    for i, lp in enumerate(params["dec"]["layers"]):
        x = fusion_layer(lp, x, t_mask, rng=rs[i], rate=cfg.dropout, train=train)
    return x


def fs_forward(params: Params, state, cfg: FSEENDConfig, xs: jnp.ndarray,
               lens: jnp.ndarray, n_slots: int, *, train: bool = False, rngs=None):
    """Full batch pass. Returns dict with logits (B,T,n_slots), emb (B,T,D)
    (post conv+L2norm), attractors (B,T,n_slots,D) (post L2norm), state."""
    r_enc, r_dec = (jax.random.split(rngs) if rngs is not None else (None, None))
    h, new_state = encode(params, state, cfg, xs, lens, train=train, rngs=r_enc)
    emb = nn.lookahead_conv(params["cnn"], h, cfg.conv_delay)
    emb = nn.l2_normalize(emb)
    attractors = decode(params, cfg, emb, n_slots, train=train, rngs=r_dec)
    attractors = nn.l2_normalize(attractors)
    logits = jnp.einsum("btd,btcd->btc", emb, attractors,
                        preferred_element_type=jnp.float32)
    return {"logits": logits, "emb": emb, "attractors": attractors, "state": new_state}


def fs_test(params: Params, state, cfg: FSEENDConfig, xs, lens, max_nspks: int | None = None):
    """Inference entry (reference model.test, onl_tfm...py:67-84): run with
    max_speakers+2 attractor slots; caller drops slot 0 (silence) and applies
    sigmoid."""
    n_slots = max_nspks if max_nspks is not None else cfg.max_nspks
    return fs_forward(params, state, cfg, xs, lens, n_slots, train=False)


# ---------------------------------------------------------------------------
# streaming mode — fixed-capacity caches + lax.scan
# ---------------------------------------------------------------------------


def fs_stream_init(cfg: FSEENDConfig, batch: int, capacity: int, n_slots: int | None = None,
                   dtype=jnp.float32) -> Params:
    """Allocate the StreamState pytree for `batch` parallel streams.

    capacity = max frames the stream will see (KV caches are preallocated —
    FS-EEND streaming state is inherently O(t), SURVEY.md §3.2)."""
    H, D = cfg.n_heads, cfg.n_units
    hd = D // H
    C = n_slots if n_slots is not None else cfg.max_nspks
    return {
        # per-LANE stream clocks (continuous batching: lanes serve
        # independent streams that start/flush at different times)
        "t": jnp.zeros((batch,), jnp.int32),        # frames pushed so far
        "emitted": jnp.zeros((batch,), jnp.int32),  # decoder steps taken
        "enc_kv": [
            {"k": jnp.zeros((batch, H, capacity, hd), dtype),
             "v": jnp.zeros((batch, H, capacity, hd), dtype)}
            for _ in range(cfg.enc_n_layers)
        ],
        "conv_buf": jnp.zeros((batch, cfg.conv_kernel_size, D), dtype),
        "dec_kv": [
            {"k": jnp.zeros((batch, C, H, capacity, hd), dtype),
             "v": jnp.zeros((batch, C, H, capacity, hd), dtype)}
            for _ in range(cfg.dec_n_layers)
        ],
    }


def _cached_attention(attn_p: Params, x_q: jnp.ndarray, cache: Params, idx: jnp.ndarray):
    """Single-query attention against a fixed-capacity cache with PER-LANE
    positions.

    x_q: (B, ..., D) one frame per lane. Writes lane b's k/v at idx[b]
    (shared across any inner axes, e.g. decoder slots), attends positions
    [0, idx[b]]. Returns (out (B, ..., D), new_cache)."""
    q, k, v = nn.mha_project_qkv(attn_p, x_q[..., None, :], x_q[..., None, :], x_q[..., None, :])
    # q/k/v: (B, ..., H, 1, hd)

    def upd(c, kk, i):
        return jax.lax.dynamic_update_index_in_dim(c, kk, i, axis=-2)

    new_k = jax.vmap(upd)(cache["k"], k[..., 0, :], idx)
    new_v = jax.vmap(upd)(cache["v"], v[..., 0, :], idx)
    cap = cache["k"].shape[-2]
    mask = jnp.where(jnp.arange(cap)[None, :] <= idx[:, None], 0.0,
                     nn.NEG_INF)                          # (B, cap)
    mask = mask.reshape((mask.shape[0],) + (1,) * (q.ndim - 2) + (cap,))
    out = nn.mha_core(q, new_k, new_v, mask)  # (B, ..., H, 1, hd)
    out = nn._merge_heads(out)[..., 0, :]
    out = nn.linear(attn_p["out_proj"], out)
    return out, {"k": new_k, "v": new_v}


def fs_stream_step(params: Params, state: Params, cfg: FSEENDConfig, bn_state,
                   x_t: jnp.ndarray, n_slots: int, flush=False):
    """One streaming step for a batch of streams.

    x_t: (B, in_size) — the frame at time state["t"].  After the real input
    ends, call `conv_delay` more steps with flush=True: a zero vector is
    pushed into the conv buffer *without* running the encoder, reproducing
    the reference's dummy_conv_input flush (streaming_infer_dia.py:82-86,
    streaming_tfm...py:41-42).

    Returns (new_state, out) where out = dict(logits (B, n_slots),
    emb (B, D), valid (B,) bool — False during a lane's first `conv_delay`
    steps when its look-ahead conv has no output yet).  flush is scalar or
    per-lane (B,): lanes serve independent streams (continuous batching).
    """
    t = state["t"]
    B = x_t.shape[0]
    flush = jnp.broadcast_to(jnp.asarray(flush, bool), (B,))

    def lane_keep(keep_old, new, old):
        return jax.tree.map(
            lambda n, o: jnp.where(
                keep_old.reshape(keep_old.shape + (1,) * (n.ndim - 1)), o, n),
            new, old)

    # --- encoder (eval-mode BN: running stats) ---
    h, _ = nn.batch_norm(params["enc"]["bn"], bn_state, x_t, train=False)
    h = nn.layer_norm(params["enc"]["norm"], nn.linear(params["enc"]["proj"], h))
    new_enc_kv = []
    for lp, cache in zip(params["enc"]["layers"], state["enc_kv"]):
        a, new_cache = _cached_attention(lp["self_attn"], h, cache, t)
        new_cache = lane_keep(flush, new_cache, cache)
        h = nn.layer_norm(lp["norm1"], h + a)
        h = nn.layer_norm(lp["norm2"], h + nn.ff_block(lp, h))
        new_enc_kv.append(new_cache)
    # flush steps push zeros into the conv, bypassing the encoder
    h = jnp.where(flush[:, None], 0.0, h)
    # --- look-ahead conv ring buffer ---
    conv_buf = jnp.concatenate([state["conv_buf"][:, 1:], h[:, None, :]], axis=1)
    y = jnp.einsum("bkd,kdo->bo", conv_buf, params["cnn"]["kernel"]) + params["cnn"]["bias"]
    valid = t >= cfg.conv_delay  # conv output exists for frame t - conv_delay
    emb = nn.l2_normalize(y)
    # --- decoder (runs on valid frames only; cache writes are gated) ---
    u = state["emitted"]
    pe = nn.sinusoidal_table(cfg.pe_max_len, cfg.n_units)[:n_slots].astype(emb.dtype)  # (C, D)
    x = jnp.concatenate(
        [jnp.broadcast_to(emb[:, None, :], (B, n_slots, cfg.n_units)),
         jnp.broadcast_to(pe[None], (B, n_slots, cfg.n_units))], axis=-1)
    x = nn.linear(params["dec"]["convert"], x)  # (B, C, D)
    new_dec_kv = []
    for lp, cache in zip(params["dec"]["layers"], state["dec_kv"]):
        a, new_cache = _cached_attention(lp["time_attn"], x, cache, u)
        new_cache = lane_keep(~valid, new_cache, cache)
        x = nn.layer_norm(lp["norm11"], x + a)
        s = nn.mha(lp["spk_attn"], x, x, x, None)
        x = nn.layer_norm(lp["norm21"], x + s)
        x = nn.layer_norm(lp["norm22"], x + nn.ff_block(lp, x))
        new_dec_kv.append(new_cache)
    attractors = nn.l2_normalize(x)
    logits = jnp.einsum("bd,bcd->bc", emb, attractors, preferred_element_type=jnp.float32)
    new_state = {
        # steps taken, real + flush: a flush step still slides the conv
        # window, so `valid` keeps advancing (streams shorter than
        # conv_delay emit entirely during flush). Encoder cache writes at
        # flush positions are gated out above, so t only CLOCKS them.
        "t": t + 1,
        "emitted": jnp.where(valid, u + 1, u),
        "enc_kv": new_enc_kv,
        "conv_buf": conv_buf,
        "dec_kv": new_dec_kv,
    }
    return new_state, {"logits": logits, "emb": emb, "valid": valid}


def fs_stream_scan(params: Params, state: Params, cfg: FSEENDConfig, bn_state,
                   xs: jnp.ndarray, n_slots: int):
    """Fused scan over a whole (B, T, F) clip: feeds T frames + conv_delay
    zero-flush frames, returns time-aligned (B, T, n_slots) logits.

    This is the latency path compiled ONCE; per-frame serving uses
    `fs_stream_step` directly (see fseend_tpu/serving)."""
    B, T, F = xs.shape
    pad = jnp.zeros((B, cfg.conv_delay, F), xs.dtype)
    seq = jnp.concatenate([xs, pad], axis=1).swapaxes(0, 1)  # (T+delay, B, F)
    flush = jnp.arange(T + cfg.conv_delay) >= T

    def step(carry, inp):
        x_t, fl = inp
        new_state, out = fs_stream_step(params, carry, cfg, bn_state, x_t, n_slots,
                                        flush=fl)
        return new_state, (out["logits"], out["emb"])

    _, (logits, emb) = jax.lax.scan(step, state, (seq, flush))
    # outputs at scan step t correspond to input frame t - conv_delay
    return logits[cfg.conv_delay:].swapaxes(0, 1), emb[cfg.conv_delay:].swapaxes(0, 1)


# ---------------------------------------------------------------------------
# blockwise streaming — K queries per step against the KV caches
# ---------------------------------------------------------------------------
#
# Masked attention is evaluation-order invariant, so attending a BLOCK of K
# queries against the growing cache is numerically EXACT vs both the
# per-frame path and the batch pass — it just replaces K sequential
# vector-attention steps with one (K x cache) matmul.  The look-ahead conv
# uses the same one-block-lag trick as the LS blockwise mode (the emitted
# block is the previous one, whose +delay context is the new block's head).
# Requires K >= conv_delay.


def fs_blockstream_init(cfg: FSEENDConfig, batch: int, capacity: int,
                        n_slots: int | None = None, block: int = 100,
                        dtype=jnp.float32) -> Params:
    assert block >= cfg.conv_delay
    st = fs_stream_init(cfg, batch, capacity, n_slots, dtype)
    # blockwise mode keeps SHARED clocks (the K-query cache write is a
    # contiguous dynamic slice at one position; all lanes advance together)
    st["t"] = jnp.zeros((), jnp.int32)
    st["emitted"] = jnp.zeros((), jnp.int32)
    st["h_prev"] = jnp.zeros((batch, block, cfg.n_units), dtype)
    st["h_tail2"] = jnp.zeros((batch, cfg.conv_delay, cfg.n_units), dtype)
    st["m"] = jnp.zeros((), jnp.int32)
    del st["conv_buf"]
    return st


def _cached_attention_block(attn_p: Params, x_q: jnp.ndarray, cache: Params,
                            start: jnp.ndarray, flash: bool = False):
    """K-query attention against a fixed-capacity cache: writes the block's
    k/v at [start, start+K), each query i attends positions <= start+i.
    x_q: (..., K, D). Returns (out (..., K, D), new_cache). flash routes
    the softmax(qk)v core through the online-softmax Pallas kernel (no
    materialized (K, cap) scores — kernels/cached_attention_pallas.py)."""
    q, k, v = nn.mha_project_qkv(attn_p, x_q, x_q, x_q)  # (..., H, K, hd)
    K = x_q.shape[-2]
    cap = cache["k"].shape[-2]
    new_k = jax.lax.dynamic_update_slice_in_dim(cache["k"], k, start, axis=-2)
    new_v = jax.lax.dynamic_update_slice_in_dim(cache["v"], v, start, axis=-2)
    if flash:
        from fseend_tpu.kernels.cached_attention_pallas import (
            cached_attention_block)

        out = cached_attention_block(q, new_k, new_v, start,
                                     interpret=jax.default_backend() != "tpu")
    else:
        pos = jnp.arange(cap)[None, :]
        qpos = start + jnp.arange(K)[:, None]
        mask = jnp.where(pos <= qpos, 0.0, nn.NEG_INF)  # (K, cap)
        out = nn.mha_core(q, new_k, new_v, mask)
    out = nn._merge_heads(out)
    out = nn.linear(attn_p["out_proj"], out)
    return out, {"k": new_k, "v": new_v}


def fs_blockstream_step(params: Params, state: Params, cfg: FSEENDConfig,
                        bn_state, xs: jnp.ndarray, n_slots: int,
                        enc_bypass=False, h_mask: jnp.ndarray | None = None):
    """Consume block m (B, K, in_size), emit logits (B, K, n_slots) of block
    m-1 (first call's output is warm-up garbage). enc_bypass=True drains the
    final block with zero embeddings (stream-end flush). h_mask (K,) zeroes
    this block's embeddings per frame — pass it on a zero-padded final
    block so the look-ahead conv sees the offline zero padding instead of
    BN'd-zero-feature embeddings (exact ragged-tail parity with
    fs_forward)."""
    B, K, _ = xs.shape
    t = state["t"]
    enc_bypass = jnp.asarray(enc_bypass)
    # --- encoder on block m (eval BN) ---
    h, _ = nn.batch_norm(params["enc"]["bn"], bn_state, xs, train=False)
    h = nn.layer_norm(params["enc"]["norm"], nn.linear(params["enc"]["proj"], h))
    new_enc_kv = []
    for lp, cache in zip(params["enc"]["layers"], state["enc_kv"]):
        a, new_cache = _cached_attention_block(lp["self_attn"], h, cache, t,
                                               flash=cfg.use_flash_attn)
        new_cache = jax.tree.map(
            lambda new, old: jnp.where(enc_bypass, old, new), new_cache, cache)
        h = nn.layer_norm(lp["norm1"], h + a)
        h = nn.layer_norm(lp["norm2"], h + nn.ff_block(lp, h))
        new_enc_kv.append(new_cache)
    h = jnp.where(enc_bypass, 0.0, h)
    if h_mask is not None:
        h = h * h_mask[None, :, None].astype(h.dtype)
    # --- look-ahead conv emits block m-1 ---
    window = jnp.concatenate(
        [state["h_tail2"], state["h_prev"], h[:, :cfg.conv_delay]], axis=1)
    emb = nn.conv1d(params["cnn"], window, padding=[(0, 0)])
    emb = nn.l2_normalize(emb)
    # --- decoder block (time axis aligned from stream frame 0) ---
    u = state["emitted"]
    first = state["m"] == 0
    pe = nn.sinusoidal_table(cfg.pe_max_len, cfg.n_units)[:n_slots].astype(emb.dtype)
    x = jnp.concatenate(
        [jnp.broadcast_to(emb[:, :, None, :], (B, K, n_slots, cfg.n_units)),
         jnp.broadcast_to(pe[None, None], (B, K, n_slots, cfg.n_units))], axis=-1)
    x = nn.linear(params["dec"]["convert"], x)  # (B, K, C, D)
    new_dec_kv = []
    for lp, cache in zip(params["dec"]["layers"], state["dec_kv"]):
        xt = x.swapaxes(1, 2)  # (B, C, K, D)
        # decoder time-attention stays on the XLA masked path even under
        # use_flash_attn: at its row count (B*C*H=1536) XLA's big batched
        # matmuls beat the kernel (measured 7.5 vs 7.8 ms; the kernel's
        # per-step cost scales with row-groups). Flash wins the encoder
        # (256 rows: 2.55 vs 3.44 ms) — see tools/bench_fs_serving.py.
        a, new_cache = _cached_attention_block(lp["time_attn"], xt, cache, u)
        new_cache = jax.tree.map(
            lambda new, old: jnp.where(first, old, new), new_cache, cache)
        xt = nn.layer_norm(lp["norm11"], xt + a)
        x = xt.swapaxes(1, 2)
        s = nn.mha(lp["spk_attn"], x, x, x, None)
        x = nn.layer_norm(lp["norm21"], x + s)
        x = nn.layer_norm(lp["norm22"], x + nn.ff_block(lp, x))
        new_dec_kv.append(new_cache)
    attractors = nn.l2_normalize(x)
    logits = jnp.einsum("bkd,bkcd->bkc", emb, attractors,
                        preferred_element_type=jnp.float32)
    new_state = {
        "t": jnp.where(enc_bypass, t, t + K),
        "emitted": jnp.where(first, u, u + K),
        "enc_kv": new_enc_kv,
        "dec_kv": new_dec_kv,
        "h_prev": h,
        "h_tail2": state["h_prev"][:, -cfg.conv_delay:],
        "m": state["m"] + 1,
    }
    return new_state, logits


# ---------------------------------------------------------------------------
# per-frame-EXACT fast block — prefix attention read once per block
# ---------------------------------------------------------------------------
#
# `fs_stream_step` re-reads the FULL capacity-sized KV caches every frame
# (~550 MB/frame-step at 64 lanes/cap 2048 — BENCH r4 measured it 120x
# slower than blockwise).  Masked attention is evaluation-order invariant,
# so a block of K frames can be advanced in ONE pass that reads the history
# prefix once and handles intra-block causality with a (K, cap) mask —
# K x less cache traffic and MXU-shaped (K x cap) matmuls — while every
# output frame still depends only on inputs <= its own stream time.  This
# is the FS analog of LS chunkwise recurrence (SURVEY.md §5.7): identical
# per-frame semantics (the reference's streaming_tfm.py:15-37 growing-KV
# loop), not the one-block-lag blockwise mode above.
#
# Decoder cache convention: position = STREAM clock t (not the emitted
# clock u = t - conv_delay of fs_stream_step).  The first `conv_delay`
# positions hold pre-warm-up garbage and are masked out of every read
# (min_pos), so writes are uniform (no per-frame gating).  Attention is
# position-agnostic (causal mask only), so this relabeling is exact.
#
# Contract (both hold for real streams; asserted nowhere, documented here):
#   * per lane, flush frames are a SUFFIX of the stream (the conv-tail
#     drain) — flush-frame encoder cache writes land at positions no real
#     query ever attends;
#   * lane stream length + conv_delay <= capacity (flush steps keep
#     clocking t past the last real frame).


def _cached_attention_block_perlane(attn_p: Params, x_q: jnp.ndarray,
                                    cache: Params, start: jnp.ndarray,
                                    min_pos: int = 0, flash: bool = False):
    """K-query attention against a fixed-capacity cache with PER-LANE write
    positions (lanes serve independent streams — continuous batching).

    x_q: (B, ..., K, D); cache k/v: (B, ..., H, cap, hd); start: (B,).
    Writes lane b's block k/v at [start[b], start[b]+K); query i of lane b
    attends positions p with min_pos <= p <= start[b] + i."""
    q, k, v = nn.mha_project_qkv(attn_p, x_q, x_q, x_q)  # (B, ..., H, K, hd)
    K = x_q.shape[-2]
    cap = cache["k"].shape[-2]

    def upd(c, kk, s):
        return jax.lax.dynamic_update_slice_in_dim(c, kk, s, axis=-2)

    new_k = jax.vmap(upd)(cache["k"], k, start)
    new_v = jax.vmap(upd)(cache["v"], v, start)
    if flash:
        # online-softmax decode: the (B, ..., K, cap) f32 score tensor —
        # the dominant HBM traffic of the fast block (~3.1 GB per dec
        # layer per 125-frame sub-block at 64 lanes/cap 2048) — never
        # leaves VMEM.  Same mask semantics as the XLA path below
        # (parity-tested incl. the pre-warm-up self-position rule).
        from fseend_tpu.kernels.cached_attention_pallas import (
            flash_cached_attention_perlane)

        lead = q.shape[:-2]                              # (B, ..., H)
        R = math.prod(lead)
        out = flash_cached_attention_perlane(
            q.reshape(R, K, -1), new_k.reshape(R, cap, -1),
            new_v.reshape(R, cap, -1), start,
            rows_per_lane=R // q.shape[0], min_pos=min_pos,
            interpret=jax.default_backend() != "tpu")
        out = out.reshape(*lead, K, -1)
    else:
        pos = jnp.arange(cap)
        qpos = start[:, None] + jnp.arange(K)[None, :]   # (B, K)
        # the self position is ALWAYS attendable: a pre-warm-up decoder
        # query (qpos < min_pos) would otherwise see an all-masked row ->
        # NaN, and the NaN output poisons the NEXT layer's cache writes.
        # For queries past min_pos the self position already satisfies the
        # standard condition, so this changes nothing on valid frames
        # (their garbage-free outputs are what the parity tests pin).
        ok = ((pos[None, None, :] <= qpos[:, :, None])
              & (pos[None, None, :] >= min_pos)) \
            | (pos[None, None, :] == qpos[:, :, None])
        mask = jnp.where(ok, 0.0, nn.NEG_INF)            # (B, K, cap)
        mask = mask.reshape((mask.shape[0],) + (1,) * (q.ndim - 3)
                            + (K, cap))
        out = nn.mha_core(q, new_k, new_v, mask)
    out = nn._merge_heads(out)
    return nn.linear(attn_p["out_proj"], out), {"k": new_k, "v": new_v}


def fs_framestream_block(params: Params, state: Params, cfg: FSEENDConfig,
                         bn_state, xs: jnp.ndarray, n_slots: int,
                         flush: jnp.ndarray):
    """Advance `fs_stream_init` state by a block of K frames with EXACT
    per-frame streaming semantics (output i = frame start+i-conv_delay,
    `valid` gating identical to fs_stream_step; tested equal to the
    per-frame scan).

    xs: (B, K, in_size); flush: (B, K) bool (per-lane conv-drain tails).
    Returns (new_state, (logits (B, K, n_slots) f32, valid (B, K) bool))."""
    B, K, _ = xs.shape
    t = state["t"]                                       # (B,) lane clocks
    flush = jnp.broadcast_to(jnp.asarray(flush, bool), (B, K))

    # --- encoder (eval-mode BN: running stats) ---
    h, _ = nn.batch_norm(params["enc"]["bn"], bn_state, xs, train=False)
    h = nn.layer_norm(params["enc"]["norm"],
                      nn.linear(params["enc"]["proj"], h))
    new_enc_kv = []
    for lp, cache in zip(params["enc"]["layers"], state["enc_kv"]):
        a, new_cache = _cached_attention_block_perlane(
            lp["self_attn"], h, cache, t, flash=cfg.use_flash_attn)
        h = nn.layer_norm(lp["norm1"], h + a)
        h = nn.layer_norm(lp["norm2"], h + nn.ff_block(lp, h))
        new_enc_kv.append(new_cache)
    # flush steps push zeros into the conv, bypassing the encoder output
    # (the garbage they wrote to the caches above is never attended by a
    # real query — see the flush-suffix contract)
    h = jnp.where(flush[..., None], 0.0, h)

    # --- look-ahead conv over the rolling window ---
    window = jnp.concatenate([state["conv_buf"][:, 1:], h], axis=1)
    emb = nn.conv1d(params["cnn"], window, padding=[(0, 0)])  # (B, K, D)
    emb = nn.l2_normalize(emb)
    valid = (t[:, None] + jnp.arange(K)[None, :]) >= cfg.conv_delay  # (B, K)

    # --- decoder (stream-clock cache positions; pre-warm-up rows masked) ---
    pe = nn.sinusoidal_table(cfg.pe_max_len, cfg.n_units)[:n_slots] \
        .astype(emb.dtype)
    x = jnp.concatenate(
        [jnp.broadcast_to(emb[:, :, None, :], (B, K, n_slots, cfg.n_units)),
         jnp.broadcast_to(pe[None, None], (B, K, n_slots, cfg.n_units))],
        axis=-1)
    x = nn.linear(params["dec"]["convert"], x)           # (B, K, C, D)
    new_dec_kv = []
    for lp, cache in zip(params["dec"]["layers"], state["dec_kv"]):
        xt = x.swapaxes(1, 2)                            # (B, C, K, D)
        a, new_cache = _cached_attention_block_perlane(
            lp["time_attn"], xt, cache, t, min_pos=cfg.conv_delay,
            flash=cfg.use_flash_attn)
        xt = nn.layer_norm(lp["norm11"], xt + a)
        x = xt.swapaxes(1, 2)
        s = nn.mha(lp["spk_attn"], x, x, x, None)
        x = nn.layer_norm(lp["norm21"], x + s)
        x = nn.layer_norm(lp["norm22"], x + nn.ff_block(lp, x))
        new_dec_kv.append(new_cache)
    attractors = nn.l2_normalize(x)
    logits = jnp.einsum("bkd,bkcd->bkc", emb, attractors,
                        preferred_element_type=jnp.float32)
    new_state = {
        "t": t + K,
        "emitted": jnp.maximum(t + K - cfg.conv_delay, 0),
        "enc_kv": new_enc_kv,
        "conv_buf": window[:, -cfg.conv_kernel_size:],
        "dec_kv": new_dec_kv,
    }
    return new_state, (logits, valid)


def fs_blockstream_run(params: Params, cfg: FSEENDConfig, bn_state,
                       xs: jnp.ndarray, n_slots: int, block: int):
    """Whole-clip blockwise streaming; exactly equals the batch fs_forward."""
    B, T, F = xs.shape
    padT = (-T) % block
    capacity = T + padT
    state = fs_blockstream_init(cfg, B, capacity, n_slots, block, xs.dtype)
    xs_p = jnp.pad(xs, ((0, 0), (0, padT), (0, 0)))
    outs = []
    for st_i in range(0, T + padT, block):
        h_mask = (jnp.arange(st_i, st_i + block) < T)
        state, logits = fs_blockstream_step(
            params, state, cfg, bn_state, xs_p[:, st_i:st_i + block], n_slots,
            h_mask=h_mask)
        outs.append(logits)
    state, logits = fs_blockstream_step(
        params, state, cfg, bn_state, jnp.zeros((B, block, F), xs.dtype),
        n_slots, enc_bypass=True)
    outs.append(logits)
    return jnp.concatenate(outs[1:], axis=1)[:, :T]
