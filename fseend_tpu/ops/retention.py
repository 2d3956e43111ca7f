"""Multi-scale retention — the O(1)-state long-context engine of LS-EEND.

Re-designed from /root/reference/LS-EEND/nnet/modules/retention.py (itself a
torchscale derivative) as pure JAX with three interchangeable compute modes
(SURVEY.md §5.7):

  * ``retention_parallel``   — (T x T) decay-masked linear attention; short
    sequences / training on one chunk.
  * ``retention_chunkwise``  — parallel inside fixed-size chunks +
    ``lax.scan`` carrying (kv_state, kv_scale) across chunks; the training
    mode for hour-long sequences at O(T * chunk) cost.
  * ``retention_recurrent_step`` — per-frame O(1) state update; streaming.

Reference quirks preserved exactly (they are load-bearing for checkpoint
parity):
  * per-head decay γ is 1 (``decay = log([1]*heads)``, retention.py:20) — pure
    cumulative linear attention with running-scale renormalization instead of
    decay; the γ<1 general path is kept functional.
  * xpos rotation is computed but DISABLED in the reference (q/k used raw,
    retention.py:209-213); we expose ``use_xpos`` (default False).
  * data-dependent renormalizers use detached values clamped to >= 1
    (retention.py:121,162,180): parallel row-sum |.|, chunkwise inner scale,
    and the max-abs-sum kv scale. We mirror with ``stop_gradient``.
  * head layout: key_dim = embed_dim/heads, head_dim = value_factor*key_dim;
    k is pre-scaled by key_dim**-0.5; output group-norm is a non-affine
    LayerNorm(head_dim, eps=1e-6); swish(g) gating; out projection.

State convention for recurrent mode: ``kv`` has shape (B, H, dv, dk) with
``out[d_v] = sum_k q[d_k] * kv[d_v, d_k]`` and running scalar ``scale`` (B, H).
Initialize with zeros/zeros: the first step then reproduces the reference's
uninitialized-state branch (retention.py:137-138) identically.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from fseend_tpu.ops import nn

Params = dict


@dataclasses.dataclass(frozen=True)
class RetentionConfig:
    embed_dim: int
    num_heads: int
    value_factor: int = 1
    chunk_size: int = 500
    use_xpos: bool = False
    use_decay: bool = False  # reference uses γ=1 (no decay)
    use_pallas: bool = False  # fused TPU kernel for the chunkwise core (γ=1)
    use_fused_ret: bool = False  # FULLY fused layer kernel (projections +
                                 # chunkwise core + norm/gate/out-proj in one
                                 # pallas_call) — see
                                 # kernels/retention_layer_pallas.py

    @property
    def key_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def head_dim(self) -> int:
        return self.embed_dim * self.value_factor // self.num_heads


def decay_gammas(cfg: RetentionConfig) -> jnp.ndarray:
    """Per-head decay γ. Reference pins γ=1 (retention.py:20); the standard
    retnet schedule 1 - 2^(-5-h) is available via use_decay."""
    if cfg.use_decay:
        return 1.0 - jnp.exp2(-5.0 - jnp.arange(cfg.num_heads, dtype=jnp.float32))
    return jnp.ones((cfg.num_heads,), jnp.float32)


def init_retention(key, cfg: RetentionConfig) -> Params:
    """q/k/v/g projections (xavier gain 2^-2.5) + out projection (xavier),
    matching retention.py:105-111."""
    D, F = cfg.embed_dim, cfg.value_factor
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    g = 2.0 ** -2.5
    return {
        "q_proj": nn.xavier_linear_init(k1, D, D, gain=g),
        "k_proj": nn.xavier_linear_init(k2, D, D, gain=g),
        "v_proj": nn.xavier_linear_init(k3, D, D * F, gain=g),
        "g_proj": nn.xavier_linear_init(k4, D, D * F, gain=g),
        "out_proj": nn.xavier_linear_init(k5, D * F, D),
    }


def _xpos_angles(cfg: RetentionConfig) -> jnp.ndarray:
    half = cfg.key_dim // 2
    angle = 1.0 / (10000 ** jnp.linspace(0, 1, half))
    return jnp.repeat(angle, 2)


def _rotate_every_two(x):
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def _theta_shift(x, sin, cos):
    return x * cos + _rotate_every_two(x) * sin


def _project_qkv(p: Params, x: jnp.ndarray, cfg: RetentionConfig):
    """x: (B, T, D) -> q,k: (B, H, T, dk), v: (B, H, T, dv), g: (B, T, D*F)."""
    B, T, _ = x.shape
    H, dk, dv = cfg.num_heads, cfg.key_dim, cfg.head_dim
    q = nn.linear(p["q_proj"], x)
    k = nn.linear(p["k_proj"], x) * (dk ** -0.5)
    v = nn.linear(p["v_proj"], x)
    g = nn.linear(p["g_proj"], x)
    q = q.reshape(B, T, H, dk).swapaxes(1, 2)
    k = k.reshape(B, T, H, dk).swapaxes(1, 2)
    v = v.reshape(B, T, H, dv).swapaxes(1, 2)
    if cfg.use_xpos:
        angle = _xpos_angles(cfg)
        idx = jnp.arange(T, dtype=jnp.float32)
        sin = jnp.sin(idx[:, None] * angle[None, :])
        cos = jnp.cos(idx[:, None] * angle[None, :])
        q = _theta_shift(q, sin, cos)
        k = _theta_shift(k, sin, cos)
    return q, k, v, g


def _finish(p: Params, out_heads: jnp.ndarray, g: jnp.ndarray, cfg: RetentionConfig):
    """out_heads: (B, H, T, dv) -> group-norm -> gate -> out proj (B, T, D)."""
    B, H, T, dv = out_heads.shape
    out = out_heads.swapaxes(1, 2)  # (B, T, H, dv)
    out = nn.layer_norm(None, out, eps=1e-6)  # non-affine LN over head_dim
    out = out.reshape(B, T, H * dv)
    out = jax.nn.silu(g) * out
    return nn.linear(p["out_proj"], out)


def _decay_mask(T: int, gammas: jnp.ndarray):
    """(H, T, T) normalized decay mask + (H, T, 1) sqrt-rowsum scale
    (retention.py:48-57)."""
    i = jnp.arange(T, dtype=jnp.float32)
    delta = i[:, None] - i[None, :]
    tril = delta >= 0
    mask = jnp.where(tril[None], gammas[:, None, None] ** jnp.where(tril, delta, 0.0)[None], 0.0)
    scale = jnp.sqrt(jnp.sum(mask, axis=-1, keepdims=True))
    return mask / scale, scale


# ---------------------------------------------------------------------------
# mode 1: parallel
# ---------------------------------------------------------------------------


def retention_parallel(p: Params, x: jnp.ndarray, cfg: RetentionConfig) -> jnp.ndarray:
    """(B, T, D) -> (B, T, D). Masked-matmul form (retention.py:113-124)."""
    q, k, v, g = _project_qkv(p, x, cfg)
    gammas = decay_gammas(cfg)
    mask, _ = _decay_mask(x.shape[1], gammas)
    qk = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    qk = qk * mask[None]
    denom = jnp.abs(jax.lax.stop_gradient(qk).sum(axis=-1, keepdims=True))
    qk = qk / jnp.clip(denom, 1.0, None)
    out = jnp.einsum("bhqk,bhkd->bhqd", qk, v, preferred_element_type=jnp.float32)
    return _finish(p, out, g, cfg)


# ---------------------------------------------------------------------------
# mode 2: chunkwise recurrent (lax.scan over chunks)
# ---------------------------------------------------------------------------


def chunk_state_init(cfg: RetentionConfig, batch: int, dtype=jnp.float32) -> Params:
    """Cross-chunk carry for the chunkwise recursion: kv_state (B,H,dk,dv)
    and its running scale (B,H,1,1). Zero/one init reproduces the
    from-scratch chunkwise pass exactly."""
    return {
        "kv": jnp.zeros((batch, cfg.num_heads, cfg.key_dim, cfg.head_dim), dtype),
        "scale": jnp.ones((batch, cfg.num_heads, 1, 1), dtype),
    }


def retention_chunkwise(p: Params, x: jnp.ndarray, cfg: RetentionConfig) -> jnp.ndarray:
    """(B, T, D) -> (B, T, D) with T % chunk_size == 0
    (the model pads, LS onl_conformer...py:82-85).

    Faithful port of the cross-chunk state recursion with running
    abs-sum renormalization (retention.py:146-194), expressed as a scan.
    """
    out, _ = retention_chunkwise_stateful(p, x, None, cfg)
    return out


def retention_chunkwise_stateful(p: Params, x: jnp.ndarray, state: Params | None,
                                 cfg: RetentionConfig):
    """Chunkwise retention continuing from a cross-chunk `state` (None =
    fresh). Returns (out (B, T, D), new_state).  This is the engine of
    blockwise-recurrent SERVING: each arriving block of frames is one (or
    more) chunks, with O(1) carried state — the exact math the model trains
    with (chunkwise mode), at matmul granularity instead of per-frame ops."""
    B, T, D = x.shape
    L = cfg.chunk_size
    assert T % L == 0, f"T={T} must be a multiple of chunk_size={L}"
    N = T // L
    H, dk, dv = cfg.num_heads, cfg.key_dim, cfg.head_dim

    if cfg.use_fused_ret and not cfg.use_xpos:
        # whole layer (projections + core + finish) in one pallas_call —
        # no q/k/v/g/core-out HBM round-trips (the fusion-barrier cost the
        # op-level kernel pays); differentiable via custom-VJP recompute
        from fseend_tpu.kernels.retention_layer_pallas import (
            fused_retention_layer)

        return fused_retention_layer(
            p, x, state, cfg, jax.default_backend() != "tpu")

    q, k, v, g = _project_qkv(p, x, cfg)  # (B, H, T, d*)

    if cfg.use_pallas and not cfg.use_decay and state is None:
        from fseend_tpu.kernels.retention_pallas import chunkwise_retention

        out = chunkwise_retention(
            q.reshape(B * H, T, dk), k.reshape(B * H, T, dk),
            v.reshape(B * H, T, dv), L,
            interpret=jax.default_backend() != "tpu").reshape(B, H, T, dv)
        # the differentiable (custom-VJP) γ=1 training kernel; state unused
        return _finish(p, out, g, cfg), None
    if cfg.use_pallas:
        # carried-state and/or γ<1: the forward-only fused serving kernel
        # (blockwise-recurrent streaming — each call is one or more chunks
        # continued from `state`)
        from fseend_tpu.kernels.retention_pallas import (
            chunkwise_retention_stateful)

        gam = jnp.tile(decay_gammas(cfg), B)               # row bh = b*H + h
        if state is None:
            kv0 = jnp.zeros((B * H, dk, dv), jnp.float32)
            s0 = jnp.ones((B * H, 1, 1), jnp.float32)
        else:
            kv0 = state["kv"].reshape(B * H, dk, dv)
            s0 = state["scale"].reshape(B * H, 1, 1)
        out, kv_f, s_f = chunkwise_retention_stateful(
            gam, q.reshape(B * H, T, dk), k.reshape(B * H, T, dk),
            v.reshape(B * H, T, dv), kv0, s0, L,
            interpret=jax.default_backend() != "tpu")
        new_state = {"kv": kv_f.reshape(B, H, dk, dv),
                     "scale": s_f.reshape(B, H, 1, 1)}
        return _finish(p, out.reshape(B, H, T, dv), g, cfg), new_state
    gammas = decay_gammas(cfg)
    mask, scale = _decay_mask(L, gammas)           # (H, L, L), (H, L, 1)
    cross_decay = gammas[:, None, None] ** L        # (H, 1, 1)
    inner_decay = gammas[:, None] ** (jnp.arange(L, dtype=jnp.float32)[None, :] + 1)
    inner_decay = inner_decay[:, :, None] / (scale / scale[:, -1:, :])  # (H, L, 1)

    # chunked views: (N, B, H, L, d)
    qc = q.reshape(B, H, N, L, dk).transpose(2, 0, 1, 3, 4)
    kc = k.reshape(B, H, N, L, dk).transpose(2, 0, 1, 3, 4)
    vc = v.reshape(B, H, N, L, dv).transpose(2, 0, 1, 3, 4)

    # intra-chunk attention (batched over chunks — one big MXU matmul)
    qk = jnp.einsum("nbhqd,nbhkd->nbhqk", qc, kc, preferred_element_type=jnp.float32)
    qk = qk * mask[None, None]
    inner_scale = jnp.clip(
        jnp.abs(jax.lax.stop_gradient(qk)).sum(-1, keepdims=True), 1.0, None)
    inner_out = jnp.einsum("nbhqk,nbhkd->nbhqd", qk / inner_scale, vc,
                           preferred_element_type=jnp.float32)

    # per-chunk kv summaries: k^T (v * decay_row_last) (retention.py:167)
    kv_chunks = jnp.einsum("nbhlk,nbhlv->nbhkv", kc, vc * mask[None, None, :, -1, :, None],
                           preferred_element_type=jnp.float32)

    def scan_body(carry, inp):
        kv_state, kv_scale = carry  # (B,H,dk,dv), (B,H,1,1)
        kv_c = inp
        kv_rec = kv_state / kv_scale
        cross_scale = kv_scale
        kv_state = kv_state * cross_decay[None] + kv_c
        kv_scale = jnp.clip(
            jnp.abs(jax.lax.stop_gradient(kv_state)).sum(-2, keepdims=True)
            .max(-1, keepdims=True), 1.0, None)
        return (kv_state, kv_scale), (kv_rec, cross_scale)

    if state is None:
        init = (jnp.zeros((B, H, dk, dv), qk.dtype),
                jnp.ones((B, H, 1, 1), qk.dtype))
    else:
        init = (state["kv"].astype(qk.dtype), state["scale"].astype(qk.dtype))
    (kv_f, scale_f), (kv_recurrent, cross_scale) = jax.lax.scan(
        scan_body, init, kv_chunks)
    # kv_recurrent: (N, B, H, dk, dv); cross_scale: (N, B, H, 1, 1)

    cross_out = jnp.einsum("nbhlk,nbhkv->nbhlv", qc * inner_decay[None, None],
                           kv_recurrent, preferred_element_type=jnp.float32)
    all_scale = jnp.maximum(inner_scale, cross_scale)
    out = inner_out * (inner_scale / all_scale) + cross_out * (cross_scale / all_scale)
    out = out.transpose(1, 2, 0, 3, 4).reshape(B, H, T, dv).astype(x.dtype)
    sd = state["kv"].dtype if state is not None else x.dtype
    return _finish(p, out, g, cfg), {"kv": kv_f.astype(sd),
                                     "scale": scale_f.astype(sd)}


# ---------------------------------------------------------------------------
# mode 3: recurrent (streaming, O(1) state)
# ---------------------------------------------------------------------------


def retention_state_init(cfg: RetentionConfig, batch: int, dtype=jnp.float32) -> Params:
    """Zero state. scale=0 makes the first step reduce to the reference's
    fresh-state branch (scale -> 1, kv -> k v) exactly."""
    return {
        "kv": jnp.zeros((batch, cfg.num_heads, cfg.head_dim, cfg.key_dim), dtype),
        "scale": jnp.zeros((batch, cfg.num_heads), dtype),
    }


def retention_recurrent_step(p: Params, x_t: jnp.ndarray, state: Params,
                             cfg: RetentionConfig):
    """x_t: (B, D) one frame -> (out (B, D), new_state).

    Implements retention.py:126-144 with γ from decay_gammas:
      scale' = scale*γ + 1
      kv'    = kv * (sqrt(scale)*γ/sqrt(scale')) + (v k)/sqrt(scale')
      out    = sum_k q_k * kv'[v, k]
    """
    B, D = x_t.shape
    H, dk, dv = cfg.num_heads, cfg.key_dim, cfg.head_dim
    q = nn.linear(p["q_proj"], x_t).reshape(B, H, dk)
    k = (nn.linear(p["k_proj"], x_t) * (dk ** -0.5)).reshape(B, H, dk)
    v = nn.linear(p["v_proj"], x_t).reshape(B, H, dv)
    g = nn.linear(p["g_proj"], x_t)
    gammas = decay_gammas(cfg)[None]  # (1, H)

    prev_scale = state["scale"]
    scale = prev_scale * gammas + 1.0
    decay_mix = (jnp.sqrt(prev_scale) * gammas / jnp.sqrt(scale))[..., None, None]
    kv_t = v[..., :, None] * k[..., None, :]  # (B, H, dv, dk)
    kv = state["kv"] * decay_mix + kv_t / jnp.sqrt(scale)[..., None, None]
    out = jnp.einsum("bhk,bhvk->bhv", q, kv, preferred_element_type=jnp.float32)

    out = nn.layer_norm(None, out, eps=1e-6)  # (B, H, dv) non-affine
    out = out.reshape(B, H * dv).astype(x_t.dtype)
    out = jax.nn.silu(g) * out
    out = nn.linear(p["out_proj"], out)
    # keep the carried state in its own dtype (bf16 serving states must not
    # be promoted by the f32 decay constants)
    sd = state["kv"].dtype
    return out, {"kv": kv.astype(sd), "scale": scale.astype(state["scale"].dtype)}


def retention_recurrent(p: Params, x: jnp.ndarray, cfg: RetentionConfig) -> jnp.ndarray:
    """Whole-sequence recurrent evaluation via lax.scan (for tests/serving)."""
    B = x.shape[0]

    def step(state, x_t):
        out, state = retention_recurrent_step(p, x_t, state, cfg)
        return state, out

    _, ys = jax.lax.scan(step, retention_state_init(cfg, B, x.dtype), x.swapaxes(0, 1))
    return ys.swapaxes(0, 1)
