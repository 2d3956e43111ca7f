"""Pallas TPU kernel: FULLY fused retention layer (projections + chunkwise
core + group-norm/gate/out-proj) with carried cross-chunk state.

Why this exists: the op-level chunkwise kernel (kernels/retention_pallas.py)
beats XLA on the core itself, but loses end-to-end because `pallas_call` is a
fusion barrier — when XLA owns the whole graph it fuses the q/k/v/g
projections, the silu gate, the per-head group-norm and the out-projection
into the retention regions, while the custom call forces all of those
neighbors through separate HBM round-trips (PARITY.md "Round 3: Pallas
batched grid").  The serving step is HBM-bandwidth-bound, so the barrier —
not the core — is the cost.

This kernel removes the barrier by eating the neighbors: one call reads the
layer input x (B, T, D) and the carried (kv, scale) state, and writes the
layer output (B, T, D) and the new state.  Per layer per block that replaces
~6 materialized (B, T, D)-sized tensors (q, k, v, g, core-out, gated-out)
with zero — the only HBM traffic is x in, y out, weights (resident across
grid steps via constant index maps), and the O(1) state.

Grid = (B/G, N) with the chunk axis N minor; TPU grid execution is
sequential, so the (kv, scale) running state lives in VMEM scratch carried
across chunk steps (seeded at n == 0, exported at n == N-1) — the same
pattern as the core kernel.  Heads are processed in an unrolled loop; each
head's intra-chunk dots are G-row batched `dot_general`s (G=8 is the
measured-optimal grain from the core-kernel shootout), and per-head decay γ
is a scalar inside the loop, so the decay mask is a single (L, L) plane
instead of the core kernel's (G, L, L) block.

Numerics mirror ops/retention.py exactly: projections round to x.dtype (as
`nn.linear` does), core math accumulates f32, group-norm eps 1e-6
non-affine, out = silu(g) * norm(core), then out-proj (+bias).
xpos is not supported (the reference disables it, retention.py:209-213 —
q/k are used raw); callers gate on `not cfg.use_xpos`.

Differentiable via jax.custom_vjp: backward recomputes through the pure-JAX
stateful path (`ops.retention.retention_chunkwise_stateful` with the fused
flag off) — the same recompute trade the core kernel makes — so the flag is
safe to leave on in eval AND train graphs, though its target is serving.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(gam_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
            wg_ref, bg_ref, wo_ref, bo_ref, kv0_ref, s0_ref,
            y_ref, kvf_ref, sf_ref, kv_state, kv_scale,
            *, L: int, N: int, H: int, dk: int, dv: int):
    """One (row-group, chunk) grid step: G lanes × one L-frame chunk through
    the whole layer.  kv_state (G, H, dk, dv) / kv_scale (G, H, 1, 1) are
    VMEM scratch carried across the sequential minor grid axis."""
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        kv_state[...] = kv0_ref[...].astype(jnp.float32)
        kv_scale[...] = s0_ref[...].astype(jnp.float32)

    x = x_ref[:, 0]                                   # (G, L, D), x.dtype
    dt = x.dtype
    nobatch = (((2,), (0,)), ((), ()))                # (G,L,D) @ (D,E)

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(x, w_ref[...].astype(dt), nobatch,
                                preferred_element_type=jnp.float32)
        return (y + b_ref[...].astype(jnp.float32)).astype(dt)

    q = proj(wq_ref, bq_ref)                          # (G, L, D)
    # scale as a dt-typed scalar: Mosaic rejects broadcasting a raw python
    # float (f32 scalar) into a bf16 vector ('vector.broadcast' verifier)
    k = proj(wk_ref, bk_ref) * jnp.asarray(dk ** -0.5, dt)
    v = proj(wv_ref, bv_ref)                          # (G, L, DF)
    g = proj(wg_ref, bg_ref)

    # Mosaic cannot legalize powf; γ^x == exp(x·logγ) (exact for γ=1)
    lg_all = jnp.log(gam_ref[...].astype(jnp.float32))  # (H, 1, 1)

    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tri = col <= row
    delta = jnp.where(tri, (row - col).astype(jnp.float32), 0.0)
    ii = row[:, :1].astype(jnp.float32)               # (L, 1) = i

    bqk = (((2,), (2,)), ((0,), (0,)))                # q @ k^T, G-batched
    bav = (((2,), (1,)), ((0,), (0,)))                # (G,L,L) @ (G,L,dv)
    bkv = (((1,), (1,)), ((0,), (0,)))                # k^T v, G-batched

    outs = []
    for h in range(H):
        lg = lg_all[h, 0, 0]
        qh = q[:, :, h * dk:(h + 1) * dk]
        kh = k[:, :, h * dk:(h + 1) * dk]
        vh = v[:, :, h * dv:(h + 1) * dv]

        decay = jnp.where(tri, jnp.exp(lg * delta), 0.0)          # (L, L)
        scale_vec = jnp.sqrt(decay.sum(axis=-1, keepdims=True))   # (L, 1)
        mask = decay / scale_vec
        scale_last = jnp.sqrt(decay[-1:, :].sum(axis=-1, keepdims=True))

        qk = jax.lax.dot_general(qh, kh, bqk,
                                 preferred_element_type=jnp.float32)
        qk = qk * mask[None]
        inner_scale = jnp.clip(jnp.abs(qk).sum(axis=-1, keepdims=True),
                               1.0, None)
        inner = jax.lax.dot_general(qk / inner_scale, vh, bav,
                                    preferred_element_type=jnp.float32)

        # cross-chunk read: (q * inner_decay) @ (kv / kv_scale)
        inner_decay = jnp.exp(lg * (ii + 1.0)) * scale_last / scale_vec
        cross_scale = kv_scale[:, h]                              # (G, 1, 1)
        cross = jax.lax.dot_general(
            qh.astype(jnp.float32) * inner_decay[None], kv_state[:, h], bav,
            preferred_element_type=jnp.float32) / cross_scale

        all_scale = jnp.maximum(inner_scale, cross_scale)
        oh = (inner * (inner_scale / all_scale)
              + cross * (cross_scale / all_scale)).astype(dt)

        # per-head group-norm (eps 1e-6, non-affine — retention.py _finish)
        ohf = oh.astype(jnp.float32)
        mu = jnp.mean(ohf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(ohf - mu), axis=-1, keepdims=True)
        outs.append(((ohf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(dt))

        # state update: kv' = kv * γ^L + k^T (v * last_mask_row)
        last_row = jnp.exp(lg * (L - 1 - col[:1, :]).astype(jnp.float32)) \
            / scale_last                                          # (1, L)
        kv_c = jax.lax.dot_general(kh, vh * last_row.swapaxes(0, 1)[None],
                                   bkv, preferred_element_type=jnp.float32)
        new_state = kv_state[:, h] * jnp.exp(lg * float(L)) + kv_c
        kv_state[:, h] = new_state
        kv_scale[:, h] = jnp.clip(
            jnp.abs(new_state).sum(axis=1, keepdims=True)
            .max(axis=2, keepdims=True), 1.0, None)

    out = jnp.concatenate(outs, axis=-1)              # (G, L, H·dv)
    # gate in f32: Mosaic lowers bf16 logistic with an f32 const that fails
    # the vector.broadcast verifier ((f32) -> vector<...xbf16>)
    y = (jax.nn.silu(g.astype(jnp.float32))
         * out.astype(jnp.float32)).astype(dt)
    y = jax.lax.dot_general(y, wo_ref[...].astype(dt), nobatch,
                            preferred_element_type=jnp.float32)
    y_ref[:, 0] = (y + bo_ref[...].astype(jnp.float32)).astype(y_ref.dtype)

    @pl.when(n == N - 1)
    def _():
        kvf_ref[...] = kv_state[...].astype(kvf_ref.dtype)
        sf_ref[...] = kv_scale[...].astype(sf_ref.dtype)


def _pick_group(B: int, L: int) -> int:
    """Largest measured-good lane group dividing B.  The dominant f32
    intermediates are the per-head (G, L, L) qk planes (~3 live); cap them
    at ~2 MB each, the same VMEM rule as the core kernel (which G=16
    violated at L=128 only because its decay/mask were (G, L, L) too —
    here they are a single (L, L) plane, but the qk cap still binds)."""
    budget = 2 * 1024 * 1024
    for g in (8, 4, 2):
        if B % g == 0 and g * L * L * 4 <= budget:
            return g
    return 1


@functools.partial(jax.jit, static_argnames=("chunk", "interpret", "group"))
def _forward(gammas, x, wq, bq, wk, bk, wv, bv, wg, bg, wo, bo, kv0, s0,
             chunk: int, interpret: bool = False, group: int | None = None):
    """x (B, T, D); per-head γ (H,); weights (D, ·)/( ·, D) with (1, ·)
    biases; kv0 (B, H, dk, dv), s0 (B, H, 1, 1)
    -> (y (B, T, D), kv_f, s_f)."""
    B, T, D = x.shape
    H = gammas.shape[0]
    dk = wq.shape[1] // H
    dv = wv.shape[1] // H
    N = T // chunk
    G = group or _pick_group(B, chunk)
    x4 = x.reshape(B, N, chunk, D)
    g3 = gammas.reshape(H, 1, 1).astype(jnp.float32)
    const2 = lambda b, n: (0, 0)
    y, kv_f, s_f = pl.pallas_call(
        functools.partial(_kernel, L=chunk, N=N, H=H, dk=dk, dv=dv),
        grid=(B // G, N),
        in_specs=[
            # γ as (H, 1, 1): trailing (1, 1) dims satisfy Mosaic's tiling
            # rule (same trick as the core kernel's (G, 1, 1) operand)
            pl.BlockSpec((H, 1, 1), lambda b, n: (0, 0, 0)),
            pl.BlockSpec((G, 1, chunk, D), lambda b, n: (b, n, 0, 0)),
            # weights/biases: constant index maps — fetched once, kept in VMEM
            pl.BlockSpec(wq.shape, const2), pl.BlockSpec(bq.shape, const2),
            pl.BlockSpec(wk.shape, const2), pl.BlockSpec(bk.shape, const2),
            pl.BlockSpec(wv.shape, const2), pl.BlockSpec(bv.shape, const2),
            pl.BlockSpec(wg.shape, const2), pl.BlockSpec(bg.shape, const2),
            pl.BlockSpec(wo.shape, const2), pl.BlockSpec(bo.shape, const2),
            pl.BlockSpec((G, H, dk, dv), lambda b, n: (b, 0, 0, 0)),
            pl.BlockSpec((G, H, 1, 1), lambda b, n: (b, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((G, 1, chunk, D), lambda b, n: (b, n, 0, 0)),
            pl.BlockSpec((G, H, dk, dv), lambda b, n: (b, 0, 0, 0)),
            pl.BlockSpec((G, H, 1, 1), lambda b, n: (b, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, chunk, D), x.dtype),
            jax.ShapeDtypeStruct((B, H, dk, dv), kv0.dtype),
            jax.ShapeDtypeStruct((B, H, 1, 1), s0.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, H, dk, dv), jnp.float32),
            pltpu.VMEM((G, H, 1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(g3, x4, wq, bq, wk, bk, wv, bv, wg, bg, wo, bo, kv0, s0)
    return y.reshape(B, T, D), kv_f, s_f


def _bias2d(p, key, width):
    b = p[key].get("bias")
    if b is None:
        b = jnp.zeros((width,), jnp.float32)
    return b.reshape(1, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_retention_layer(p, x, state, cfg, interpret: bool = False):
    """Drop-in for `ops.retention.retention_chunkwise_stateful` (fused):
    p = retention params, x (B, T, D) with T % cfg.chunk_size == 0,
    state = {"kv", "scale"} or None -> (y (B, T, D), new_state).
    Requires cfg.use_xpos == False (the reference's setting)."""
    return _apply(p, x, state, cfg, interpret)


def _apply(p, x, state, cfg, interpret):
    assert not cfg.use_xpos, "fused retention layer: xpos unsupported"
    from fseend_tpu.ops.retention import decay_gammas

    B, T, D = x.shape
    H, dk, dv = cfg.num_heads, cfg.key_dim, cfg.head_dim
    if state is None:
        kv0 = jnp.zeros((B, H, dk, dv), jnp.float32)
        s0 = jnp.ones((B, H, 1, 1), jnp.float32)
    else:
        kv0, s0 = state["kv"], state["scale"]
    y, kv_f, s_f = _forward(
        decay_gammas(cfg), x,
        p["q_proj"]["kernel"], _bias2d(p, "q_proj", D),
        p["k_proj"]["kernel"], _bias2d(p, "k_proj", D),
        p["v_proj"]["kernel"], _bias2d(p, "v_proj", H * dv),
        p["g_proj"]["kernel"], _bias2d(p, "g_proj", H * dv),
        p["out_proj"]["kernel"], _bias2d(p, "out_proj", D),
        kv0, s0, cfg.chunk_size, interpret)
    sd = state["kv"].dtype if state is not None else x.dtype
    return y, {"kv": kv_f.astype(sd), "scale": s_f.astype(sd)}


def _fwd(p, x, state, cfg, interpret):
    return _apply(p, x, state, cfg, interpret), (p, x, state)


def _bwd(cfg, interpret, res, ct):
    from fseend_tpu.ops import retention as R

    p, x, state = res
    # both kernel flags off: the carried-state core kernel is forward-only,
    # so the recompute must take the pure-JAX path unconditionally
    pure_cfg = dataclasses.replace(cfg, use_fused_ret=False, use_pallas=False)

    def run(p_, x_, st_):
        return R.retention_chunkwise_stateful(p_, x_, st_, pure_cfg)

    _, vjp = jax.vjp(run, p, x, state)
    return vjp(ct)


fused_retention_layer.defvjp(_fwd, _bwd)
