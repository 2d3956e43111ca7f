"""Pallas TPU kernel: fused chunkwise retention (γ=1).

The chunkwise-retention op (ops/retention.py:retention_chunkwise) is the hot
op of LS-EEND training (SURVEY.md §5.7 "hard part #1"): per chunk it does an
intra-chunk masked matmul, a cross-chunk state read, and a sequential state
update.  The pure-XLA version materializes qk (N, B, H, L, L), per-chunk kv
summaries and the scanned state in HBM between fused regions.

This kernel runs the whole chunkwise pipeline with the chunk resident in
VMEM and the running (kv_state, kv_scale) in VMEM *scratch carried across
sequential grid steps*: grid = (BH/G, N) with N minor — TPU grid execution
is sequential, so scratch written at chunk n is visible at chunk n+1; it is
seeded when n == 0.  One pass over HBM for q/k/v, one for the output.

G (batch·head) rows are processed per grid step as G-batched dot_generals
(default 8).  Round 2 shipped G=1 and lost to XLA ~2.7x at serving shapes
(BH=512, L=128): one (L, dk) matmul per step is too fine a grain to hide
grid overhead.  Batching rows amortizes it; measured on the chip
(tools/bench_retention_kernel.py, bf16): XLA 1.10 ms, G=1 2.99 ms,
G=8 1.03 ms — the batched grid is the first configuration that beats XLA.

γ=1 specialization (what the reference actually runs, retention.py:20):
the decay mask reduces to a lower-triangular 1/sqrt(row) normalization and
cross_decay == 1; per-head masks are head-independent so everything is
computed in-kernel with iota (no mask operands).

Gradients: `chunkwise_retention` is wrapped in jax.custom_vjp whose backward
re-runs the pure-JAX implementation's VJP (one recompute — the same
trade XLA rematerialization makes), so training can use the kernel without a
hand-written backward.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(gamma_ref, q_ref, k_ref, v_ref, kv0_ref, s0_ref,
            o_ref, kvf_ref, sf_ref, kv_state, kv_scale, *, L: int, N: int,
            G: int):
    """One (row-group, chunk) grid step over G (batch·head) rows. Carried
    (kv_state, kv_scale) live in VMEM scratch across the sequential minor
    grid axis; the incoming state refs seed chunk 0 and the final state is
    exported at chunk N-1.  Per-(batch,head) decay γ arrives as a
    (G,1,1)-blocked operand; γ=1 reduces every decay term to the
    reference's renormalized cumulative form (retention.py:146-194)."""
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        kv_state[...] = kv0_ref[...].astype(jnp.float32)
        kv_scale[...] = s0_ref[...].astype(jnp.float32)

    # Mosaic cannot legalize math.powf; γ^x == exp(x·logγ)
    # (exact for the reference's γ=1: log 1 = 0 → exp 0 = 1)
    lg = jnp.log(gamma_ref[...].astype(jnp.float32))          # (G, 1, 1)
    q = q_ref[:, 0]  # (G, L, dk)
    k = k_ref[:, 0]
    v = v_ref[:, 0]

    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tri = col <= row
    delta = jnp.where(tri, (row - col).astype(jnp.float32), 0.0)
    decay = jnp.where(tri, jnp.exp(lg * delta[None]), 0.0)    # (G, L, L)
    scale_vec = jnp.sqrt(decay.sum(axis=-1, keepdims=True))   # (G, L, 1)
    mask = decay / scale_vec

    bqk = (((2,), (2,)), ((0,), (0,)))                        # q @ k^T per row
    qk = jax.lax.dot_general(q, k, bqk,
                             preferred_element_type=jnp.float32) * mask
    inner_scale = jnp.clip(jnp.abs(qk).sum(axis=-1, keepdims=True), 1.0, None)
    bav = (((2,), (1,)), ((0,), (0,)))                        # (G,L,L)x(G,L,dv)
    inner = jax.lax.dot_general(qk / inner_scale, v, bav,
                                preferred_element_type=jnp.float32)

    # cross-chunk read: (q * inner_decay) @ (kv_state / kv_scale) with
    # inner_decay[i] = γ^(i+1) * scale_vec[L-1] / scale_vec[i]
    ii = row[:, :1].astype(jnp.float32)[None]                 # (1, L, 1) = i
    scale_last = jnp.sqrt(decay[:, -1:, :].sum(axis=-1, keepdims=True))
    inner_decay = jnp.exp(lg * (ii + 1.0)) * scale_last / scale_vec
    cross_scale = kv_scale[...]                               # (G, 1, 1)
    cross = jax.lax.dot_general(q * inner_decay, kv_state[...], bav,
                                preferred_element_type=jnp.float32) / cross_scale

    all_scale = jnp.maximum(inner_scale, cross_scale)
    o_ref[:, 0] = (inner * (inner_scale / all_scale)
                   + cross * (cross_scale / all_scale)).astype(o_ref.dtype)

    # state update: kv = kv * γ^L + k^T (v * last_mask_row)
    last_row = (jnp.exp(lg * (L - 1 - col[:1, :]).astype(jnp.float32)[None])
                / scale_last)                                  # (G, 1, L)
    bkv = (((1,), (1,)), ((0,), (0,)))                        # k^T v per row
    kv_c = jax.lax.dot_general(k, v * last_row.swapaxes(1, 2), bkv,
                               preferred_element_type=jnp.float32)
    new_state = kv_state[...] * jnp.exp(lg * float(L)) + kv_c
    kv_state[...] = new_state
    kv_scale[...] = jnp.clip(
        jnp.abs(new_state).sum(axis=1, keepdims=True).max(axis=2, keepdims=True),
        1.0, None)

    @pl.when(n == N - 1)
    def _():
        kvf_ref[...] = kv_state[...].astype(kvf_ref.dtype)
        sf_ref[...] = kv_scale[...].astype(sf_ref.dtype)


def _pick_group(BH: int, L: int) -> int:
    """Largest measured-good row-group dividing BH (G=8 wins the chip
    shootout at L=128; 16 regresses — the (G, L, L) decay/qk working set
    starts evicting the q/k/v blocks from VMEM, and Mosaic's scoped-vmem
    stack OOMs just past 16 MB at BH=5120/G=8/L=128 in the stateless
    variant).  Cap G so the f32 (G, L, L) intermediates (~4 live: decay,
    mask, qk, qk/inner_scale) stay ≤ ~2 MB each — at the training
    chunk L=500 that caps G at 2."""
    budget = 2 * 1024 * 1024
    for g in (8, 4, 2):
        if BH % g == 0 and g * L * L * 4 <= budget:
            return g
    return 1


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def _forward_stateful(gammas, q, k, v, kv0, s0, chunk: int,
                      interpret: bool = False):
    """(BH,)-per-row γ, q/k (BH, T, dk), v (BH, T, dv), kv0 (BH, dk, dv),
    s0 (BH, 1, 1) -> (out (BH, T, dv), kv_f, s_f)."""
    BH, T, dk = q.shape
    dv = v.shape[-1]
    N = T // chunk
    G = _pick_group(BH, chunk)
    # 4-D (BH, N, L, d) views: the (L, d) block equals the trailing array
    # dims, satisfying Mosaic's block-divisibility rule for any chunk size.
    q4 = q.reshape(BH, N, chunk, dk)
    k4 = k.reshape(BH, N, chunk, dk)
    v4 = v.reshape(BH, N, chunk, dv)
    g2 = gammas.reshape(BH, 1, 1).astype(jnp.float32)
    grid = (BH // G, N)
    out, kv_f, s_f = pl.pallas_call(
        functools.partial(_kernel, L=chunk, N=N, G=G),
        grid=grid,
        in_specs=[
            # per-(batch,head) γ as (BH, 1, 1): a (G, 1, 1) block's
            # LAST TWO dims equal the array's trailing (1, 1), which is the
            # form Mosaic's tiling rule accepts (a (G, 1) block over a 2-D
            # (BH, 1) array fails on real TPU, and a full-array SMEM block
            # blows the 1 MB SMEM budget at decoder scale BH = B·C·H).
            pl.BlockSpec((G, 1, 1), lambda b, n: (b, 0, 0)),
            pl.BlockSpec((G, 1, chunk, dk), lambda b, n: (b, n, 0, 0)),
            pl.BlockSpec((G, 1, chunk, dk), lambda b, n: (b, n, 0, 0)),
            pl.BlockSpec((G, 1, chunk, dv), lambda b, n: (b, n, 0, 0)),
            pl.BlockSpec((G, dk, dv), lambda b, n: (b, 0, 0)),
            pl.BlockSpec((G, 1, 1), lambda b, n: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((G, 1, chunk, dv), lambda b, n: (b, n, 0, 0)),
            pl.BlockSpec((G, dk, dv), lambda b, n: (b, 0, 0)),
            pl.BlockSpec((G, 1, 1), lambda b, n: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, N, chunk, dv), q.dtype),
            jax.ShapeDtypeStruct((BH, dk, dv), kv0.dtype),
            jax.ShapeDtypeStruct((BH, 1, 1), s0.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, dk, dv), jnp.float32),
            pltpu.VMEM((G, 1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(g2, q4, k4, v4, kv0, s0)
    return out.reshape(BH, T, dv), kv_f, s_f


def _forward(q, k, v, chunk: int, interpret: bool = False):
    """γ=1, fresh-state forward (the training hot path)."""
    BH, _, dk = q.shape
    dv = v.shape[-1]
    out, _, _ = _forward_stateful(
        jnp.ones((BH,), jnp.float32), q, k, v,
        jnp.zeros((BH, dk, dv), jnp.float32),
        jnp.ones((BH, 1, 1), jnp.float32), chunk, interpret)
    return out


def chunkwise_retention_stateful(gammas, q, k, v, kv0, s0, chunk: int,
                                 interpret: bool = False):
    """Carried-state chunkwise retention with per-row decay γ — the
    blockwise-recurrent SERVING core (each arriving block = one or more
    chunks, O(1) state; matches retention.py:146-194 continued from state).
    Forward-only: serving never differentiates; use `chunkwise_retention`
    for the training (fresh-state, γ=1) path, which has a custom VJP."""
    return _forward_stateful(gammas, q, k, v, kv0, s0, chunk, interpret)


def _pure_core(q, k, v, chunk: int):
    """Pure-JAX reference of the same (BH, T, d) core (γ=1), used for the
    custom-vjp backward. Mirrors ops/retention.py retention_chunkwise."""
    BH, T, dk = q.shape
    dv = v.shape[-1]
    L = chunk
    N = T // L
    qc = q.reshape(BH, N, L, dk).swapaxes(0, 1)
    kc = k.reshape(BH, N, L, dk).swapaxes(0, 1)
    vc = v.reshape(BH, N, L, dv).swapaxes(0, 1)
    i = jnp.arange(L, dtype=jnp.float32)
    tri = i[:, None] >= i[None, :]
    scale_vec = jnp.sqrt(i + 1.0)[:, None]
    mask = jnp.where(tri, 1.0, 0.0) / scale_vec
    qk = jnp.einsum("nbqd,nbkd->nbqk", qc, kc, preferred_element_type=jnp.float32) * mask
    inner_scale = jnp.clip(jnp.abs(jax.lax.stop_gradient(qk)).sum(-1, keepdims=True), 1.0, None)
    inner = jnp.einsum("nbqk,nbkd->nbqd", qk / inner_scale, vc,
                       preferred_element_type=jnp.float32)
    kv_chunks = jnp.einsum("nblk,nblv->nbkv", kc, vc / math.sqrt(L),
                           preferred_element_type=jnp.float32)

    def body(carry, inp):
        kv_state, kv_scale = carry
        kv_rec = kv_state / kv_scale
        cs = kv_scale
        kv_state = kv_state + inp
        kv_scale = jnp.clip(
            jnp.abs(jax.lax.stop_gradient(kv_state)).sum(-2, keepdims=True)
            .max(-1, keepdims=True), 1.0, None)
        return (kv_state, kv_scale), (kv_rec, cs)

    init = (jnp.zeros((BH, dk, dv), jnp.float32), jnp.ones((BH, 1, 1), jnp.float32))
    _, (kv_rec, cross_scale) = jax.lax.scan(body, init, kv_chunks)
    inner_decay = (math.sqrt(L) / scale_vec)
    cross = jnp.einsum("nbqd,nbdv->nbqv", qc * inner_decay, kv_rec,
                       preferred_element_type=jnp.float32)
    all_scale = jnp.maximum(inner_scale, cross_scale)
    out = inner * (inner_scale / all_scale) + cross * (cross_scale / all_scale)
    return out.swapaxes(0, 1).reshape(BH, T, dv).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def chunkwise_retention(q, k, v, chunk: int, interpret: bool = False):
    """Fused γ=1 chunkwise retention core.

    q, k: (BH, T, dk) with k pre-scaled by dk**-0.5; v: (BH, T, dv);
    T % chunk == 0.  Returns (BH, T, dv).
    """
    return _forward(q, k, v, chunk, interpret)


def _fwd(q, k, v, chunk, interpret):
    return _forward(q, k, v, chunk, interpret), (q, k, v)


def _bwd(chunk, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _pure_core(a, b, c, chunk), q, k, v)
    return vjp(g)


chunkwise_retention.defvjp(_fwd, _bwd)
