"""Pallas TPU kernel: flash-style attention of a K-query block against a
fixed-capacity KV cache (FS-EEND blockwise serving).

Why this exists: `fs_blockstream_step` attends each K=128-frame block
against the full preallocated cache (capacity positions, masked beyond the
write head) via `nn.mha_core`, which MATERIALIZES the (rows, K, capacity)
f32 score tensor in HBM — at 64 lanes x 4 heads x K=128 x cap=2048 that is
268 MB per encoder layer per block (and the C-slot decoder is worse),
dwarfing the 134 MB/layer the cache itself costs to read.  This kernel is
the classic online-softmax (flash) decode: scores live only as (G, K, BK)
VMEM tiles; running (max, sum, acc) statistics are carried across the
sequential kv-block grid axis, so HBM traffic drops to the cache read plus
O(1) state — the score tensor never exists.

Semantics (exactly `fs_eend._cached_attention_block`'s mask, which is the
reference's growing-cache causal rule, FS-EEND/nnet/streaming_tfm_model.py:
query i of the block attends cache positions <= start + i, where `start`
is the shared block write head (scalar; blockwise lanes advance together —
fs_eend.py:360-373).  Numerics mirror `nn.mha_core`: the q·k dot and the
softmax run in f32 with the 1/sqrt(hd) scale applied after the dot, and the
probability tile is rounded to v.dtype before the value dot (mha_core
rounds the normalized weights; the online form rounds the unnormalized
exp() tile and normalizes the f32 accumulator at the end — drift is at the
rounding level, bounded by the parity tests).

Masked-row safety: row i is fully masked in kv-block j iff j*BK > start+i,
which can only happen AFTER block (start+i)//BK gave that row a real score
(position 0 is valid for every row), so the running max is finite by then
and exp(-1e30 - m) underflows to exactly 0 — no NaN path.  Blocks with
j*BK > start+K-1 are masked for EVERY row and are skipped entirely
(@pl.when), saving the MXU work for the unfilled cache tail.

Forward-only: serving path (`use_flash_attn`), never differentiated.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # finite -inf stand-in: exp(_NEG - m) underflows to 0.0 in f32


def _kernel(start_ref, q_ref, k_ref, v_ref, o_ref, acc, m_run, l_run,
            *, K: int, BK: int, NJ: int, scale: float):
    j = pl.program_id(1)
    start = start_ref[0]

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        m_run[...] = jnp.full_like(m_run, _NEG)
        l_run[...] = jnp.zeros_like(l_run)

    # kv-blocks past every query's horizon (start+K-1) are dead: skip
    @pl.when(j * BK <= start + K - 1)
    def _():
        q = q_ref[...]                                   # (G, K, hd)
        k = k_ref[...]                                   # (G, BK, hd)
        v = v_ref[...]
        bqk = (((2,), (2,)), ((0,), (0,)))               # q @ k^T, G-batched
        bpv = (((2,), (1,)), ((0,), (0,)))               # p @ v,  G-batched
        s = jax.lax.dot_general(q, k, bqk,
                                preferred_element_type=jnp.float32) * scale
        qpos = start + jax.lax.broadcasted_iota(jnp.int32, (K, BK), 0)
        pos = j * BK + jax.lax.broadcasted_iota(jnp.int32, (K, BK), 1)
        s = jnp.where((pos <= qpos)[None], s, _NEG)      # (G, K, BK)

        m_new = jnp.maximum(m_run[...], s.max(axis=-1, keepdims=True))
        corr = jnp.exp(m_run[...] - m_new)               # (G, K, 1)
        p = jnp.exp(s - m_new)                           # (G, K, BK), <= 1
        l_run[...] = l_run[...] * corr + p.sum(axis=-1, keepdims=True)
        m_run[...] = m_new
        acc[...] = acc[...] * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, bpv, preferred_element_type=jnp.float32)

    @pl.when(j == NJ - 1)
    def _():
        o_ref[...] = (acc[...] / l_run[...]).astype(o_ref.dtype)


def _pick_group(R: int, K: int, BK: int) -> int:
    """Largest row group with the f32 (G, K, BK) score tile <= ~4 MB —
    G=8 x BK=1024 (a 4 MB tile) measured 2.55 ms vs 3.70 ms for
    G=8 x BK=512 at the encoder serving shape (R=256, cap=2048): fewer,
    fatter grid steps win until the tile thrashes VMEM."""
    budget = 4 * 1024 * 1024
    for g in (8, 4, 2):
        if R % g == 0 and g * K * BK * 4 <= budget:
            return g
    return 1


@functools.partial(jax.jit,
                   static_argnames=("interpret", "block_kv", "group"))
def flash_cached_attention(q, k, v, start, *, interpret: bool = False,
                           block_kv: int = 1024, group: int | None = None):
    """softmax(q k^T / sqrt(hd) + prefix-causal mask) v against a cache.

    q: (R, K, hd); k, v: (R, cap, hd); start: scalar int32 write head.
    Query i attends cache positions <= start + i.  Returns (R, K, hd) in
    q.dtype.  cap % block_kv must be 0 (pass a smaller block_kv otherwise).
    """
    R, K, hd = q.shape
    cap = k.shape[1]
    BK = min(block_kv, cap)
    assert cap % BK == 0, (cap, BK)
    NJ = cap // BK
    G = group or _pick_group(R, K, BK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R // G, NJ),
        in_specs=[
            pl.BlockSpec((G, K, hd), lambda r, j, s: (r, 0, 0)),
            pl.BlockSpec((G, BK, hd), lambda r, j, s: (r, j, 0)),
            pl.BlockSpec((G, BK, hd), lambda r, j, s: (r, j, 0)),
        ],
        out_specs=pl.BlockSpec((G, K, hd), lambda r, j, s: (r, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((G, K, hd), jnp.float32),
            pltpu.VMEM((G, K, 1), jnp.float32),
            pltpu.VMEM((G, K, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, K=K, BK=BK, NJ=NJ,
                          scale=1.0 / math.sqrt(hd)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, K, hd), q.dtype),
        interpret=interpret,
    )(jnp.asarray(start, jnp.int32).reshape(1), q, k, v)


def cached_attention_block(q, k, v, start, *, interpret: bool = False):
    """Leading-dims wrapper: q (..., K, hd) vs cache k/v (..., cap, hd) with
    shared scalar write head `start`; flattens the batch/slot/head leading
    axes into kernel rows and restores them."""
    lead = q.shape[:-2]
    R = math.prod(lead)
    out = flash_cached_attention(
        q.reshape(R, *q.shape[-2:]), k.reshape(R, *k.shape[-2:]),
        v.reshape(R, *v.shape[-2:]), start, interpret=interpret)
    return out.reshape(*lead, *out.shape[-2:])


# ---------------------------------------------------------------------------
# per-lane write heads (FS fast block / continuous batching)
# ---------------------------------------------------------------------------
#
# The round-5 FS fast block (fs_eend.fs_framestream_block) attends a K-frame
# query block against per-LANE-clock caches: lane b's queries sit at
# start[b]..start[b]+K-1 (continuous batching = independent stream phases).
# The XLA path materializes the (B, C, H, K, cap) f32 score tensor per
# decoder layer (~3.1 GB per 125-frame sub-block at 64 lanes/cap 2048) —
# the dominant HBM traffic of the whole step.  This variant is the same
# online-softmax decode as above with three deltas:
#   * `start` is a PER-ROW vector (scalar-prefetched; rows grouped so one
#     group never spans two lanes — G divides H (enc) / H (dec innermost),
#     so the group max used for dead-block skipping is exact per lane);
#   * a `min_pos` floor (the decoder masks pre-warm-up cache rows), with
#     the self position ALWAYS attendable (fs_eend's NaN guard for
#     pre-warm-up queries);
#   * masked-tile safety: with min_pos > 0 a row can be fully masked
#     BEFORE its first finite score (blocks left of min_pos), where the
#     scalar-start kernel's "position 0 is always valid" argument fails —
#     the probability tile is therefore explicitly zeroed on masked
#     entries instead of relying on exp underflow.

def _kernel_perlane(start_ref, q_ref, k_ref, v_ref, o_ref, acc, m_run,
                    l_run, *, K: int, BK: int, NJ: int, G: int,
                    min_pos: int, scale: float):
    r = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        m_run[...] = jnp.full_like(m_run, _NEG)
        l_run[...] = jnp.zeros_like(l_run)

    starts = start_ref[pl.ds(r * G, G)]                  # (G,) int32
    # kv-blocks past every group row's horizon are dead (right skip);
    # left-of-min_pos blocks may still hold pre-warm-up self positions,
    # so there is no left skip.
    @pl.when(j * BK <= jnp.max(starts) + K - 1)
    def _():
        q = q_ref[...]                                   # (G, K, hd)
        k = k_ref[...]                                   # (G, BK, hd)
        v = v_ref[...]
        bqk = (((2,), (2,)), ((0,), (0,)))
        bpv = (((2,), (1,)), ((0,), (0,)))
        s = jax.lax.dot_general(q, k, bqk,
                                preferred_element_type=jnp.float32) * scale
        qpos = starts[:, None, None] \
            + jax.lax.broadcasted_iota(jnp.int32, (G, K, BK), 1)
        pos = j * BK + jax.lax.broadcasted_iota(jnp.int32, (G, K, BK), 2)
        ok = ((pos <= qpos) & (pos >= min_pos)) | (pos == qpos)
        s = jnp.where(ok, s, _NEG)                       # (G, K, BK)

        m_new = jnp.maximum(m_run[...], s.max(axis=-1, keepdims=True))
        corr = jnp.exp(m_run[...] - m_new)               # (G, K, 1)
        # explicit zero on masked entries: exp(_NEG - _NEG) would be 1.0
        # on rows whose scores are ALL masked while m_new is still _NEG
        p = jnp.where(ok, jnp.exp(s - m_new), 0.0)       # (G, K, BK)
        l_run[...] = l_run[...] * corr + p.sum(axis=-1, keepdims=True)
        m_run[...] = m_new
        acc[...] = acc[...] * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, bpv, preferred_element_type=jnp.float32)

    @pl.when(j == NJ - 1)
    def _():
        o_ref[...] = (acc[...] / l_run[...]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("rows_per_lane", "min_pos", "interpret",
                                    "block_kv", "group"))
def flash_cached_attention_perlane(q, k, v, start, *, rows_per_lane: int,
                                   min_pos: int = 0, interpret: bool = False,
                                   block_kv: int = 1024,
                                   group: int | None = None):
    """Per-lane-clock flash decode.  q: (R, K, hd); k, v: (R, cap, hd);
    start: (R // rows_per_lane,) int32 per-LANE write heads (rows are
    lane-major: rows_per_lane consecutive rows share a lane).  Query i of
    lane b attends positions p with (min_pos <= p <= start[b]+i) or
    (p == start[b]+i).  Returns (R, K, hd) in q.dtype."""
    R, K, hd = q.shape
    cap = k.shape[1]
    BK = min(block_kv, cap)
    assert cap % BK == 0, (cap, BK)
    assert R % rows_per_lane == 0
    NJ = cap // BK
    G = group or _pick_group(R, K, BK)
    # one group must never span two lanes (the dead-block skip uses the
    # group max; a cross-lane group would also mis-index starts)
    while rows_per_lane % G:
        G //= 2
    G = max(G, 1)
    starts_row = jnp.repeat(jnp.asarray(start, jnp.int32), rows_per_lane)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R // G, NJ),
        in_specs=[
            pl.BlockSpec((G, K, hd), lambda r, j, s: (r, 0, 0)),
            pl.BlockSpec((G, BK, hd), lambda r, j, s: (r, j, 0)),
            pl.BlockSpec((G, BK, hd), lambda r, j, s: (r, j, 0)),
        ],
        out_specs=pl.BlockSpec((G, K, hd), lambda r, j, s: (r, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((G, K, hd), jnp.float32),
            pltpu.VMEM((G, K, 1), jnp.float32),
            pltpu.VMEM((G, K, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_perlane, K=K, BK=BK, NJ=NJ, G=G,
                          min_pos=min_pos, scale=1.0 / math.sqrt(hd)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, K, hd), q.dtype),
        interpret=interpret,
    )(starts_row, q, k, v)
