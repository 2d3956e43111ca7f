"""Pallas TPU kernels: fused LS-EEND decoder fusion-layer TRAINING step —
forward AND hand-written backward, activations VMEM-resident per chunk.

Why this exists: the measured train-step breakdown (PARITY.md "Round 3:
training performance") shows the attractor decoder's fwd+bwd is ~60% of the
step and HBM-BANDWIDTH-BOUND, not FLOP-bound: every op on the (B, T, C, D)
slot grid touches 20-50M elements, each residual/norm/dropout materializes
them to HBM, the two `swapaxes` per layer relayout them again, and XLA's
autodiff saves ~15 such tensors for the backward.  One standalone LayerNorm
measured 6.0 ms while the XLA-counted FLOPs of the whole step need ~9 ms of
MXU.  Op-level tuning is exhausted (the matmuls are already MXU-shaped); the
fix is keeping the slot-grid activations in VMEM across the whole layer.

This module fuses ONE decoder fusion layer (reference semantics:
merge_retnet_layer.py:233-276 — time-axis chunkwise retention -> post-LN ->
speaker-axis MHA -> post-LN -> relu-FFN -> post-LN) into
  * a forward kernel: grid (B, N) with the chunk axis N minor; the gamma=1
    chunkwise-retention running state (kv, scale) lives in VMEM scratch
    across chunk steps; HBM traffic per layer = x in + y out + the O(B*N*
    H*C*dk*dv) per-chunk state checkpoints the backward needs;
  * a backward kernel: same grid with the chunk axis REVERSED; recomputes
    the chunk's forward entirely in VMEM (flash-attention-style recompute —
    nothing but x, dy and the per-chunk state checkpoints are read), then
    backpropagates through LN/FFN/MHA/gate/group-norm/retention by hand.
    The retention state cotangent rides VMEM scratch across the reverse
    chunk sweep; weight gradients accumulate in VMEM-resident output blocks
    (constant index maps) across ALL grid steps.

Dropout (all 5 sites of the reference layer: retention-out, attention
weights, MHA-out, FFN-hidden, FFN-out) runs INSIDE the kernel with a
counter-based hash RNG (murmur3 finalizer over element indices), so forward
and backward regenerate bit-identical masks from (seed, b, n, site) with
zero HBM mask traffic.  (pltpu.prng_* is not available in interpret mode in
this JAX version; the hash is mode-independent and test-able on CPU.)

Numerics mirror the pure-JAX train path (`models/ls_eend.fusion_layer` with
time_mode="chunkwise") op for op: retention per ops/retention.py:195-300
(gamma=1, stop-gradient renormalizers clamped >=1 — their backward is zero
by construction), MHA per ops/nn.py:mha_core (dropout on post-softmax
weights), LN/FFN per ops/nn.py.  MXU operands are cast to x.dtype before
every dot (one-pass bf16 semantics, exactly what
JAX_DEFAULT_MATMUL_PRECISION=bfloat16 does to the XLA path) and accumulate
f32, so the f32 parity tests are exact and the bf16 path matches XLA's
rounding family.  The internal chunk L defaults to cfg.chunk_size (exact
parity with the XLA path).  Smaller L is a legitimate perf/VMEM knob:
gamma=1 chunkwise retention is chunk-size invariant up to the group-norm
eps — the pre-norm head outputs at different chunk sizes are per-row
PROPORTIONAL (measured ratio std ~4e-5; with eps=0 the normalized outputs
agree to 7e-7), and the residual sensitivity (~0.05 on random tiny nets,
far smaller at trained activation scales) is a property of the REFERENCE's
own renormalized formulation (clip(.,1) renormalizers retention.py:162/180
+ LayerNorm(eps=1e-6) retention.py:86), not of this kernel — the kernel is
bit-faithful to the XLA path at every equal chunk size.

Scope: training (and eval) batch chunkwise mode, gamma=1 (cfg.use_decay
False — the reference's setting), xpos off, from-zero retention state (the
train path never carries state across calls).

Reference parity anchors: fusion layer merge_retnet_layer.py:233-276,
chunkwise retention + renormalizers LS-EEND/nnet/modules/retention.py:146-194.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fseend_tpu.kernels._common import framescan_vmem_limit_bytes

# dropout sites, in generation order (the order is load-bearing: fwd and
# bwd must draw masks identically)
_SITE_RET, _SITE_ATTNW, _SITE_MHA, _SITE_FFH, _SITE_FFO = range(5)

_U = jnp.uint32


def _hash_keep(seed, b, n, site, shape, rate: float, dt):
    """Deterministic per-element dropout multiplier: murmur3-finalizer hash
    of (seed, b, n, site, element index) -> keep ? 1/(1-rate) : 0 in `dt`.
    Pure uint32 VPU ops — identical in interpret and compiled modes."""
    base = (seed.astype(_U) * _U(0x9E3779B9)
            ^ (b.astype(_U) * _U(0x85EBCA6B))
            ^ (n.astype(_U) * _U(0xC2B2AE35))
            ^ _U((site * 0x27D4EB2F) & 0xFFFFFFFF))
    # linear element index (sizes here are < 2^31)
    idx = jnp.zeros(shape, _U)
    stride = 1
    for ax in range(len(shape) - 1, -1, -1):
        idx = idx + jax.lax.broadcasted_iota(_U, shape, ax) * _U(stride)
        stride *= shape[ax]
    h = idx ^ base
    h = h * _U(0x85EBCA6B)
    h = h ^ (h >> _U(13))
    h = h * _U(0xC2B2AE35)
    h = h ^ (h >> _U(16))
    keep = h >= _U(min(int(rate * 2.0 ** 32), 2 ** 32 - 1))
    return keep.astype(dt) * jnp.asarray(1.0 / (1.0 - rate), dt)


def _ln_fwd(x, s_row, b_row):
    """LayerNorm over the last axis (eps 1e-5, affine), f32 in/out.
    Returns (y, xhat, rstd)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    rs = jax.lax.rsqrt(var + 1e-5)
    xhat = (x - mu) * rs
    return xhat * s_row + b_row, xhat, rs


def _ln_bwd(dy, xhat, rs, s_row):
    """Backward of _ln_fwd. Returns (dx, dscale_rows, dbias_rows) where the
    d{scale,bias}_rows still need a sum over the leading axes."""
    dxh = dy * s_row
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    dx = rs * (dxh - m1 - xhat * m2)
    return dx, dy * xhat, dy


def _gn_bwd(dy, xhat, rs):
    """Backward of the non-affine per-head group norm (eps 1e-6, over dv)."""
    m1 = jnp.mean(dy, axis=-1, keepdims=True)
    m2 = jnp.mean(dy * xhat, axis=-1, keepdims=True)
    return rs * (dy - m1 - xhat * m2)


def _mm(a_dt, w_ref, b_ref=None):
    """(R, K) @ (K, M) -> f32 (+ bias row).  Operands in data dtype, f32
    accumulation — one-pass bf16 MXU semantics."""
    y = jax.lax.dot_general(a_dt, w_ref[...],
                            (((a_dt.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if b_ref is not None:
        y = y + b_ref[...].astype(jnp.float32)
    return y


def _bdot(a, b, contract, batch=((0,), (0,))):
    """C-batched dot_general in f32."""
    return jax.lax.dot_general(a, b, (contract, batch),
                               preferred_element_type=jnp.float32)


def _chunk_fwd(x_dt, kv_in, s_in, refs, seed, b, n, *,
               C, L, D, H, F, rate, collect):
    """One chunk of the fusion layer, everything in VMEM.

    x_dt: (C, L, D) data-dtype; kv_in: (H, C, dk, dv) f32; s_in: (H, C, 1, 1)
    f32.  Returns (y_f32 (C,L,D), kv_out, s_out, stash) — stash is None
    unless collect (the backward's recompute)."""
    (wqkvg, bqkvg, wro, bro, wmi, bmi, wmo, bmo,
     wf1, bf1, wf2, bf2, lns, lnb) = refs
    dt = x_dt.dtype
    f32 = jnp.float32
    dk = D // H
    dv = dk
    hd = D // H
    st = {} if collect else None

    # ---- constants of the gamma=1 chunkwise recursion ----
    # (iota must be integer on TPU; cast after)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tril = coli <= rowi
    sc = jnp.sqrt(rowi[:, :1].astype(f32) + 1.0)         # (L, 1) sqrt(i+1)
    mask = jnp.where(tril, 1.0, 0.0) / sc                # (L, L)
    inner_decay = sc[-1:, :] / sc                        # (L, 1)
    wlast = 1.0 / math.sqrt(L)                           # scalar
    kscale = jnp.asarray(dk ** -0.5, dt)

    def drop(v, site, shape=None):
        if rate <= 0.0:
            return v, None
        m = _hash_keep(seed, b, n, site, shape or v.shape, rate,
                       f32 if v.dtype == f32 else dt)
        return v * m, m

    x2d = x_dt.reshape(C * L, D)

    # ---- time-axis retention (ops/retention.py chunkwise, gamma=1) ----
    qkvg = _mm(x2d, wqkvg, bqkvg).reshape(C, L, 4 * D)   # f32
    qkvg_dt = qkvg.astype(dt)
    if collect:
        st["qkvg_dt"] = qkvg_dt
    heads, kv_outs, s_outs = [], [], []
    for h in range(H):
        q = qkvg_dt[..., h * dk:(h + 1) * dk]
        k = qkvg_dt[..., D + h * dk:D + (h + 1) * dk] * kscale
        v = qkvg_dt[..., 2 * D + h * dv:2 * D + (h + 1) * dv]
        qk = _bdot(q, k, ((2,), (2,))) * mask[None]      # (C, L, L) f32
        # stop_gradient mirrors the reference's DETACHED renormalizers
        # (retention.py:162) — identity in the kernel (the bwd is
        # hand-written) but it makes this function a valid autodiff ORACLE
        # for testing the hand-written backward (tests/test_dec_train_fusion)
        is_ = jnp.clip(jnp.sum(jnp.abs(jax.lax.stop_gradient(qk)),
                               axis=2, keepdims=True), 1.0, None)
        innin = (qk / is_).astype(dt)                    # (C, L, L)
        inner = _bdot(innin, v, ((2,), (1,)))            # (C, L, dv) f32
        qid = q.astype(f32) * inner_decay[None]
        kvn = kv_in[h] / s_in[h]                         # (C, dk, dv) f32
        cross = _bdot(qid, kvn, ((2,), (1,)))            # (C, L, dv) f32
        all_ = jnp.maximum(is_, s_in[h])                 # (C, L, 1)
        oh = inner * (is_ / all_) + cross * (s_in[h] / all_)
        # per-head group norm (eps 1e-6, non-affine — retention._finish)
        mu = jnp.mean(oh, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(oh - mu), axis=-1, keepdims=True)
        grs = jax.lax.rsqrt(var + 1e-6)
        ohn = (oh - mu) * grs
        heads.append(ohn)
        # state update: kv' = kv + k^T (v / sqrt(L)); scale' = clip(max|.|, 1)
        kv_c = _bdot(k, v, ((1,), (1,))) * wlast         # (C, dk, dv) f32
        kv_o = kv_in[h] + kv_c
        kv_outs.append(kv_o)
        s_outs.append(jnp.clip(
            jnp.abs(jax.lax.stop_gradient(kv_o))
            .sum(axis=1, keepdims=True).max(axis=2, keepdims=True),
            1.0, None))
        if collect:
            st[f"innin{h}"] = innin
            st[f"is{h}"] = is_
            st[f"all{h}"] = all_
            st[f"kvn{h}"] = kvn
            st[f"ohn{h}"] = ohn.astype(dt)
            st[f"grs{h}"] = grs
    retcat = jnp.concatenate(heads, axis=-1)             # (C, L, D) f32
    g = qkvg[..., 3 * D:]                                # f32
    sg = jax.nn.sigmoid(g)
    gated = (g * sg) * retcat                            # silu(g) * norm(out)
    gated_dt = gated.astype(dt)
    a = _mm(gated_dt.reshape(C * L, D), wro, bro).reshape(C, L, D)
    a, m0 = drop(a, _SITE_RET)
    x1, xh1, rs1 = _ln_fwd(x_dt.astype(f32) + a,
                           lns[0].astype(f32)[None], lnb[0].astype(f32)[None])
    x1_dt = x1.astype(dt)

    # ---- speaker-axis MHA across the C slots (ops/nn.py mha_core) ----
    qkv = _mm(x1_dt.reshape(C * L, D), wmi, bmi).reshape(C, L, 3 * D)
    qkv_dt = qkv.astype(dt)
    inv = 1.0 / math.sqrt(hd)
    attn_heads = []
    for h in range(H):
        qh = qkv_dt[..., h * hd:(h + 1) * hd]            # (C, L, hd)
        kh = qkv_dt[..., D + h * hd:D + (h + 1) * hd]
        vh = qkv_dt[..., 2 * D + h * hd:2 * D + (h + 1) * hd]
        # weights live KEY-SLOT-MINOR (C, L, Cj): per-slot access is then a
        # minor-axis size-1 SLICE.  The (C, Cj, L) layout needs a
        # (C,1,L)->(C,L,1) reshape per slot, i.e. a minor-dim insertion,
        # which Mosaic only lowers for 32-bit types — in bf16 it fails with
        # "Insertion of minor dim that is not a no-op only supported for
        # 32-bit types" (hit on-chip 2026-08-19; the f32 interpret tests
        # can't see it).  The stacks below insert minor dims on f32 only.
        scores = jnp.stack(
            [jnp.sum((qh * kh[cj:cj + 1]).astype(f32), axis=-1)
             for cj in range(C)], axis=-1) * inv         # (C, L, Cj) f32
        w = jax.nn.softmax(scores, axis=-1)
        wd_dt, m1h = drop(w.astype(dt), _SITE_ATTNW + 16 * h)
        acc = jnp.zeros((C, L, hd), f32)
        for cj in range(C):
            acc = acc + (wd_dt[:, :, cj:cj + 1] * vh[cj][None]).astype(f32)
        attn_heads.append(acc)
        if collect:
            st[f"w{h}"] = w.astype(dt)
            st[f"m1_{h}"] = m1h
    attn_dt = jnp.concatenate(attn_heads, axis=-1).astype(dt)
    s_mha = _mm(attn_dt.reshape(C * L, D), wmo, bmo).reshape(C, L, D)
    s_mha, m2 = drop(s_mha, _SITE_MHA)
    x2, xh2, rs2 = _ln_fwd(x1 + s_mha,
                           lns[1].astype(f32)[None], lnb[1].astype(f32)[None])
    x2_dt = x2.astype(dt)

    # ---- relu feed-forward (ops/nn.py ff_block) ----
    hpre = _mm(x2_dt.reshape(C * L, D), wf1, bf1).reshape(C, L, F)
    hrelu = jnp.maximum(hpre, 0.0)
    hdrop, m3 = drop(hrelu, _SITE_FFH)
    hdrop_dt = hdrop.astype(dt)
    f = _mm(hdrop_dt.reshape(C * L, F), wf2, bf2).reshape(C, L, D)
    f, m4 = drop(f, _SITE_FFO)
    x3, xh3, rs3 = _ln_fwd(x2 + f,
                           lns[2].astype(f32)[None], lnb[2].astype(f32)[None])

    kv_out = jnp.stack(kv_outs)
    s_out = jnp.stack(s_outs)
    if collect:
        st.update(m0=m0, m2=m2, m4=m4,
                  g=g.astype(dt), retcat=retcat.astype(dt),
                  gated_dt=gated_dt, xh1=xh1.astype(dt), rs1=rs1,
                  x1_dt=x1_dt, qkv_dt=qkv_dt, attn_dt=attn_dt,
                  xh2=xh2.astype(dt), rs2=rs2, x2_dt=x2_dt,
                  relu_m=(hpre > 0.0).astype(dt), m3=m3,
                  hdrop_dt=hdrop_dt, xh3=xh3.astype(dt), rs3=rs3)
    return x3, kv_out, s_out, st


def _fwd_kernel(seed_ref, x_ref, *rest, C, L, D, H, F, N, rate,
                checkpoints=True):
    refs = rest[:14]
    if checkpoints:
        y_ref, kvs_ref, ss_ref = rest[14:17]
        kv_scr, s_scr = rest[17:]
    else:
        y_ref = rest[14]
        kv_scr, s_scr = rest[15:]
    b = pl.program_id(0)
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        kv_scr[...] = jnp.zeros_like(kv_scr)
        s_scr[...] = jnp.ones_like(s_scr)

    kv_in = kv_scr[...]
    s_in = s_scr[...]
    if checkpoints:
        # checkpoint the INCOMING state for the backward's recompute.  ss is
        # carried (B, N, H, C, 1, 1) so the write needs NO reshape: Mosaic's
        # layout inference rejects the (1,1,H,C)<->(H,C,1,1) shape cast
        # ("infer-vector-layout: unsupported shape cast", hit on-chip
        # 2026-08-19 — the unit dims move from major to minor, a relayout).
        kvs_ref[0, 0] = kv_in.astype(kvs_ref.dtype)
        ss_ref[0, 0] = s_in.astype(ss_ref.dtype)

    x_dt = x_ref[0, :, 0]                                # (C, L, D)
    y, kv_out, s_out, _ = _chunk_fwd(
        x_dt, kv_in, s_in, refs, seed_ref[0, 0], b, n,
        C=C, L=L, D=D, H=H, F=F, rate=rate, collect=False)
    y_ref[0, :, 0] = y.astype(y_ref.dtype)
    kv_scr[...] = kv_out
    s_scr[...] = s_out


def _bwd_kernel(seed_ref, x_ref, dy_ref, kvs_ref, ss_ref, *rest,
                C, L, D, H, F, N, B, rate):
    refs = rest[:14]
    (dx_ref, dwqkvg_ref, dbqkvg_ref, dwro_ref, dbro_ref, dwmi_ref, dbmi_ref,
     dwmo_ref, dbmo_ref, dwf1_ref, dbf1_ref, dwf2_ref, dbf2_ref,
     dlns_ref, dlnb_ref) = rest[14:29]
    dkv_scr = rest[29]
    b = pl.program_id(0)
    rn = pl.program_id(1)
    n = N - 1 - rn                                       # reverse chunk sweep
    (wqkvg, bqkvg, wro, bro, wmi, bmi, wmo, bmo,
     wf1, bf1, wf2, bf2, lns, lnb) = refs
    f32 = jnp.float32
    dk = D // H
    dv = dk
    hd = D // H
    first = jnp.logical_and(b == 0, rn == 0)

    @pl.when(rn == 0)
    def _():
        dkv_scr[...] = jnp.zeros_like(dkv_scr)

    @pl.when(first)
    def _():
        for r in (dwqkvg_ref, dbqkvg_ref, dwro_ref, dbro_ref, dwmi_ref,
                  dbmi_ref, dwmo_ref, dbmo_ref, dwf1_ref, dbf1_ref,
                  dwf2_ref, dbf2_ref, dlns_ref, dlnb_ref):
            r[...] = jnp.zeros_like(r)

    x_dt = x_ref[0, :, 0]
    dt = x_dt.dtype
    kv_in = kvs_ref[0, 0].astype(f32)
    s_in = ss_ref[0, 0].astype(f32)          # (H, C, 1, 1) — no reshape
    _, _, _, st = _chunk_fwd(
        x_dt, kv_in, s_in, refs, seed_ref[0, 0], b, jnp.asarray(n),
        C=C, L=L, D=D, H=H, F=F, rate=rate, collect=True)

    rowi = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    sc = jnp.sqrt(rowi[:, :1].astype(f32) + 1.0)
    mask = jnp.where(coli <= rowi, 1.0, 0.0) / sc
    inner_decay = sc[-1:, :] / sc                        # (L, 1)
    wlast = 1.0 / math.sqrt(L)
    kscale = jnp.asarray(dk ** -0.5, dt)

    def dmul(v, m):
        return v if m is None else v * m.astype(f32)

    flat = lambda t: t.reshape(C * L, t.shape[-1])

    def wgrad(acc_ref, a_dt, d_f32):
        acc_ref[...] += jax.lax.dot_general(
            flat(a_dt), flat(d_f32).astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    def bgrad(acc_ref, d_f32):
        acc_ref[...] += jnp.sum(flat(d_f32), axis=0, keepdims=True)

    def dthrough(d_f32, w_ref):
        """d @ W^T in data dtype, f32 accumulation."""
        return jax.lax.dot_general(
            flat(d_f32).astype(dt), w_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=f32).reshape(C, L, -1)

    # ---- LN3 ----
    dy = dy_ref[0, :, 0].astype(f32)
    dr3, dls2, dlb2 = _ln_bwd(dy, st["xh3"].astype(f32), st["rs3"],
                              lns[2].astype(f32)[None])
    dlns_ref[2] += jnp.sum(flat(dls2), axis=0, keepdims=True)
    dlnb_ref[2] += jnp.sum(flat(dlb2), axis=0, keepdims=True)
    # ---- FFN ----
    df = dmul(dr3, st["m4"])
    wgrad(dwf2_ref, st["hdrop_dt"], df)
    bgrad(dbf2_ref, df)
    dhdrop = dthrough(df, wf2)                           # (C, L, F)
    dhpre = dmul(dhdrop, st["m3"]) * st["relu_m"].astype(f32)
    wgrad(dwf1_ref, st["x2_dt"], dhpre)
    bgrad(dbf1_ref, dhpre)
    dx2 = dr3 + dthrough(dhpre, wf1)
    # ---- LN2 ----
    dr2, dls1, dlb1 = _ln_bwd(dx2, st["xh2"].astype(f32), st["rs2"],
                              lns[1].astype(f32)[None])
    dlns_ref[1] += jnp.sum(flat(dls1), axis=0, keepdims=True)
    dlnb_ref[1] += jnp.sum(flat(dlb1), axis=0, keepdims=True)
    # ---- MHA ----
    ds = dmul(dr2, st["m2"])
    wgrad(dwmo_ref, st["attn_dt"], ds)
    bgrad(dbmo_ref, ds)
    dattn = dthrough(ds, wmo)                            # (C, L, D)
    inv = 1.0 / math.sqrt(hd)
    qkv_dt = st["qkv_dt"]
    dqkv_heads_q, dqkv_heads_k, dqkv_heads_v = [], [], []
    for h in range(H):
        qh = qkv_dt[..., h * hd:(h + 1) * hd]
        kh = qkv_dt[..., D + h * hd:D + (h + 1) * hd]
        vh = qkv_dt[..., 2 * D + h * hd:2 * D + (h + 1) * hd]
        dah = dattn[..., h * hd:(h + 1) * hd]            # (C, L, hd) f32
        w = st[f"w{h}"].astype(f32)                      # (C, L, Cj)
        m1h = st[f"m1_{h}"]
        wd = w if m1h is None else w * m1h.astype(f32)
        dah_dt = dah.astype(dt)
        # d(w_dropped)[c, l, cj] = sum_hd dah[c,l,:] * vh[cj,l,:]
        # (key-slot-minor layout throughout: per-slot access is a minor-axis
        # slice; minor-dim INSERTION on bf16 is Mosaic-rejected — see fwd)
        dwd = jnp.stack(
            [jnp.sum((dah_dt * vh[cj:cj + 1]).astype(f32), axis=-1)
             for cj in range(C)], axis=-1)               # (C, L, Cj)
        # dv[cj] = sum_ci wd[ci,:,cj] * dah[ci]
        dvh = jnp.stack(
            [sum((wd[ci, :, cj:cj + 1] * dah[ci])
                 for ci in range(C))
             for cj in range(C)], axis=0)                # (C, L, hd)
        dw = dwd if m1h is None else dwd * m1h.astype(f32)
        dscore = (w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))) * inv
        dqh = sum((dscore[:, :, cj:cj + 1]
                   * kh[cj][None].astype(f32)) for cj in range(C))
        dkh = jnp.stack(
            [sum((dscore[ci, :, cj:cj + 1]
                  * qh[ci].astype(f32))
                 for ci in range(C)) for cj in range(C)], axis=0)
        dqkv_heads_q.append(dqh)
        dqkv_heads_k.append(dkh)
        dqkv_heads_v.append(dvh)
    dqkv = jnp.concatenate(
        [jnp.concatenate(dqkv_heads_q, axis=-1),
         jnp.concatenate(dqkv_heads_k, axis=-1),
         jnp.concatenate(dqkv_heads_v, axis=-1)], axis=-1)  # (C, L, 3D)
    wgrad(dwmi_ref, st["x1_dt"], dqkv)
    bgrad(dbmi_ref, dqkv)
    dx1 = dr2 + dthrough(dqkv, wmi)
    # ---- LN1 ----
    dr1, dls0, dlb0 = _ln_bwd(dx1, st["xh1"].astype(f32), st["rs1"],
                              lns[0].astype(f32)[None])
    dlns_ref[0] += jnp.sum(flat(dls0), axis=0, keepdims=True)
    dlnb_ref[0] += jnp.sum(flat(dlb0), axis=0, keepdims=True)
    # ---- retention out-proj + gate ----
    da = dmul(dr1, st["m0"])
    wgrad(dwro_ref, st["gated_dt"], da)
    bgrad(dbro_ref, da)
    dgated = dthrough(da, wro)                           # (C, L, D) f32
    g = st["g"].astype(f32)
    sg = jax.nn.sigmoid(g)
    silu = g * sg
    dretcat = dgated * silu
    dg = dgated * st["retcat"].astype(f32) * (sg * (1.0 + g * (1.0 - sg)))
    # ---- retention core, per head ----
    qkvg_dt = st["qkvg_dt"]
    dq_all, dk_all, dv_all = [], [], []
    for h in range(H):
        q = qkvg_dt[..., h * dk:(h + 1) * dk]
        k = qkvg_dt[..., D + h * dk:D + (h + 1) * dk] * kscale
        v = qkvg_dt[..., 2 * D + h * dv:2 * D + (h + 1) * dv]
        is_ = st[f"is{h}"]
        all_ = st[f"all{h}"]
        # group-norm backward
        dohn = dretcat[..., h * dv:(h + 1) * dv]
        doh = _gn_bwd(dohn, st[f"ohn{h}"].astype(f32), st[f"grs{h}"])
        dinner = doh * (is_ / all_)
        dcross = doh * (s_in[h] / all_)
        din_dt = dinner.astype(dt)
        dcr_dt = dcross.astype(dt)
        # cross path (kvn, s_in are stop-grad constants)
        kvn_dt = st[f"kvn{h}"].astype(dt)
        dqid = _bdot(dcr_dt, kvn_dt, ((2,), (2,)))       # (C, L, dk)
        dq = dqid * inner_decay[None]
        qid_dt = (q.astype(f32) * inner_decay[None]).astype(dt)
        dkv_cross = _bdot(qid_dt, dcr_dt, ((1,), (1,))) / s_in[h]
        # inner path
        innin = st[f"innin{h}"]
        dv_ = _bdot(innin, din_dt, ((1,), (1,)))         # (C, dv?) -> (C, L, dv)
        # NOTE: innin is (C, L, L); contract over the query axis L (axis 1)
        # innin^T @ dinner: (C, Lk, Lq) x (C, Lq, dv)
        dqk = _bdot(din_dt, v, ((2,), (2,))) / is_ * mask[None]
        dqk_dt = dqk.astype(dt)
        dq = dq + _bdot(dqk_dt, k, ((2,), (1,)))         # (C, L, dk)
        dk_ = _bdot(dqk_dt, q, ((1,), (1,)))             # (C, Lk, dk)
        # state-update path.  Cotangent bookkeeping (gamma=1):
        #   S_n = S_{n-1} + kv_c(n);  chunk n's cross READS S_{n-1}.
        # Reverse sweep: dkv_scr holds dS_n (set while processing chunk
        # n+1; zero for the last chunk — training discards the final
        # state).  kv_c(n)'s k/v grads use dS_n ALONE; the cross-read
        # contribution dkv_cross belongs to dS_{n-1}, the NEXT carry.
        dS_n = dkv_scr[h]                                # (C, dk, dv)
        dS_dt = dS_n.astype(dt)
        dk_ = dk_ + _bdot(v, dS_dt, ((2,), (2,))) * wlast
        dv_ = dv_ + _bdot(k, dS_dt, ((2,), (1,))) * wlast
        dkv_scr[h] = dS_n + dkv_cross                    # dS_{n-1}
        dq_all.append(dq)
        dk_all.append(dk_ * float(dk ** -0.5))
        dv_all.append(dv_)
    dqkvg = jnp.concatenate(
        [jnp.concatenate(dq_all, axis=-1), jnp.concatenate(dk_all, axis=-1),
         jnp.concatenate(dv_all, axis=-1), dg], axis=-1)  # (C, L, 4D)
    wgrad(dwqkvg_ref, x_dt, dqkvg)
    bgrad(dbqkvg_ref, dqkvg)
    dx = dr1 + dthrough(dqkvg, wqkvg)
    dx_ref[0, :, 0] = dx.astype(dx_ref.dtype)


def _pack(p, dt):
    """Layer param pytree -> kernel operand tuple (all data-dtype)."""
    tr = p["time_ret"]
    cat = lambda names, key: jnp.concatenate(
        [tr[nm][key].astype(dt) for nm in names],
        axis=1 if key == "kernel" else 0)
    names = ("q_proj", "k_proj", "v_proj", "g_proj")
    wqkvg = cat(names, "kernel")
    bqkvg = jnp.concatenate(
        [tr[nm].get("bias", jnp.zeros((tr[nm]["kernel"].shape[1],),
                                      jnp.float32)).astype(dt)
         for nm in names], axis=0).reshape(1, -1)
    at = p["spk_attn"]
    lns = jnp.stack([p[nm]["scale"].astype(dt).reshape(1, -1)
                     for nm in ("norm11", "norm21", "norm22")])
    lnb = jnp.stack([p[nm]["bias"].astype(dt).reshape(1, -1)
                     for nm in ("norm11", "norm21", "norm22")])
    b2 = lambda q, w: q.get("bias", jnp.zeros((w.shape[1],), jnp.float32)) \
        .astype(dt).reshape(1, -1)
    return (wqkvg, bqkvg,
            tr["out_proj"]["kernel"].astype(dt),
            b2(tr["out_proj"], tr["out_proj"]["kernel"]),
            at["in_proj"]["kernel"].astype(dt),
            at["in_proj"]["bias"].astype(dt).reshape(1, -1),
            at["out_proj"]["kernel"].astype(dt),
            b2(at["out_proj"], at["out_proj"]["kernel"]),
            p["linear1"]["kernel"].astype(dt),
            b2(p["linear1"], p["linear1"]["kernel"]),
            p["linear2"]["kernel"].astype(dt),
            b2(p["linear2"], p["linear2"]["kernel"]),
            lns, lnb)


def _const_specs(ops):
    return [pl.BlockSpec(o.shape, lambda b, n, _r=o.ndim: (0,) * _r)
            for o in ops]


def _fwd_call(x5, seed, ops, H: int, rate: float, interpret: bool,
              checkpoints: bool = True):
    """checkpoints=False (the no-grad/eval path) skips the per-chunk
    (B,N,H,C,dk,dv)+(B,N,H,C,1,1) f32 state-checkpoint outputs — pure HBM
    write traffic the VJP-free caller would discard."""
    B, C, N, L, D = x5.shape
    F = ops[8].shape[1]
    dk = D // H
    kern = functools.partial(_fwd_kernel, C=C, L=L, D=D, H=H, F=F, N=N,
                             rate=rate, checkpoints=checkpoints)
    out_specs = [pl.BlockSpec((1, C, 1, L, D), lambda b, n: (b, 0, n, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct(x5.shape, x5.dtype)]
    if checkpoints:
        out_specs += [
            pl.BlockSpec((1, 1, H, C, dk, dk), lambda b, n: (b, n, 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, H, C, 1, 1),
                         lambda b, n: (b, n, 0, 0, 0, 0)),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((B, N, H, C, dk, dk), jnp.float32),
            jax.ShapeDtypeStruct((B, N, H, C, 1, 1), jnp.float32),
        ]
    outs = pl.pallas_call(
        kern,
        grid=(B, N),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, n: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, 1, L, D), lambda b, n: (b, 0, n, 0, 0)),
            *_const_specs(ops),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((H, C, dk, dk), jnp.float32),
            pltpu.VMEM((H, C, 1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=framescan_vmem_limit_bytes()),
        interpret=interpret,
    )(seed, x5, *ops)
    if checkpoints:
        return outs
    return outs[0], None, None


def _bwd_call(x5, dy5, kvs, ss, seed, ops, H: int, rate: float,
              interpret: bool):
    B, C, N, L, D = x5.shape
    F = ops[8].shape[1]
    dk = D // H
    kern = functools.partial(_bwd_kernel, C=C, L=L, D=D, H=H, F=F, N=N, B=B,
                             rate=rate)
    cm2 = lambda s: pl.BlockSpec(s, lambda b, n, _r=len(s): (0,) * _r)
    outs = pl.pallas_call(
        kern,
        grid=(B, N),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, n: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, 1, L, D),
                         lambda b, n, _N=N: (b, 0, _N - 1 - n, 0, 0)),
            pl.BlockSpec((1, C, 1, L, D),
                         lambda b, n, _N=N: (b, 0, _N - 1 - n, 0, 0)),
            pl.BlockSpec((1, 1, H, C, dk, dk),
                         lambda b, n, _N=N: (b, _N - 1 - n, 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, H, C, 1, 1),
                         lambda b, n, _N=N: (b, _N - 1 - n, 0, 0, 0, 0)),
            *_const_specs(ops),
        ],
        out_specs=[
            pl.BlockSpec((1, C, 1, L, D),
                         lambda b, n, _N=N: (b, 0, _N - 1 - n, 0, 0)),
            cm2((D, 4 * D)), cm2((1, 4 * D)), cm2((D, D)), cm2((1, D)),
            cm2((D, 3 * D)), cm2((1, 3 * D)), cm2((D, D)), cm2((1, D)),
            cm2((D, F)), cm2((1, F)), cm2((F, D)), cm2((1, D)),
            cm2((3, 1, D)), cm2((3, 1, D)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x5.shape, x5.dtype),
            jax.ShapeDtypeStruct((D, 4 * D), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((F, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((3, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((3, 1, D), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, C, dk, dk), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=framescan_vmem_limit_bytes()),
        interpret=interpret,
    )(seed, x5, dy5, kvs, ss, *ops)
    return outs


def _layer_apply(p, x, seed, *, n_heads: int, chunk: int, rate: float,
                 interpret: bool):
    """x: (B, C, T, D) slot-major; seed: (1,1) int32.  Applies one decoder
    fusion layer (train semantics, from-zero retention state)."""
    B, C, T, D = x.shape
    L = chunk
    assert T % L == 0, f"T={T} must be a multiple of the kernel chunk {L}"
    N = T // L
    ops = _pack(p, x.dtype)
    x5 = x.reshape(B, C, N, L, D)
    y, _, _ = _fwd_call(x5, seed, ops, n_heads, rate, interpret,
                        checkpoints=False)
    return y.reshape(B, C, T, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_fusion_layer(p, x, seed, n_heads: int, chunk: int, rate: float,
                       interpret: bool = False):
    """Drop-in for `models/ls_eend.fusion_layer` (chunkwise train mode) on a
    slot-major (B, C, T, D) grid, with a hand-written fused backward.
    gamma=1 / no-xpos only (the reference's setting); `rate` is the dropout
    rate (0.0 = eval).  `seed` (1,1) int32 drives the in-kernel mask hash."""
    return _layer_apply(p, x, seed, n_heads=n_heads, chunk=chunk, rate=rate,
                        interpret=interpret)


def _vjp_fwd(p, x, seed, n_heads, chunk, rate, interpret):
    B, C, T, D = x.shape
    L = chunk
    N = T // L
    ops = _pack(p, x.dtype)
    x5 = x.reshape(B, C, N, L, D)
    y, kvs, ss = _fwd_call(x5, seed, ops, n_heads, rate, interpret)
    return y.reshape(B, C, T, D), (p, x5, seed, kvs, ss)


def _vjp_bwd(n_heads, chunk, rate, interpret, res, dy):
    p, x5, seed, kvs, ss = res
    B, C, N, L, D = x5.shape
    ops = _pack(p, x5.dtype)
    dy5 = dy.reshape(B, C, N, L, D)
    (dx5, dwqkvg, dbqkvg, dwro, dbro, dwmi, dbmi, dwmo, dbmo,
     dwf1, dbf1, dwf2, dbf2, dlns, dlnb) = _bwd_call(
        x5, dy5, kvs, ss, seed, ops, n_heads, rate, interpret)

    def like(leaf, val):
        return val.reshape(leaf.shape).astype(leaf.dtype)

    tr = p["time_ret"]
    dp = {
        "time_ret": {},
        "spk_attn": {
            "in_proj": {"kernel": like(p["spk_attn"]["in_proj"]["kernel"], dwmi),
                        "bias": like(p["spk_attn"]["in_proj"]["bias"], dbmi)},
            "out_proj": {"kernel": like(p["spk_attn"]["out_proj"]["kernel"], dwmo)},
        },
        "linear1": {"kernel": like(p["linear1"]["kernel"], dwf1)},
        "linear2": {"kernel": like(p["linear2"]["kernel"], dwf2)},
        "norm11": {"scale": like(p["norm11"]["scale"], dlns[0]),
                   "bias": like(p["norm11"]["bias"], dlnb[0])},
        "norm21": {"scale": like(p["norm21"]["scale"], dlns[1]),
                   "bias": like(p["norm21"]["bias"], dlnb[1])},
        "norm22": {"scale": like(p["norm22"]["scale"], dlns[2]),
                   "bias": like(p["norm22"]["bias"], dlnb[2])},
    }
    Dm = dwro.shape[0]
    for i, nm in enumerate(("q_proj", "k_proj", "v_proj", "g_proj")):
        dp["time_ret"][nm] = {
            "kernel": like(tr[nm]["kernel"], dwqkvg[:, i * Dm:(i + 1) * Dm])}
        if "bias" in tr[nm]:
            dp["time_ret"][nm]["bias"] = like(
                tr[nm]["bias"], dbqkvg[0, i * Dm:(i + 1) * Dm])
    dp["time_ret"]["out_proj"] = {"kernel": like(tr["out_proj"]["kernel"], dwro)}
    if "bias" in tr["out_proj"]:
        dp["time_ret"]["out_proj"]["bias"] = like(tr["out_proj"]["bias"],
                                                  dbro[0])
    if "bias" in p["spk_attn"]["out_proj"]:
        dp["spk_attn"]["out_proj"]["bias"] = like(
            p["spk_attn"]["out_proj"]["bias"], dbmo[0])
    if "bias" in p["linear1"]:
        dp["linear1"]["bias"] = like(p["linear1"]["bias"], dbf1[0])
    if "bias" in p["linear2"]:
        dp["linear2"]["bias"] = like(p["linear2"]["bias"], dbf2[0])
    # MHA param dict carries static n_heads metadata; mirror it (non-leaf)
    from fseend_tpu.ops.nn import static_int

    dp["spk_attn"]["_n_heads"] = static_int(n_heads)
    dseed = np.zeros((1, 1), jax.dtypes.float0)
    return dp, dx5.reshape(dy.shape), dseed


fused_fusion_layer.defvjp(_vjp_fwd, _vjp_bwd)
