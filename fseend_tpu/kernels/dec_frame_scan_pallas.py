"""Pallas TPU kernel: fused FRAME-SCAN of the LS-EEND attractor decoder —
per-frame recurrent streaming semantics at blockwise-serving cost.

Why this exists: the per-frame streaming mode (`models/ls_eend.ls_stream_step`
scanned by `StreamingServer._block_impl`) is HBM-BANDWIDTH-BOUND ON DECODER
STATE, not dispatch- or FLOP-bound.  With the production config (n_units 256,
4 heads, n_slots = max_nspks = 10, 128 lanes) the two decoder retention
states total (B*C=1280, 4, 64, 64) x 2 layers = 84 MB bf16, and the XLA scan
reads AND writes all of it from HBM every frame: ~340 MB/frame = ~0.41 ms at
the v5e's ~820 GB/s — which is almost exactly the measured 0.472 ms/step
(BENCH_r03).  This kernel scans a whole K-frame block with the states
RESIDENT IN VMEM: grid=(T,) minor over frames, decoder kv state lives in the
(constant-index-map) output block across all grid steps, seeded from the
incoming state by an explicit HBM->VMEM DMA at t==0.  State traffic per
call drops from 2*84 MB/frame to 2*84 MB/BLOCK.

Layout (everything feature-major, lanes = batch):
  * activations are (D, N) with N = C*B lanes in SLOT-MAJOR order
    (lane = c*B + b).  B is a multiple of 128, so every per-slot slice
    x[:, c*B:(c+1)*B] is lane-tile aligned — the speaker-axis MHA contracts
    across slots with cheap 128-aligned lane slices + concats instead of
    relayouts.
  * retention state is (L, H, dv, dk, N): the (dk, N) minor planes are
    (64, 128k) native tiles; heads/layers unroll.
  * features/heads live on the SUBLANE axis, so head splits (256 -> 4x64)
    and all layer-norm reductions are free sublane ops.

Numerics mirror `ops.retention.retention_recurrent_step` (retention.py:126-144
quirks) exactly, via the gamma=1 unnormalized-state identity: the reference
carries kv_t = KV_t / sqrt(s_t) with KV_t = sum_i v_i k_i^T and s_t = #valid
steps, so this kernel carries KV (one FMA per frame instead of a decay
rescale + add) and converts at the call boundary:
    out_t   = (q . KV_{t-1} + (q . k) v) / sqrt(s_{t-1} + 1)
    KV_t    = KV_{t-1} + v k^T * valid_t      (carried state gated per lane,
    s_t     = s_{t-1} + valid_t                exactly `lane_keep(~valid)`)
The ephemeral-output/gated-carry split reproduces ls_stream_step's semantics
for INVALID lanes too (their logits come from the would-be-updated state
while their carried state stays put — models/ls_eend.py:430-433).

Scope: gamma=1 (cfg.use_decay=False, the reference's setting) and xpos off,
like kernels/retention_layer_pallas.py.  Forward/serving only (no vjp): the
per-frame mode never trains.

Reference parity anchors: fusion layer merge_retnet_layer.py:233-276
(time-retention -> LN -> slot-MHA -> LN -> relu-FF -> LN, post-norm),
recurrent retention retention.py:126-144, streaming loop
LS-EEND/streaming_infer_dia.py:52-97.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from fseend_tpu.kernels._common import (
    mm as _mm, ln as _ln, t_ as _t, b_ as _b, framescan_vmem_limit_bytes)


def _tile(x, reps: int):
    """Lane-tile (R, B) -> (R, reps*B): slot-major copies; B is 128-aligned
    so this is vreg concatenation, not a relayout."""
    if reps == 1:
        return x
    return jnp.concatenate([x] * reps, axis=-1)


def _kernel(embp_ref, embn_ref, valid_ref, pe_ref,
            wqkvg_ref, bqkvg_ref, wro_ref, bro_ref,
            wmi_ref, bmi_ref, wmo_ref, bmo_ref,
            wf1_ref, bf1_ref, wf2_ref, bf2_ref,
            lns_ref, lnb_ref, kv0_ref, s0_ref,
            logits_ref, kvf_ref, sf_ref,
            s_scr, sem,
            *, L: int, H: int, dk: int, dv: int, C: int, B: int, T: int):
    g = pl.program_id(0)
    t = pl.program_id(1)
    D = H * dk
    N = C * B  # B here is the PER-GROUP lane count Bg
    f32 = jnp.float32

    # ---- t==0 (per lane group): seed the VMEM-resident state from HBM,
    # un-normalize ----
    @pl.when(t == 0)
    def _():
        dma = pltpu.make_async_copy(
            kv0_ref.at[:, :, :, :, pl.ds(g * N, N)], kvf_ref, sem)
        dma.start()
        dma.wait()
        s_scr[...] = s0_ref[...].astype(f32)
        for l in range(L):
            root = jnp.sqrt(s_scr[l])                       # (1, N)
            for h in range(H):
                kvf_ref[l, h] = (kvf_ref[l, h].astype(f32)
                                 * root[None]).astype(kvf_ref.dtype)

    e = embp_ref[0, 0]                                       # (D, B)
    dt = e.dtype
    x = _tile(e, C) + pe_ref[...].astype(dt)                 # (D, N)
    mt = _tile(valid_ref[0, 0], C).astype(f32)               # (1, N)

    for l in range(L):
        s_old = s_scr[l]                                     # (1, N) f32
        out_scale = jax.lax.rsqrt(s_old + 1.0)
        # ---- time-axis retention, one recurrent step ----
        qkvg = _mm(wqkvg_ref[l], x, bqkvg_ref[l]).astype(dt)  # (4D, N)
        kscale = jnp.asarray(dk ** -0.5, dt)
        heads = []
        for h in range(H):
            qh = qkvg[h * dk:(h + 1) * dk]                   # (dk, N)
            kh = qkvg[D + h * dk:D + (h + 1) * dk] * kscale
            vh = qkvg[2 * D + h * dv:2 * D + (h + 1) * dv]   # (dv, N)
            kv = kvf_ref[l, h]                               # (dv, dk, N)
            r0 = jnp.sum(qh[None].astype(f32) * kv.astype(f32), axis=1)
            qk = jnp.sum(qh.astype(f32) * kh.astype(f32), axis=0, keepdims=True)
            out = (r0 + qk * vh.astype(f32)) * out_scale     # (dv, N) f32
            # per-head group norm (eps 1e-6, non-affine — retention._finish)
            mu = jnp.mean(out, axis=0, keepdims=True)
            var = jnp.mean(jnp.square(out - mu), axis=0, keepdims=True)
            heads.append(((out - mu) * jax.lax.rsqrt(var + 1e-6)).astype(dt))
            # gated carry: KV += v k^T * valid — native state-dtype FMA (the
            # XLA scan's state math is bf16 too; one pass, no f32 round trip)
            kvf_ref[l, h] = kv + vh[:, None, :] * (kh * mt.astype(dt))[None]
        s_scr[l] = s_old + mt
        o = jnp.concatenate(heads, axis=0)                   # (H*dv, N)
        g = qkvg[3 * D:3 * D + H * dv]
        gated = (jax.nn.silu(g.astype(f32)) * o.astype(f32)).astype(dt)
        a = _mm(wro_ref[l], gated, bro_ref[l])               # (D, N) f32
        x32 = _ln(x.astype(f32) + a, lns_ref[l, 0], lnb_ref[l, 0])
        x = x32.astype(dt)

        # ---- speaker-axis MHA across the C slots of each lane ----
        qkv = _mm(wmi_ref[l], x, bmi_ref[l]).astype(dt)      # (3D, N)
        hd = D // H
        inv = jnp.asarray(1.0 / math.sqrt(hd), f32)
        attn = []
        for h in range(H):
            qh = qkv[h * hd:(h + 1) * hd]
            kh = qkv[D + h * hd:D + (h + 1) * hd]
            vh = qkv[2 * D + h * hd:2 * D + (h + 1) * hd]
            rows = []
            for c in range(C):
                kc = _tile(kh[:, c * B:(c + 1) * B], C)      # (hd, N)
                rows.append(jnp.sum((qh * kc).astype(f32), axis=0,
                                    keepdims=True))          # (1, N)
            scores = jnp.concatenate(rows, axis=0) * inv     # (C, N) f32
            probs = jax.nn.softmax(scores, axis=0).astype(dt)
            acc = jnp.zeros((hd, N), f32)
            for c in range(C):
                vc = _tile(vh[:, c * B:(c + 1) * B], C)
                acc += (probs[c:c + 1] * vc).astype(f32)
            attn.append(acc.astype(dt))
        s_mha = _mm(wmo_ref[l], jnp.concatenate(attn, axis=0), bmo_ref[l])
        x32 = _ln(x.astype(f32) + s_mha, lns_ref[l, 1], lnb_ref[l, 1])
        x = x32.astype(dt)

        # ---- relu feed-forward ----
        hid = jnp.maximum(_mm(wf1_ref[l], x, bf1_ref[l]), 0.0).astype(dt)
        f = _mm(wf2_ref[l], hid, bf2_ref[l])
        x32 = _ln(x.astype(f32) + f, lns_ref[l, 2], lnb_ref[l, 2])
        x = x32.astype(dt)

    # ---- attractors -> logits against the (already l2-normed) embedding ----
    xf = x.astype(f32)
    attr = xf * jax.lax.rsqrt(jnp.sum(jnp.square(xf), axis=0, keepdims=True))
    ent = _tile(embn_ref[0, 0], C).astype(f32)               # (D, N)
    logits_ref[0] = jnp.sum(ent * attr, axis=0, keepdims=True)

    # ---- t==T-1: re-normalize the carried state for the caller ----
    @pl.when(t == T - 1)
    def _():
        for l in range(L):
            inv_root = jax.lax.rsqrt(jnp.maximum(s_scr[l], 1.0))  # (1, N)
            for h in range(H):
                kvf_ref[l, h] = (kvf_ref[l, h].astype(f32)
                                 * inv_root[None]).astype(kvf_ref.dtype)
        sf_ref[...] = s_scr[...].astype(sf_ref.dtype)


@functools.partial(jax.jit, static_argnames=("C", "groups", "interpret"))
def dec_frame_scan(embp, embn, valid, pe_t,
                   w_qkvg, b_qkvg, w_ro, b_ro, w_mi, b_mi, w_mo, b_mo,
                   w_f1, b_f1, w_f2, b_f2, ln_s, ln_b,
                   kv0, s0, *, C: int, groups: int = 1,
                   interpret: bool = False):
    """embp/embn: (T, D, B); valid: (T, 1, B); pe_t: (D, C*B/groups);
    stacked per-layer weights lead with L; kv0: (L, H, dv, dk, C*B)
    (group-major, then slot-major lanes; NORMALIZED like the model state);
    s0: (L, 1, C*B) -> (logits (T, 1, C*B) f32, kv_f like kv0, s_f like s0).

    `groups` splits the B lanes into independent scans so each holds only
    state/groups bytes in VMEM (grid = (groups, T), T minor)."""
    T, D, B = embp.shape
    L, H, dv, dk, Nt = kv0.shape
    G = groups
    assert B % G == 0 and Nt == C * B
    Bg = B // G
    N = C * Bg
    # real-TPU lowering requires every block's last two dims to be
    # (8, 128)-divisible OR equal to the array dims; a (1, D, Bg) block of a
    # (T, D, B) array violates that whenever Bg < 128, so the per-frame
    # inputs are reshaped group-major to (T, G, D|1, Bg) — their blocks then
    # EQUAL the trailing array dims for any group split.  (The state/logits
    # blocks slice the lane axis at N = C*Bg, which pick_groups keeps
    # 128-divisible.)
    embp = embp.reshape(T, D, G, Bg).transpose(0, 2, 1, 3)
    embn = embn.reshape(T, D, G, Bg).transpose(0, 2, 1, 3)
    valid = valid.reshape(T, 1, G, Bg).transpose(0, 2, 1, 3)
    wspec = lambda a: pl.BlockSpec(a.shape, lambda g, t, _n=a.ndim: (0,) * _n)
    return pl.pallas_call(
        functools.partial(_kernel, L=L, H=H, dk=dk, dv=dv, C=C, B=Bg, T=T),
        grid=(G, T),
        in_specs=[
            pl.BlockSpec((1, 1, D, Bg), lambda g, t: (t, g, 0, 0)),
            pl.BlockSpec((1, 1, D, Bg), lambda g, t: (t, g, 0, 0)),
            pl.BlockSpec((1, 1, 1, Bg), lambda g, t: (t, g, 0, 0)),
            wspec(pe_t),
            wspec(w_qkvg), wspec(b_qkvg), wspec(w_ro), wspec(b_ro),
            wspec(w_mi), wspec(b_mi), wspec(w_mo), wspec(b_mo),
            wspec(w_f1), wspec(b_f1), wspec(w_f2), wspec(b_f2),
            wspec(ln_s), wspec(ln_b),
            # incoming state stays in HBM; DMA'd into the resident out block
            # at t==0 so VMEM holds ONE copy of the 84 MB state, not two
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((L, 1, N), lambda g, t: (0, 0, g)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, N), lambda g, t: (t, 0, g)),
            pl.BlockSpec((L, H, dv, dk, N), lambda g, t: (0, 0, 0, 0, g)),
            pl.BlockSpec((L, 1, N), lambda g, t: (0, 0, g)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 1, C * B), jnp.float32),
            jax.ShapeDtypeStruct(kv0.shape, kv0.dtype),
            jax.ShapeDtypeStruct(s0.shape, s0.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((L, 1, N), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        # the resident state block is the point of the kernel: at G=1 the
        # production shape holds ~84 MB of decoder kv in VMEM, well past
        # Mosaic's default scoped-vmem limit — the limit tracks the grouping
        # budget (+headroom; default 96+24 = the v5e's ~120 MB usable), and
        # pick_groups splits lanes when even that is too small
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=framescan_vmem_limit_bytes()),
        interpret=interpret,
    )(embp, embn, valid, pe_t, w_qkvg, b_qkvg, w_ro, b_ro, w_mi, b_mi,
      w_mo, b_mo, w_f1, b_f1, w_f2, b_f2, ln_s, ln_b, kv0, s0)


# ---------------------------------------------------------------------------
# parameter/state packing (model pytree <-> kernel operand layout)
# ---------------------------------------------------------------------------


def pack_dec_weights(dec_params: dict, cfg, dt):
    """Stack the decoder fusion layers' weights into the kernel's transposed,
    L-leading operands. dec_params = params['dec'] of models/ls_eend.py."""
    D = cfg.n_units
    H = cfg.n_heads
    dv = D // H
    layers = dec_params["layers"]
    wq, bq = [], []
    wro, bro = [], []
    wmi, bmi, wmo, bmo = [], [], [], []
    wf1, bf1, wf2, bf2 = [], [], [], []
    lns, lnb = [], []
    for lp in layers:
        tr = lp["time_ret"]
        wq.append(jnp.concatenate(
            [_t(tr, "q_proj", dt), _t(tr, "k_proj", dt),
             _t(tr, "v_proj", dt), _t(tr, "g_proj", dt)], axis=0))
        bq.append(jnp.concatenate(
            [_b(tr, "q_proj", D, dt), _b(tr, "k_proj", D, dt),
             _b(tr, "v_proj", H * dv, dt), _b(tr, "g_proj", H * dv, dt)],
            axis=0))
        wro.append(_t(tr, "out_proj", dt))
        bro.append(_b(tr, "out_proj", D, dt))
        at = lp["spk_attn"]
        wmi.append(at["in_proj"]["kernel"].astype(dt).T)     # (3D, D)
        bmi.append(at["in_proj"]["bias"].astype(dt).reshape(-1, 1))
        wmo.append(_t(at, "out_proj", dt))
        bmo.append(_b(at, "out_proj", D, dt))
        wf1.append(_t(lp, "linear1", dt))
        bf1.append(_b(lp, "linear1", cfg.dec_dim_feedforward, dt))
        wf2.append(_t(lp, "linear2", dt))
        bf2.append(_b(lp, "linear2", D, dt))
        lns.append(jnp.stack([lp[n]["scale"].astype(dt).reshape(-1, 1)
                              for n in ("norm11", "norm21", "norm22")]))
        lnb.append(jnp.stack([lp[n]["bias"].astype(dt).reshape(-1, 1)
                              for n in ("norm11", "norm21", "norm22")]))
    st = lambda xs: jnp.stack(xs)
    return (st(wq), st(bq), st(wro), st(bro), st(wmi), st(bmi), st(wmo),
            st(bmo), st(wf1), st(bf1), st(wf2), st(bf2), st(lns), st(lnb))


def pick_groups(B: int, C: int, H: int, dv: int, dk: int, L: int,
                itemsize: int) -> int:
    """Smallest lane-group count whose per-group state slice fits the VMEM
    budget (`FSEEND_FRAMESCAN_VMEM_MB`, default sized for the v5e's 128 MB
    minus weights/activations). Bg MUST stay 128-aligned: real-TPU lowering
    rejects the non-aligned slot-MHA lane slices a finer split creates."""
    from fseend_tpu.kernels._common import framescan_vmem_budget_bytes

    import os

    force = os.environ.get("FSEEND_FRAMESCAN_FORCE_GROUPS")
    if force:
        # test/debug escape hatch: interpret mode accepts lane splits that
        # real-TPU lowering rejects, so parity tests can exercise the
        # grouped code path at tiny shapes
        g = int(force)
        assert B % g == 0, f"FORCE_GROUPS={g} must divide B={B}"
        return g
    budget = framescan_vmem_budget_bytes()
    total = L * H * dv * dk * C * B * itemsize
    # Legal splits, per the 2026-08-18 chip probe (tools/chip_framekernel_
    # probe.py): a g > 1 split must keep BOTH the state/logits lane blocks
    # (C*B/g wide) 128-divisible AND the per-group lane width Bg = B/g
    # 128-aligned — the slot-MHA slices kh[:, c*Bg:(c+1)*Bg] at Bg=64
    # (B=128, g=2) are not merely slow relayouts, they FAIL real-TPU
    # lowering outright (remote compile rc=1; interpret mode accepts them).
    # At the production shape (B=128, C=10) that leaves only g=1: grouping
    # helps only at B >= 256.  When nothing fits the soft budget, take the
    # largest legal split and accept the overrun — the compiler's vmem
    # limit, not this knob, is the real arbiter (returning B here would
    # make lane blocks C wide, which lowering also rejects).
    # KNOWN LIMIT (2026-08-18 chip probe): even the fully-aligned g=2 at
    # B=256 (Bg=128, lane blocks 1280) fails the remote TPU compile, so on
    # a v5e the kernel's practical lane capacity is <=128 (~84 MB resident
    # decoder state); scale lanes further via the multi-chip shard_map
    # route (serving/runtime.py lane sharding), not via groups.
    legal = [g for g in range(1, B + 1)
             if B % g == 0 and (g == 1 or ((B // g) % 128 == 0
                                           and (C * B // g) % 128 == 0))]
    fitting = [g for g in legal if total // g <= budget]
    return fitting[0] if fitting else max(legal)


def pack_dec_state(dec_states: list, B: int, C: int, groups: int = 1):
    """[{'kv': (B*C, H, dv, dk), 'scale': (B*C, H)}] (b-major lanes) ->
    (kv (L, H, dv, dk, C*B) group-major then slot-major, s (L, 1, C*B) f32)."""
    kv = jnp.stack([st["kv"] for st in dec_states])          # (L, BC, H, dv, dk)
    L, _, H, dv, dk = kv.shape
    G, Bg = groups, B // groups
    kv = kv.reshape(L, G, Bg, C, H, dv, dk).transpose(0, 4, 5, 6, 1, 3, 2)
    kv = kv.reshape(L, H, dv, dk, C * B)
    s = jnp.stack([st["scale"][:, 0] for st in dec_states])  # gamma=1: heads eq
    s = s.reshape(L, G, Bg, C).transpose(0, 1, 3, 2).reshape(L, 1, C * B)
    return kv, s.astype(jnp.float32)


def unpack_dec_state(kv_f, s_f, B: int, C: int, H: int, like: list,
                     groups: int = 1):
    """Inverse of pack_dec_state, cast back to the server state's dtypes."""
    L = kv_f.shape[0]
    dv, dk = kv_f.shape[2], kv_f.shape[3]
    G, Bg = groups, B // groups
    kv = kv_f.reshape(L, H, dv, dk, G, C, Bg).transpose(0, 4, 6, 5, 1, 2, 3)
    kv = kv.reshape(L, B * C, H, dv, dk)
    s = s_f.reshape(L, G, C, Bg).transpose(0, 1, 3, 2).reshape(L, B * C)
    return [{"kv": kv[l].astype(like[l]["kv"].dtype),
             "scale": jnp.broadcast_to(s[l][:, None], (B * C, H))
             .astype(like[l]["scale"].dtype)}
            for l in range(L)]
