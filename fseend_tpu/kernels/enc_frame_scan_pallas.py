"""Pallas TPU kernel: fused FRAME-SCAN of the LS-EEND conformer encoder —
the companion of kernels/dec_frame_scan_pallas.py for the per-frame
streaming mode.

One call scans T frames through ALL `enc_n_layers` conformer blocks
(½FF → retention → causal-dwconv module → ½FF → LN, encoder.py:76-110 /
models/ls_eend._block_step) with every per-layer state VMEM-resident:
retention kv as the unnormalized gamma=1 form (same identity as the decoder
kernel), and the (k)-slot post-GLU conv windows as shift rings.  The XLA
per-frame scan re-reads ~13 MB of weights + ~21 MB of states from HBM every
frame; here both are fetched once per T-frame block.

Layout identical to the decoder kernel: activations are feature-major
(D, B) so head splits and layer norms are sublane ops; lanes = the B
streams.  Per-lane `flush` gating (streaming drain, ls_stream_step's
lane_keep) is a multiplicative mask on the retention update and a lane
select on the conv ring; outputs for flushing lanes are computed from the
ephemeral updated state exactly like the reference scan (the caller zeroes
the flushed frames before the look-ahead cnn).

Forward/serving only; gamma=1, xpos off (the reference's settings).
Reference parity anchors: conformer block encoder.py:115-123 (one-step),
conv module convolution.py:154-167, recurrent retention retention.py:126-144.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from fseend_tpu.kernels._common import (mm as _mm, ln as _ln,
                                        silu32 as _silu32, t_ as _t, b_ as _b,
                                        framescan_vmem_limit_bytes)


def _kernel(h0_ref, flush_ref,
            lns_ref, lnb_ref,
            wf1a_ref, bf1a_ref, wf1b_ref, bf1b_ref,
            wqkvg_ref, bqkvg_ref, wro_ref, bro_ref,
            wpw1_ref, bpw1_ref, dw_ref, bna_ref, bnb_ref, wpw2_ref, bpw2_ref,
            wf2a_ref, bf2a_ref, wf2b_ref, bf2b_ref,
            kv0_ref, s0_ref, ring0_ref,
            hout_ref, kvf_ref, sf_ref, ringf_ref,
            s_scr,
            *, L: int, H: int, dk: int, dv: int, T: int, ffac: float):
    t = pl.program_id(0)
    D = H * dk
    f32 = jnp.float32

    @pl.when(t == 0)
    def _():
        s_scr[...] = s0_ref[...].astype(f32)
        ringf_ref[...] = ring0_ref[...]
        for l in range(L):
            root = jnp.sqrt(s_scr[l])                        # (1, B)
            for h in range(H):
                kvf_ref[l, h] = (kv0_ref[l, h].astype(f32)
                                 * root[None]).astype(kvf_ref.dtype)

    x = h0_ref[0]                                            # (D, B)
    dt = x.dtype
    fl = flush_ref[0]                                        # (1, B) 0/1
    mg = (1.0 - fl.astype(f32))                              # gate: not flush
    keep = fl.astype(jnp.bool_)[None]                        # (1, 1, B)

    def half_ff(x, wa, ba, wb, bb, lns, lnb):
        h = _ln(x.astype(f32), lns, lnb).astype(dt)
        h = _silu32(_mm(wa, h, ba)).astype(dt)               # (F, B)
        h = _mm(wb, h, bb)                                   # (D, B) f32
        return (x.astype(f32) + ffac * h).astype(dt)

    for l in range(L):
        # ---- ½ feed-forward #1 ----
        x = half_ff(x, wf1a_ref[l], bf1a_ref[l], wf1b_ref[l], bf1b_ref[l],
                    lns_ref[l, 0], lnb_ref[l, 0])

        # ---- retention (pre-LN), one recurrent step ----
        hpre = _ln(x.astype(f32), lns_ref[l, 1], lnb_ref[l, 1]).astype(dt)
        qkvg = _mm(wqkvg_ref[l], hpre, bqkvg_ref[l]).astype(dt)
        s_old = s_scr[l]
        out_scale = jax.lax.rsqrt(s_old + 1.0)
        kscale = jnp.asarray(dk ** -0.5, dt)
        heads = []
        for h in range(H):
            qh = qkvg[h * dk:(h + 1) * dk]
            kh = qkvg[D + h * dk:D + (h + 1) * dk] * kscale
            vh = qkvg[2 * D + h * dv:2 * D + (h + 1) * dv]
            kv = kvf_ref[l, h]                               # (dv, dk, B)
            r0 = jnp.sum(qh[None].astype(f32) * kv.astype(f32), axis=1)
            qk = jnp.sum(qh.astype(f32) * kh.astype(f32), axis=0,
                         keepdims=True)
            out = (r0 + qk * vh.astype(f32)) * out_scale     # (dv, B) f32
            mu = jnp.mean(out, axis=0, keepdims=True)
            var = jnp.mean(jnp.square(out - mu), axis=0, keepdims=True)
            heads.append(((out - mu) * jax.lax.rsqrt(var + 1e-6)).astype(dt))
            kvf_ref[l, h] = kv + vh[:, None, :] * (kh * mg.astype(dt))[None]
        s_scr[l] = s_old + mg
        o = jnp.concatenate(heads, axis=0)
        g = qkvg[3 * D:3 * D + H * dv]
        gated = (_silu32(g) * o.astype(f32)).astype(dt)
        a = _mm(wro_ref[l], gated, bro_ref[l])
        x = (x.astype(f32) + a).astype(dt)

        # ---- causal depthwise conv module ----
        hc = _ln(x.astype(f32), lns_ref[l, 2], lnb_ref[l, 2]).astype(dt)
        pw = _mm(wpw1_ref[l], hc, bpw1_ref[l])               # (2D, B) f32
        glu = (pw[:D] * jax.nn.sigmoid(pw[D:])).astype(dt)   # (D, B)
        ring = ringf_ref[l]                                  # (k, D, B)
        shifted = jnp.concatenate([ring[1:], glu[None]], axis=0)
        ring_sel = jnp.where(keep, ring, shifted)
        ringf_ref[l] = ring_sel
        y = jnp.sum(ring_sel.astype(f32) * dw_ref[l].astype(f32), axis=0)
        y = y * bna_ref[l].astype(f32) + bnb_ref[l].astype(f32)
        y = _mm(wpw2_ref[l], _silu32(y).astype(dt), bpw2_ref[l])
        x = (x.astype(f32) + y).astype(dt)

        # ---- ½ feed-forward #2, final LN ----
        x = half_ff(x, wf2a_ref[l], bf2a_ref[l], wf2b_ref[l], bf2b_ref[l],
                    lns_ref[l, 3], lnb_ref[l, 3])
        x = _ln(x.astype(f32), lns_ref[l, 4], lnb_ref[l, 4]).astype(dt)

    hout_ref[0] = x

    @pl.when(t == T - 1)
    def _():
        for l in range(L):
            inv_root = jax.lax.rsqrt(jnp.maximum(s_scr[l], 1.0))
            for h in range(H):
                kvf_ref[l, h] = (kvf_ref[l, h].astype(f32)
                                 * inv_root[None]).astype(kvf_ref.dtype)
        sf_ref[...] = s_scr[...].astype(sf_ref.dtype)


@functools.partial(jax.jit, static_argnames=("ffac", "interpret"))
def enc_frame_scan(h0, flush,
                   lns, lnb, wf1a, bf1a, wf1b, bf1b,
                   w_qkvg, b_qkvg, w_ro, b_ro,
                   wpw1, bpw1, dw, bn_a, bn_b, wpw2, bpw2,
                   wf2a, bf2a, wf2b, bf2b,
                   kv0, s0, ring0, *, ffac: float, interpret: bool = False):
    """h0: (T, D, B) post input-proj+LN; flush: (T, 1, B) 0/1 mask;
    stacked per-layer weights lead with L; kv0: (L, H, dv, dk, B) normalized;
    s0: (L, 1, B) f32; ring0: (L, k, D, B) post-GLU windows
    -> (h (T, D, B), kv_f, s_f, ring_f)."""
    T, D, B = h0.shape
    L, H, dv, dk, _ = kv0.shape
    wspec = lambda a: pl.BlockSpec(a.shape, lambda t, _n=a.ndim: (0,) * _n)
    return pl.pallas_call(
        functools.partial(_kernel, L=L, H=H, dk=dk, dv=dv, T=T, ffac=ffac),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, D, B), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, B), lambda t: (t, 0, 0)),
            wspec(lns), wspec(lnb),
            wspec(wf1a), wspec(bf1a), wspec(wf1b), wspec(bf1b),
            wspec(w_qkvg), wspec(b_qkvg), wspec(w_ro), wspec(b_ro),
            wspec(wpw1), wspec(bpw1), wspec(dw), wspec(bn_a), wspec(bn_b),
            wspec(wpw2), wspec(bpw2),
            wspec(wf2a), wspec(bf2a), wspec(wf2b), wspec(bf2b),
            wspec(kv0), wspec(s0), wspec(ring0),
        ],
        out_specs=[
            pl.BlockSpec((1, D, B), lambda t: (t, 0, 0)),
            pl.BlockSpec(kv0.shape, lambda t: (0,) * kv0.ndim),
            pl.BlockSpec(s0.shape, lambda t: (0,) * s0.ndim),
            pl.BlockSpec(ring0.shape, lambda t: (0,) * ring0.ndim),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, D, B), h0.dtype),
            jax.ShapeDtypeStruct(kv0.shape, kv0.dtype),
            jax.ShapeDtypeStruct(s0.shape, s0.dtype),
            jax.ShapeDtypeStruct(ring0.shape, ring0.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((L, 1, B), jnp.float32)],
        # resident enc state (~17 MB kv + conv rings) + stacked weights can
        # pass Mosaic's default scoped-vmem limit; match dec_frame_scan
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=framescan_vmem_limit_bytes()),
        interpret=interpret,
    )(h0, flush, lns, lnb, wf1a, bf1a, wf1b, bf1b, w_qkvg, b_qkvg, w_ro, b_ro,
      wpw1, bpw1, dw, bn_a, bn_b, wpw2, bpw2, wf2a, bf2a, wf2b, bf2b,
      kv0, s0, ring0)


# ---------------------------------------------------------------------------
# packing helpers
# ---------------------------------------------------------------------------


def pack_enc_weights(blocks: list, conv_bn: list, cfg, dt, eps: float = 1e-5):
    """Stack conformer-block weights into the kernel's transposed, L-leading
    operands; folds eval-mode BatchNorm into a per-channel (a, b)."""
    D = cfg.n_units
    F = D * cfg.ff_expansion
    H = cfg.n_heads
    dv = D // H
    cols = {k: [] for k in ("lns", "lnb", "wf1a", "bf1a", "wf1b", "bf1b",
                            "wqkvg", "bqkvg", "wro", "bro",
                            "wpw1", "bpw1", "dw", "bna", "bnb",
                            "wpw2", "bpw2", "wf2a", "bf2a", "wf2b", "bf2b")}
    for bp, bs in zip(blocks, conv_bn):
        lnames = [("ff1", "norm"), (None, "ret_norm"), ("conv", "norm"),
                  ("ff2", "norm"), (None, "final_norm")]
        lps = [(bp[g][n] if g else bp[n]) for g, n in lnames]
        cols["lns"].append(jnp.stack([p["scale"].astype(dt).reshape(-1, 1)
                                      for p in lps]))
        cols["lnb"].append(jnp.stack([p["bias"].astype(dt).reshape(-1, 1)
                                      for p in lps]))
        for ff, wa, ba, wb, bb in (("ff1", "wf1a", "bf1a", "wf1b", "bf1b"),
                                   ("ff2", "wf2a", "bf2a", "wf2b", "bf2b")):
            cols[wa].append(_t(bp[ff], "linear1", dt))
            cols[ba].append(_b(bp[ff], "linear1", F, dt))
            cols[wb].append(_t(bp[ff], "linear2", dt))
            cols[bb].append(_b(bp[ff], "linear2", D, dt))
        tr = bp["ret"]
        cols["wqkvg"].append(jnp.concatenate(
            [_t(tr, "q_proj", dt), _t(tr, "k_proj", dt),
             _t(tr, "v_proj", dt), _t(tr, "g_proj", dt)], axis=0))
        cols["bqkvg"].append(jnp.concatenate(
            [_b(tr, "q_proj", D, dt), _b(tr, "k_proj", D, dt),
             _b(tr, "v_proj", H * dv, dt), _b(tr, "g_proj", H * dv, dt)],
            axis=0))
        cols["wro"].append(_t(tr, "out_proj", dt))
        cols["bro"].append(_b(tr, "out_proj", D, dt))
        cv = bp["conv"]
        cols["wpw1"].append(_t(cv, "pw1", dt))
        cols["bpw1"].append(_b(cv, "pw1", 2 * D, dt))
        cols["dw"].append(cv["dw"]["kernel"].astype(dt)
                          .reshape(cfg.conv_kernel_size, D, 1))
        a = (cv["bn"]["scale"] * jax.lax.rsqrt(bs["var"] + eps))
        cols["bna"].append(a.astype(dt).reshape(-1, 1))
        cols["bnb"].append((cv["bn"]["bias"] - bs["mean"] * a)
                           .astype(dt).reshape(-1, 1))
        cols["wpw2"].append(_t(cv, "pw2", dt))
        cols["bpw2"].append(_b(cv, "pw2", D, dt))
    return tuple(jnp.stack(cols[k]) for k in
                 ("lns", "lnb", "wf1a", "bf1a", "wf1b", "bf1b",
                  "wqkvg", "bqkvg", "wro", "bro",
                  "wpw1", "bpw1", "dw", "bna", "bnb", "wpw2", "bpw2",
                  "wf2a", "bf2a", "wf2b", "bf2b"))


def pack_enc_state(enc_states: list):
    """[{'ret': {'kv': (B,H,dv,dk), 'scale': (B,H)}, 'conv': (B,k-1,D)}]
    -> (kv (L,H,dv,dk,B), s (L,1,B) f32, ring (L,k,D,B))."""
    kv = jnp.stack([st["ret"]["kv"] for st in enc_states])   # (L,B,H,dv,dk)
    kv = kv.transpose(0, 2, 3, 4, 1)
    s = jnp.stack([st["ret"]["scale"][:, 0] for st in enc_states])  # (L, B)
    cache = jnp.stack([st["conv"] for st in enc_states])     # (L,B,k-1,D)
    ring = cache.transpose(0, 2, 3, 1)                       # (L,k-1,D,B)
    pad = jnp.zeros(ring[:, :1].shape, ring.dtype)
    return kv, s[:, None].astype(jnp.float32), jnp.concatenate(
        [pad, ring], axis=1)


def unpack_enc_state(kv_f, s_f, ring_f, like: list):
    """Inverse of pack_enc_state (drops the ring's oldest slot)."""
    out = []
    for l, st in enumerate(like):
        H = st["ret"]["kv"].shape[1]
        kv = kv_f[l].transpose(3, 0, 1, 2).astype(st["ret"]["kv"].dtype)
        s = jnp.broadcast_to(s_f[l, 0][:, None], st["ret"]["scale"].shape)
        cache = ring_f[l, 1:].transpose(2, 0, 1).astype(st["conv"].dtype)
        out.append({"ret": {"kv": kv,
                            "scale": s.astype(st["ret"]["scale"].dtype)},
                    "conv": cache})
    return out
