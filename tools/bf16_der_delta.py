"""Translate the frame-kernel's bf16 carry drift into the unit that matters: DER.

PARITY.md reports the fused frame-scan kernel's bf16 unnormalized-KV carry
drifting by max |dlogit| 0.014 over a 200-frame block vs the f32 oracle — a
logit-space figure.  This tool scores a TRAINED checkpoint's validation set
through both paths and reports the collar-DER delta:

  oracle : f32 params, per-frame XLA scan (`ls_stream_scan`) — the
           reference's streaming semantics (LS-EEND/streaming_infer_dia.py)
           at full precision;
  shipped: bf16 params, fused frame-scan kernels (`ls_stream_scan_fused`)
           at the serving default's 128-lane batch (val recordings padded
           with zero lanes to the kernel's 128-aligned lane requirement).

Usage (a curriculum stage's averaged checkpoint + its val dir):
  python tools/bf16_der_delta.py --configs /root/curr256/curr_ls_ns8.yaml \
      --ckpt /root/curr256/curr_ls_ns8/version_0/avg_model.npz

Prints one JSON line: {"der_f32_scan": ..., "der_bf16_kernel": ...,
"der_delta_abs": ..., "max_abs_dprob": ...} plus the per-recording rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--lanes", type=int, default=128,
                    help="kernel lane batch (serving default 128; the val "
                         "recordings occupy the first R lanes)")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--median", type=int, default=11)
    ap.add_argument("--collar", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cli.infer import load_model
    from fseend_tpu.data.dataset import DiarizationDataset, FeatureConfig
    from fseend_tpu.models import ls_eend
    from fseend_tpu.ops.features import extract_fbank
    from fseend_tpu.utils.config import load_config
    from fseend_tpu.utils.metrics import DERComponents, score_frames

    configs = load_config(args.configs)
    data = configs["data"]
    cfg, task, params, mstate = load_model(configs, args.ckpt)
    if task.model != "ls":
        ap.error("frame-scan kernels are LS-only")
    n_slots = data["max_speakers"] + 2

    # --- features + frame labels per val recording -------------------------
    feat = FeatureConfig(
        frame_size=data["feat"]["win_length"],
        frame_shift=data["feat"]["hop_length"],
        context_size=data["context_recp"], subsampling=data["subsampling"],
        rate=data["feat"]["sample_rate"], input_transform=data["feat_type"])
    ds = DiarizationDataset(
        data["val_data_dir"], feat, chunk_size=data["chunk_size"],
        use_last_samples=data.get("use_last_samples", True),
        n_speakers=data.get("num_speakers"))
    rec_labels: dict[str, list] = {}
    for i in range(len(ds)):
        ref, rec = ds.full_labels(i)
        rec_labels.setdefault(rec, []).append(np.asarray(ref))
    recs = sorted(rec_labels)
    refs = {r: np.concatenate(rec_labels[r], axis=0) for r in recs}

    wavs = {}
    with open(os.path.join(data["val_data_dir"], "wav.scp")) as f:
        for line in f:
            rec, path = line.strip().split(None, 1)
            wavs[rec] = path
    feats = [np.asarray(extract_fbank(
        wavs[r], context_size=data["context_recp"],
        frame_size=data["feat"]["win_length"],
        frame_shift=data["feat"]["hop_length"],
        input_transform=data["feat_type"],
        subsampling=data["subsampling"]), np.float32) for r in recs]
    R = len(recs)
    T = max(f.shape[0] for f in feats)
    lens = [f.shape[0] for f in feats]
    xs = np.zeros((R, T, feats[0].shape[1]), np.float32)
    for i, f in enumerate(feats):
        xs[i, :f.shape[0]] = f

    # --- oracle: f32 per-frame XLA scan ------------------------------------
    st = ls_eend.ls_stream_init(cfg, R, n_slots)
    logits_f32, _ = jax.jit(
        lambda p, s, m, x: ls_eend.ls_stream_scan(p, s, cfg, m, x, n_slots)
    )(params, st, mstate, jnp.asarray(xs))
    probs_f32 = np.asarray(jax.nn.sigmoid(logits_f32[..., 1:]), np.float32)

    # --- shipped: bf16 frame-scan kernel at the 128-lane serving batch -----
    bf = jnp.bfloat16
    cast = lambda t: jax.tree.map(
        lambda a: a.astype(bf)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, t)
    pb, mb = cast(params), cast(mstate)
    L = max(args.lanes, R)
    xsb = np.zeros((L, T, xs.shape[2]), np.float32)
    xsb[:R] = xs
    stb = ls_eend.ls_stream_init(cfg, L, n_slots, dtype=bf)
    logits_bf = jax.jit(
        lambda p, s, m, x: ls_eend.ls_stream_scan_fused(p, s, cfg, m, x,
                                                        n_slots)
    )(pb, stb, mb, jnp.asarray(xsb, bf))
    probs_bf = np.asarray(jax.nn.sigmoid(logits_bf[:R, :, 1:].astype(
        jnp.float32)), np.float32)

    # --- score both through the publication protocol -----------------------
    out = {}
    dmax = 0.0
    for tag, probs in (("f32_scan", probs_f32), ("bf16_kernel", probs_bf)):
        total = DERComponents()
        for i, r in enumerate(recs):
            c = score_frames(refs[r], probs[i, :lens[i]],
                             threshold=args.threshold, median=args.median,
                             collar_frames=args.collar,
                             subsampling=data["subsampling"])
            total += c
            print(f"{tag} {r}: DER {c.der:.4f}", file=sys.stderr)
        out[f"der_{tag}"] = round(total.der, 6)
    for i in range(R):
        dmax = max(dmax, float(np.abs(
            probs_f32[i, :lens[i]] - probs_bf[i, :lens[i]]).max()))
    out["der_delta_abs"] = round(out["der_bf16_kernel"] - out["der_f32_scan"],
                                 6)
    out["max_abs_dprob"] = round(dmax, 6)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
