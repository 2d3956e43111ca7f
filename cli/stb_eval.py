"""FLEX-STB block-wise streaming evaluation of an offline EEND-EDA model
(reference train_STB.py / train/tfm_STB.py:147-237).

Runs each validation recording through the KL-buffer block streamer, dumps
per-recording h5 probabilities (score with cli.score --hyp_dir), and prints
the real-time factor like the reference (tfm_STB.py:213-216).

  python -m cli.stb_eval --configs configs/stb.yaml \
      --ckpt eda.npz --out_dir preds_h5_stb
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--out_dir", required=True)
    args = parser.parse_args()

    import jax

    from fseend_tpu.data.dataset import DiarizationDataset, FeatureConfig
    from fseend_tpu.models import eend_eda
    from fseend_tpu.serving.flex_stb import FlexSTB
    from fseend_tpu.utils import checkpoint as ckpt_lib
    from fseend_tpu.utils.config import load_config
    from fseend_tpu.utils.postprocess import save_h5_probs

    configs = load_config(args.configs)
    data = configs["data"]
    p = configs["model"].get("params") or {}
    in_size = (2 * data["context_recp"] + 1) * data["feat"]["n_mels"]
    cfg = eend_eda.EDAConfig(
        in_size=in_size, n_units=p.get("n_units", 256),
        n_heads=p.get("n_heads", 4), n_layers=p.get("enc_n_layers", 4),
        dropout=p.get("dropout", 0.1))
    params, _ = eend_eda.init_eend_eda(jax.random.PRNGKey(0), cfg)
    if args.ckpt:
        params = ckpt_lib.load_pytree(args.ckpt, {"params": params})["params"]

    feat = FeatureConfig(
        frame_size=data["feat"]["win_length"], frame_shift=data["feat"]["hop_length"],
        context_size=data["context_recp"], subsampling=data["subsampling"],
        rate=data["feat"]["sample_rate"], input_transform=data["feat_type"])
    ds = DiarizationDataset(
        data["val_data_dir"], feat, chunk_size=data["chunk_size"],
        use_last_samples=data.get("use_last_samples", True),
        n_speakers=data.get("num_speakers"))
    stb = FlexSTB(params=params, cfg=cfg, n_speakers=data["max_speakers"],
                  buf_size=data.get("buffer_size", 1000),
                  block_size=data.get("block_size", 100),
                  buffer_weights=data.get("buffer_weights", "v1"))
    os.makedirs(args.out_dir, exist_ok=True)
    # per-recording streaming (chunk order == dataset order)
    per_rec: dict[str, list] = {}
    for i in range(len(ds)):
        Y, _T, rec = ds[i]
        per_rec.setdefault(rec, []).append(Y)
    for rec, parts in per_rec.items():
        feats = np.concatenate(parts, axis=0)
        t0 = time.perf_counter()
        probs = stb.run(feats)
        dt = time.perf_counter() - t0
        rtf = dt / (len(feats) / 10.0)  # 10 Hz post-subsampling frame rate
        save_h5_probs(os.path.join(args.out_dir, rec + ".h5"), probs)
        print(f"{rec}: {len(feats)} frames in {dt:.2f}s (RTF {rtf:.3f})")


if __name__ == "__main__":
    main()
