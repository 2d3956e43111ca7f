"""Oracle-SAD rescoring CLI (reference LS-EEND/sad_post_process.py:36-75):
reads hypothesis .h5 files, applies the oracle speech mask from the data
dir's labels, writes rescored .h5 files.

  python -m cli.sad_postprocess --configs configs/ls_infer_callhome.yaml \
      --hyp_dir preds_h5 --out_dir preds_h5_sad
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", required=True)
    parser.add_argument("--hyp_dir", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--threshold", type=float, default=0.5)
    args = parser.parse_args()

    from fseend_tpu.data.dataset import DiarizationDataset, FeatureConfig
    from fseend_tpu.utils.config import load_config
    from fseend_tpu.utils.postprocess import (load_h5_probs, oracle_sad_rescore,
                                              save_h5_probs)

    configs = load_config(args.configs)
    data = configs["data"]
    feat = FeatureConfig(
        frame_size=data["feat"]["win_length"], frame_shift=data["feat"]["hop_length"],
        context_size=data["context_recp"], subsampling=data["subsampling"],
        rate=data["feat"]["sample_rate"], input_transform=data["feat_type"])
    ds = DiarizationDataset(
        data["val_data_dir"], feat, chunk_size=data["chunk_size"],
        use_last_samples=data.get("use_last_samples", True),
        n_speakers=data.get("num_speakers"))
    os.makedirs(args.out_dir, exist_ok=True)
    # oracle labels per recording (chunk order == dataset order)
    rec_labels: dict[str, list] = {}
    for i in range(len(ds)):
        ref, rec = ds.full_labels(i)
        rec_labels.setdefault(rec, []).append(np.asarray(ref)[:: data["subsampling"]])
    for rec, parts in rec_labels.items():
        path = os.path.join(args.hyp_dir, rec + ".h5")
        if not os.path.exists(path):
            continue
        hyp = load_h5_probs(path)
        speech = np.concatenate(parts, axis=0).max(axis=1)[: len(hyp)]
        if len(speech) < len(hyp):
            speech = np.pad(speech, (0, len(hyp) - len(speech)))
        out = oracle_sad_rescore(hyp, speech, threshold=args.threshold)
        save_h5_probs(os.path.join(args.out_dir, rec + ".h5"), out)
        print(rec)


if __name__ == "__main__":
    main()
