"""wav -> RTTM offline inference (reference dia_pred.py:22-63).

Usage:
  python -m cli.infer --configs configs/fs_infer.yaml \
      --wav /path/x.wav --ckpt avg_model.npz --out out.rttm
Accepts framework .npz checkpoints or reference torch .ckpt files.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_model(configs, ckpt_path):
    import jax

    from cli.train import build_model
    from fseend_tpu.utils import checkpoint as ckpt_lib
    from fseend_tpu.utils import torch_convert as tc

    model_cfg, init_fn, task = build_model(configs)
    params, mstate = init_fn(jax.random.PRNGKey(0))
    if ckpt_path:
        if ckpt_path.endswith((".ckpt", ".pt", ".pth")):
            sd = tc.load_torch_ckpt(ckpt_path)
            if task.model == "ls":
                params, mstate = tc.ls_from_state_dict(sd, model_cfg)
            else:
                params, mstate = tc.fs_from_state_dict(sd, model_cfg)
        else:
            flat = ckpt_lib.load_flat(ckpt_path)
            if any(k.startswith("params/") for k in flat):
                tpl = {"params": params, "model_state": mstate}
                try:
                    loaded = ckpt_lib.load_pytree(ckpt_path, tpl)
                    params, mstate = loaded["params"], loaded["model_state"]
                except KeyError:
                    params = ckpt_lib.load_pytree(ckpt_path, {"params": params})["params"]
            else:
                params = ckpt_lib.load_pytree(ckpt_path, params)
    return model_cfg, task, params, mstate


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", required=True)
    parser.add_argument("--wav", default=None)
    parser.add_argument("--wav_dir", default=None,
                        help="run every wav/flac in a directory")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--out", default=None)
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--median", type=int, default=11)
    parser.add_argument("--device_frontend", action="store_true",
                        help="featurize on the accelerator (ops/features_tpu)"
                             " instead of the host DSP — removes the host "
                             "CPU from the pipeline for --wav inference")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from fseend_tpu.models import fs_eend, ls_eend
    from fseend_tpu.ops.features import extract_fbank
    from fseend_tpu.utils.config import load_config
    from fseend_tpu.utils.rttm import make_rttm

    configs = load_config(args.configs)
    data = configs["data"]
    model_cfg, task, params, mstate = load_model(configs, args.ckpt)

    if args.wav_dir:
        from fseend_tpu.data.dataset import FeatureConfig, PredictDataset

        feat_cfg = FeatureConfig(
            frame_size=data["feat"]["win_length"],
            frame_shift=data["feat"]["hop_length"],
            context_size=data["context_recp"], subsampling=data["subsampling"],
            rate=data["feat"]["sample_rate"], input_transform=data["feat_type"])
        ds = PredictDataset(args.wav_dir, feat_cfg)
        for i in range(len(ds)):
            feats_i, rec = ds[i]
            _run_one(configs, model_cfg, task, params, mstate, feats_i, rec,
                     args)
        return
    if not args.wav:
        parser.error("need --wav or --wav_dir")

    if args.device_frontend:
        from fseend_tpu.ops.features import read_wav
        from fseend_tpu.ops.features_tpu import logmel_frontend

        audio, _sr = read_wav(args.wav)
        if audio.ndim > 1:
            audio = audio[:, 0]
        feats = np.asarray(logmel_frontend(
            jnp.asarray(audio[None]), frame_size=data["feat"]["win_length"],
            frame_shift=data["feat"]["hop_length"],
            context_size=data["context_recp"],
            subsampling=data["subsampling"],
            input_transform=data["feat_type"],
            sr=data["feat"]["sample_rate"])[0])
    else:
        feats = extract_fbank(
            args.wav, context_size=data["context_recp"],
            frame_size=data["feat"]["win_length"],
            frame_shift=data["feat"]["hop_length"],
            input_transform=data["feat_type"], subsampling=data["subsampling"])
    rec = os.path.splitext(os.path.basename(args.wav))[0]
    _run_one(configs, model_cfg, task, params, mstate, feats, rec, args)


def _run_one(configs, model_cfg, task, params, mstate, feats, rec, args):
    import jax
    import jax.numpy as jnp

    from fseend_tpu.models import fs_eend, ls_eend
    from fseend_tpu.utils.rttm import make_rttm

    data = configs["data"]
    xs = jnp.asarray(feats)[None]
    lens = jnp.array([len(feats)])
    max_slots = data["max_speakers"] + 2
    if task.model == "ls":
        out = ls_eend.ls_test(params, mstate, model_cfg, xs, lens, max_slots)
    else:
        out = fs_eend.fs_test(params, mstate, model_cfg, xs, lens, max_slots)
    # drop silence slot 0, sigmoid (dia_pred.py:53-56)
    probs = np.asarray(jax.nn.sigmoid(out["logits"][0, :, 1:]))
    rttm = make_rttm(rec, probs, frame_shift=data["feat"]["hop_length"],
                     subsampling=data["subsampling"],
                     sampling_rate=data["feat"]["sample_rate"],
                     threshold=args.threshold, median=args.median,
                     out_rttm_file=args.out)
    print(rttm, end="")


if __name__ == "__main__":
    main()
