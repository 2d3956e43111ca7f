"""Continuous-batching batch server: diarize a directory of wavs by
multiplexing them over the lanes of ONE compiled streaming step.

  python -m cli.serve --configs configs/ls_infer.yaml --ckpt avg.npz \
      --wav_dir /data/wavs --out_dir rttms --lanes 16 --block 64

Unlike cli.infer (one batch forward per recording, padded to the longest),
this streams every recording concurrently through the per-frame serving
path with per-lane clocks — recordings of very different lengths waste no
lane time (a finished lane is reset and reused immediately), which is the
production pattern for live traffic. The reference's streaming demo serves
one stream per process (LS-EEND/streaming_infer_dia.py:52-97).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--wav_dir", required=True)
    parser.add_argument("--out_dir", required=True)
    # defaults = the measured frontier optimum (docs/results/
    # latency_frontier_r4.json): 128 lanes (frame-kernel legal + swept) and
    # 500-frame dispatch blocks -> 416.8k frames/s on one v5e chip
    parser.add_argument("--lanes", type=int, default=128)
    parser.add_argument("--block", type=int, default=500)
    parser.add_argument("--frame_kernel", choices=["auto", "on", "off"],
                        default="auto",
                        help="LS Pallas frame-scan serving kernel; auto = on "
                             "for LS at 128-aligned lanes on TPU")
    parser.add_argument("--capacity", type=int, default=8192,
                        help="FS only: max frames per recording")
    args = parser.parse_args()

    import jax.numpy as jnp

    from cli.infer import load_model
    from fseend_tpu.ops.features import extract_fbank
    from fseend_tpu.serving.runtime import StreamingServer
    from fseend_tpu.serving.scheduler import ContinuousBatcher
    from fseend_tpu.utils.config import load_config
    from fseend_tpu.utils.rttm import make_rttm

    configs = load_config(args.configs)
    data = configs["data"]
    model_cfg, task, params, mstate = load_model(configs, args.ckpt)
    fk = {"auto": None, "on": True, "off": False}[args.frame_kernel]
    srv = StreamingServer(kind=task.model, cfg=model_cfg, params=params,
                          model_state=mstate, n_lanes=args.lanes,
                          n_slots=data["max_speakers"] + 2,
                          capacity=args.capacity, frame_kernel=fk)
    cb = ContinuousBatcher(srv, block=args.block)

    wavs = sorted(glob.glob(os.path.join(args.wav_dir, "*.wav")))
    if not wavs:
        sys.exit(f"no wavs in {args.wav_dir}")
    total_frames = 0
    for path in wavs:
        feats = extract_fbank(
            path, context_size=data["context_recp"],
            frame_size=data["feat"]["win_length"],
            frame_shift=data["feat"]["hop_length"],
            input_transform=data["feat_type"],
            subsampling=data["subsampling"])
        total_frames += len(feats)
        cb.submit(os.path.splitext(os.path.basename(path))[0], feats)

    t0 = time.perf_counter()
    results = cb.run()
    dt = time.perf_counter() - t0

    os.makedirs(args.out_dir, exist_ok=True)
    for rec, probs in results.items():
        out_path = os.path.join(args.out_dir, rec + ".rttm")
        if os.path.exists(out_path):   # make_rttm appends; re-runs must not
            os.unlink(out_path)        # duplicate every segment
        make_rttm(rec, np.asarray(probs),
                  frame_shift=data["feat"]["hop_length"],
                  subsampling=data["subsampling"],
                  sampling_rate=data["feat"]["sample_rate"],
                  out_rttm_file=out_path)
    print(f"served {len(wavs)} recordings ({total_frames} frames) over "
          f"{args.lanes} lanes in {dt:.2f}s "
          f"({total_frames / dt:.0f} frames/s) -> {args.out_dir}")


if __name__ == "__main__":
    main()
