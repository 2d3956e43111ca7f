"""Sweep the FS fast-block sub-block length (fs_fast_chunk) on the chip.

The fast block (fs_eend.fs_framestream_block) is neither HBM- nor
MXU-bound at the shipped default (64 lanes / cap 2048 / L=125: cache
reads ~24 GB/s, score traffic ~100 GB/s, ~3 TFLOP/s = 1.6% MFU against
v5e's 197), so the sub-block length L — which amortizes per-sub-block
overheads (per-lane cache dynamic_update_slice, mask build, dispatch)
against working-set size — is the first knob to sweep.  Larger L = fewer
cache-read passes per frame and fewer dispatches, but a (B, C, H, L, cap)
f32 score working set that grows linearly.

Writes one JSON line per config; the winner becomes the server default if
it beats the r5-shipped L=125 by a margin worth a default change.

  python tools/sweep_fs_fast_chunk.py [--lanes 64] [--cap 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from fseend_tpu.models import fs_eend
from fseend_tpu.serving.runtime import StreamingServer


def _sync(x):
    return np.asarray(jnp.ravel(jnp.asarray(x))[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=64)
    ap.add_argument("--cap", type=int, default=2048)
    ap.add_argument("--block", type=int, default=500)
    ap.add_argument("--chunks", default="50,100,125,250,500")
    args = ap.parse_args()

    cfg = fs_eend.FSEENDConfig()  # production size
    dt = jnp.bfloat16
    params, mstate = fs_eend.init_fs_eend(jax.random.PRNGKey(0), cfg)
    cast = lambda t: jax.tree.map(
        lambda a: a.astype(dt)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, t)
    params, mstate = cast(params), cast(mstate)
    rng = np.random.default_rng(0)
    xs = jax.device_put(jnp.asarray(
        rng.standard_normal((args.lanes, args.block, cfg.in_size)), dt))
    import dataclasses
    rows = []
    for L, flash in ((int(c), f) for f in (False, True)
                     for c in args.chunks.split(",")):
        if args.block % L:
            continue
        try:
            vcfg = dataclasses.replace(cfg, use_flash_attn=flash)
            srv = StreamingServer(kind="fs", cfg=vcfg, params=params,
                                  model_state=mstate, n_lanes=args.lanes,
                                  n_slots=cfg.max_nspks, capacity=args.cap,
                                  dtype=dt, fs_fast=True, fs_fast_chunk=L)
            p, _ = srv.process_block(xs)
            _sync(p)
            srv.reset_lanes(np.arange(args.lanes))
            # steady state: fill the caches, then time 2 blocks
            nfill = max(args.cap // args.block - 1, 0)
            for _ in range(nfill):
                p, _ = srv.process_block(xs)
            _sync(p)
            nrep = 2
            t0 = time.perf_counter()
            for _ in range(nrep):
                p, _ = srv.process_block(xs)
            _sync(p)
            el = time.perf_counter() - t0
            fps = args.lanes * args.block * nrep / el
            rows.append({"L": L, "flash": flash, "lanes": args.lanes,
                         "cap": args.cap,
                         "ms_per_frame": round(el / (args.block * nrep) * 1e3,
                                               3),
                         "frames_per_sec": round(fps, 1)})
            print(json.dumps(rows[-1]), flush=True)
            del srv
        except Exception as e:  # pragma: no cover — chip-only
            print(f"L={L} flash={flash} FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
