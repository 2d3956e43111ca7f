"""FS-EEND per-frame streaming: where do 37 ms/frame-step go?

BENCH r4 measured the FS per-frame scan at 1,713 frames/s (37.4 ms per
frame-step at 64 lanes / capacity 2048) — 120x slower than FS blockwise on
the same model.  The per-frame step's masked cached-attention touches the
FULL preallocated capacity-sized KV caches every frame (static shapes: the
(B, H, cap, hd) tensors are read whole regardless of the lane clock t), so
the hypothesis is a capacity-proportional HBM-traffic wall plus whatever
the per-lane scatter-append costs.

This probe times the per-frame scan across capacity x lanes and reports
ms/frame-step, GB/frame-step touched state, and implied HBM GB/s — if
ms/frame scales ~linearly with capacity and lanes, the full-cache-touch
roofline is confirmed and the fix is prefix-bounded reads (Pallas kernel
with dynamic pl.ds prefix slices), not op tuning.

    python tools/probe_fs_perframe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fseend_tpu.models import fs_eend
from fseend_tpu.serving.runtime import StreamingServer


def _sync(x):
    return np.asarray(jnp.ravel(x)[0])


def state_bytes(cfg, lanes, cap, itemsize=2):
    H, D, C = cfg.n_heads, cfg.n_units, cfg.max_nspks
    enc = cfg.enc_n_layers * 2 * lanes * H * cap * (D // H) * itemsize
    dec = cfg.dec_n_layers * 2 * lanes * C * H * cap * (D // H) * itemsize
    return enc + dec


def main():
    cfg = fs_eend.FSEENDConfig()  # production size
    dt = jnp.bfloat16
    params, mstate = fs_eend.init_fs_eend(jax.random.PRNGKey(0), cfg)
    cast = lambda t: jax.tree.map(
        lambda a: a.astype(dt)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, t)
    params, mstate = cast(params), cast(mstate)
    rng = np.random.default_rng(0)
    rows = []
    block = 250
    # fast=True: the round-5 per-frame-EXACT fast block (prefix read once
    # per sub-block); fast=False: the r4 frame-by-frame scan this probe was
    # written to diagnose (full-cache touch per frame)
    for lanes, cap, fast in ((64, 2048, False), (64, 1024, False),
                             (64, 512, False), (16, 2048, False),
                             (64, 2048, True), (64, 512, True),
                             (128, 2048, True)):
        try:
            srv = StreamingServer(kind="fs", cfg=cfg, params=params,
                                  model_state=mstate, n_lanes=lanes,
                                  n_slots=cfg.max_nspks, capacity=cap,
                                  dtype=dt, fs_fast=fast)
            xs = jax.device_put(jnp.asarray(
                rng.standard_normal((lanes, block, cfg.in_size)), dt))
            p, _ = srv.process_block(xs)
            _sync(p)
            srv.reset_lanes(np.arange(lanes))
            t0 = time.perf_counter()
            p, _ = srv.process_block(xs)
            _sync(p)
            el = time.perf_counter() - t0
            ms = el / block * 1e3
            gb = state_bytes(cfg, lanes, cap) / 1e9
            rows.append({"lanes": lanes, "capacity": cap, "fast": fast,
                         "ms_per_frame": round(ms, 3),
                         "frames_per_sec": round(lanes * block / el, 1),
                         "state_gb": round(gb, 3),
                         "implied_gbps_at_1x_touch": round(gb / (ms / 1e3), 1)})
            print(rows[-1], flush=True)
            del srv
        except Exception as e:
            print(f"lanes={lanes} cap={cap} FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
