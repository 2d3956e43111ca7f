"""Latency/throughput frontier for LS-EEND serving on one chip.

The two production modes sit at opposite ends of a frontier:

  * per-frame recurrent scan — frame-level latency (the reference's
    streaming semantics, LS-EEND/streaming_infer_dia.py:52-97), lowest
    latency, lowest MXU utilization (one (lanes, D) matmul per op);
  * blockwise-recurrent K=128 — rides the 128x128 MXU tile, highest
    throughput, but a lane must buffer K frames (K/10 Hz = +12.8 s)
    before the chip sees them.

Micro-blocks (K=16..64) are the middle modes VERDICT r2 #6 asks for:
+1.6..6.4 s batching latency for a measured throughput step-up. This
sweeps K (1 = per-frame scan) x lanes and tabulates frames/s, x-realtime
per lane, and the end-to-end per-frame latency model

  latency_p50 ~= K / frame_rate  (block fill, 10 Hz)  +  device block time

Run on the real chip:  python tools/sweep_latency.py [--out /tmp/frontier.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "bfloat16")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from fseend_tpu.models import ls_eend
from fseend_tpu.serving.runtime import StreamingServer

FRAME_HZ = 10.0  # post-subsampling frame rate (8 kHz, hop 80, subsample 10)


def _sync(x):
    arr = x
    while isinstance(arr, (tuple, list, dict)):
        arr = jax.tree.leaves(arr)[0]
    return np.asarray(jnp.ravel(arr)[0])


def measure_perframe(cfg, params, mstate, lanes, dt, n_frames=2000,
                     frame_kernel=False, block=500):
    """Fused per-frame scan via StreamingServer.process_block (scan of
    ls_stream_step; `block` only amortizes dispatch + (for the kernel) the
    per-call state DMA — semantics stay frame-level). frame_kernel=True
    swaps in the Pallas frame-scan kernels (states VMEM-resident across
    the `block`-frame call)."""
    rng = np.random.default_rng(0)
    server = StreamingServer(kind="ls", cfg=cfg, params=params,
                             model_state=mstate, n_lanes=lanes,
                             n_slots=cfg.max_nspks, dtype=dt,
                             frame_kernel=frame_kernel)
    xs = jax.device_put(jnp.asarray(
        rng.standard_normal((lanes, block, cfg.in_size)), dt))
    p, _ = server.process_block(xs)
    _sync(p)
    n_rep = max(1, n_frames // block)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        p, _ = server.process_block(xs)
    _sync(p)
    el = time.perf_counter() - t0
    fps = lanes * block * n_rep / el
    step_ms = el / (block * n_rep) * 1e3
    return {"mode": "per-frame-kernel" if frame_kernel else "per-frame",
            "K": 1, "lanes": lanes, "block": block,
            "frames_per_sec": round(fps, 1),
            "rt_per_lane": round(fps / lanes / FRAME_HZ, 1),
            "device_block_ms": round(step_ms, 3),
            # a frame is visible to the chip as soon as it exists
            "latency_ms": round(step_ms, 3)}


def measure_blockwise(cfg, params, mstate, lanes, K, dt, n_rep=20):
    rng = np.random.default_rng(0)
    xs = jax.device_put(jnp.asarray(
        rng.standard_normal((lanes, K, cfg.in_size)), dt))
    st = ls_eend.ls_blockstream_init(cfg, lanes, cfg.max_nspks, K, dt)
    step = jax.jit(
        lambda s, x: ls_eend.ls_blockstream_step(params, s, cfg, mstate, x,
                                                 cfg.max_nspks),
        donate_argnums=(0,))
    st, y = step(st, xs)
    _sync(y)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        st, y = step(st, xs)
    _sync(y)
    el = time.perf_counter() - t0
    fps = lanes * K * n_rep / el
    blk_ms = el / n_rep * 1e3
    fill_ms = K / FRAME_HZ * 1e3
    return {"mode": "blockwise", "K": K, "lanes": lanes,
            "frames_per_sec": round(fps, 1),
            "rt_per_lane": round(fps / lanes / FRAME_HZ, 1),
            "device_block_ms": round(blk_ms, 3),
            # last frame of a block waits ~0 for fill; FIRST frame waits
            # K/rate — report the worst-case (first-frame) latency
            "latency_ms": round(fill_ms + blk_ms, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/latency_frontier.json")
    ap.add_argument("--lanes", default="128")
    # block >= conv_delay (9) is required by ls_blockstream_init
    ap.add_argument("--Ks", default="16,32,64,128")
    ap.add_argument("--perframe_lanes", default="128,512")
    # frame-kernel dispatch-block sweep (VERDICT r3 #2): per-frame
    # SEMANTICS at every size; the block amortizes the per-call state DMA
    ap.add_argument("--fk_blocks", default="125,250,500,1000")
    args = ap.parse_args()

    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    cfg = ls_eend.LSEENDConfig()  # production size
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), cfg)
    dt = jnp.bfloat16
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(dt) if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x, t)
    params, mstate = cast(params), cast(mstate)

    rows = []

    def save():
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)

    def add(fn, *a, **kw):
        # one Mosaic/VMEM rejection (frame-kernel rows are chip-dependent)
        # must not lose the rows already measured — log and keep sweeping,
        # persisting after every row
        try:
            r = fn(*a, **kw)
        except Exception as e:
            print(f"[sweep] {fn.__name__}{kw or ''} failed: "
                  f"{type(e).__name__}: {str(e)[:300]}", file=sys.stderr,
                  flush=True)
            return
        rows.append(r)
        print(json.dumps(r), flush=True)
        save()

    for lanes in (int(s) for s in args.perframe_lanes.split(",")):
        add(measure_perframe, cfg, params, mstate, lanes, dt)
        # frame-scan kernel: 128 lanes only — the 2026-08-18 chip probe
        # showed >128 lanes fail remote TPU compile (state exceeds VMEM and
        # the only legal split, g=2 @ Bg=128, is rejected by Mosaic), so a
        # bigger sweep would just burn compile minutes on known failures
        if lanes == 128:
            for blk in (int(s) for s in args.fk_blocks.split(",")):
                add(measure_perframe, cfg, params, mstate, lanes, dt,
                    frame_kernel=True, block=blk)
    for lanes in (int(s) for s in args.lanes.split(",")):
        for K in (int(s) for s in args.Ks.split(",")):
            add(measure_blockwise, cfg, params, mstate, lanes, K, dt)

    save()
    print(f"-> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
