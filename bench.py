"""Benchmark: batched multi-stream LS-EEND streaming throughput on one chip.

Prints ONE JSON line:
  {"metric": "streaming_frames_per_sec_per_chip", "value": N,
   "unit": "frames/s", "vs_baseline": N / 1000}

Baseline (BASELINE.md): >= 100x real time per chip at the 10 Hz
post-subsampling frame rate => 1000 frames/s/chip.  We measure sustained
frames/s across all lanes of the production-size LS-EEND model
(256 units, 4 conformer-retention layers, 2 decoder layers, 10 attractor
slots — conf/spk_onl_conformer_retention_enc_dec_nonautoreg.yaml) using the
fused block-scan serving path.  Extra diagnostics go to stderr.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "bfloat16")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from fseend_tpu.models import ls_eend
    from fseend_tpu.serving.runtime import StreamingServer

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    cfg = ls_eend.LSEENDConfig()  # production size (345->256, 4+2 layers, S=10)
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), cfg)

    lanes = int(os.environ.get("BENCH_LANES", "128"))
    block = int(os.environ.get("BENCH_BLOCK", "500"))
    n_blocks = int(os.environ.get("BENCH_BLOCKS", "10"))

    server = StreamingServer(kind="ls", cfg=cfg, params=params,
                             model_state=mstate, n_lanes=lanes,
                             n_slots=cfg.max_nspks)

    rng = np.random.default_rng(0)
    xs = jax.device_put(
        rng.standard_normal((lanes, block, cfg.in_size)).astype(np.float32))

    # warmup + compile
    p, _ = server.process_block(xs)
    jax.block_until_ready(p)

    t0 = time.perf_counter()
    for _ in range(n_blocks):
        p, _ = server.process_block(xs)
    jax.block_until_ready(p)
    dt = time.perf_counter() - t0

    total_frames = lanes * block * n_blocks
    fps = total_frames / dt
    ms_per_frame_step = (dt / (block * n_blocks)) * 1000

    # single-frame latency (p50): a length-1 block through the same scan
    # program family (the per-frame jit path compiles pathologically slowly
    # through this environment's remote-compile relay; the 1-frame scan is
    # the same computation)
    lat = []
    x1 = xs[:, :1]
    p, _ = server.process_block(x1)  # compile
    jax.block_until_ready(p)
    for _ in range(30):
        t = time.perf_counter()
        p, _ = server.process_block(x1)
        jax.block_until_ready(p)
        lat.append((time.perf_counter() - t) * 1000)
    p50 = float(np.percentile(lat, 50))

    print(f"lanes={lanes} block={block} blocks={n_blocks} "
          f"wall={dt:.3f}s frames/s={fps:.0f} "
          f"ms/frame-step(batched)={ms_per_frame_step:.3f} "
          f"p50 single-step latency={p50:.2f}ms "
          f"per-lane realtime factor={fps / lanes / 10:.1f}x",
          file=sys.stderr)

    print(json.dumps({
        "metric": "streaming_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
