"""Benchmark: batched multi-stream LS-EEND streaming throughput on one chip.

Prints ONE JSON line:
  {"metric": "streaming_frames_per_sec_per_chip", "value": N,
   "unit": "frames/s", "vs_baseline": N / 1000}

Baseline (BASELINE.md): >= 100x real time per chip at the 10 Hz
post-subsampling frame rate => 1000 frames/s/chip, batched multi-stream.

Two serving modes of the production-size LS-EEND model (345->256, 4
conformer-retention layers + 2 decoder layers, 10 attractor slots) are
measured; the best sustained number wins:
  1. per-frame recurrent scan (the reference's streaming semantics,
     O(1) state, frame-level latency);
  2. blockwise-recurrent (chunkwise retention with carried cross-block
     state — bit-exact vs the batch chunkwise pass, +block/10Hz latency).

Robustness: this environment's remote-compile latency is variable, so the
fast-compiling mode is measured first and a SIGTERM/SIGINT handler prints
the best completed result if the process is killed mid-way.
"""

import json
import os
import signal
import sys
import time

os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "bfloat16")

import jax

# persistent compilation cache: this environment's remote-compile latency is
# high and variable; a warm cache turns minutes of XLA compile into seconds
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

_RESULT = {}


def _emit(*_args):
    if _RESULT:
        print(json.dumps(_RESULT), flush=True)
    os._exit(0)


def _record(fps: float, note: str):
    global _RESULT
    if not _RESULT or fps > _RESULT["value"]:
        _RESULT = {
            "metric": "streaming_frames_per_sec_per_chip",
            "value": round(fps, 1),
            "unit": "frames/s",
            "vs_baseline": round(fps / 1000.0, 3),
        }
    print(f"[bench] {note}: {fps:.0f} frames/s", file=sys.stderr, flush=True)


def main():
    from fseend_tpu.models import ls_eend
    from fseend_tpu.serving.runtime import StreamingServer

    signal.signal(signal.SIGTERM, _emit)
    signal.signal(signal.SIGINT, _emit)

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    cfg = ls_eend.LSEENDConfig()  # production size
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    lanes = int(os.environ.get("BENCH_LANES", "128"))
    # serve in bf16 (state updates are dtype-preserving; outputs verified
    # within bf16 tolerance of f32 in tests) — 1.5x on the per-frame path
    dt = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(dt) if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x, t)
    params, mstate = cast(params), cast(mstate)

    # --- mode 1: per-frame recurrent scan (fast compile ~2 min) ---
    block = int(os.environ.get("BENCH_BLOCK", "500"))
    n_rep = int(os.environ.get("BENCH_BLOCKS", "10"))
    server = StreamingServer(kind="ls", cfg=cfg, params=params,
                             model_state=mstate, n_lanes=lanes,
                             n_slots=cfg.max_nspks, dtype=dt)
    xs = jax.device_put(
        jnp.asarray(rng.standard_normal((lanes, block, cfg.in_size)), dt))
    p, _ = server.process_block(xs)
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        p, _ = server.process_block(xs)
    jax.block_until_ready(p)
    fps1 = lanes * block * n_rep / (time.perf_counter() - t0)
    _record(fps1, f"per-frame recurrent scan (lanes={lanes}, "
                  f"{fps1 / lanes / 10:.0f}x realtime/lane)")

    # p50 single-frame latency (includes this environment's ~30-40 ms
    # per-dispatch relay overhead; on-device compute is ~0.3 ms/frame-step)
    x1 = xs[:, :1]
    p, _ = server.process_block(x1)
    jax.block_until_ready(p)
    lat = []
    for _ in range(30):
        t = time.perf_counter()
        p, _ = server.process_block(x1)
        jax.block_until_ready(p)
        lat.append((time.perf_counter() - t) * 1e3)
    print(f"[bench] p50 single-frame latency: {np.percentile(lat, 50):.2f} ms "
          f"(relay-dispatch bound)", file=sys.stderr, flush=True)

    if os.environ.get("BENCH_FAST"):
        print(json.dumps(_RESULT))
        return

    # --- mode 2: blockwise-recurrent (chunkwise-exact; K/10Hz latency) ---
    K = int(os.environ.get("BENCH_BLOCKWISE_K", "100"))
    st = ls_eend.ls_blockstream_init(cfg, lanes, cfg.max_nspks, K, dt)
    xsb = jax.device_put(
        jnp.asarray(rng.standard_normal((lanes, K, cfg.in_size)), dt))
    step = jax.jit(
        lambda s, x: ls_eend.ls_blockstream_step(params, s, cfg, mstate, x,
                                                 cfg.max_nspks),
        donate_argnums=(0,))
    st, y = step(st, xsb)
    jax.block_until_ready(y)
    n2 = 20
    t0 = time.perf_counter()
    for _ in range(n2):
        st, y = step(st, xsb)
    jax.block_until_ready(y)
    fps2 = lanes * K * n2 / (time.perf_counter() - t0)
    _record(fps2, f"blockwise-recurrent K={K} "
                  f"({fps2 / lanes / 10:.0f}x realtime/lane)")

    print(json.dumps(_RESULT))


if __name__ == "__main__":
    main()
