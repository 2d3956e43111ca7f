"""One-off chip probe for the frame-scan kernels: compile + parity +
throughput at the production serving shape, across lane-group settings.

Usage: python tools/chip_framekernel_probe.py [--lanes 128] [--block 500]
Prints one line per (budget, enc_kernel) config: ok/fail, max|dp| vs the
XLA per-frame scan, frames/s (readback-barriered), ms/frame-step.
"""

import argparse
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


def _sync(x):
    return np.asarray(jnp.ravel(x)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=128)
    ap.add_argument("--block", type=int, default=500)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--skip_parity", action="store_true")
    args = ap.parse_args()

    from fseend_tpu.models import ls_eend
    from fseend_tpu.serving.runtime import StreamingServer

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    cfg = ls_eend.LSEENDConfig()
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), cfg)
    dt = jnp.bfloat16
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(dt) if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x, t)
    params, mstate = cast(params), cast(mstate)
    rng = np.random.default_rng(0)
    lanes, block = args.lanes, args.block
    xs = jax.device_put(
        jnp.asarray(rng.standard_normal((lanes, block, cfg.in_size)), dt))

    # reference: XLA per-frame scan
    ref_p = None
    if not args.skip_parity:
        server = StreamingServer(kind="ls", cfg=cfg, params=params,
                                 model_state=mstate, n_lanes=lanes,
                                 n_slots=cfg.max_nspks, dtype=dt)
        p, _ = server.process_block(xs)
        ref_p = np.asarray(p, np.float32)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            p, _ = server.process_block(xs)
        _sync(p)
        el = time.perf_counter() - t0
        print(f"[probe] XLA per-frame scan: {lanes*block*args.reps/el:,.0f} "
              f"f/s, {el/(block*args.reps)*1e3:.3f} ms/step", flush=True)
        del server

    # configs: (probe_lanes, budget_mb, enc_kernel).  Lane-grouping is only
    # legal at 128-aligned per-group widths (2026-08-18 chip probe: finer
    # splits fail Mosaic lowering), so the grouped path is exercised at
    # 2*lanes where pick_groups selects g=2 with Bg = lanes.
    n_ok, n_fail = 0, 0
    for probe_lanes, budget, enc_k in (
            (lanes, None, True), (lanes, None, False),
            (2 * lanes, None, True)):
        if budget is None:
            os.environ.pop("FSEEND_FRAMESCAN_VMEM_MB", None)
        else:
            os.environ["FSEEND_FRAMESCAN_VMEM_MB"] = str(budget)
        tag = (f"lanes={probe_lanes} budget={budget or 'default'} "
               f"enc_kernel={enc_k}")
        xsl = xs
        if probe_lanes != lanes:
            xsl = jax.device_put(jnp.asarray(
                rng.standard_normal((probe_lanes, block, cfg.in_size)), dt))
        try:
            sk = StreamingServer(kind="ls", cfg=cfg, params=params,
                                 model_state=mstate, n_lanes=probe_lanes,
                                 n_slots=cfg.max_nspks, dtype=dt,
                                 frame_kernel=True, frame_kernel_enc=enc_k)
            t0 = time.perf_counter()
            p, _ = sk.process_block(xsl)
            pk = np.asarray(p, np.float32)
            print(f"[probe] {tag}: compiled+ran in {time.perf_counter()-t0:.1f}s",
                  flush=True)
            if ref_p is not None and probe_lanes == lanes:
                print(f"[probe] {tag}: max|dp| vs XLA scan = "
                      f"{np.abs(pk - ref_p).max():.5f}", flush=True)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                p, _ = sk.process_block(xsl)
            _sync(p)
            el = time.perf_counter() - t0
            print(f"[probe] {tag}: {probe_lanes*block*args.reps/el:,.0f} f/s, "
                  f"{el/(block*args.reps)*1e3:.3f} ms/step", flush=True)
            del sk
            n_ok += 1
        except Exception as e:
            n_fail += 1
            print(f"[probe] {tag}: FAILED {type(e).__name__}: {str(e)[:2000]}",
                  flush=True)
    print(f"[probe] summary: {n_ok} ok, {n_fail} failed", flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
