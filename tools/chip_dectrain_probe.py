"""Real-TPU compile/run probe for the fused decoder-layer TRAINING kernel.

Interpret-mode tests cannot see Mosaic lowering rules (e.g. the bf16
minor-dim-insertion rejection this probe caught on 2026-08-19); run this on
the chip after ANY change to kernels/dec_train_fusion_pallas.py, before
claiming perf numbers.  Exits non-zero if any config fails.

  python tools/chip_dectrain_probe.py            # small + production shapes
  DECTRAIN_PROBE=small python tools/chip_dectrain_probe.py
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache (same dir bench.py uses): these kernels take
# 10-25 min of remote AOT compile per config — pay it once
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from fseend_tpu.kernels.dec_train_fusion_pallas import fused_fusion_layer
from fseend_tpu.models import ls_eend


def probe(B, C, T, D, H, F, chunk, dt, rate, n_time=3):
    cfg = ls_eend.LSEENDConfig(n_units=D, n_heads=H, dec_dim_feedforward=F,
                               dec_n_layers=1)
    params, _ = ls_eend.init_ls_eend(jax.random.PRNGKey(0), cfg)
    p = jax.tree.map(lambda a: a.astype(dt)
                     if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                     params["dec"]["layers"][0])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C, T, D)), dt)
    seed = jnp.asarray([[7]], jnp.int32)

    def loss(p, x):
        return jnp.sum(fused_fusion_layer(p, x, seed, H, chunk, rate) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    t0 = time.perf_counter()
    dp, dx = g(p, x)
    jax.block_until_ready(dx)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_time):
        dp, dx = g(p, x)
    dx0 = np.asarray(dx[0, 0, 0, 0])  # value readback barrier
    ms = (time.perf_counter() - t0) / n_time * 1e3
    return compile_s, ms, float(dx0)


def main():
    shapes = [
        # (B, C, T, D, H, F, chunk, dtype, rate)
        (2, 10, 250, 256, 4, 2048, 125, jnp.bfloat16, 0.1),
    ]
    if os.environ.get("DECTRAIN_PROBE") != "small":
        shapes += [
            # bench/train default: B=16, T=500, chunk 125, bf16 + dropout
            (16, 10, 500, 256, 4, 2048, 125, jnp.bfloat16, 0.1),
            (16, 10, 500, 256, 4, 2048, 125, jnp.float32, 0.1),
        ]
    failed = 0
    for (B, C, T, D, H, F, chunk, dt, rate) in shapes:
        tag = (f"B={B} C={C} T={T} D={D} F={F} chunk={chunk} "
               f"dt={jnp.dtype(dt).name} rate={rate}")
        try:
            compile_s, ms, v = probe(B, C, T, D, H, F, chunk, dt, rate)
            print(f"OK   {tag}: compile {compile_s:.1f}s, "
                  f"{ms:.2f} ms/grad-step, dx000={v:.4g}", flush=True)
        except Exception:
            failed += 1
            print(f"FAIL {tag}:", flush=True)
            traceback.print_exc()
    print(f"{failed} failures / {len(shapes)} configs", flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
