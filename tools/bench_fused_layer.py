"""Whole-retention-LAYER shootout at serving shapes: XLA (projections +
pure chunkwise core + finish, fully fusible by XLA), the op-level Pallas
core (use_pallas — a fusion barrier between XLA-owned neighbors), and the
fully fused layer kernel (kernels/retention_layer_pallas.py) across row
groups G.

This measures exactly the boundary PARITY.md diagnosed ("the remaining gap
is not the core — it's fusion across op boundaries"): if the fused layer
wins here at the encoder (B=128) and decoder (B=lanes*slots) shapes, it
should win end-to-end in bench.py's blockwise serving step.

    JAX_PLATFORMS=cpu python tools/bench_fused_layer.py --check
    python tools/bench_fused_layer.py                 # times on the chip
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fseend_tpu.kernels import retention_layer_pallas as KL
from fseend_tpu.ops import retention as R


def _sync(x):
    return np.asarray(jnp.ravel(x)[0])


def timeit(f, *a, n=30):
    out = f(*a)
    _sync(out[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    _sync(out[0])
    return (time.perf_counter() - t0) / n * 1e3


def bench_shape(B, T, D, H, chunk, dt, interp):
    cfg = R.RetentionConfig(embed_dim=D, num_heads=H, chunk_size=chunk)
    p = R.init_retention(jax.random.PRNGKey(0), cfg)
    p = jax.tree.map(lambda a: a.astype(dt), p)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.5, dt)
    st = {"kv": jnp.zeros((B, H, D // H, D // H), jnp.float32),
          "scale": jnp.ones((B, H, 1, 1), jnp.float32)}

    pure = jax.jit(lambda p_, x_, s_: R.retention_chunkwise_stateful(
        p_, x_, s_, cfg))
    core_cfg = dataclasses.replace(cfg, use_pallas=True)
    core = jax.jit(lambda p_, x_, s_: R.retention_chunkwise_stateful(
        p_, x_, s_, core_cfg))

    y_ref, st_ref = pure(p, x, st)
    print(f"-- layer shape B={B} T={T} D={D} H={H} chunk={chunk} "
          f"{np.dtype(dt).name}", flush=True)
    if interp:
        y_k, st_k = KL.fused_retention_layer(p, x, st, cfg, True)
        err = float(jnp.abs(y_k - y_ref).max())
        print(f"   fused == pure: maxerr {err:.2e}", flush=True)
        assert err < 2e-5
        return

    print(f"   XLA whole layer:   {timeit(pure, p, x, st):7.3f} ms", flush=True)
    print(f"   pallas core only:  {timeit(core, p, x, st):7.3f} ms", flush=True)
    gammas = R.decay_gammas(cfg)

    def fused_g(G):
        def f(p_, x_, s_):
            return KL._forward(
                gammas, x_,
                p_["q_proj"]["kernel"], p_["q_proj"]["bias"].reshape(1, -1),
                p_["k_proj"]["kernel"], p_["k_proj"]["bias"].reshape(1, -1),
                p_["v_proj"]["kernel"], p_["v_proj"]["bias"].reshape(1, -1),
                p_["g_proj"]["kernel"], p_["g_proj"]["bias"].reshape(1, -1),
                p_["out_proj"]["kernel"], p_["out_proj"]["bias"].reshape(1, -1),
                s_["kv"], s_["scale"], chunk, False, G)
        return jax.jit(f)

    for G in (2, 4, 8, 16):
        if B % G:
            continue
        try:
            f = fused_g(G)
            ms = timeit(f, p, x, st)
            y_k = f(p, x, st)[0]
            err = float(jnp.max(jnp.abs(y_k.astype(jnp.float32)
                                        - y_ref.astype(jnp.float32))))
            print(f"   fused layer G={G:2d}:  {ms:7.3f} ms   maxerr {err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"   fused layer G={G:2d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", help="CPU interpret-mode")
    ap.add_argument("--lanes", type=int, default=128)
    ap.add_argument("--slots", type=int, default=10)
    ap.add_argument("--K", type=int, default=128)
    args = ap.parse_args()
    dt = jnp.float32 if args.check else jnp.bfloat16
    if args.check:
        bench_shape(4, 16, 32, 4, 8, dt, True)
        print("interpret-mode parity OK", flush=True)
        return
    # encoder serving shape: B=lanes, one K-frame block per call
    bench_shape(args.lanes, args.K, 256, 4, args.K, dt, False)
    # decoder serving shape: rows = lanes * attractor slots
    bench_shape(args.lanes * args.slots, args.K, 256, 4, args.K, dt, False)


if __name__ == "__main__":
    main()
