"""Retention-core shootout at serving shapes: XLA vs the shipped Pallas
kernel vs a batched-grid Pallas variant (G (lane-head) rows per grid step,
the fix VERDICT r2 #4 prescribes for the diagnosed fine-grain failure).

Run on CPU for correctness (interpret mode), on the chip for the verdict:

    JAX_PLATFORMS=cpu python tools/bench_retention_kernel.py --check
    python tools/bench_retention_kernel.py            # times on the chip
"""

import argparse
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fseend_tpu.kernels import retention_pallas as RP


def _kernel_batched(q_ref, k_ref, v_ref, o_ref, kv_state, kv_scale,
                    *, L: int, N: int, G: int):
    """γ=1 chunkwise retention, G rows per grid step. Same math as
    retention_pallas._kernel with the (batch·head) axis inside the block:
    every matmul is a G-batched dot_general, grid steps drop by G×."""
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        kv_state[...] = jnp.zeros_like(kv_state)
        kv_scale[...] = jnp.ones_like(kv_scale)

    q = q_ref[:, 0]   # (G, L, dk)
    k = k_ref[:, 0]
    v = v_ref[:, 0]

    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tri = (col <= row).astype(jnp.float32)
    # sqrt(1..L); cumsum has no Pallas TPU lowering, and tpu.iota must
    # produce integers — iota int32 then cast
    scale_vec = jnp.sqrt(
        (jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) + 1).astype(jnp.float32))
    mask = tri / scale_vec                                 # (L, L)

    dn = (((2,), (2,)), ((0,), (0,)))                      # batched qk^T
    qk = jax.lax.dot_general(q, k, dn,
                             preferred_element_type=jnp.float32) * mask
    inner_scale = jnp.clip(jnp.abs(qk).sum(axis=-1, keepdims=True), 1.0, None)
    dv_dims = (((2,), (1,)), ((0,), (0,)))                 # (G,L,L)x(G,L,dv)
    inner = jax.lax.dot_general(qk / inner_scale, v, dv_dims,
                                preferred_element_type=jnp.float32)

    inner_decay = math.sqrt(L) / scale_vec                 # (L, 1)
    cross_scale = kv_scale[...]                            # (G, 1, 1)
    dk_dims = (((2,), (1,)), ((0,), (0,)))                 # (G,L,dk)x(G,dk,dv)
    cross = jax.lax.dot_general(q * inner_decay, kv_state[...], dk_dims,
                                preferred_element_type=jnp.float32) / cross_scale

    all_scale = jnp.maximum(inner_scale, cross_scale)
    o_ref[:, 0] = (inner * (inner_scale / all_scale)
                   + cross * (cross_scale / all_scale)).astype(o_ref.dtype)

    kt_dims = (((1,), (1,)), ((0,), (0,)))                 # k^T v per row
    kv_c = jax.lax.dot_general(k, v / math.sqrt(L), kt_dims,
                               preferred_element_type=jnp.float32)
    new_state = kv_state[...] + kv_c
    kv_state[...] = new_state
    kv_scale[...] = jnp.clip(
        jnp.abs(new_state).sum(axis=1, keepdims=True).max(axis=2, keepdims=True),
        1.0, None)


@functools.partial(jax.jit, static_argnames=("chunk", "G", "interpret"))
def batched_forward(q, k, v, chunk: int, G: int, interpret: bool = False):
    BH, T, dk = q.shape
    dv = v.shape[-1]
    N = T // chunk
    assert BH % G == 0
    q4 = q.reshape(BH, N, chunk, dk)
    k4 = k.reshape(BH, N, chunk, dk)
    v4 = v.reshape(BH, N, chunk, dv)
    out = pl.pallas_call(
        functools.partial(_kernel_batched, L=chunk, N=N, G=G),
        grid=(BH // G, N),
        in_specs=[
            pl.BlockSpec((G, 1, chunk, dk), lambda b, n: (b, n, 0, 0)),
            pl.BlockSpec((G, 1, chunk, dk), lambda b, n: (b, n, 0, 0)),
            pl.BlockSpec((G, 1, chunk, dv), lambda b, n: (b, n, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G, 1, chunk, dv), lambda b, n: (b, n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, N, chunk, dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((G, dk, dv), jnp.float32),
            pltpu.VMEM((G, 1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q4, k4, v4)
    return out.reshape(BH, T, dv)


def _sync(x):
    return np.asarray(jnp.ravel(x)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", help="CPU interpret-mode")
    ap.add_argument("--BH", type=int, default=512)   # 128 lanes x 4 heads
    ap.add_argument("--T", type=int, default=128)    # serving block K
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--dk", type=int, default=64)
    args = ap.parse_args()
    interp = args.check
    rng = np.random.default_rng(0)
    dt = jnp.float32 if args.check else jnp.bfloat16
    q = jnp.asarray(rng.standard_normal((args.BH, args.T, args.dk)), dt)
    k = jnp.asarray(rng.standard_normal((args.BH, args.T, args.dk)), dt)
    v = jnp.asarray(rng.standard_normal((args.BH, args.T, args.dk)), dt)

    ref = RP._pure_core(q, k, v, args.chunk)
    if args.check:
        old = RP._forward(q, k, v, args.chunk, interpret=True)
        np.testing.assert_allclose(np.asarray(old), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
        for G in (1, 4, 8):
            new = batched_forward(q, k, v, args.chunk, G, interpret=True)
            np.testing.assert_allclose(np.asarray(new), np.asarray(ref),
                                       atol=2e-5, rtol=1e-5)
            print(f"G={G}: batched kernel == pure core", flush=True)
        return

    def timeit(f, *a, n=30):
        out = f(*a)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*a)
        _sync(out)
        return (time.perf_counter() - t0) / n * 1e3

    xla = jax.jit(lambda a, b, c: RP._pure_core(a, b, c, args.chunk))
    print(f"shapes: BH={args.BH} T={args.T} chunk={args.chunk} dk={args.dk} "
          f"{dt.__name__}", flush=True)
    print(f"XLA pure core:        {timeit(xla, q, k, v):7.3f} ms", flush=True)
    print(f"pallas (1 row/step):  {timeit(lambda a, b, c: RP._forward(a, b, c, args.chunk), q, k, v):7.3f} ms",
          flush=True)
    for G in (4, 8, 16):
        try:
            ms = timeit(lambda a, b, c, g=G: batched_forward(a, b, c, args.chunk, g),
                        q, k, v)
            # correctness on-chip too (bf16 tolerance)
            got = batched_forward(q, k, v, args.chunk, G)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            print(f"pallas (G={G:2d}):       {ms:7.3f} ms   maxerr {err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"pallas (G={G:2d}): FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
