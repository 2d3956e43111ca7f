"""Pallas TPU kernel: fused two-layer FFN (y = act(x W1 + b1) W2 + b2).

XLA cannot fuse back-to-back GEMMs, so the (rows, dim_ff) hidden activation
round-trips HBM — and cost analysis shows the serving step is HBM-bound
(~720 GB/s of ~819 on v5e), dominated by the decoder's dim_ff=2048 FFN over
10 attractor slots.  This kernel keeps the hidden tile in VMEM: per row-tile
it reads x (D), writes y (D), and streams the weights — cutting the FFN's
HBM traffic by ~2*dim_ff/D (16x for 256->2048).

Forward-only fusion with a custom-VJP backward that recomputes via plain
JAX (same pattern as kernels/retention_pallas.py), so it is usable in
training too.

MEASURED (v5e, 128k x 256 -> 2048 -> 256 bf16): XLA 2.92 ms vs this kernel
2.99 ms — XLA's fusion+pipelining already saturates this shape, so the
kernel stays OPT-IN (LSEENDConfig.use_pallas wires the serving paths);
kept as infrastructure for shapes/fusions where XLA falls short.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ACTS = {"relu": jax.nn.relu, "silu": jax.nn.silu, "gelu": jax.nn.gelu}


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, act: str):
    h = jnp.dot(x_ref[...], w1_ref[...], preferred_element_type=jnp.float32)
    h = _ACTS[act](h + b1_ref[...])
    y = jnp.dot(h.astype(x_ref.dtype), w2_ref[...],
                preferred_element_type=jnp.float32)
    o_ref[...] = (y + b2_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "tile", "interpret"))
def _forward(x2, w1, b1, w2, b2, act: str, tile: int, interpret: bool = False):
    N, D = x2.shape
    F = w1.shape[1]
    grid = (N // tile,)
    return pl.pallas_call(
        functools.partial(_kernel, act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0)),
            pl.BlockSpec((D, F), lambda i: (0, 0)),   # weights: constant map,
            pl.BlockSpec((1, F), lambda i: (0, 0)),   # fetched once & kept
            pl.BlockSpec((F, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, D), x2.dtype),
        interpret=interpret,
    )(x2, w1, b1, w2, b2)


def _pure(x2, w1, b1, w2, b2, act):
    h = _ACTS[act](jnp.dot(x2, w1, preferred_element_type=jnp.float32) + b1[0])
    return (jnp.dot(h.astype(x2.dtype), w2, preferred_element_type=jnp.float32)
            + b2[0]).astype(x2.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused2(x2, w1, b1, w2, b2, act, tile, interpret):
    return _forward(x2, w1, b1, w2, b2, act, tile, interpret)


def _fwd(x2, w1, b1, w2, b2, act, tile, interpret):
    return _forward(x2, w1, b1, w2, b2, act, tile, interpret), (x2, w1, b1, w2, b2)


def _bwd(act, tile, interpret, res, g):
    x2, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(lambda a, b, c, d, e: _pure(a, b, c, d, e, act),
                     x2, w1, b1, w2, b2)
    return vjp(g)


_fused2.defvjp(_fwd, _bwd)


def fused_ffn(p: dict, x: jnp.ndarray, activation: str = "relu",
              tile: int = 256, interpret: bool = False) -> jnp.ndarray:
    """Fused act(x @ p['linear1']) @ p['linear2'] on (..., D) inputs.

    Falls back to plain JAX when shapes don't tile cleanly (row count not a
    multiple of `tile`, or lane dims not 128-aligned)."""
    w1, b1 = p["linear1"]["kernel"], p["linear1"]["bias"]
    w2, b2 = p["linear2"]["kernel"], p["linear2"]["bias"]
    D, F = w1.shape
    lead = x.shape[:-1]
    N = 1
    for s in lead:
        N *= s
    if (N % tile) or (D % 128) or (F % 128):
        h = _ACTS[activation](x @ w1.astype(x.dtype) + b1.astype(x.dtype))
        return h @ w2.astype(x.dtype) + b2.astype(x.dtype)
    x2 = x.reshape(N, D)
    out = _fused2(x2, w1.astype(x.dtype), b1.astype(x.dtype)[None],
                  w2.astype(x.dtype), b2.astype(x.dtype)[None],
                  activation, tile, interpret)
    return out.reshape(*lead, D)
