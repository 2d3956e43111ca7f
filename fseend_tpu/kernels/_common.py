"""Shared helpers for the frame-scan Pallas kernels (in-kernel math plus
weight-packing), used by dec_frame_scan_pallas.py and enc_frame_scan_pallas.py.

Kept deliberately tiny: everything here runs INSIDE a Mosaic kernel (except
the packing helpers) and must respect the TPU lowering rules (f32 accumulate
via preferred_element_type, no python-float scalars onto bf16 vectors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mm(w, x, b=None):
    """(O, I) @ (I, N) -> (O, N) f32 accumulate (+ bias (O, 1))."""
    y = jax.lax.dot_general(w, x, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y


def ln(x32, scale, bias, eps=1e-5):
    """LayerNorm over the feature (sublane) axis of (D, N), f32 in/out."""
    mu = jnp.mean(x32, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=0, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def silu32(x):
    """silu computed in f32: jax.nn.silu on bf16 trips Mosaic's broadcast
    verifier (internal f32 logistic constant)."""
    x32 = x.astype(jnp.float32)
    return x32 * jax.nn.sigmoid(x32)


def framescan_vmem_budget_bytes() -> int:
    """Lane-grouping VMEM budget for the frame-scan kernels
    (`FSEEND_FRAMESCAN_VMEM_MB`, default sized for the v5e's 128 MB minus
    weights/activations headroom)."""
    import os

    return int(os.environ.get("FSEEND_FRAMESCAN_VMEM_MB", "96")) * 1024 * 1024


def framescan_vmem_limit_bytes() -> int:
    """Mosaic scoped-vmem limit for the frame-scan kernels:
    max(budget + 24 MB headroom, 120 MB) so RAISING the grouping budget on a
    big-VMEM part raises the compiler limit with it, while LOWERING the
    budget never drops the limit below the v5e default (at the production
    shape grouping is often impossible — see pick_groups — and the ungrouped
    state must still be allowed to compile).  Independently overridable via
    `FSEEND_FRAMESCAN_VMEM_LIMIT_MB` for smaller-VMEM parts."""
    import os

    override = os.environ.get("FSEEND_FRAMESCAN_VMEM_LIMIT_MB")
    if override is not None:
        return int(override) * 1024 * 1024
    budget = framescan_vmem_budget_bytes()
    return max(budget + 24 * 1024 * 1024, 120 * 1024 * 1024)


def t_(p, key, dt):
    """Transposed kernel (O, I) of a linear's (I, O) weight."""
    return p[key]["kernel"].astype(dt).T


def b_(p, key, width, dt):
    b = p[key].get("bias")
    if b is None:
        b = jnp.zeros((width,), jnp.float32)
    return b.astype(dt).reshape(-1, 1)
