"""Sequence parallelism (SP) for the O(T^2) parallel-mode ops.

The reference scales sequence length algorithmically on one device
(retention, SURVEY.md §5.7) — cross-device SP "is not needed for parity but
the chunk dimension is the natural axis if added later".  Here it is, for
the offline/parallel-mode paths where time is NOT sequential:

  * ``sp_causal_mha``          — causal masked attention with the TIME axis
    sharded over a mesh axis: queries stay local, k/v are all-gathered over
    ICI, the causal mask uses global positions.  Work per device: T/n x T.
  * ``sp_retention_parallel``  — same treatment for γ=1 parallel retention
    (the row-normalizers depend only on global row indices, so each shard
    computes its own rows exactly).

Both are `shard_map`s: drop-in, bit-equal to the single-device op (tested on
the virtual 8-device mesh).  Streaming modes need no SP — their state is
O(1) and the lane (stream) axis is the natural data-parallel axis
(serving/runtime.shard_server_over_mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fseend_tpu.ops import nn
from fseend_tpu.ops import retention as R


def sp_causal_mha(p, x: jnp.ndarray, mesh: Mesh, axis: str = "data",
                  mask_delay: int = 0) -> jnp.ndarray:
    """Causal MHA with x: (B, T, D) sharded on T over `axis`.

    Equivalent to nn.mha(p, x, x, x, causal_mask(T)) with the time axis
    distributed; the all-gather of k/v rides the mesh interconnect.
    """
    B, T, D = x.shape
    n = mesh.shape[axis]
    assert T % n == 0, f"T={T} must divide over the {axis} axis ({n})"
    Tl = T // n

    def local(x_local):
        idx = jax.lax.axis_index(axis)
        q, k, v = nn.mha_project_qkv(p, x_local, x_local, x_local)
        # gather keys/values from every shard: (..., H, T, hd)
        k_all = jax.lax.all_gather(k, axis, axis=2, tiled=True)
        v_all = jax.lax.all_gather(v, axis, axis=2, tiled=True)
        qpos = idx * Tl + jnp.arange(Tl)[:, None]   # global query rows
        kpos = jnp.arange(T)[None, :]
        mask = jnp.where(kpos <= qpos + mask_delay, 0.0, nn.NEG_INF)
        out = nn.mha_core(q, k_all, v_all, mask)
        out = nn._merge_heads(out)
        return nn.linear(p["out_proj"], out)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(None, axis, None),
    )(x)


def sp_retention_parallel(p, x: jnp.ndarray, cfg: R.RetentionConfig,
                          mesh: Mesh, axis: str = "data") -> jnp.ndarray:
    """γ=1 parallel retention with the time axis sharded over `axis`.

    Row i's decay normalization (1/sqrt(i+1)) and the data-dependent
    row-sum clamp both depend only on row-local quantities, so each shard
    reproduces its rows of the full computation exactly.
    """
    B, T, D = x.shape
    n = mesh.shape[axis]
    assert T % n == 0
    Tl = T // n
    H, dk, dv = cfg.num_heads, cfg.key_dim, cfg.head_dim

    def local(x_local):
        idx = jax.lax.axis_index(axis)
        q = nn.linear(p["q_proj"], x_local).reshape(B, Tl, H, dk).swapaxes(1, 2)
        k = (nn.linear(p["k_proj"], x_local) * (dk ** -0.5)).reshape(
            B, Tl, H, dk).swapaxes(1, 2)
        v = nn.linear(p["v_proj"], x_local).reshape(B, Tl, H, dv).swapaxes(1, 2)
        g = nn.linear(p["g_proj"], x_local)
        k_all = jax.lax.all_gather(k, axis, axis=2, tiled=True)
        v_all = jax.lax.all_gather(v, axis, axis=2, tiled=True)
        qpos = idx * Tl + jnp.arange(Tl)[:, None]
        kpos = jnp.arange(T)[None, :]
        tri = kpos <= qpos  # (Tl, T) causal rows at global positions
        mask = jnp.where(tri, 1.0, 0.0) / jnp.sqrt(qpos.astype(jnp.float32) + 1.0)
        qk = jnp.einsum("bhqd,bhkd->bhqk", q, k_all,
                        preferred_element_type=jnp.float32) * mask
        denom = jnp.abs(jax.lax.stop_gradient(qk).sum(-1, keepdims=True))
        qk = qk / jnp.clip(denom, 1.0, None)
        out = jnp.einsum("bhqk,bhkd->bhqd", qk, v_all,
                         preferred_element_type=jnp.float32)
        return R._finish(p, out, g, cfg)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(None, axis, None),
    )(x)
