"""Device mesh + sharding rules — the TPU-native replacement for the
reference's DDP strategy (SURVEY.md §2.3, §5.8).

The reference's entire parallelism story is data parallelism through
PyTorch-Lightning DDP (NCCL allreduce).  Here:

  * a 2-D ``Mesh`` over ("data", "model"): the batch axis is sharded over
    "data" (gradient allreduce becomes an XLA collective over ICI, inserted
    automatically by jit); large projection matrices are sharded over
    "model" (tensor parallelism — head-dim for attention/retention,
    hidden-dim for FFNs), which the reference has no equivalent of;
  * metric aggregation (Lightning sync_dist) == summing counter pytrees that
    jit already partial-reduces; no user-level collectives needed;
  * sync_batchnorm: batch stats are computed on the *global* batch
    automatically because the BN reduction crosses the sharded batch axis —
    XLA inserts the psum (the reference needs an explicit
    ``sync_batchnorm=True``, LS train_dia_simu.py:167).

Sequence (chunk-axis) sharding for hour-long parallel-mode scoring is the
natural next axis; retention's cross-chunk scan keeps training sequential by
design (O(1) state), so "sp" here means sharding the *batch of streams*, not
time.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ("data", "model") mesh. Default: all devices on "data"."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, f"{n_data}x{n_model} > {n} devices"
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# Rules mapping param-tree path substrings -> PartitionSpec for the kernel.
# Biases follow their kernel's output sharding. Matched in order.
_TP_RULES = [
    # attention/retention projections: shard the output (head) dim
    (r"in_proj", P(None, "model")),
    (r"(q|k|v|g)_proj.*kernel", P(None, "model")),
    (r"out_proj.*kernel", P("model", None)),
    # FFN: hidden dim sharded (megatron-style pair)
    (r"linear1.*kernel", P(None, "model")),
    (r"linear2.*kernel", P("model", None)),
    (r"pw1.*kernel", P(None, "model")),
    (r"pw2.*kernel", P("model", None)),
]
_TP_BIAS_RULES = [
    (r"in_proj", P("model")),
    (r"(q|k|v|g)_proj", P("model")),
    (r"linear1", P("model")),
    (r"pw1", P("model")),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def param_pspec(path, leaf) -> P:
    """PartitionSpec for one parameter leaf under tensor parallelism."""
    s = _path_str(path)
    if getattr(leaf, "ndim", 0) >= 2 and s.endswith("kernel"):
        for pat, spec in _TP_RULES:
            if re.search(pat, s):
                return spec
    if getattr(leaf, "ndim", 0) == 1 and s.endswith("bias"):
        for pat, spec in _TP_BIAS_RULES:
            if re.search(pat, s):
                return spec
    return P()  # replicated


def param_shardings(params: Any, mesh: Mesh, tensor_parallel: bool = True):
    """NamedSharding tree for a param pytree. tensor_parallel=False (or a
    1-sized model axis) replicates everything — pure DP, matching the
    reference's strategy."""

    def one(path, leaf):
        spec = param_pspec(path, leaf) if tensor_parallel else P()
        # guard: dims must divide the mesh axis; fall back to replication
        if any(ax is not None for ax in spec):
            for dim, ax in zip(leaf.shape, spec):
                if ax is not None and dim % mesh.shape[ax] != 0:
                    return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def batch_sharding(mesh: Mesh):
    """Shard the leading (batch) axis over "data"."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh):
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_params(params: Any, mesh: Mesh, tensor_parallel: bool = True):
    shardings = param_shardings(params, mesh, tensor_parallel)
    return jax.tree.map(jax.device_put, params, shardings)
