"""Ahead-of-time serving artifacts: freeze a BlockStreamingServer into a
single self-contained file (StableHLO via jax.export, weights baked in as
constants) that a deployment host can load and run WITHOUT the model code,
the config system, or the checkpoint machinery — just jax + this loader.

    save_server(server, "ls_server.npz")            # build box (has ckpts)
    srv = AotBlockServer("ls_server.npz")           # serving box
    probs = srv.process_block(frames)               # same API/semantics

Two functions are exported: `init` (fresh per-stream state — also a pure
constant graph) and `step` (state, frames, flush, h_mask) -> (state,
probs).  Artifacts are platform-bound (export lowers for the platform it
ran on: export on TPU to serve on TPU); jax.export verifies this at load.

The reference has no deployment story at all — inference requires the full
training repo plus torch/Lightning to unpickle checkpoints
(FS-EEND/dia_pred.py:30-50).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def _export(jitted, *args):
    from jax import export as jexport

    sds = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        args)
    return jexport.export(jitted)(*sds).serialize()


def save_server(server, path: str) -> None:
    """Freeze a live BlockStreamingServer (serving/runtime.py) to `path`.

    The exported `init` is rebuilt pristine (fresh_state), NOT taken from
    server.state — freezing a server that has already processed blocks must
    not bake mid-stream state into the artifact."""
    zero_state = jax.tree.map(jnp.asarray, server.fresh_state())
    step_blob = _export(
        server._step,
        zero_state,
        jnp.zeros((server.n_lanes, server.block, server.cfg.in_size),
                  server.dtype),
        jnp.asarray(False),
        jnp.ones((server.block,), bool))
    init_blob = _export(jax.jit(lambda: zero_state))
    meta = {
        "kind": server.kind,
        "n_lanes": int(server.n_lanes),
        "n_slots": int(server.n_slots),
        "block": int(server.block),
        "in_size": int(server.cfg.in_size),
        "conv_delay": int(server.cfg.conv_delay),
        "capacity": int(server.capacity) if server.kind == "fs" else None,
        "dtype": str(np.dtype(server.dtype)
                     if server.dtype != jnp.bfloat16 else "bfloat16"),
    }
    np.savez(path, meta=json.dumps(meta),
             step=np.frombuffer(step_blob, np.uint8),
             init=np.frombuffer(init_blob, np.uint8))


class AotBlockServer:
    """Run a frozen serving artifact; mirrors BlockStreamingServer's
    process_block API (one-block emission lag, flush, h_mask)."""

    def __init__(self, path: str):
        from jax import export as jexport

        z = np.load(path)
        self.meta = json.loads(str(z["meta"]))
        self._step = jexport.deserialize(z["step"].tobytes()).call
        self._init = jexport.deserialize(z["init"].tobytes()).call
        self.kind = self.meta["kind"]
        self.n_lanes = self.meta["n_lanes"]
        self.n_slots = self.meta["n_slots"]
        self.block = self.meta["block"]
        self.dtype = jnp.dtype(self.meta["dtype"])
        # absent in pre-round-3 artifacts -> guard disabled
        self.capacity = self.meta.get("capacity")
        self.state = self._init()
        self._frames_fed = 0

    def reset_all(self):
        self.state = self._init()
        self._frames_fed = 0

    def process_block(self, frames: np.ndarray, flush: bool = False,
                      h_mask: np.ndarray | None = None) -> np.ndarray:
        if self.kind == "fs" and not flush and self.capacity is not None:
            # same overflow guard as BlockStreamingServer.process_block
            if self._frames_fed + self.block > self.capacity:
                raise ValueError(
                    f"FS blockwise stream exceeds KV capacity: "
                    f"{self._frames_fed} frames fed + block {self.block} > "
                    f"capacity {self.capacity}; reset_all() or re-export "
                    f"with larger capacity")
            self._frames_fed += self.block
        if h_mask is None:
            h_mask = np.ones((self.block,), bool)
        self.state, probs = self._step(self.state,
                                       jnp.asarray(frames, self.dtype),
                                       jnp.asarray(flush),
                                       jnp.asarray(h_mask))
        return probs
