"""Batched multi-stream streaming runtime — the production serving path.

The reference's streaming inference is a python loop over frames calling a
torch module per frame (FS-EEND/streaming_infer_dia.py:77-81,
LS-EEND/streaming_infer_dia.py:52-97) for ONE stream.  Here:

  * N independent audio streams are served by ONE compiled step whose state
    is a batched `StreamState` pytree resident in HBM (`vmap` is implicit —
    every state tensor has a leading lane axis);
  * per-frame dispatch overhead is amortized by `stream_block`: a
    `lax.scan` over a block of K frames compiled once (SURVEY.md §7 "the
    serving loop itself must be a fused scan, not a Python loop of jitted
    steps");
  * lanes can be reset individually (a new call replaces a finished one)
    with no recompilation — state reset is a `where` on the lane mask.

LS-EEND lanes carry O(1) state; FS-EEND lanes carry bounded KV caches
(capacity = max call length).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fseend_tpu.models import fs_eend, ls_eend


@dataclasses.dataclass
class StreamingServer:
    """Multi-stream server over one model family."""

    kind: str                 # "fs" | "ls"
    cfg: Any
    params: Any
    model_state: Any
    n_lanes: int
    n_slots: int
    capacity: int = 4096      # fs only: max frames per call
    dtype: Any = jnp.float32
    # ls only: run process_block with the attractor decoder fused into the
    # Pallas frame-scan kernel (states VMEM-resident across the block) —
    # same per-frame latency semantics, ~bandwidth-bound -> compute-bound.
    # None = AUTO (the shipped default): on for LS at EXACTLY n_lanes=128 —
    # the swept frontier (docs/results/latency_frontier_r4.json) shows it
    # dominating every other operating point (416.8k f/s @ 0.307 ms vs
    # per-frame XLA 269.3k @ 0.475 ms and blockwise K=128 404.3k @ 12.8 s).
    # 128 is the only chip-validated lane count: the 2026-08-18 probe showed
    # >128 lanes (and finer lane groups) fail Mosaic lowering, so the auto
    # default must not silently break a previously-working n_lanes=256 XLA
    # server.  Pass frame_kernel=True explicitly for sharded multi-chip
    # setups where the per-device shard is 128 lanes.
    frame_kernel: bool | None = None
    # with frame_kernel: also run the conformer encoder as a frame-scan
    # kernel (False = XLA per-frame scan for the encoder only)
    frame_kernel_enc: bool = True
    # fs only: advance streams with the per-frame-EXACT fast block
    # (fs_eend.fs_framestream_block — history prefix read once per
    # sub-block instead of once per frame; ~K x less KV-cache HBM traffic,
    # measured 120x at r4 shapes).  False = the frame-by-frame scan of
    # fs_stream_step (the oracle path the fast block is tested against).
    fs_fast: bool = True
    # fs_fast sub-block length: blocks are scanned in L-frame pieces to
    # bound the (B, C, H, L, cap) attention-score working set.  None =
    # largest divisor of the incoming block size <= 128.
    fs_fast_chunk: int | None = None
    # set by shard_server_over_mesh: XLA's SPMD partitioner cannot split a
    # pallas custom call, so the frame-kernel block runs under an explicit
    # lane-sharded shard_map when a mesh is attached
    mesh: Any = None

    def __post_init__(self):
        if self.frame_kernel is None:
            self.frame_kernel = (self.kind == "ls"
                                 and self.n_lanes == 128
                                 and jax.default_backend() == "tpu")
        if self.frame_kernel and self.kind != "ls":
            raise ValueError(
                "frame_kernel=True is LS-only (the FS decoder's growing KV "
                "caches do not fit VMEM residency). FS per-frame serving is "
                "covered by the default fs_fast=True exact fast block "
                "(measured 55x the frame scan; docs/results/"
                "fs_perframe_probe_r5.json), optionally with "
                "cfg.use_flash_attn for the online-softmax cache read.")
        self.state = self._init_state()
        # host-side copy: the live state's buffers are DONATED by the jitted
        # steps, so aliasing them here would leave _reset closing over
        # deleted arrays (reset_lanes after any step would crash)
        self._zero_state = jax.tree.map(np.asarray, self.state)
        def step_with_probs(state, x_t, flush):
            new_state, out = self._step_impl(state, x_t, flush)
            return new_state, {"probs": self._probs(out["logits"]),
                               "valid": out["valid"]}

        self._step = jax.jit(step_with_probs, donate_argnums=(0,))
        self._block = jax.jit(self._block_impl, donate_argnums=(0,))
        self._reset = jax.jit(self._reset_impl, donate_argnums=(0,))

    def _init_state(self):
        if self.kind == "fs":
            return fs_eend.fs_stream_init(self.cfg, self.n_lanes, self.capacity,
                                          self.n_slots, self.dtype)
        return ls_eend.ls_stream_init(self.cfg, self.n_lanes, self.n_slots,
                                      self.dtype)

    # -- single frame ------------------------------------------------------
    def _step_impl(self, state, x_t, flush):
        if self.kind == "fs":
            if self.fs_fast:
                # K=1 fast block: keeps the decoder-cache layout consistent
                # with process_block (stream-clock positions), so step() and
                # block calls interleave on one stream
                B = x_t.shape[0]
                fl = jnp.broadcast_to(jnp.asarray(flush, bool), (B,))
                state, (logits, valid) = fs_eend.fs_framestream_block(
                    self.params, state, self.cfg, self.model_state["bn"],
                    x_t[:, None, :], self.n_slots, fl[:, None])
                return state, {"logits": logits[:, 0], "valid": valid[:, 0]}
            return fs_eend.fs_stream_step(self.params, state, self.cfg,
                                          self.model_state["bn"], x_t,
                                          self.n_slots, flush)
        return ls_eend.ls_stream_step(self.params, state, self.cfg,
                                      self.model_state, x_t, self.n_slots, flush)

    def _probs(self, logits):
        """sigmoid + silence-slot drop, computed inside the jitted program
        (one dispatch per call instead of two)."""
        return jax.nn.sigmoid(logits[..., 1:])

    def step(self, frames: np.ndarray, flush: bool = False):
        """frames: (n_lanes, in_size) -> probs (n_lanes, n_slots-1)
        (sigmoid, silence slot dropped — dia_pred.py:53-56)."""
        self.state, out = self._step(self.state, jnp.asarray(frames),
                                     jnp.asarray(flush))
        return out["probs"], out["valid"]

    # -- block of frames (throughput path) ---------------------------------
    def _block_impl(self, state, xs, flush):
        if self.kind == "ls" and self.frame_kernel:
            def run(params, mstate, state, xs, flush):
                return ls_eend.ls_stream_block_fused(
                    params, state, self.cfg, mstate, xs, flush,
                    self.n_slots, enc_kernel=self.frame_kernel_enc)

            if self.mesh is not None:
                # every LS stream-state leaf is lane-major (B or B*C leading
                # axis), so the whole step shards along axis 0 with zero
                # collectives; params/model_state are replicated
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                lane = jax.tree.map(lambda _: P("data"), state)
                repl = lambda t: jax.tree.map(lambda _: P(), t)
                run_sh = shard_map(
                    run, mesh=self.mesh,
                    in_specs=(repl(self.params), repl(self.model_state),
                              lane, P("data"), P(None, "data")),
                    out_specs=(lane, (P(None, "data"), P(None, "data"))),
                    check_vma=False)
                state, (logits, valid) = run_sh(self.params, self.model_state,
                                                state, xs, flush)
            else:
                state, (logits, valid) = run(self.params, self.model_state,
                                             state, xs, flush)
            return state, (self._probs(logits.swapaxes(0, 1)), valid)

        if self.kind == "fs" and self.fs_fast:
            # per-frame-EXACT fast blocks: scan over L-frame sub-blocks so
            # the (B, C, H, L, cap) score working set stays bounded while
            # the KV caches are read once per SUB-BLOCK, not once per frame
            B, K, _ = xs.shape
            L = self.fs_fast_chunk or max(
                d for d in range(1, min(K, 128) + 1) if K % d == 0)
            assert K % L == 0, (K, L)
            flush_bk = flush.swapaxes(0, 1)              # (B, K)

            def body(carry, inp):
                x_i, fl_i = inp
                new_state, (logits, valid) = fs_eend.fs_framestream_block(
                    self.params, carry, self.cfg, self.model_state["bn"],
                    x_i, self.n_slots, fl_i)
                return new_state, (logits, valid)

            xs_r = xs.reshape(B, K // L, L, -1).swapaxes(0, 1)
            fl_r = flush_bk.reshape(B, K // L, L).swapaxes(0, 1)
            state, (logits, valid) = jax.lax.scan(body, state, (xs_r, fl_r))
            # (NS, B, L, C) -> (B, K, C); (NS, B, L) -> (K, B)
            logits = logits.swapaxes(0, 1).reshape(B, K, -1)
            valid = valid.swapaxes(0, 1).reshape(B, K).swapaxes(0, 1)
            return state, (self._probs(logits), valid)

        def body(carry, inp):
            x_t, fl = inp
            new_state, out = self._step_impl(carry, x_t, fl)
            return new_state, (out["logits"], out["valid"])

        state, (logits, valid) = jax.lax.scan(
            body, state, (xs.swapaxes(0, 1), flush))
        return state, (self._probs(logits.swapaxes(0, 1)), valid)

    def process_block(self, frames: np.ndarray, flush=None):
        """frames: (n_lanes, K, in_size); flush: None, (K,) shared, or
        (n_lanes, K) per-lane — lanes serve independent streams (FS and LS
        both carry per-lane stream clocks in this per-frame mode).
        Returns (probs (n_lanes, K, n_slots-1), valid (K, n_lanes))."""
        K = frames.shape[1]
        flush = np.zeros((K,), bool) if flush is None else np.asarray(flush)
        if flush.ndim == 1:
            flush = np.broadcast_to(flush[:, None], (K, self.n_lanes))
        else:
            flush = flush.T  # (n_lanes, K) -> scan-major (K, n_lanes)
        self.state, (probs, valid) = self._block(
            self.state, jnp.asarray(frames), jnp.asarray(flush))
        return probs, valid

    # -- lane management ---------------------------------------------------
    def _reset_impl(self, state, lane_mask):
        def reset_leaf(cur, zero):
            if cur.ndim == 0:
                return cur  # shared scalar counters are left untouched
            # lane-indexed tensors lead with n_lanes; decoder retention
            # states lead with n_lanes*n_slots (slot-major per lane)
            if cur.shape[:1] == (self.n_lanes,):
                m = lane_mask
            elif cur.shape[:1] == (self.n_lanes * self.n_slots,):
                m = jnp.repeat(lane_mask, self.n_slots)
            else:
                return cur
            m = m.reshape(m.shape + (1,) * (cur.ndim - 1))
            return jnp.where(m, zero, cur)

        return jax.tree.map(reset_leaf, state, self._zero_state)

    def reset_lanes(self, lanes):
        """Reset the given lane indices to fresh-stream state.

        Exact for BOTH families: every per-lane tensor — KV caches /
        retention states, conv rings, and the lane's stream clocks
        (t/emitted) — resets, so a reused lane reproduces a fresh server
        bit-for-bit (tested) while its neighbours continue untouched.
        """
        mask = np.zeros((self.n_lanes,), bool)
        mask[np.asarray(lanes)] = True
        self.state = self._reset(self.state, jnp.asarray(mask))


def stream_file(server: StreamingServer, feats: np.ndarray, block: int = 128):
    """Convenience: run one recording through lane-broadcast streaming,
    returning time-aligned probabilities (handles the conv-delay flush)."""
    T, Fdim = feats.shape
    delay = server.cfg.conv_delay
    xs = np.broadcast_to(feats[None], (server.n_lanes, T, Fdim))
    pad = np.zeros((server.n_lanes, delay, Fdim), feats.dtype)
    xs = np.concatenate([xs, pad], axis=1)
    flush = np.arange(T + delay) >= T
    probs = []
    for st in range(0, T + delay, block):
        ed = min(st + block, T + delay)
        p, valid = server.process_block(xs[:, st:ed], flush[st:ed])
        probs.append(np.asarray(p[0]))
    out = np.concatenate(probs, axis=0)
    return out[delay:]


@dataclasses.dataclass
class BlockStreamingServer:
    """Blockwise streaming server (LS and FS): consumes fixed-size K-frame
    blocks per lane, emits the previous block's probabilities (one-block lag
    + conv_delay alignment; see the blockwise sections of models/ls_eend.py
    and models/fs_eend.py).  Highest-throughput serving mode; use
    `StreamingServer` for frame-level latency.

    LS lanes carry O(1) chunkwise-retention state (bit-exact vs batch
    chunkwise); FS lanes carry bounded KV caches and are bit-exact vs the
    masked batch pass (capacity = max call length)."""

    cfg: Any
    params: Any
    model_state: Any
    n_lanes: int
    n_slots: int
    block: int = 100
    kind: str = "ls"          # "ls" | "fs"
    capacity: int = 4096      # fs only
    dtype: Any = jnp.float32

    def __post_init__(self):
        assert self.block >= self.cfg.conv_delay
        self._frames_fed = 0    # fs capacity guard (non-flush blocks only)
        self.state = self.fresh_state()
        if self.kind == "fs":
            def step(state, xs, enc_bypass, h_mask):
                new_state, logits = fs_eend.fs_blockstream_step(
                    self.params, state, self.cfg, self.model_state["bn"], xs,
                    self.n_slots, enc_bypass=enc_bypass, h_mask=h_mask)
                return new_state, jax.nn.sigmoid(logits[..., 1:])
        else:
            def step(state, xs, enc_bypass, h_mask):
                new_state, logits = ls_eend.ls_blockstream_step(
                    self.params, state, self.cfg, self.model_state, xs,
                    self.n_slots, enc_bypass=enc_bypass, h_mask=h_mask)
                return new_state, jax.nn.sigmoid(logits[..., 1:])

        self._step = jax.jit(step, donate_argnums=(0,))

    def fresh_state(self):
        """A pristine per-stream state (what reset_all installs); also used
        by serving/aot.py so exported artifacts never bake mid-stream
        state into their `init`."""
        if self.kind == "fs":
            return fs_eend.fs_blockstream_init(
                self.cfg, self.n_lanes, self.capacity, self.n_slots,
                self.block, self.dtype)
        return ls_eend.ls_blockstream_init(
            self.cfg, self.n_lanes, self.n_slots, self.block, self.dtype)

    def process_block(self, frames: np.ndarray, flush: bool = False,
                      h_mask: np.ndarray | None = None):
        """frames: (n_lanes, block, in_size) -> probs of the PREVIOUS block
        (n_lanes, block, n_slots-1). The first call's output is warm-up
        garbage; with flush=True a zero-embedding block drains the tail.
        h_mask (block,) bool marks valid frames — pass it on a zero-padded
        final partial block for exact ragged-tail parity with the batch
        pass."""
        if self.kind == "fs" and not flush:
            # FS KV caches are fixed-capacity; dynamic_update_slice clamps
            # the write start, so overflowing would silently corrupt the
            # cache tail. Fail loudly instead. (Flush blocks bypass the
            # encoder and write nothing — fs_blockstream_step enc_bypass.)
            if self._frames_fed + self.block > self.capacity:
                raise ValueError(
                    f"FS blockwise stream exceeds KV capacity: "
                    f"{self._frames_fed} frames fed + block {self.block} > "
                    f"capacity {self.capacity}; raise `capacity` or "
                    f"reset_all() between calls")
            self._frames_fed += self.block
        if h_mask is None:
            h_mask = np.ones((self.block,), bool)
        self.state, probs = self._step(self.state, jnp.asarray(frames),
                                       jnp.asarray(flush), jnp.asarray(h_mask))
        return probs

    def blocks_consumed(self) -> int:
        # LS carries a per-lane block counter (lane reuse re-gates the
        # warm-up block); FS blockwise keeps a shared scalar
        return int(np.max(np.asarray(self.state["m"])))

    def reset_all(self):
        """Fresh state for every lane (FS caches are position-dependent, so
        FS resets are whole-batch; LS supports per-lane reset_lanes)."""
        self.__post_init__()

    def reset_lanes(self, lanes):
        """Reset lanes to fresh-stream state (γ=1 retention state is
        position-independent, so per-lane reset is exact for LS)."""
        if self.kind != "ls":
            raise ValueError("per-lane reset is LS-only (FS KV caches are "
                             "position-dependent); use reset_all()")
        mask = np.zeros((self.n_lanes,), bool)
        mask[np.asarray(lanes)] = True
        m = jnp.asarray(mask)
        zero = ls_eend.ls_blockstream_init(
            self.cfg, self.n_lanes, self.n_slots, self.block, self.dtype)

        def reset_leaf(cur, z):
            if cur.ndim == 0 or cur.shape[:1] != (self.n_lanes,):
                return cur
            mm = m.reshape((self.n_lanes,) + (1,) * (cur.ndim - 1))
            return jnp.where(mm, z, cur)

        # decoder states are (n_lanes*n_slots, ...): expand the mask
        def reset_dec_leaf(cur, z):
            if cur.shape[:1] == (self.n_lanes * self.n_slots,):
                mm = jnp.repeat(m, self.n_slots)
                mm = mm.reshape((cur.shape[0],) + (1,) * (cur.ndim - 1))
                return jnp.where(mm, z, cur)
            return cur

        st = dict(self.state)
        st["enc"] = jax.tree.map(reset_leaf, self.state["enc"], zero["enc"])
        for k in ("h_prev", "h_tail2", "m"):
            # m is per-lane: the reset lane's next block is re-gated as its
            # warm-up block, keeping the garbage emission out of its decoder
            # retention state (exact lane reuse)
            st[k] = reset_leaf(self.state[k], zero[k])
        st["dec"] = jax.tree.map(reset_dec_leaf, self.state["dec"], zero["dec"])
        self.state = st


def shard_server_over_mesh(server, mesh):
    """Multi-chip serving: shard the server's lane axis across the "data"
    axis of a mesh. Every state tensor and input block is lane-major, so XLA
    partitions the whole streaming step with zero cross-chip collectives —
    N chips serve N x lanes streams at N x throughput.

    Works for StreamingServer and BlockStreamingServer; call right after
    construction (before the first step)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    lane_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == server.n_lanes:
            return jax.device_put(x, lane_sh)
        if hasattr(x, "ndim") and x.ndim >= 1 and server.n_slots and \
                x.shape[0] == server.n_lanes * server.n_slots:
            return jax.device_put(x, lane_sh)  # decoder (lanes*slots) axis
        return jax.device_put(x, repl)

    server.state = jax.tree.map(put, server.state)
    server.params = jax.tree.map(lambda x: jax.device_put(x, repl), server.params)
    server.model_state = jax.tree.map(lambda x: jax.device_put(x, repl),
                                      server.model_state)
    if getattr(server, "frame_kernel", False):
        # pallas custom calls don't auto-partition: route the frame-kernel
        # block through an explicit lane-sharded shard_map (see _block_impl)
        assert server.n_lanes % mesh.shape["data"] == 0
        server.mesh = mesh
    return server
