"""Benchmark: batched multi-stream LS-EEND streaming throughput on one chip.

Prints ONE JSON line:
  {"metric": "streaming_frames_per_sec_per_chip", "value": N,
   "unit": "frames/s", "vs_baseline": N / 1000}

Baseline (BASELINE.md): >= 100x real time per chip at the 10 Hz
post-subsampling frame rate => 1000 frames/s/chip, batched multi-stream.

Measured modes, ordered by importance so a driver timeout can never again
erase the newest metric (round 4's lesson: BENCH_r04 rc=124 lost mfu_train
because training ran LAST behind six serving variants):
  1. per-frame recurrent scan (headline; the reference's streaming
     semantics, O(1) state, frame-level latency) + the frame-scan Pallas
     kernel variant (the shipped serving default);
  2. TRAINING step (fwd+bwd) — XLA then the fused decoder-layer kernel;
  3. blockwise-recurrent serving (XLA / pallas / fused) -> mfu_serving;
  4. FS-EEND serving (blockwise bounded-KV + per-frame).

Robustness: a wall-clock self-budget (env BENCH_BUDGET_S, default 1680 s)
skips remaining modes and prints the JSON before an external timeout can
land; a SIGTERM/SIGINT handler still prints the best completed result if
the process is killed anyway.
"""

import contextlib
import dataclasses
import json
import os
import signal
import sys
import time

os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "bfloat16")

import jax

# persistent compilation cache: this environment's remote-compile latency is
# high and variable; a warm cache turns minutes of XLA compile into seconds
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

_RESULT = {}
_T0 = time.monotonic()
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1680"))

# MXU peak by device kind (dense bf16 FLOP/s per chip). v5e ("v5 lite"):
# 197 TFLOP/s bf16. Override with BENCH_PEAK_TFLOPS for other parts.
_PEAK_BF16 = {"TPU v5 lite": 197e12, "TPU v5e": 197e12,
              "TPU v4": 275e12, "TPU v6 lite": 918e12, "TPU v6e": 918e12}


def _budget_ok(label: str, need_s: float = 0.0) -> bool:
    """True if `need_s` more seconds fit in the self-budget; otherwise log
    the skip so a missing key in the artifact is attributable."""
    left = _BUDGET_S - (time.monotonic() - _T0)
    if left >= need_s:
        return True
    print(f"[bench] BUDGET: skipping {label} ({left:.0f}s left < "
          f"{need_s:.0f}s estimated)", file=sys.stderr, flush=True)
    return False


class _DeadlineExceeded(Exception):
    pass


@contextlib.contextmanager
def _hard_deadline(label: str, reserve_s: float = 90.0,
                   max_s: float | None = None):
    """SIGALRM backstop around a single mode: a remote-relay compile can
    stall for tens of minutes (2026-08-19: the fused-dec train kernel at
    production shape held the compile helper >25 min before a SIGKILL),
    which the upfront _budget_ok estimate cannot see.  The alarm fires
    `reserve_s` before the total budget (or after `max_s`, whichever is
    sooner) so the JSON always prints.  Only meaningful in the main
    thread; a non-positive remaining budget raises immediately via the
    caller's _budget_ok."""
    left = _BUDGET_S - (time.monotonic() - _T0) - reserve_s
    if max_s is not None:
        left = min(left, max_s)
    if left <= 1:
        raise _DeadlineExceeded(label)

    def _h(_sig, _frm):
        raise _DeadlineExceeded(label)

    old = signal.signal(signal.SIGALRM, _h)
    signal.alarm(int(left))
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def device_peak_flops() -> float | None:
    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    kind = getattr(jax.devices()[0], "device_kind", "")
    for k, v in _PEAK_BF16.items():
        if k in str(kind):
            return v
    return None


def compiled_flops(jitted, *args) -> float | None:
    """FLOPs per call from XLA's own cost model of the compiled executable
    (no hand-derived analytic count to get wrong)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = ca.get("flops")
        return float(f) if f and np.isfinite(f) else None
    except Exception as e:  # cost model unavailable on some backends
        print(f"[bench] cost_analysis unavailable: {e}", file=sys.stderr)
        return None


def _mfu(flops_per_call: float | None, calls: int, elapsed: float) -> float | None:
    peak = device_peak_flops()
    if flops_per_call is None or peak is None or elapsed <= 0:
        return None
    return flops_per_call * calls / elapsed / peak


def _emit(*_args):
    if _RESULT:
        print(json.dumps(_RESULT), flush=True)
    os._exit(0)


def _sync(x):
    """Honest barrier: read one element of the output back to the host.
    jax.block_until_ready over the axon relay has been observed to return
    BEFORE the computation finished (chained steps "completing" 30x faster
    than a single step), which silently inflates throughput; a value
    readback cannot lie — the element's bytes must exist."""
    arr = x
    while isinstance(arr, (tuple, list, dict)):
        arr = jax.tree.leaves(arr)[0]
    # index ON DEVICE first so only one element crosses the relay — a full
    # np.asarray would add the bulk-transfer time to the timed region
    return np.asarray(jnp.ravel(arr)[0])


def _record(fps: float, note: str):
    if not _RESULT or fps > _RESULT.get("value", 0):
        _RESULT.update({
            "metric": "streaming_frames_per_sec_per_chip",
            "value": round(fps, 1),
            "unit": "frames/s",
            "vs_baseline": round(fps / 1000.0, 3),
        })
    print(f"[bench] {note}: {fps:.0f} frames/s", file=sys.stderr, flush=True)


def _mode_perframe(cfg, params, mstate, lanes, dt, rng):
    """Mode 1: per-frame recurrent scan (XLA) + 1b frame-scan kernel."""
    from fseend_tpu.serving.runtime import StreamingServer
    from fseend_tpu.models import ls_eend

    block = int(os.environ.get("BENCH_BLOCK", "500"))
    n_rep = int(os.environ.get("BENCH_BLOCKS", "10"))
    # frame_kernel=False EXPLICITLY: the server's shipped default is auto-ON
    # for LS at 128 lanes, and this row exists to keep measuring the
    # XLA-scan baseline the kernel is judged against (mode 1b = the kernel).
    server = StreamingServer(kind="ls", cfg=cfg, params=params,
                             model_state=mstate, n_lanes=lanes,
                             n_slots=cfg.max_nspks, dtype=dt,
                             frame_kernel=False)
    xs = jax.device_put(
        jnp.asarray(rng.standard_normal((lanes, block, cfg.in_size)), dt))
    p, _ = server.process_block(xs)
    _sync(p)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        p, _ = server.process_block(xs)
    _sync(p)
    el1 = time.perf_counter() - t0
    fps1 = lanes * block * n_rep / el1
    _record(fps1, f"per-frame recurrent scan (lanes={lanes}, "
                  f"{fps1 / lanes / 10:.0f}x realtime/lane)")
    # On-device frame-step latency: the sustained rate amortizes dispatch
    # over block*n_rep queued steps, so elapsed/steps IS device time per
    # frame-step (one step advances all `lanes` streams one frame).
    dev_ms = el1 / (block * n_rep) * 1e3
    print(f"[bench] on-device p50 frame-step latency: {dev_ms:.3f} ms "
          f"({lanes} lanes/step)", file=sys.stderr, flush=True)
    _RESULT["ondevice_frame_ms"] = round(dev_ms, 3)

    # --- mode 1b: per-frame semantics, frame-scan Pallas kernels
    # (decoder+encoder states VMEM-resident across the block).
    # Fail-safe: a Mosaic/VMEM rejection must not sink the whole bench.
    if not os.environ.get("BENCH_SKIP_FRAMEKERNEL") and \
            _budget_ok("frame-scan kernel mode", 180):
        # A Mosaic VMEM OOM must not sink the mode: retry without the
        # encoder kernel before giving up.  (Budget-retry rungs were dropped
        # after the 2026-08-18 chip probe: at <=128 lanes pick_groups can
        # never split further — finer lane groups fail real-TPU lowering —
        # so lowering the budget cannot change the compiled config.)
        for enc_k in (True, False):
            try:
              with _hard_deadline(f"frame-kernel(enc={enc_k})"):
                serverk = StreamingServer(kind="ls", cfg=cfg, params=params,
                                          model_state=mstate, n_lanes=lanes,
                                          n_slots=cfg.max_nspks, dtype=dt,
                                          frame_kernel=True,
                                          frame_kernel_enc=enc_k)
                p, _ = serverk.process_block(xs)
                _sync(p)
                t0 = time.perf_counter()
                for _ in range(n_rep):
                    p, _ = serverk.process_block(xs)
                _sync(p)
                el1k = time.perf_counter() - t0
                fps1k = lanes * block * n_rep / el1k
                _record(fps1k,
                        f"per-frame frame-scan kernel (lanes={lanes}, "
                        f"enc_kernel={enc_k}, "
                        f"{fps1k / lanes / 10:.0f}x realtime/lane)")
                devk_ms = el1k / (block * n_rep) * 1e3
                print(f"[bench] on-device frame-step latency "
                      f"[frame-kernel]: {devk_ms:.3f} ms "
                      f"({lanes} lanes/step)", file=sys.stderr, flush=True)
                _RESULT["ondevice_frame_ms_kernel"] = round(devk_ms, 3)
                del serverk
                break
            except Exception as e:  # pragma: no cover - chip-only
                print(f"[bench] frame-scan kernel mode failed "
                      f"(enc_kernel={enc_k}, {type(e).__name__}): "
                      f"{str(e)[:300]}", file=sys.stderr, flush=True)

    # wall p50 of a single un-pipelined dispatch (relay overhead incl.)
    x1 = xs[:, :1]
    p, _ = server.process_block(x1)
    _sync(p)
    lat = []
    for _ in range(30):
        t = time.perf_counter()
        p, _ = server.process_block(x1)
        _sync(p)
        lat.append((time.perf_counter() - t) * 1e3)
    print(f"[bench] p50 single-frame wall latency: "
          f"{np.percentile(lat, 50):.2f} ms "
          f"(relay-dispatch bound; device time above)", file=sys.stderr,
          flush=True)


def _mode_train(cfg, rng):
    """Mode: training step throughput + MFU (production LS, fwd+bwd) —
    XLA first (guarantees mfu_train), then the fused decoder-layer kernel
    (the round-4 deliverable, kernels/dec_train_fusion_pallas.py)."""
    from fseend_tpu.models import ls_eend
    from fseend_tpu.train import optim, trainer

    B = int(os.environ.get("BENCH_TRAIN_B", "16"))
    T = int(os.environ.get("BENCH_TRAIN_T", "500"))
    S = 4
    # defaults from the measured sweep (tools/sweep_train.py, r3):
    # bf16 + retention chunk 125 -> 141.6k f/s vs f32/chunk-500's 108.9k
    # (+30%). γ=1 chunkwise retention is chunk-size-invariant up to the
    # group-norm eps (see kernels/dec_train_fusion_pallas.py docstring),
    # so the train chunk is a near-pure perf knob; bf16 training is
    # validated in tests (bf16 vs f32 loss curves).  The fused-dec variant
    # inherits the same chunk (fused_dec_chunk=None) — identical semantics,
    # so the two variants are directly comparable.
    train_chunk = int(os.environ.get("BENCH_TRAIN_CHUNK", "125"))
    tcfg = dataclasses.replace(cfg, chunk_size=train_chunk)
    task = trainer.TaskConfig(
        model="ls", label_mode="fixed", masked_emb_loss=True,
        compute_dtype=os.environ.get("BENCH_TRAIN_DTYPE", "bf16"))
    tx = optim.build_optimizer("noam", d_model=cfg.n_units,
                               warmup_steps=100_000)
    p32, m32 = ls_eend.init_ls_eend(jax.random.PRNGKey(0), tcfg)
    batch = {
        "feats": jnp.asarray(rng.standard_normal((B, T, cfg.in_size)),
                             jnp.float32),
        "labels": jnp.asarray(
            (rng.uniform(size=(B, T, S)) > 0.7), jnp.float32),
        "lens": jnp.full((B,), T, jnp.int32),
        "n_spk": jnp.full((B,), S, jnp.int32),
    }
    key = jax.random.PRNGKey(1)
    n3 = int(os.environ.get("BENCH_TRAIN_STEPS", "10"))
    # MFU for both variants uses the all-XLA graph's FLOP count (the cost
    # model can't see inside pallas custom calls — same rule as serving).
    flops_xla_tr = None
    best3 = (0.0, None)
    # fused-dec runs its kernels at L=128 regardless of the swept encoder
    # chunk: the 2026-08-19 chip probes showed the kernel at the bench's
    # L=125 fails Mosaic ("infer-vector-layout: unsupported shape cast")
    # and blows the compile helper, while L=128 — the MXU tile — compiles
    # in 284 s and runs at production dims.  gamma=1 chunkwise retention
    # is chunk-size invariant up to the group-norm eps, so the two
    # variants stay comparable (each at its own best operating point).
    fused_L = int(os.environ.get("BENCH_FUSED_DEC_CHUNK", "128"))
    for variant, vcfg in (
            ("xla", tcfg),
            ("fused-dec", dataclasses.replace(tcfg, use_fused_dec=True,
                                              fused_dec_chunk=fused_L))):
        if variant == "fused-dec" and os.environ.get("BENCH_NO_PALLAS"):
            continue
        if variant == "fused-dec" and not _budget_ok("fused-dec train", 240):
            continue
        try:
            # the SIGALRM deadline backstops a stalled remote compile (the
            # fused-dec kernel held the helper >25 min on 2026-08-19): the
            # JSON must print even if the compile never returns.  The
            # fused-dec variant additionally gets a 600 s personal cap so a
            # doomed compile can't starve the modes behind it.
            with _hard_deadline(
                    f"train[{variant}]",
                    max_s=(float(os.environ.get("BENCH_FUSED_DEC_CAP_S",
                                                "600"))
                           if variant != "xla" else None)):
                # fresh leaf copies per variant: the donate=True step
                # deletes the state buffers, and TrainState.create aliases
                # its inputs
                state = trainer.TrainState.create(
                    jax.tree.map(jnp.copy, p32), jax.tree.map(jnp.copy, m32),
                    tx)
                tstep = trainer.make_train_step(task, vcfg, tx, donate=True)
                flops_tr = compiled_flops(tstep, state, batch, key)
                if variant == "xla":
                    flops_xla_tr = flops_tr
                elif flops_xla_tr is not None:
                    flops_tr = flops_xla_tr
                state, met = tstep(state, batch, key)
                _sync(met["tot_loss"])
                t0 = time.perf_counter()
                for _ in range(n3):
                    state, met = tstep(state, batch, key)
                _sync(met["tot_loss"])
                el3 = time.perf_counter() - t0
                del state
        except Exception as e:  # pragma: no cover — chip-only lowering
            print(f"[bench] train variant {variant} failed "
                  f"({type(e).__name__}): {str(e)[:300]}",
                  file=sys.stderr, flush=True)
            continue
        fps3 = B * T * n3 / el3
        mfu3 = _mfu(flops_tr, n3, el3)
        msg = (f"[bench] train step [{variant}] (B={B}, T={T}, "
               f"{task.compute_dtype}, chunk={train_chunk}): "
               f"{fps3:.0f} frames/s, {el3 / n3 * 1e3:.1f} ms/step")
        if mfu3 is not None:
            msg += (f", MFU {100 * mfu3:.2f}% "
                    f"(XLA-counted {flops_tr / 1e12:.3f} TFLOP/step)")
        print(msg, file=sys.stderr, flush=True)
        if fps3 > best3[0]:
            best3 = (fps3, mfu3)
        _RESULT[f"train_frames_per_sec_{variant.replace('-', '_')}"] = \
            round(fps3, 1)
        if best3[1] is not None:
            _RESULT["mfu_train"] = round(best3[1], 5)
        _RESULT["train_frames_per_sec"] = round(best3[0], 1)


def _mode_blockwise(cfg, params, mstate, lanes, dt, rng):
    """Mode: blockwise-recurrent serving (chunkwise-exact; K/10Hz latency),
    XLA vs the fused Pallas carried-state retention kernel -> mfu_serving."""
    from fseend_tpu.models import ls_eend

    # default 128: measured sweep (tools/sweep_serving.py) — K=128 rides
    # the 128x128 MXU tile exactly (403k f/s, 18.2% MFU vs 336k, 15.0%
    # at the reference-protocol K=100; K=256 adds intra-chunk quadratic
    # work, more lanes add working set for no win)
    K = int(os.environ.get("BENCH_BLOCKWISE_K", "128"))
    xsb = jax.device_put(
        jnp.asarray(rng.standard_normal((lanes, K, cfg.in_size)), dt))
    best2 = (0.0, None)  # (fps, mfu) of the fastest blockwise variant
    flops_xla = None  # algorithmic FLOPs from the all-XLA graph: the cost
    # model can't see inside pallas custom calls, so kernel variants
    # under-count; MFU is comparable only at a common FLOP count
    for variant, vcfg in (
            ("xla", cfg),
            ("pallas", dataclasses.replace(cfg, use_pallas=True)),
            # whole-layer fusion (projections + core + finish in one
            # pallas_call — no fusion-barrier round-trips)
            ("fused", dataclasses.replace(cfg, use_fused_ret=True))):
        if variant in ("pallas", "fused") and os.environ.get("BENCH_NO_PALLAS"):
            continue
        if variant != "xla" and not _budget_ok(f"blockwise [{variant}]", 120):
            continue
        st = ls_eend.ls_blockstream_init(vcfg, lanes, vcfg.max_nspks, K, dt)
        step = jax.jit(
            lambda s, x, c=vcfg: ls_eend.ls_blockstream_step(
                params, s, c, mstate, x, c.max_nspks),
            donate_argnums=(0,))
        flops_blk = compiled_flops(step, st, xsb)
        if variant == "xla":
            flops_xla = flops_blk
        elif flops_xla is not None:
            flops_blk = flops_xla
        st, y = step(st, xsb)
        _sync(y)
        n2 = 20
        t0 = time.perf_counter()
        for _ in range(n2):
            st, y = step(st, xsb)
        _sync(y)
        el2 = time.perf_counter() - t0
        fps2 = lanes * K * n2 / el2
        _record(fps2, f"blockwise-recurrent K={K} [{variant}] "
                      f"({fps2 / lanes / 10:.0f}x realtime/lane)")
        m = _mfu(flops_blk, n2, el2)
        if fps2 > best2[0]:
            best2 = (fps2, m)
        if m is not None:
            print(f"[bench] serving MFU [{variant}] (XLA-counted "
                  f"{flops_blk / 1e9:.2f} GFLOP/call): {100 * m:.2f}% of "
                  f"{device_peak_flops() / 1e12:.0f} TFLOP/s",
                  file=sys.stderr, flush=True)
        if best2[1] is not None:
            _RESULT["mfu_serving"] = round(best2[1], 5)


def _mode_fs(cast, dt, rng):
    """Mode: FS-EEND serving (the ICASSP-2024 headline model) — blockwise
    bounded-KV streaming (bit-exact vs the masked batch pass) + the
    per-frame recurrent scan.  Measured every round (VERDICT r3 #3)."""
    from fseend_tpu.models import fs_eend
    from fseend_tpu.serving.runtime import StreamingServer

    fcfg = fs_eend.FSEENDConfig()  # production size
    fparams, fmstate = fs_eend.init_fs_eend(jax.random.PRNGKey(0), fcfg)
    fparams, fmstate = cast(fparams), cast(fmstate)
    f_lanes = int(os.environ.get("BENCH_FS_LANES", "64"))
    cap = int(os.environ.get("BENCH_FS_CAPACITY", "2048"))
    Kf = int(os.environ.get("BENCH_FS_K", "128"))
    xsf = jax.device_put(jnp.asarray(
        rng.standard_normal((f_lanes, Kf, fcfg.in_size)), dt))
    # blockwise: steady state at full caches (mid-fill flatters the
    # masked path less; see tools/bench_fs_serving.py)
    stf = fs_eend.fs_blockstream_init(fcfg, f_lanes, cap, fcfg.max_nspks,
                                      Kf, dt)
    fstep = jax.jit(
        lambda s, x: fs_eend.fs_blockstream_step(
            fparams, s, fcfg, fmstate["bn"], x, fcfg.max_nspks),
        donate_argnums=(0,))
    for _ in range(cap // Kf):
        stf, yf = fstep(stf, xsf)
    _sync(yf)
    nf = 10
    t0 = time.perf_counter()
    for _ in range(nf):
        stf, yf = fstep(stf, xsf)
    _sync(yf)
    elf = time.perf_counter() - t0
    fpsf = f_lanes * Kf * nf / elf
    print(f"[bench] FS blockwise K={Kf} cap={cap} (lanes={f_lanes}, "
          f"{fpsf / f_lanes / 10:.0f}x realtime/lane): {fpsf:.0f} frames/s",
          file=sys.stderr, flush=True)
    _RESULT["fs_blockwise_frames_per_sec"] = round(fpsf, 1)
    del stf, fstep

    if not _budget_ok("FS per-frame scan", 150):
        return
    # per-frame semantics: the prefix-bounded cached-attention step (auto
    # tier scheduling) if available on this backend, else the full-capacity
    # scan — whichever the server picks is what ships, so measure that.
    fserver = StreamingServer(kind="fs", cfg=fcfg, params=fparams,
                              model_state=fmstate, n_lanes=f_lanes,
                              n_slots=fcfg.max_nspks, capacity=cap,
                              dtype=dt)
    blockf = 500
    xsp = jax.device_put(jnp.asarray(
        rng.standard_normal((f_lanes, blockf, fcfg.in_size)), dt))
    p, _ = fserver.process_block(xsp)
    _sync(p)
    fserver.reset_lanes(np.arange(f_lanes))
    nrep = 3  # 3x500 frames < capacity 2048
    t0 = time.perf_counter()
    for _ in range(nrep):
        p, _ = fserver.process_block(xsp)
    _sync(p)
    elp = time.perf_counter() - t0
    fpsp = f_lanes * blockf * nrep / elp
    print(f"[bench] FS per-frame scan (lanes={f_lanes}, "
          f"{fpsp / f_lanes / 10:.0f}x realtime/lane): {fpsp:.0f} frames/s, "
          f"{elp / (blockf * nrep) * 1e3:.3f} ms/frame-step",
          file=sys.stderr, flush=True)
    _RESULT["fs_perframe_frames_per_sec"] = round(fpsp, 1)
    del fserver


def main():
    from fseend_tpu.models import ls_eend

    signal.signal(signal.SIGTERM, _emit)
    signal.signal(signal.SIGINT, _emit)

    print(f"device: {jax.devices()[0]} (budget {_BUDGET_S:.0f}s)",
          file=sys.stderr)
    cfg = ls_eend.LSEENDConfig()  # production size
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    lanes = int(os.environ.get("BENCH_LANES", "128"))
    # serve in bf16 (state updates are dtype-preserving; outputs verified
    # within bf16 tolerance of f32 in tests) — 1.5x on the per-frame path
    dt = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(dt) if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x, t)
    params, mstate = cast(params), cast(mstate)

    def run_mode(label, fn, *a):
        """A mode that stalls (remote-relay compile) or dies must not sink
        the artifact: SIGALRM deadline + catch-all, JSON always prints."""
        try:
            with _hard_deadline(label):
                fn(*a)
        except Exception as e:
            print(f"[bench] mode {label} aborted ({type(e).__name__}): "
                  f"{str(e)[:300]}", file=sys.stderr, flush=True)

    if not os.environ.get("BENCH_NO_SERVE") and \
            not os.environ.get("BENCH_SKIP_PERFRAME"):
        run_mode("perframe", _mode_perframe, cfg, params, mstate, lanes, dt,
                 rng)
        if os.environ.get("BENCH_FAST"):
            print(json.dumps(_RESULT))
            return

    if not os.environ.get("BENCH_NO_TRAIN") and _budget_ok("train modes", 240):
        run_mode("train", _mode_train, cfg, rng)

    if not os.environ.get("BENCH_NO_SERVE") and \
            _budget_ok("blockwise serving", 120):
        run_mode("blockwise", _mode_blockwise, cfg, params, mstate, lanes,
                 dt, rng)

    if not os.environ.get("BENCH_NO_FS") and \
            not os.environ.get("BENCH_NO_SERVE") and \
            _budget_ok("FS serving", 180):
        run_mode("fs", _mode_fs, cast, dt, rng)

    print(f"[bench] total wall: {time.monotonic() - _T0:.0f}s "
          f"of {_BUDGET_S:.0f}s budget", file=sys.stderr, flush=True)
    print(json.dumps(_RESULT))


if __name__ == "__main__":
    main()
