"""Parity: fused per-frame-streaming block (Pallas decoder + encoder
frame-scan kernels, interpret mode on CPU) vs scanning `ls_stream_step`
frame by frame — the exact semantics StreamingServer._block_impl serves.

Covers per-lane flush gating, per-lane clocks straddling conv_delay
(valid-gated decoder state carry), multi-block state carry (non-zero
entry scale -> the kernel's unnormalize/renormalize boundary), and
invalid-lane logits (computed from the ephemeral updated state)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fseend_tpu.models import ls_eend

CFG = ls_eend.LSEENDConfig(
    in_size=20, n_units=64, n_heads=4, enc_n_layers=2, dec_n_layers=2,
    conv_kernel_size=4, dec_dim_feedforward=48, conv_delay=2, max_nspks=3,
    dropout=0.0)
B, T, C = 4, 12, 3


def _reference_block(params, state, mstate, xs, flush, n_slots):
    def body(carry, inp):
        x_t, fl = inp
        new_state, out = ls_eend.ls_stream_step(params, carry, CFG, mstate,
                                                x_t, n_slots, flush=fl)
        return new_state, (out["logits"], out["valid"])

    return jax.lax.scan(body, state, (xs.swapaxes(0, 1), flush))


@pytest.fixture(scope="module")
def setup():
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(3), CFG)
    rng = np.random.default_rng(7)
    xs = [jnp.asarray(rng.standard_normal((B, T, CFG.in_size)), jnp.float32)
          for _ in range(2)]
    return params, mstate, xs


def _flush():
    # lanes flush at different frames (lane 0 drains early, lane 3 never)
    fl = np.zeros((T, B), bool)
    fl[8:, 0] = True
    fl[10:, 1] = True
    return jnp.asarray(fl)


@pytest.mark.parametrize("enc_kernel", [False, True])
def test_block_fused_matches_stepwise_scan(setup, enc_kernel):
    params, mstate, xs = setup
    state0 = ls_eend.ls_stream_init(CFG, B, C)
    # stagger the per-lane clocks so `valid` flips mid-block on some lanes
    state0 = dict(state0, t=jnp.asarray([0, 1, CFG.conv_delay, 5], jnp.int32))
    flush = _flush()

    ref_state, (ref_logits, ref_valid) = _reference_block(
        params, state0, mstate, xs[0], flush, C)
    state0b = dict(state0, t=jnp.asarray([0, 1, CFG.conv_delay, 5], jnp.int32))
    new_state, (logits, valid) = ls_eend.ls_stream_block_fused(
        params, state0b, CFG, mstate, xs[0], flush, C, interpret=True,
        enc_kernel=enc_kernel)

    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref_valid))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-4)
    for got, want in zip(jax.tree.leaves(new_state), jax.tree.leaves(ref_state)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)


def test_block_fused_lane_groups(setup, monkeypatch):
    """Forced maximal lane-grouping (grid=(G,T)); parity must hold with
    per-group state slices.  (Real-TPU pick_groups only ever selects
    128-aligned splits — the 2026-08-18 chip probe showed finer ones fail
    Mosaic lowering — so the grouped path is forced explicitly here and
    exercised in interpret mode.)"""
    monkeypatch.setenv("FSEEND_FRAMESCAN_FORCE_GROUPS", str(B))
    params, mstate, xs = setup
    state0 = ls_eend.ls_stream_init(CFG, B, C)
    flush = _flush()
    ref_state, (ref_logits, _) = _reference_block(
        params, state0, mstate, xs[0], flush, C)
    state0b = ls_eend.ls_stream_init(CFG, B, C)
    new_state, (logits, _) = ls_eend.ls_stream_block_fused(
        params, state0b, CFG, mstate, xs[0], flush, C, interpret=True)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-4)
    for got, want in zip(jax.tree.leaves(new_state), jax.tree.leaves(ref_state)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)


def test_bf16_drift_no_worse_than_xla_scan(setup):
    """bf16 serving: the fused kernels' drift from the f32 oracle stays in
    the same class as the XLA per-frame scan's bf16 drift (the kernels carry
    the unnormalized-KV form; this pins that it doesn't degrade numerics)."""
    params, mstate, xs = setup
    flush = jnp.zeros((T, B), bool)

    state = ls_eend.ls_stream_init(CFG, B, C)
    _, (oracle, _) = _reference_block(params, state, mstate, xs[0], flush, C)

    dt = jnp.bfloat16
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(dt) if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x, t)
    params_h, mstate_h = cast(params), cast(mstate)
    xs_h = xs[0].astype(dt)

    st_x = ls_eend.ls_stream_init(CFG, B, C, dt)
    _, (lx, _) = _reference_block(params_h, st_x, mstate_h, xs_h, flush, C)
    st_f = ls_eend.ls_stream_init(CFG, B, C, dt)
    _, (lf, _) = ls_eend.ls_stream_block_fused(
        params_h, st_f, CFG, mstate_h, xs_h, flush, C, interpret=True)

    err_xla = float(jnp.max(jnp.abs(lx - oracle)))
    err_fused = float(jnp.max(jnp.abs(lf - oracle)))
    assert err_fused <= 3.0 * err_xla + 1e-3, (err_fused, err_xla)


def test_stream_scan_fused_matches_scan(setup):
    """Whole-clip helper: conv-delay alignment identical to ls_stream_scan."""
    params, mstate, xs = setup
    st = ls_eend.ls_stream_init(CFG, B, C)
    ref, _ = ls_eend.ls_stream_scan(params, st, CFG, mstate, xs[0], C)
    st2 = ls_eend.ls_stream_init(CFG, B, C)
    got = ls_eend.ls_stream_scan_fused(params, st2, CFG, mstate, xs[0], C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_streaming_server_frame_kernel_matches(setup):
    """StreamingServer(frame_kernel=True) serves identical probs/valid to the
    stepwise server (kernels auto-select interpret mode off-TPU)."""
    from fseend_tpu.serving.runtime import StreamingServer

    params, mstate, xs = setup
    mk = lambda fk: StreamingServer(kind="ls", cfg=CFG, params=params,
                                    model_state=mstate, n_lanes=B, n_slots=C,
                                    frame_kernel=fk)
    sref, sfus = mk(False), mk(True)
    for blk in xs:
        p0, v0 = sref.process_block(blk)
        p1, v1 = sfus.process_block(blk)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=2e-4)
    # lane reset reproduces a fresh stream through the fused path too
    sfus.reset_lanes([1])
    sref.reset_lanes([1])
    p0, _ = sref.process_block(xs[0])
    p1, _ = sfus.process_block(xs[0])
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=2e-4)


def test_continuous_batcher_over_frame_kernel_server(setup):
    """The production scheduler (ContinuousBatcher: arrivals mid-flight,
    lane reuse, per-lane flush) composes with the fused frame-scan server —
    results match the stepwise-scan server for every multiplexed stream."""
    from fseend_tpu.serving.runtime import StreamingServer
    from fseend_tpu.serving.scheduler import ContinuousBatcher

    params, mstate, _ = setup
    rng = np.random.default_rng(11)
    streams = {f"s{i}": rng.standard_normal((t, CFG.in_size))
               .astype(np.float32) for i, t in enumerate([7, 15, 4, 11])}

    def run(fk):
        srv = StreamingServer(kind="ls", cfg=CFG, params=params,
                              model_state=mstate, n_lanes=2, n_slots=C,
                              frame_kernel=fk)
        cb = ContinuousBatcher(srv, block=6)
        for sid, feats in streams.items():
            cb.submit(sid, feats)
        return cb.run()

    ref, got = run(False), run(True)
    assert set(got) == set(ref)
    for sid in streams:
        np.testing.assert_allclose(got[sid], ref[sid], atol=2e-4)


@pytest.mark.parametrize("enc_kernel", [False, True])
def test_block_fused_second_block_carries_state(setup, enc_kernel):
    """Second consecutive block: entry decoder scale > 0 exercises the
    kernel's state un/re-normalization boundary."""
    params, mstate, xs = setup
    flush = jnp.zeros((T, B), bool)

    state = ls_eend.ls_stream_init(CFG, B, C)
    state, _ = _reference_block(params, state, mstate, xs[0], flush, C)
    ref_state, (ref_logits, _) = _reference_block(
        params, state, mstate, xs[1], flush, C)

    state_f = ls_eend.ls_stream_init(CFG, B, C)
    state_f, _ = ls_eend.ls_stream_block_fused(
        params, state_f, CFG, mstate, xs[0], flush, C, interpret=True,
        enc_kernel=enc_kernel)
    new_state, (logits, _) = ls_eend.ls_stream_block_fused(
        params, state_f, CFG, mstate, xs[1], flush, C, interpret=True,
        enc_kernel=enc_kernel)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=5e-4)
    for got, want in zip(jax.tree.leaves(new_state), jax.tree.leaves(ref_state)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4)
