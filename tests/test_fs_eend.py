"""FS-EEND model tests: shapes, masking, and batch==streaming equivalence
(the reference's own key verification, streaming_infer_dia.py:97)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fseend_tpu.models import fs_eend as M

CFG = M.FSEENDConfig(
    in_size=23, n_units=32, n_heads=4, enc_n_layers=2, dec_n_layers=2,
    enc_dim_feedforward=64, dec_dim_feedforward=64, dropout=0.1,
    conv_delay=3, max_nspks=4,
)


@pytest.fixture(scope="module")
def model():
    params, state = M.init_fs_eend(jax.random.PRNGKey(0), CFG)
    return params, state


def test_forward_shapes(model, rng):
    params, state = model
    B, T = 2, 16
    xs = jnp.asarray(rng.standard_normal((B, T, CFG.in_size)), jnp.float32)
    lens = jnp.array([16, 12])
    out = M.fs_forward(params, state, CFG, xs, lens, n_slots=4, train=False)
    assert out["logits"].shape == (B, T, 4)
    assert out["emb"].shape == (B, T, CFG.n_units)
    assert out["attractors"].shape == (B, T, 4, CFG.n_units)
    # attractors and emb are L2-normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["emb"][0, 0])), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["attractors"][0, 0, 0])), 1.0, atol=1e-5)


def test_causality(model, rng):
    """Changing future input must not change past output beyond conv_delay."""
    params, state = model
    B, T = 1, 20
    xs = rng.standard_normal((B, T, CFG.in_size)).astype(np.float32)
    out1 = M.fs_forward(params, state, CFG, jnp.asarray(xs), jnp.array([T]), 4)
    xs2 = xs.copy()
    xs2[:, 15:] += 10.0
    out2 = M.fs_forward(params, state, CFG, jnp.asarray(xs2), jnp.array([T]), 4)
    # frames < 15 - conv_delay are unaffected (conv has +-delay look-ahead)
    horizon = 15 - CFG.conv_delay
    np.testing.assert_allclose(
        np.asarray(out1["logits"][:, :horizon]),
        np.asarray(out2["logits"][:, :horizon]), atol=1e-5)
    # and some later frame IS affected (sanity that the test can fail)
    assert np.abs(np.asarray(out1["logits"][:, 16:]) -
                  np.asarray(out2["logits"][:, 16:])).max() > 1e-3


def test_streaming_equals_batch(model, rng):
    """Frame-by-frame streaming must reproduce the masked batch pass to 1e-4
    (reference asserts the same, FS-EEND/streaming_infer_dia.py:97)."""
    params, state = model
    B, T = 2, 24
    xs = jnp.asarray(rng.standard_normal((B, T, CFG.in_size)), jnp.float32)
    lens = jnp.full((B,), T)
    batch = M.fs_forward(params, state, CFG, xs, lens, n_slots=4, train=False)

    st = M.fs_stream_init(CFG, B, capacity=T + CFG.conv_delay, n_slots=4)
    logits_s, emb_s = M.fs_stream_scan(params, st, CFG, state["bn"], xs, n_slots=4)
    np.testing.assert_allclose(
        np.asarray(logits_s), np.asarray(batch["logits"]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(emb_s), np.asarray(batch["emb"]), atol=1e-4)


def test_streaming_step_by_step_matches_scan(model, rng):
    """Single-step API (serving path) == fused scan."""
    params, state = model
    B, T = 1, 10
    xs = jnp.asarray(rng.standard_normal((B, T, CFG.in_size)), jnp.float32)
    st = M.fs_stream_init(CFG, B, capacity=T + CFG.conv_delay, n_slots=4)
    outs = []
    step = jax.jit(
        lambda s, x, f: M.fs_stream_step(params, s, CFG, state["bn"], x, 4, flush=f))
    seq = jnp.concatenate(
        [xs, jnp.zeros((B, CFG.conv_delay, CFG.in_size))], axis=1)
    for t in range(T + CFG.conv_delay):
        st, out = step(st, seq[:, t], jnp.asarray(t >= T))
        outs.append(out["logits"])
    manual = jnp.stack(outs[CFG.conv_delay:], axis=1)

    st2 = M.fs_stream_init(CFG, B, capacity=T + CFG.conv_delay, n_slots=4)
    logits_s, _ = M.fs_stream_scan(params, st2, CFG, state["bn"], xs, n_slots=4)
    np.testing.assert_allclose(np.asarray(manual), np.asarray(logits_s), atol=1e-5)


def test_train_mode_runs_with_dropout(model, rng):
    params, state = model
    B, T = 2, 8
    xs = jnp.asarray(rng.standard_normal((B, T, CFG.in_size)), jnp.float32)
    lens = jnp.full((B,), T)
    out = M.fs_forward(params, state, CFG, xs, lens, 4, train=True,
                       rngs=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out["logits"])).all()
    # BN running stats updated in train mode
    assert not np.allclose(np.asarray(out["state"]["bn"]["mean"]),
                           np.asarray(state["bn"]["mean"]))


def test_blockstream_exact_vs_batch(model, rng):
    """FS blockwise streaming == masked batch pass EXACTLY (masked attention
    is evaluation-order invariant; the conv gets its look-ahead from the
    next block's head)."""
    params, state = model
    B, T, K = 2, 20, 5
    xs = jnp.asarray(rng.standard_normal((B, T, CFG.in_size)), jnp.float32)
    batch = M.fs_forward(params, state, CFG, xs, jnp.full((B,), T), 4)
    blk = M.fs_blockstream_run(params, CFG, state["bn"], xs, 4, block=K)
    np.testing.assert_allclose(np.asarray(blk), np.asarray(batch["logits"]),
                               atol=1e-5)
    # non-multiple T: the final block is zero-padded with h_mask, so the
    # look-ahead conv sees the offline zero padding — exact to the last frame
    T2 = 18
    xs2 = xs[:, :T2]
    batch2 = M.fs_forward(params, state, CFG, xs2, jnp.full((B,), T2), 4)
    blk2 = M.fs_blockstream_run(params, CFG, state["bn"], xs2, 4, block=K)
    np.testing.assert_allclose(np.asarray(blk2), np.asarray(batch2["logits"]),
                               atol=1e-5)


def test_framestream_block_exact_vs_frame_scan(model, rng):
    """fs_framestream_block (prefix read once per block) == the per-frame
    fs_stream_step scan, for every output frame and the `valid` gating,
    across warm-up, odd block splits, per-lane clock skew, and the
    conv-drain flush tail."""
    params, state = model
    B, T = 2, 17
    cap = T + CFG.conv_delay + 2
    xs = jnp.asarray(rng.standard_normal((B, T, CFG.in_size)), jnp.float32)
    pad = jnp.zeros((B, CFG.conv_delay, CFG.in_size), jnp.float32)
    seq = jnp.concatenate([xs, pad], axis=1)
    flush = jnp.broadcast_to(
        (jnp.arange(T + CFG.conv_delay) >= T)[None], (B, T + CFG.conv_delay))

    # oracle: per-frame scan
    st0 = M.fs_stream_init(CFG, B, cap, 4)
    logits_ref, _ = M.fs_stream_scan(params, st0, CFG, state["bn"], xs, 4)

    # fast path: uneven block split (5 + 1 + 14), per-lane flush suffix
    st = M.fs_stream_init(CFG, B, cap, 4)
    outs, vals = [], []
    for lo, hi in ((0, 5), (5, 6), (6, T + CFG.conv_delay)):
        st, (lg, vd) = M.fs_framestream_block(
            params, st, CFG, state["bn"], seq[:, lo:hi], 4, flush[:, lo:hi])
        outs.append(lg)
        vals.append(vd)
    logits = jnp.concatenate(outs, axis=1)
    valid = np.asarray(jnp.concatenate(vals, axis=1))
    # valid gating identical to the scan: first conv_delay steps invalid
    assert not valid[:, : CFG.conv_delay].any()
    assert valid[:, CFG.conv_delay:].all()
    # output at step t is frame t - conv_delay (same alignment as the scan)
    np.testing.assert_allclose(np.asarray(logits[:, CFG.conv_delay:]),
                               np.asarray(logits_ref), atol=2e-5)


def test_framestream_per_lane_clock_skew(model, rng):
    """Lanes at different stream phases (continuous batching): lane 1 is
    reset mid-flight and its restarted stream matches a solo pass, while
    lane 0's longer stream is unaffected."""
    params, state = model
    cap = 48
    xa = jnp.asarray(rng.standard_normal((2, 12, CFG.in_size)), jnp.float32)
    xb = jnp.asarray(rng.standard_normal((2, 9, CFG.in_size)), jnp.float32)
    nofl = jnp.zeros((2, 12), bool)

    st = M.fs_stream_init(CFG, 2, cap, 4)
    st, _ = M.fs_framestream_block(params, st, CFG, state["bn"], xa, 4,
                                   nofl)
    # reset lane 1 only (zero state + clock), then feed stream B
    st = jax.tree.map(
        lambda leaf, z: leaf.at[1].set(z[1]) if leaf.ndim else leaf,
        st, M.fs_stream_init(CFG, 2, cap, 4))
    st, (lg, vd) = M.fs_framestream_block(params, st, CFG, state["bn"], xb,
                                          4, nofl[:, :9])

    solo = M.fs_stream_init(CFG, 2, cap, 4)
    solo, (lg_s, vd_s) = M.fs_framestream_block(params, solo, CFG,
                                                state["bn"], xb, 4,
                                                nofl[:, :9])
    np.testing.assert_allclose(np.asarray(lg[1]), np.asarray(lg_s[1]),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(vd[1]), np.asarray(vd_s[1]))
    # lane 0 at clock 12 emits VALID frames for the whole second block
    assert np.asarray(vd)[0].all()


def test_framestream_flash_matches_xla(model, rng):
    """use_flash_attn routes the fast block's cached attention through the
    per-lane online-softmax kernel (interpret mode off-TPU): probs, valid
    and carried caches == the XLA fast block, across warm-up (the
    min_pos/self-position edge where a fully-masked tile precedes the
    first finite score), odd block splits and the flush tail."""
    import dataclasses

    params, state = model
    B, T = 2, 17
    cap = 32
    cfgF = dataclasses.replace(CFG, use_flash_attn=True)
    xs = jnp.asarray(rng.standard_normal((B, T, CFG.in_size)), jnp.float32)
    pad = jnp.zeros((B, CFG.conv_delay, CFG.in_size), jnp.float32)
    seq = jnp.concatenate([xs, pad], axis=1)
    flush = jnp.broadcast_to(
        (jnp.arange(T + CFG.conv_delay) >= T)[None], (B, T + CFG.conv_delay))

    def run(cfg):
        st = M.fs_stream_init(cfg, B, cap, 4)
        outs, vals = [], []
        for lo, hi in ((0, 5), (5, 6), (6, T + CFG.conv_delay)):
            st, (lg, vd) = M.fs_framestream_block(
                params, st, cfg, state["bn"], seq[:, lo:hi], 4,
                flush[:, lo:hi])
            outs.append(lg)
            vals.append(vd)
        return jnp.concatenate(outs, 1), jnp.concatenate(vals, 1), st

    lg_ref, vd_ref, st_ref = run(CFG)
    lg_fl, vd_fl, st_fl = run(cfgF)
    np.testing.assert_array_equal(np.asarray(vd_fl), np.asarray(vd_ref))
    # compare only VALID frames: pre-warm-up outputs are ephemeral garbage
    # in both paths but not bit-matched (different masked-row arithmetic)
    v = np.asarray(vd_ref)
    np.testing.assert_allclose(np.asarray(lg_fl)[v], np.asarray(lg_ref)[v],
                               atol=3e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=3e-5), st_fl, st_ref)
