"""EEND-EDA baseline + FLEX-STB tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fseend_tpu.models import eend_eda as M

CFG = M.EDAConfig(in_size=23, n_units=32, n_heads=4, n_layers=2,
                  dim_feedforward=64, dropout=0.0)


@pytest.fixture(scope="module")
def model():
    return M.init_eend_eda(jax.random.PRNGKey(0), CFG)


def test_lstm_matches_torch(rng):
    D, H, B, T = 8, 12, 2, 10
    p = M.lstm_init(jax.random.PRNGKey(1), D, H)
    xs = rng.standard_normal((B, T, D)).astype(np.float32)
    tl = torch.nn.LSTM(D, H, 1, batch_first=True)
    with torch.no_grad():
        tl.weight_ih_l0.copy_(torch.from_numpy(np.asarray(p["w_ih"]).T.copy()))
        tl.weight_hh_l0.copy_(torch.from_numpy(np.asarray(p["w_hh"]).T.copy()))
        tl.bias_ih_l0.copy_(torch.from_numpy(np.asarray(p["b_ih"]).copy()))
        tl.bias_hh_l0.copy_(torch.from_numpy(np.asarray(p["b_hh"]).copy()))
        ref, (h, c) = tl(torch.from_numpy(xs))
    ys, (hj, cj) = M.lstm_scan(p, jnp.asarray(xs))
    # 5e-5: this environment's remote CPU codegen rounds slightly differently
    # from local builds (fma contraction), observed up to ~1.5e-5
    np.testing.assert_allclose(np.asarray(ys), ref.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(hj), h[0].numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(cj), c[0].numpy(), atol=5e-5)


def test_eda_forward_shapes(model, rng):
    params, _ = model
    B, T, S = 2, 20, 3
    xs = jnp.asarray(rng.standard_normal((B, T, CFG.in_size)), jnp.float32)
    out = M.eda_forward(params, CFG, xs, n_speakers_max=S)
    assert out["logits"].shape == (B, T, S)
    assert out["attractors"].shape == (B, S + 1, CFG.n_units)
    assert out["exist_logits"].shape == (B, S + 1)


def test_eda_test_with_counter(model, rng):
    params, _ = model
    xs = jnp.asarray(rng.standard_normal((1, 20, CFG.in_size)), jnp.float32)
    out = M.eda_test(params, CFG, xs, shuffle_rng=jax.random.PRNGKey(5))
    assert out["logits"].shape == (1, 20, CFG.max_attractors)
    assert out["exist_probs"].shape == (1, CFG.max_attractors)
    assert ((np.asarray(out["exist_probs"]) >= 0)
            & (np.asarray(out["exist_probs"]) <= 1)).all()


def test_eda_training_learns(model, rng):
    """Joint diarization+existence loss decreases on a toy problem."""
    import optax

    from fseend_tpu.train import losses

    params, _ = model
    B, T, S = 4, 16, 2
    labels = (rng.uniform(size=(B, T, S)) > 0.5).astype(np.float32)
    xs = (labels @ rng.standard_normal((S, CFG.in_size)) +
          0.1 * rng.standard_normal((B, T, CFG.in_size))).astype(np.float32)
    xs, labels = jnp.asarray(xs), jnp.asarray(labels)
    lens = jnp.full((B,), T)
    n_spk = jnp.full((B,), S)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def loss_fn(p):
        out = M.eda_forward(p, CFG, xs, n_speakers_max=S)
        pit, perm_labels, _ = losses.batch_pit_loss(out["logits"], labels, lens, n_spk)
        al = losses.attractor_existence_loss(out["exist_logits"], n_spk)
        return pit + CFG.attractor_loss_ratio * al

    step = jax.jit(lambda p, o: _upd(p, o))

    def _upd(p, o):
        l, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    first = None
    for i in range(25):
        params, opt, l = step(params, opt)
        if first is None:
            first = float(l)
    assert float(l) < first * 0.95


def test_flex_stb_runs(model, rng):
    from fseend_tpu.serving.flex_stb import FlexSTB, find_best_perm, update_buffer

    params, _ = model
    stb = FlexSTB(params=params, cfg=CFG, n_speakers=2, buf_size=30,
                  block_size=10)
    feats = rng.standard_normal((45, CFG.in_size)).astype(np.float32)
    out = stb.run(feats)
    assert out.shape == (45, 2)
    assert np.isfinite(out).all() and (out >= 0).all() and (out <= 1).all()


def test_padded_scoring_equals_unpadded(model, rng):
    """The fixed-shape (lens-masked) scorer must equal scoring the true
    length directly — the round-1 zero-padded scorer polluted real frames'
    logits through unmasked attention + the attractor LSTM tail (max |dlogit|
    was ~1.4); tfm_STB.py scores the true-length sequence."""
    params, _ = model
    feats = rng.standard_normal((1, 17, CFG.in_size)).astype(np.float32)
    exact = M.eda_test(params, CFG, jnp.asarray(feats),
                       n_attractors=2)["logits"]
    padded = np.pad(feats, ((0, 0), (0, 23), (0, 0)))
    masked = M.eda_test(params, CFG, jnp.asarray(padded),
                        n_attractors=2,
                        lens=jnp.asarray([17]))["logits"][:, :17]
    np.testing.assert_allclose(np.asarray(masked), np.asarray(exact),
                               atol=2e-5)


def test_flex_stb_buffer_weight_variants(model, rng):
    from fseend_tpu.serving.flex_stb import FlexSTB

    params, _ = model
    feats = rng.standard_normal((45, CFG.in_size)).astype(np.float32)
    outs = {}
    for w in ("v1", "v2", "fifo"):
        stb = FlexSTB(params=params, cfg=CFG, n_speakers=2, buf_size=30,
                      block_size=10, buffer_weights=w)
        outs[w] = stb.run(feats)
        assert outs[w].shape == (45, 2) and np.isfinite(outs[w]).all()
    # first block sees no buffer: identical across variants
    np.testing.assert_allclose(outs["v1"][:10], outs["fifo"][:10], atol=1e-6)


def test_find_best_perm_recovers_shuffle(rng):
    from fseend_tpu.serving.flex_stb import find_best_perm

    y = rng.uniform(size=(50, 3)).astype(np.float32)
    perm = [2, 0, 1]
    y_pred = y[:, perm]
    # best_perm maps pred columns back onto y's columns
    best = find_best_perm(y, y_pred)
    np.testing.assert_array_equal(y_pred[:, best][: , 0], y[:, 0])


def test_update_buffer_prefers_peaky_frames(rng):
    from fseend_tpu.serving.flex_stb import update_buffer

    g = np.random.default_rng(0)
    x = rng.standard_normal((40, 4)).astype(np.float32)
    y = np.full((40, 2), 0.5, np.float32)
    y[:10] = [0.99, 0.01]  # informative frames
    xb, yb = update_buffer(x[:20], x[20:], y[:20], y[20:], buf_size=12, rng=g)
    assert xb.shape == (12, 4) and yb.shape == (12, 2)


def test_split_results_and_kl_v2(rng):
    from fseend_tpu.serving.flex_stb import kl_weights_v2, split_results

    labels = np.zeros((25, 3), np.float32)
    labels[:10, 0] = 1
    labels[5:20, 1] = 1
    preds = rng.uniform(size=(25, 3)).astype(np.float32)
    ls_, ps_, ns_ = split_results(labels, preds, blk_size=10)
    assert ns_[0] == 2 and ls_[0].shape == (10, 2) and ps_[0].shape == (10, 2)
    w = kl_weights_v2(rng.uniform(size=(30, 2)).astype(np.float32))
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-6)
