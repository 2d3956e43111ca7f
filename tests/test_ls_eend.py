"""LS-EEND model tests: shapes, O(1) streaming parity vs recurrent batch,
chunkwise-vs-streaming closeness (the reference's atol=1e-3 check)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fseend_tpu.models import ls_eend as M

CFG = M.LSEENDConfig(
    in_size=23, n_units=32, n_heads=4, enc_n_layers=2, dec_n_layers=2,
    dropout=0.1, chunk_size=8, ff_expansion=2, conv_kernel_size=5,
    dec_dim_feedforward=64, conv_delay=3, max_nspks=4,
)


@pytest.fixture(scope="module")
def model():
    return M.init_ls_eend(jax.random.PRNGKey(0), CFG)


def test_forward_shapes(model, rng):
    params, state = model
    B, T = 2, 16
    xs = jnp.asarray(rng.standard_normal((B, T, CFG.in_size)), jnp.float32)
    lens = jnp.array([16, 12])
    out = M.ls_forward(params, state, CFG, xs, lens, n_slots=4)
    assert out["logits"].shape == (B, T, 4)
    assert out["emb"].shape == (B, T, CFG.n_units)


def test_forward_pads_to_chunk_multiple(model, rng):
    params, state = model
    B, T = 1, 13  # not a multiple of chunk_size=8
    xs = jnp.asarray(rng.standard_normal((B, T, CFG.in_size)), jnp.float32)
    out = M.ls_forward(params, state, CFG, xs, jnp.array([T]), n_slots=4)
    assert out["logits"].shape == (B, T, 4)


def test_streaming_equals_recurrent_batch(model, rng):
    """Streaming scan must match the batch pass in recurrent time_mode
    EXACTLY (this is the reference's forward vs forward_one_step test,
    onl_conformer...py:336-550)."""
    params, state = model
    B, T = 2, 16
    xs = jnp.asarray(rng.standard_normal((B, T, CFG.in_size)), jnp.float32)
    lens = jnp.full((B,), T)
    batch = M.ls_forward(params, state, CFG, xs, lens, 4, time_mode="recurrent")

    st = M.ls_stream_init(CFG, B, n_slots=4)
    logits_s, emb_s = M.ls_stream_scan(params, st, CFG, state, xs, n_slots=4)
    np.testing.assert_allclose(np.asarray(emb_s), np.asarray(batch["emb"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits_s), np.asarray(batch["logits"]),
                               atol=1e-4)


def test_streaming_close_to_chunkwise_batch(model, rng):
    """Chunkwise (training mode) vs streaming: approximately equal — the
    reference accepts atol=1e-3 relative drift (LS streaming_infer_dia.py:157-160)."""
    params, state = model
    B, T = 1, 16
    xs = jnp.asarray(0.1 * rng.standard_normal((B, T, CFG.in_size)), jnp.float32)
    lens = jnp.full((B,), T)
    batch = M.ls_forward(params, state, CFG, xs, lens, 4, time_mode="chunkwise")
    st = M.ls_stream_init(CFG, B, n_slots=4)
    logits_s, _ = M.ls_stream_scan(params, st, CFG, state, xs, n_slots=4)
    np.testing.assert_allclose(np.asarray(logits_s), np.asarray(batch["logits"]),
                               atol=1e-2)


def test_stream_state_is_o1(model):
    """State size must not depend on how many frames were consumed."""
    st = M.ls_stream_init(CFG, batch=1, n_slots=4)
    sizes = sum(x.size for x in jax.tree.leaves(st))
    params, state = model
    x = jnp.zeros((1, CFG.in_size))
    for t in range(5):
        st, _ = M.ls_stream_step(params, st, CFG, state, x, 4)
    assert sum(x.size for x in jax.tree.leaves(st)) == sizes


def test_causality(model, rng):
    params, state = model
    B, T = 1, 16
    xs = rng.standard_normal((B, T, CFG.in_size)).astype(np.float32)
    o1 = M.ls_forward(params, state, CFG, jnp.asarray(xs), jnp.array([T]), 4,
                      time_mode="recurrent")
    xs2 = xs.copy()
    xs2[:, 12:] += 5.0
    o2 = M.ls_forward(params, state, CFG, jnp.asarray(xs2), jnp.array([T]), 4,
                      time_mode="recurrent")
    horizon = 12 - CFG.conv_delay
    np.testing.assert_allclose(np.asarray(o1["logits"][:, :horizon]),
                               np.asarray(o2["logits"][:, :horizon]), atol=1e-5)


def test_train_mode(model, rng):
    params, state = model
    B, T = 2, 16
    xs = jnp.asarray(rng.standard_normal((B, T, CFG.in_size)), jnp.float32)
    out = M.ls_forward(params, state, CFG, xs, jnp.full((B,), T), 4, train=True,
                       rngs=jax.random.PRNGKey(7))
    assert np.isfinite(np.asarray(out["logits"])).all()
    # conformer conv BN stats updated
    assert not np.allclose(
        np.asarray(out["state"]["conv_bn"][0]["mean"]),
        np.asarray(state["conv_bn"][0]["mean"]))


def test_remat_grads_identical(model, rng):
    """jax.checkpoint on conformer blocks: identical grads, less memory."""
    import dataclasses

    params, state = model
    cfg_r = dataclasses.replace(CFG, remat=True)
    xs = jnp.asarray(rng.standard_normal((1, 16, CFG.in_size)), jnp.float32)
    lens = jnp.array([16])

    def loss(p, c):
        return jnp.sum(M.ls_forward(p, state, c, xs, lens, 4)["logits"] ** 2)

    g0 = jax.grad(lambda p: loss(p, CFG))(params)
    g1 = jax.grad(lambda p: loss(p, cfg_r))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_blockstream_exact_vs_batch_chunkwise(model, rng):
    """Blockwise-recurrent serving == batch chunkwise(chunk=block) EXACTLY,
    including non-multiple T (padding frames re-zeroed like the batch path)."""
    import dataclasses

    params, state = model
    B, K = 2, 8
    cfgK = dataclasses.replace(CFG, chunk_size=K, dropout=0.0)
    for T in (24, 21):
        xs = jnp.asarray(rng.standard_normal((B, T, CFG.in_size)), jnp.float32)
        batch = M.ls_forward(params, state, cfgK, xs, jnp.full((B,), T), 4,
                             time_mode="chunkwise")
        blk = M.ls_blockstream_run(params, cfgK, state, xs, 4, block=K)
        np.testing.assert_allclose(np.asarray(blk), np.asarray(batch["logits"]),
                                   atol=1e-6)


def test_blockstream_state_is_o1(model):
    st = M.ls_blockstream_init(CFG, batch=1, n_slots=4, block=8)
    size0 = sum(x.size for x in jax.tree.leaves(st))
    params, state = model
    xs = jnp.zeros((1, 8, CFG.in_size))
    for _ in range(3):
        st, _ = M.ls_blockstream_step(params, st, CFG, state, xs, 4)
    assert sum(x.size for x in jax.tree.leaves(st)) == size0
