"""Sequence-parallel ops == single-device ops on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fseend_tpu.ops import nn
from fseend_tpu.ops import retention as R
from fseend_tpu.parallel import mesh as pmesh
from fseend_tpu.parallel import sp


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices (see tests/conftest.needs_mesh)")
    return pmesh.make_mesh(n_data=8, n_model=1)


def test_sp_causal_mha_matches_single_device(mesh, rng):
    D, H, B, T = 32, 4, 2, 32
    p = nn.mha_init(jax.random.PRNGKey(0), D, H)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    ref = nn.mha(p, x, x, x, nn.causal_mask(T)[None, None])
    got = sp.sp_causal_mha(p, x, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_sp_retention_parallel_matches_single_device(mesh, rng):
    cfg = R.RetentionConfig(embed_dim=32, num_heads=4, chunk_size=8)
    p = R.init_retention(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32)), jnp.float32)
    ref = R.retention_parallel(p, x, cfg)
    got = sp.sp_retention_parallel(p, x, cfg, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fs_forward_sp_matches_single_device(mesh, rng):
    """FULL sequence-parallel FS-EEND forward (attention all-gathers +
    conv halo exchange) == single-device fs_forward."""
    from fseend_tpu.models import fs_eend

    cfg = fs_eend.FSEENDConfig(
        in_size=23, n_units=32, n_heads=4, enc_n_layers=2, dec_n_layers=1,
        enc_dim_feedforward=64, dec_dim_feedforward=64, dropout=0.0,
        conv_delay=3, max_nspks=4)
    params, state = fs_eend.init_fs_eend(jax.random.PRNGKey(0), cfg)
    B, T = 2, 64
    xs = jnp.asarray(rng.standard_normal((B, T, cfg.in_size)), jnp.float32)
    ref = fs_eend.fs_forward(params, state, cfg, xs, jnp.full((B,), T), 4)
    got = sp.fs_forward_sp(params, state, cfg, xs, mesh, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref["logits"]),
                               atol=1e-4)


def _fs_train_fixture(rng, T=64, dropout=0.0):
    from fseend_tpu.models import fs_eend

    cfg = fs_eend.FSEENDConfig(
        in_size=23, n_units=32, n_heads=4, enc_n_layers=2, dec_n_layers=1,
        enc_dim_feedforward=64, dec_dim_feedforward=64, dropout=dropout,
        conv_delay=3, max_nspks=4)
    params, state = fs_eend.init_fs_eend(jax.random.PRNGKey(0), cfg)
    B, S = 2, 2
    batch = {
        "feats": jnp.asarray(rng.standard_normal((B, T, cfg.in_size)),
                             jnp.float32),
        "labels": jnp.asarray((rng.uniform(size=(B, T, S)) > 0.6),
                              jnp.float32),
        "lens": jnp.asarray([T, T - 10], jnp.int32),
        "n_spk": jnp.asarray([2, 1], jnp.int32),
    }
    return cfg, params, state, batch


def test_fs_forward_sp_train_matches_single_device(mesh, rng):
    """TRAIN-mode SP forward (psum'd global-batch BN, ragged lens) ==
    fs_forward(train=True): logits, emb, AND the updated BN running stats."""
    from fseend_tpu.models import fs_eend

    cfg, params, state, batch = _fs_train_fixture(rng)
    ref = fs_eend.fs_forward(params, state, cfg, batch["feats"],
                             batch["lens"], 4, train=True)
    got = sp.fs_forward_sp_train(params, state, cfg, batch["feats"],
                                 batch["lens"], mesh, 4, train=True)
    np.testing.assert_allclose(np.asarray(got["logits"]),
                               np.asarray(ref["logits"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["emb"]),
                               np.asarray(ref["emb"]), atol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5),
        got["state"], ref["state"])


def test_fs_train_step_sp_matches_single_device(mesh, rng):
    """The FULL sequence-parallel train chain (label protocol -> SP forward
    -> PIT + emb losses -> grads THROUGH the shard_map) == the stock
    single-device chain at dropout 0: loss and every gradient leaf
    (measured worst leaf: 1.1e-6 relative — pure f32 psum reordering).
    Gradients, not post-Adam params, are the comparison unit: Adam's
    g/(sqrt(v)+eps) is sign-unstable for near-zero-gradient elements, which
    makes post-step params ill-conditioned at any tolerance that would
    still catch real bugs.  One SP optimizer step then runs end to end."""
    import optax

    from fseend_tpu.train import trainer as trainer_lib

    cfg, params, state, batch = _fs_train_fixture(rng)
    task = trainer_lib.TaskConfig(model="fs", label_mode="fixed")
    key = jax.random.PRNGKey(7)

    def fwd_sp(task_, cfg_, p, ms, feats, lens, n_slots, train, rngs):
        return sp.fs_forward_sp_train(p, ms, cfg_, feats, lens, mesh,
                                      n_slots, "data", train=train, rngs=rngs)

    def loss_ref(p):
        return trainer_lib.compute_loss(task, cfg, p, state, batch, key,
                                        train=True)

    def loss_sp(p):
        return trainer_lib.compute_loss(task, cfg, p, state, batch, key,
                                        train=True, forward_fn=fwd_sp)

    (l1, _), g1 = jax.value_and_grad(loss_ref, has_aux=True)(params)
    (l2, _), g2 = jax.value_and_grad(loss_sp, has_aux=True)(params)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    for (path, ours), ref in zip(jax.tree_util.tree_flatten_with_path(g2)[0],
                                 jax.tree.leaves(g1)):
        ours, ref = np.asarray(ours), np.asarray(ref)
        tol = max(1e-5 * float(np.abs(ref).max()), 1e-9)
        assert np.abs(ours - ref).max() <= tol, (
            f"gradient mismatch at {jax.tree_util.keystr(path)}: "
            f"{np.abs(ours - ref).max():.3e} > {tol:.3e}")

    # and the assembled step (adam + BN state threading) runs end to end
    tx = optax.adam(1e-3)
    st = trainer_lib.TrainState.create(params, state, tx)
    step_sp = sp.make_fs_train_step_sp(task, cfg, tx, mesh, donate=False)
    st, m = step_sp(st, batch, key)
    assert np.isfinite(float(m["tot_loss"])) and int(st.step) == 1
    # BN running stats updated identically to the single-device step
    ref_ms = trainer_lib.compute_loss(task, cfg, params, state, batch, key,
                                      train=True)[1][0]
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-6), st.model_state, ref_ms)


def test_fs_train_step_sp_dropout_runs(mesh, rng):
    """Dropout > 0: per-shard masks are valid iid dropout (not bit-equal to
    single device by construction) — the step must run, produce finite
    losses, and be deterministic in the rng."""
    import optax

    from fseend_tpu.train import trainer as trainer_lib

    cfg, params, state, batch = _fs_train_fixture(rng, dropout=0.1)
    task = trainer_lib.TaskConfig(model="fs", label_mode="fixed")
    tx = optax.adam(1e-3)
    step_sp = sp.make_fs_train_step_sp(task, cfg, tx, mesh, donate=False)
    key = jax.random.PRNGKey(3)
    st = trainer_lib.TrainState.create(params, state, tx)
    _, m1 = step_sp(st, batch, key)
    st = trainer_lib.TrainState.create(params, state, tx)
    _, m2 = step_sp(st, batch, key)
    assert np.isfinite(float(m1["tot_loss"]))
    np.testing.assert_allclose(float(m1["tot_loss"]), float(m2["tot_loss"]))


def _ls_train_fixture(rng, T=32, dropout=0.0):
    from fseend_tpu.models import ls_eend

    # chunk_size 4 over T=32 on the 8-device mesh: each shard holds exactly
    # one chunk — the cross-device prefix path is fully exercised
    cfg = ls_eend.LSEENDConfig(
        in_size=23, n_units=32, n_heads=4, enc_n_layers=2, dec_n_layers=1,
        dropout=dropout, chunk_size=4, ff_expansion=2, conv_kernel_size=5,
        dec_dim_feedforward=64, conv_delay=3, max_nspks=4)
    params, state = ls_eend.init_ls_eend(jax.random.PRNGKey(0), cfg)
    B, S = 2, 2
    batch = {
        "feats": jnp.asarray(rng.standard_normal((B, T, cfg.in_size)),
                             jnp.float32),
        "labels": jnp.asarray((rng.uniform(size=(B, T, S)) > 0.6),
                              jnp.float32),
        "lens": jnp.asarray([T, T - 6], jnp.int32),
        "n_spk": jnp.asarray([2, 1], jnp.int32),
    }
    return cfg, params, state, batch


def test_sp_retention_chunkwise_matches_single_device(mesh, rng):
    """γ=1 chunkwise retention with the time axis sharded: the cross-chunk
    carry is a prefix sum, so one kv all_gather replaces the sequential
    chain — outputs == single-device retention_chunkwise."""
    from jax.sharding import PartitionSpec as P

    cfg = R.RetentionConfig(embed_dim=32, num_heads=4, chunk_size=4)
    p = R.init_retention(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.standard_normal((2, 64, 32)), jnp.float32)
    ref = R.retention_chunkwise(p, x, cfg)
    got = jax.shard_map(
        lambda xl: sp._sp_retention_chunkwise(p, xl, cfg, "data"),
        mesh=mesh, in_specs=P(None, "data", None),
        out_specs=P(None, "data", None))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ls_forward_sp_train_matches_single_device(mesh, rng):
    """TRAIN-mode sequence-parallel LS forward (retention prefix carry +
    conv halos + psum'd conv-module BatchNorm) == ls_forward(train=True):
    logits, emb, AND the updated BN running stats."""
    from fseend_tpu.models import ls_eend

    cfg, params, state, batch = _ls_train_fixture(rng)
    ref = ls_eend.ls_forward(params, state, cfg, batch["feats"],
                             batch["lens"], 4, train=True)
    got = sp.ls_forward_sp_train(params, state, cfg, batch["feats"],
                                 batch["lens"], mesh, 4, train=True)
    np.testing.assert_allclose(np.asarray(got["logits"]),
                               np.asarray(ref["logits"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got["emb"]),
                               np.asarray(ref["emb"]), atol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5),
        got["state"], ref["state"])


def test_ls_train_step_sp_matches_single_device(mesh, rng):
    """The FULL sequence-parallel LS train chain == the stock single-device
    chain at dropout 0: loss and every gradient leaf (grads THROUGH the
    shard_map — all_gather transposes to psum_scatter, halos to reverse
    ppermutes).  Then one assembled SP optimizer step runs end to end."""
    import optax

    from fseend_tpu.train import trainer as trainer_lib

    cfg, params, state, batch = _ls_train_fixture(rng)
    task = trainer_lib.TaskConfig(model="ls", label_mode="fixed",
                                  masked_emb_loss=True)
    key = jax.random.PRNGKey(7)

    def fwd_sp(task_, cfg_, p, ms, feats, lens, n_slots, train, rngs):
        return sp.ls_forward_sp_train(p, ms, cfg_, feats, lens, mesh,
                                      n_slots, "data", train=train, rngs=rngs)

    def loss_ref(p):
        return trainer_lib.compute_loss(task, cfg, p, state, batch, key,
                                        train=True)

    def loss_sp(p):
        return trainer_lib.compute_loss(task, cfg, p, state, batch, key,
                                        train=True, forward_fn=fwd_sp)

    (l1, _), g1 = jax.value_and_grad(loss_ref, has_aux=True)(params)
    (l2, _), g2 = jax.value_and_grad(loss_sp, has_aux=True)(params)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    for (path, ours), ref in zip(jax.tree_util.tree_flatten_with_path(g2)[0],
                                 jax.tree.leaves(g1)):
        ours, ref = np.asarray(ours), np.asarray(ref)
        tol = max(1e-5 * float(np.abs(ref).max()), 1e-9)
        assert np.abs(ours - ref).max() <= tol, (
            f"gradient mismatch at {jax.tree_util.keystr(path)}: "
            f"{np.abs(ours - ref).max():.3e} > {tol:.3e}")

    tx = optax.adam(1e-3)
    st = trainer_lib.TrainState.create(params, state, tx)
    step_sp = sp.make_ls_train_step_sp(task, cfg, tx, mesh, donate=False)
    st, m = step_sp(st, batch, key)
    assert np.isfinite(float(m["tot_loss"])) and int(st.step) == 1
    ref_ms = trainer_lib.compute_loss(task, cfg, params, state, batch, key,
                                      train=True)[1][0]
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-6), st.model_state, ref_ms)


def test_ls_train_step_sp_dropout_runs(mesh, rng):
    """Dropout > 0 on the LS SP step: per-shard iid masks — the step must
    run, produce finite losses, and be rng-deterministic."""
    import optax

    from fseend_tpu.train import trainer as trainer_lib

    cfg, params, state, batch = _ls_train_fixture(rng, dropout=0.1)
    task = trainer_lib.TaskConfig(model="ls", label_mode="fixed",
                                  masked_emb_loss=True)
    tx = optax.adam(1e-3)
    step_sp = sp.make_ls_train_step_sp(task, cfg, tx, mesh, donate=False)
    key = jax.random.PRNGKey(3)
    st = trainer_lib.TrainState.create(params, state, tx)
    _, m1 = step_sp(st, batch, key)
    st = trainer_lib.TrainState.create(params, state, tx)
    _, m2 = step_sp(st, batch, key)
    assert np.isfinite(float(m1["tot_loss"]))
    np.testing.assert_allclose(float(m1["tot_loss"]), float(m2["tot_loss"]))
