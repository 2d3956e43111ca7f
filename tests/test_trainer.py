"""Train-step tests: loss decreases, determinism, and multi-chip sharding
(8-device virtual CPU mesh) with DP/TP equivalence to single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fseend_tpu.models import fs_eend, ls_eend
from fseend_tpu.parallel import mesh as pmesh
from fseend_tpu.train import optim, trainer

FS_CFG = fs_eend.FSEENDConfig(
    in_size=23, n_units=32, n_heads=4, enc_n_layers=2, dec_n_layers=1,
    enc_dim_feedforward=64, dec_dim_feedforward=64, dropout=0.0, conv_delay=3,
    max_nspks=4,
)


def make_batch(rng, B=8, T=16, S=2):
    labels = (rng.uniform(size=(B, T, S)) > 0.6).astype(np.float32)
    # features correlated with labels so the model can learn something
    feats = (labels.sum(-1, keepdims=True) + 0.3 * rng.standard_normal((B, T, 23))).astype(np.float32)
    return {
        "feats": jnp.asarray(feats),
        "labels": jnp.asarray(labels),
        "lens": jnp.full((B,), T, jnp.int32),
        "n_spk": jnp.full((B,), S, jnp.int32),
    }


def test_train_step_decreases_loss(rng):
    params, mstate = fs_eend.init_fs_eend(jax.random.PRNGKey(0), FS_CFG)
    task = trainer.TaskConfig(model="fs", label_mode="fixed")
    tx = optim.build_optimizer("adam", lr=1e-3, grad_clip=5.0)
    state = trainer.TrainState.create(params, mstate, tx)
    step = trainer.make_train_step(task, FS_CFG, tx, donate=False)
    batch = make_batch(rng)
    key = jax.random.PRNGKey(1)
    first = None
    for i in range(30):
        state, metrics = step(state, batch, key)
        if first is None:
            first = float(metrics["tot_loss"])
    assert float(metrics["tot_loss"]) < first * 0.9
    assert int(state.step) == 30
    assert np.isfinite(float(metrics["grad_norm"]))


def test_spk_pit_mode_runs(rng):
    params, mstate = fs_eend.init_fs_eend(jax.random.PRNGKey(0), FS_CFG)
    task = trainer.TaskConfig(model="fs", label_mode="spk_pit")
    tx = optim.build_optimizer("adam", lr=1e-4)
    state = trainer.TrainState.create(params, mstate, tx)
    step = trainer.make_train_step(task, FS_CFG, tx, donate=False)
    state, metrics = step(state, make_batch(rng), jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["tot_loss"]))


def test_hungarian_pit_mode_runs(rng):
    params, mstate = fs_eend.init_fs_eend(jax.random.PRNGKey(0), FS_CFG)
    task = trainer.TaskConfig(model="fs", label_mode="spk_pit_hungarian")
    tx = optim.build_optimizer("adam", lr=1e-4)
    state = trainer.TrainState.create(params, mstate, tx)
    step = trainer.make_train_step(task, FS_CFG, tx, donate=False)
    state, metrics = step(state, make_batch(rng), jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["tot_loss"]))


def test_bf16_mixed_precision_training(rng):
    """compute_dtype=bf16: forward/backward in bf16 with f32 master params
    and f32 moments — loss decreases, params stay f32, and the first-step
    gradient direction agrees with f32 compute."""
    params, mstate = fs_eend.init_fs_eend(jax.random.PRNGKey(0), FS_CFG)
    tx = optim.build_optimizer("adam", lr=1e-3, grad_clip=5.0)
    batch = make_batch(rng)
    key = jax.random.PRNGKey(1)

    task16 = trainer.TaskConfig(model="fs", label_mode="fixed",
                                compute_dtype="bf16")
    task32 = trainer.TaskConfig(model="fs", label_mode="fixed")
    g16 = jax.grad(lambda p: trainer.compute_loss(
        task16, FS_CFG, p, mstate, batch, key, train=True)[0])(params)
    g32 = jax.grad(lambda p: trainer.compute_loss(
        task32, FS_CFG, p, mstate, batch, key, train=True)[0])(params)
    assert all(g.dtype == jnp.float32 for g in jax.tree.leaves(g16))
    # cosine similarity of the flattened grads: bf16 noise, same direction
    f16 = jnp.concatenate([g.ravel() for g in jax.tree.leaves(g16)])
    f32 = jnp.concatenate([g.ravel() for g in jax.tree.leaves(g32)])
    cos = float(jnp.vdot(f16, f32) /
                (jnp.linalg.norm(f16) * jnp.linalg.norm(f32)))
    assert cos > 0.98, cos

    state = trainer.TrainState.create(params, mstate, tx)
    step = trainer.make_train_step(task16, FS_CFG, tx, donate=False)
    first = None
    for _ in range(30):
        state, metrics = step(state, batch, key)
        if first is None:
            first = float(metrics["tot_loss"])
    assert float(metrics["tot_loss"]) < first * 0.9
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(state.params))


def test_noam_schedule_shape():
    sched = optim.noam_schedule(256, 1000, 1.0)
    lrs = [float(sched(jnp.asarray(s))) for s in [0, 10, 999, 5000]]
    assert lrs[0] < lrs[1] < lrs[2]  # warmup increasing
    assert lrs[3] < lrs[2]  # decay after warmup


from tests.conftest import needs_mesh


@needs_mesh
def test_multichip_dp_tp_matches_single_device(rng):
    """The full train step on a (4 data, 2 model) mesh must produce the same
    loss and parameters as single-device execution."""
    params, mstate = fs_eend.init_fs_eend(jax.random.PRNGKey(0), FS_CFG)
    task = trainer.TaskConfig(model="fs", label_mode="fixed")
    tx = optim.build_optimizer("noam", d_model=32, warmup_steps=100)
    batch = make_batch(rng)
    key = jax.random.PRNGKey(3)

    # single device
    s0 = trainer.TrainState.create(params, mstate, tx)
    step0 = trainer.make_train_step(task, FS_CFG, tx, donate=False)
    s0, m0 = step0(s0, batch, key)

    # 4x2 mesh
    mesh = pmesh.make_mesh(n_data=4, n_model=2)
    with jax.set_mesh(mesh):
        sp = pmesh.shard_params(params, mesh, tensor_parallel=True)
        sstate = trainer.TrainState.create(sp, jax.tree.map(
            lambda x: jax.device_put(x, pmesh.replicated(mesh)), mstate), tx)
        sbatch = pmesh.shard_batch(batch, mesh)
        step1 = trainer.make_train_step(task, FS_CFG, tx, donate=False)
        s1, m1 = step1(sstate, sbatch, key)

    np.testing.assert_allclose(float(m0["tot_loss"]), float(m1["tot_loss"]),
                               rtol=1e-5)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - jnp.asarray(b)).max()),
                     s0.params, jax.tree.map(np.asarray, s1.params))
    assert max(jax.tree.leaves(d)) < 1e-4


def test_ls_train_step(rng):
    cfg = ls_eend.LSEENDConfig(
        in_size=23, n_units=32, n_heads=4, enc_n_layers=1, dec_n_layers=1,
        dropout=0.0, chunk_size=8, ff_expansion=2, conv_kernel_size=5,
        dec_dim_feedforward=64, conv_delay=3, max_nspks=4)
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), cfg)
    task = trainer.TaskConfig(model="ls", label_mode="fixed", masked_emb_loss=True)
    tx = optim.build_optimizer("adam", lr=1e-3)
    state = trainer.TrainState.create(params, mstate, tx)
    step = trainer.make_train_step(task, cfg, tx, donate=False)
    batch = make_batch(rng, B=4, T=16)
    first = None
    for i in range(10):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        if first is None:
            first = float(metrics["tot_loss"])
    assert float(metrics["tot_loss"]) < first


def test_aggregate_metrics():
    m = [{"pit_loss": 1.0, "speaker_scored": 10, "diarization_error": 2},
         {"pit_loss": 3.0, "speaker_scored": 30, "diarization_error": 2}]
    agg = trainer.aggregate_metrics(m)
    assert agg["pit_loss"] == 2.0
    assert agg["speaker_scored"] == 40
    np.testing.assert_allclose(agg["DER"], 0.1)


@needs_mesh
def test_multichip_ls_tp_matches_single_device(rng):
    """LS-EEND (retention + conformer) under DPxTP == single-device: the
    tensor-parallel sharding rules must respect retention's per-head
    group-norm boundaries."""
    cfg = ls_eend.LSEENDConfig(
        in_size=23, n_units=32, n_heads=4, enc_n_layers=1, dec_n_layers=1,
        dropout=0.0, chunk_size=8, ff_expansion=2, conv_kernel_size=5,
        dec_dim_feedforward=64, conv_delay=3, max_nspks=4)
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), cfg)
    task = trainer.TaskConfig(model="ls", label_mode="fixed", masked_emb_loss=True)
    tx = optim.build_optimizer("adam", lr=1e-3)
    batch = make_batch(rng, B=8, T=16)
    key = jax.random.PRNGKey(3)

    s0 = trainer.TrainState.create(params, mstate, tx)
    step0 = trainer.make_train_step(task, cfg, tx, donate=False)
    s0, m0 = step0(s0, batch, key)

    mesh = pmesh.make_mesh(n_data=4, n_model=2)
    with jax.set_mesh(mesh):
        sp = pmesh.shard_params(params, mesh, tensor_parallel=True)
        s1 = trainer.TrainState.create(sp, jax.tree.map(
            lambda x: jax.device_put(x, pmesh.replicated(mesh)), mstate), tx)
        step1 = trainer.make_train_step(task, cfg, tx, donate=False)
        s1, m1 = step1(s1, pmesh.shard_batch(batch, mesh), key)
    np.testing.assert_allclose(float(m0["tot_loss"]), float(m1["tot_loss"]),
                               rtol=1e-5)
