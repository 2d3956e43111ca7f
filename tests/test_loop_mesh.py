"""End-to-end multi-chip training THROUGH run_training (the CLI path):
same data, same seed, 4x2 DPxTP mesh vs single device — losses and final
params must match. Covers the reference's `dist_strategy: ddp` launch
(FS-EEND/train_dia.py:145-156) at the loop level, not just the step level.
"""

import json

import jax
import numpy as np

from fseend_tpu.models import fs_eend
from fseend_tpu.parallel import mesh as pmesh
from fseend_tpu.train import loop, optim, trainer as trainer_lib
from tests.conftest import needs_mesh
from tests.test_checkpoint_resume import ToyDataset

CFG = fs_eend.FSEENDConfig(
    in_size=23, n_units=32, n_heads=4, enc_n_layers=1, dec_n_layers=1,
    enc_dim_feedforward=64, dec_dim_feedforward=64, dropout=0.0,
    conv_delay=2, max_nspks=4)
TASK = trainer_lib.TaskConfig(model="fs", label_mode="fixed")


def _train(tmp_path, name, mesh=None, resume_from=None, max_epochs=2,
           opt="noam"):
    ds = ToyDataset()
    # SGD for the equality test: Adam's m/sqrt(v) on near-zero first-step
    # moments amplifies fp reduction-order noise to O(lr) param diffs even
    # when grads agree to 1e-7; SGD keeps param diff ~ lr * grad diff.
    tx = optim.build_optimizer(opt, d_model=CFG.n_units, warmup_steps=20,
                               lr=0.05 if opt == "sgd" else 1.0)
    logger = loop.MetricsLogger(str(tmp_path / name), "toy")
    return loop.run_training(
        task=TASK, model_cfg=CFG,
        init_fn=lambda key: fs_eend.init_fs_eend(key, CFG),
        train_dataset=ds, val_dataset=ds, tx=tx, logger=logger,
        batch_size=8, chunk_size=20, max_speakers=2, input_dim=23,
        max_epochs=max_epochs, seed=3, mesh=mesh, resume_from=resume_from,
        log_every=1)


def _metrics(ckpt_dir):
    lines = (ckpt_dir / "metrics.jsonl").read_text().strip().splitlines()
    return [json.loads(l) for l in lines]


@needs_mesh
def test_run_training_mesh_matches_single_device(tmp_path):
    state0, dir0 = _train(tmp_path, "single", opt="sgd")
    mesh = pmesh.make_mesh(n_data=4, n_model=2)
    with jax.set_mesh(mesh):
        state1, dir1 = _train(tmp_path, "meshed", mesh=mesh, opt="sgd")

    # per-step train losses match
    m0, m1 = _metrics(dir0), _metrics(dir1)
    assert len(m0) == len(m1) > 0
    for a, b in zip(m0, m1):
        for k in a:
            if isinstance(a[k], float) and np.isfinite(a[k]):
                np.testing.assert_allclose(a[k], b[k], rtol=2e-4, atol=1e-6,
                                           err_msg=k)
    # final params match
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state0.params, jax.tree.map(np.asarray, state1.params))
    assert max(jax.tree.leaves(diffs)) < 1e-4
    assert int(state1.step) == int(state0.step)


@needs_mesh
def test_run_training_mesh_resume(tmp_path):
    """Resume composes with the mesh path: loaded opt_state is re-sharded
    onto the moments' param shardings and training continues."""
    mesh = pmesh.make_mesh(n_data=4, n_model=2)
    with jax.set_mesh(mesh):
        _, ckpt_dir = _train(tmp_path, "m_half", mesh=mesh, max_epochs=1)
        state, _ = _train(tmp_path, "m_resumed", mesh=mesh, max_epochs=2,
                          resume_from=str(ckpt_dir / "ckpt_epoch=0.npz"))
    assert int(state.step) == 2  # 1 step/epoch (8 items, batch 8) x 2 epochs
