"""Epoch-driven training loop (the pl.Trainer replacement).

Covers the reference trainer surface (FS-EEND/train_dia.py:31-185,
LS-EEND/train_dia_simu.py:43-199): seeding, datasets + deterministic sharded
sampling, Noam/Adam optimizer, per-step scalar logging, per-epoch validation
with DER aggregation, every-epoch checkpointing + best tracking + early
stopping on val DER, resume, init_ckpt warm start, and post-training uniform
checkpoint averaging over an epoch window.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fseend_tpu.data.loader import Prefetcher, batched
from fseend_tpu.data.sampler import ShardedSampler
from fseend_tpu.train import trainer as trainer_lib
from fseend_tpu.utils import checkpoint as ckpt_lib


class MetricsLogger:
    """JSONL + stdout scalar logger (TensorBoardLogger replacement).  The
    run dir layout mirrors the reference: log_dir/version_N with the
    resolved config dumped inside (train_dia.py:103-109)."""

    def __init__(self, log_dir: str, model_name: str):
        base = Path(log_dir) / model_name
        version = 0
        while (base / f"version_{version}").exists():
            version += 1
        self.dir = base / f"version_{version}"
        self.dir.mkdir(parents=True, exist_ok=True)
        self._f = open(self.dir / "metrics.jsonl", "a")

    def log(self, step: int, scalars: dict, prefix: str = ""):
        rec = {"step": step, **{f"{prefix}{k}": _to_float(v)
                                for k, v in scalars.items()}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()


def _to_float(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v


def run_training(
    *,
    task: trainer_lib.TaskConfig,
    model_cfg,
    init_fn,
    train_dataset,
    val_dataset,
    tx,
    logger: MetricsLogger,
    batch_size: int,
    chunk_size: int,
    max_speakers: int,
    input_dim: int,
    max_epochs: int,
    seed: int = 777,
    early_stop_patience: int | None = None,
    val_interval: int = 1,
    init_ckpt: str | None = None,
    resume_from: str | None = None,
    on_the_fly: bool = False,
    mesh=None,
    log_every: int = 100,
    limit_train_batches: int | None = None,
    limit_val_batches: int | None = None,
):
    """Returns (final TrainState, checkpoint dir)."""
    params, mstate = init_fn(jax.random.PRNGKey(seed))
    state = trainer_lib.TrainState.create(params, mstate, tx)
    start_epoch = 0
    if init_ckpt:
        flatp = ckpt_lib.load_pytree(init_ckpt, params)
        state = trainer_lib.TrainState.create(flatp, mstate, tx)
    if resume_from:
        extra = ckpt_lib.load_extra(resume_from)
        tpl = {"params": state.params, "model_state": state.model_state}
        loaded = ckpt_lib.load_pytree(resume_from, tpl)
        state = trainer_lib.TrainState.create(loaded["params"],
                                              loaded["model_state"], tx)
        start_epoch = int(extra.get("epoch", -1)) + 1

    if mesh is not None:
        from fseend_tpu.parallel import mesh as pmesh

        state = trainer_lib.TrainState(
            params=pmesh.shard_params(state.params, mesh),
            model_state=jax.tree.map(
                lambda x: jax.device_put(x, pmesh.replicated(mesh)),
                state.model_state),
            opt_state=state.opt_state, step=state.step)

    train_step = trainer_lib.make_train_step(task, model_cfg, tx, donate=True)
    eval_step = trainer_lib.make_eval_step(task, model_cfg)
    rng = jax.random.PRNGKey(seed)

    sampler = ShardedSampler(len(train_dataset), shuffle=True, seed=seed)
    best = (np.inf, -1)
    for epoch in range(start_epoch, max_epochs):
        sampler.set_epoch(epoch)
        idx_iter = (i if on_the_fly else i[0] for i in sampler.indices())

        def make_iter():
            return batched(train_dataset, idx_iter, batch_size, chunk_size,
                           max_speakers, input_dim)

        t0 = time.time()
        n_steps = 0
        for batch in Prefetcher(make_iter):
            recs = batch.pop("recs")
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = train_step(state, batch, rng)
            n_steps += 1
            if n_steps % log_every == 0:
                logger.log(int(state.step), {
                    "pit_loss": metrics["pit_loss"],
                    "emb_loss": metrics["emb_loss"],
                    "tot_loss": metrics["tot_loss"],
                    "grad_norm": metrics["grad_norm"],
                }, prefix="train/")
            if limit_train_batches and n_steps >= limit_train_batches:
                break
        dt = time.time() - t0

        # ---- validation ----
        val_der = None
        if val_dataset is not None and (epoch + 1) % val_interval == 0:
            vms = []
            vcount = 0
            for batch in batched(val_dataset, range(len(val_dataset)),
                                 batch_size, chunk_size, max_speakers, input_dim,
                                 drop_last=False):
                batch.pop("recs")
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                vms.append(jax.tree.map(np.asarray, eval_step(state, batch)))
                vcount += 1
                if limit_val_batches and vcount >= limit_val_batches:
                    break
            agg = trainer_lib.aggregate_metrics(vms)
            val_der = agg.get("DER", np.inf)
            logger.log(int(state.step), agg, prefix="val/")

        print(f"epoch {epoch}: {n_steps} steps in {dt:.1f}s "
              f"loss={float(metrics['tot_loss']):.4f}"
              + (f" val/DER={val_der:.4f}" if val_der is not None else ""),
              flush=True)

        # ---- checkpoint (every epoch kept, save_top_k=-1 semantics) ----
        ckpt_lib.save_pytree(
            logger.dir / f"ckpt_epoch={epoch}.npz",
            {"params": jax.tree.map(np.asarray, state.params),
             "model_state": jax.tree.map(np.asarray, state.model_state)},
            extra={"epoch": epoch, "step": int(state.step),
                   "val_der": val_der if val_der is not None else np.nan})
        if val_der is not None and val_der < best[0]:
            best = (val_der, epoch)
        if (early_stop_patience is not None and val_der is not None
                and epoch - best[1] >= early_stop_patience):
            print(f"early stop at epoch {epoch} (best {best[0]:.4f} @ {best[1]})")
            break

    return state, logger.dir


def average_epoch_range(ckpt_dir, params_template, start_epoch=None,
                        end_epoch=None):
    """Post-training uniform average (train_dia.py:166-184); averages the
    'params' subtree of epoch checkpoints in [start, end]."""
    paths = ckpt_lib.find_epoch_checkpoints(ckpt_dir, start_epoch, end_epoch)
    if not paths:
        raise FileNotFoundError(f"no epoch checkpoints in {ckpt_dir}")
    tpl = {"params": params_template}
    # model_state is taken from the LAST checkpoint (running stats)
    avg = ckpt_lib.average_checkpoints(paths, tpl)["params"]
    last = ckpt_lib.load_flat(paths[-1])
    return avg, paths
