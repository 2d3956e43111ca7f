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
import signal
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
    if mesh is not None:
        assert batch_size % mesh.shape["data"] == 0, (
            f"batch_size {batch_size} not divisible by data axis "
            f"{mesh.shape['data']}")
    params, mstate = init_fn(jax.random.PRNGKey(seed))
    state = trainer_lib.TrainState.create(params, mstate, tx)
    start_epoch = 0
    if init_ckpt:
        # Warm start (the reference's init_ckpt finetune chain). Loop-saved
        # checkpoints wrap leaves under "params/" (+"model_state/" except
        # avg_model.npz); bare-leaf trees (cli.convert output) also accepted.
        tpl = {"params": params}
        if ckpt_lib.has_subtree(init_ckpt, "model_state"):
            tpl["model_state"] = mstate
        if ckpt_lib.has_subtree(init_ckpt, "params"):
            loaded = ckpt_lib.load_pytree(init_ckpt, tpl)
        else:
            loaded = {"params": ckpt_lib.load_pytree(init_ckpt, params)}
        state = trainer_lib.TrainState.create(
            loaded["params"], loaded.get("model_state", mstate), tx)
    if resume_from:
        # Full-fidelity resume: params + BN stats + optimizer moments +
        # step (Noam LR position) — matching Lightning's
        # resume_from_checkpoint (FS-EEND/train_dia.py:152). opt_state is
        # absent in pre-round-2 checkpoints; fall back to fresh moments.
        extra = ckpt_lib.load_extra(resume_from)
        tpl = {"params": state.params, "model_state": state.model_state}
        if ckpt_lib.has_subtree(resume_from, "opt_state"):
            tpl["opt_state"] = tx.init(state.params)
        loaded = ckpt_lib.load_pytree(resume_from, tpl)
        state = trainer_lib.TrainState(
            params=loaded["params"], model_state=loaded["model_state"],
            opt_state=loaded.get("opt_state", tx.init(loaded["params"])),
            step=jnp.asarray(int(extra.get("step", 0)), jnp.int32))
        start_epoch = int(extra.get("epoch", -1)) + 1

    pmesh = None
    if mesh is not None:
        # Shard the full TrainState over the mesh (the DDP strategy of
        # FS-EEND/train_dia.py:145-156, plus tensor parallelism):
        # params by the TP rules, optimizer moments co-sharded with their
        # params (jit(tx.init) propagates input shardings to zeros_like
        # outputs), BN stats + step replicated.
        from fseend_tpu.parallel import mesh as pmesh

        sharded_params = pmesh.shard_params(state.params, mesh)
        # compile-only shardings query: executing tx.init here would briefly
        # allocate a full throwaway copy of the Adam moments (~2x params)
        opt_shardings = jax.jit(tx.init).lower(sharded_params).compile() \
                           .output_shardings
        repl = pmesh.replicated(mesh)
        state = trainer_lib.TrainState(
            params=sharded_params,
            model_state=jax.tree.map(
                lambda x: jax.device_put(x, repl), state.model_state),
            opt_state=jax.tree.map(jax.device_put, state.opt_state,
                                   opt_shardings),
            step=jax.device_put(state.step, repl))

    # Preemption safety (beyond the reference, which loses everything since
    # the last epoch): on SIGTERM, finish the in-flight step, save
    # ckpt_preempt.npz and return.  The saved `epoch` is the last COMPLETED
    # one, so --checkpoint_resume replays the interrupted epoch from its
    # start with the preempted params/moments/step (standard semantics; the
    # deterministic sampler replays the same shard order).
    preempt = {"flag": False}

    def _on_term(signum, frame):
        preempt["flag"] = True

    try:
        prev_handler = signal.signal(signal.SIGTERM, _on_term)
    except ValueError:          # not the main thread (e.g. some test runners)
        prev_handler = None

    try:
        return _run_training_body(
            task=task, model_cfg=model_cfg, state=state, tx=tx, logger=logger,
            train_dataset=train_dataset, val_dataset=val_dataset,
            batch_size=batch_size, chunk_size=chunk_size,
            max_speakers=max_speakers, input_dim=input_dim,
            max_epochs=max_epochs, seed=seed, start_epoch=start_epoch,
            early_stop_patience=early_stop_patience, val_interval=val_interval,
            on_the_fly=on_the_fly, mesh=mesh, log_every=log_every,
            limit_train_batches=limit_train_batches,
            limit_val_batches=limit_val_batches, preempt=preempt)
    finally:
        # always restore the caller's handler — including when training
        # raises, so the process isn't left with a handler closing over this
        # call's dead state
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)


def _run_training_body(*, task, model_cfg, state, tx, logger, train_dataset,
                       val_dataset, batch_size, chunk_size, max_speakers,
                       input_dim, max_epochs, seed, start_epoch,
                       early_stop_patience, val_interval, on_the_fly, mesh,
                       log_every, limit_train_batches, limit_val_batches,
                       preempt):
    pmesh = None
    if mesh is not None:
        from fseend_tpu.parallel import mesh as pmesh

    train_step = trainer_lib.make_train_step(task, model_cfg, tx, donate=True)
    eval_step = trainer_lib.make_eval_step(task, model_cfg)
    rng = jax.random.PRNGKey(seed)

    def _save_ckpt(path, epoch, val_der=None):
        ckpt_lib.save_pytree(
            path,
            {"params": jax.tree.map(np.asarray, state.params),
             "model_state": jax.tree.map(np.asarray, state.model_state),
             "opt_state": jax.tree.map(np.asarray, state.opt_state)},
            extra={"epoch": epoch, "step": int(state.step),
                   "val_der": val_der if val_der is not None else np.nan})

    # Each *host* loads its shard of the global batch (single-controller:
    # process_count()==1 -> the whole batch); device-level sharding happens
    # via shard_batch below.
    sampler = ShardedSampler(len(train_dataset),
                             num_replicas=jax.process_count(),
                             rank=jax.process_index(), shuffle=True, seed=seed)
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
            if mesh is not None:
                batch = pmesh.shard_batch(batch, mesh)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = train_step(state, batch, rng)
            n_steps += 1
            if preempt["flag"]:
                _save_ckpt(logger.dir / "ckpt_preempt.npz", epoch - 1)
                print(f"SIGTERM: saved {logger.dir}/ckpt_preempt.npz at "
                      f"step {int(state.step)} (epoch {epoch} will replay "
                      f"on resume)", flush=True)
                return state, logger.dir
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
                if mesh is not None:
                    # val batches can be ragged (drop_last=False) — replicate
                    # rather than shard so any size compiles
                    repl = pmesh.replicated(mesh)
                    batch = {k: jax.device_put(jnp.asarray(v), repl)
                             for k, v in batch.items()}
                else:
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

        # ---- checkpoint (every epoch kept, save_top_k=-1 semantics;
        # opt_state included for Lightning-fidelity resume) ----
        _save_ckpt(logger.dir / f"ckpt_epoch={epoch}.npz", epoch, val_der)
        if val_der is not None and val_der < best[0]:
            best = (val_der, epoch)
        if (early_stop_patience is not None and val_der is not None
                and epoch - best[1] >= early_stop_patience):
            print(f"early stop at epoch {epoch} (best {best[0]:.4f} @ {best[1]})")
            break

    return state, logger.dir


def average_epoch_range(ckpt_dir, params_template, start_epoch=None,
                        end_epoch=None, model_state_template=None):
    """Post-training uniform average (train_dia.py:166-184); averages the
    'params' subtree of epoch checkpoints in [start, end].

    Returns (avg_params, model_state, paths); model_state comes from the
    LAST checkpoint (BN running stats — the reference's averaged Lightning
    state dicts include BN buffers, FS-EEND/utlis/avg_ckpt.py:6-22) and is
    None when no template is given."""
    paths = ckpt_lib.find_epoch_checkpoints(ckpt_dir, start_epoch, end_epoch)
    if not paths:
        raise FileNotFoundError(f"no epoch checkpoints in {ckpt_dir}")
    avg = ckpt_lib.average_checkpoints(paths, {"params": params_template})["params"]
    mstate = None
    if (model_state_template is not None
            and ckpt_lib.has_subtree(paths[-1], "model_state")):
        mstate = ckpt_lib.load_pytree(
            paths[-1], {"model_state": model_state_template})["model_state"]
    return avg, mstate, paths
