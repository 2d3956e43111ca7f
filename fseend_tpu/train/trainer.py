"""The pjit training/eval step factory — the TPU-native replacement for the
reference's PyTorch-Lightning task modules
(FS-EEND/train/oln_tfm_enc_dec.py:18-156, oln_tfm_enc_dec_spk_pit.py,
LS-EEND/train/oln_tfm_enc_dec_on_the_fly.py).

One train step = label protocol -> model forward -> (PIT or fixed-order) BCE
+ emb-consistency loss -> grads -> optimizer, compiled once over the device
mesh.  Gradient allreduce over the "data" axis and tensor-parallel
collectives over "model" are inserted by XLA from the shardings — no
explicit communication code (SURVEY.md §5.8).

Batches are fixed-shape dicts:
  feats  (B, T, F)   spliced-logmel features
  labels (B, T, S)   0/1 speaker activity (S = max_speakers)
  lens   (B,)        valid frame counts
  n_spk  (B,)        true speaker counts
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from fseend_tpu.models import fs_eend, ls_eend
from fseend_tpu.train import labels as labels_lib
from fseend_tpu.train import losses


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    model_state: Any           # BN running stats etc.
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, model_state, tx):
        return cls(params=params, model_state=model_state,
                   opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    """Which model family + which label/loss protocol.

    label_mode:
      "fixed"   — first-appearance ordered labels + standard BCE (F17/L12)
      "spk_pit" — rolled-PIT over real-speaker columns, silence/none pinned
                  (F18, the CALLHOME finetune protocol)
      "spk_pit_hungarian" — Hungarian assignment over real speakers (L12's
                  pit_loss_multispk path, for S too large to enumerate)
    """
    model: str = "fs"                  # "fs" | "ls"
    label_mode: str = "fixed"
    label_delay: int = 0
    consis_weight: float = 1.0
    masked_emb_loss: bool = False      # LS Σlen² normalization
    use_mask_loss: bool = False        # standard_mask_loss instead of BCE
    compute_dtype: str = "f32"         # "f32" | "bf16" mixed precision:
    # bf16 casts params+feats for fwd/bwd (MXU-native), keeps f32 master
    # params and f32 optimizer moments (grads land f32 through the cast)


def _forward(task: TaskConfig, cfg, params, model_state, feats, lens, n_slots,
             train, rngs):
    if task.model == "fs":
        return fs_eend.fs_forward(params, model_state, cfg, feats, lens, n_slots,
                                  train=train, rngs=rngs)
    return ls_eend.ls_forward(params, model_state, cfg, feats, lens, n_slots,
                              train=train, rngs=rngs)


def _cast_bf16(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def compute_loss(task: TaskConfig, cfg, params, model_state, batch, rng, *,
                 train: bool, forward_fn=None):
    """Returns (loss, aux) with aux = (new_model_state, metrics).

    `forward_fn` (same signature as `_forward`) swaps the model pass while
    keeping the whole label-protocol/loss/metrics chain — used by the
    sequence-parallel train step (parallel/sp.py), whose forward is a
    shard_map over the time axis."""
    if task.compute_dtype == "bf16":
        # mixed precision: the cast is linear, so grads flow back to the
        # f32 master params; losses below accumulate in f32
        params = _cast_bf16(params)
        batch = dict(batch, feats=_cast_bf16(batch["feats"]))
    feats, labels, lens, n_spk = (batch["feats"], batch["labels"], batch["lens"],
                                  batch["n_spk"])
    B, T, S = labels.shape
    if task.model == "eda":
        return _compute_loss_eda(task, cfg, params, model_state, batch, rng,
                                 train=train)
    n_slots = S + 2
    slot_labels, slot_mask = labels_lib.prepare_labels(labels, lens, n_spk)

    out = (forward_fn or _forward)(task, cfg, params, model_state, feats,
                                   lens, n_slots, train, rng)
    logits = out["logits"].astype(jnp.float32)  # losses accumulate in f32

    if task.label_mode == "fixed":
        tgt = slot_labels
    elif task.label_mode == "spk_pit":
        sil, spk, none = labels_lib.pin_silence_none(slot_labels)
        spk_logits = logits[..., 1:-1]
        _, spk_perm, _ = losses.batch_pit_loss(
            jax.lax.stop_gradient(spk_logits), spk, lens, n_spk,
            label_delay=task.label_delay)
        tgt = jnp.concatenate([sil, spk_perm, none], axis=-1)
    elif task.label_mode == "spk_pit_hungarian":
        sil, spk, none = labels_lib.pin_silence_none(slot_labels)
        spk_perm, _ = losses.hungarian_pit_permute(
            logits[..., 1:-1], spk, lens, n_spk)
        tgt = jnp.concatenate([sil, spk_perm, none], axis=-1)
    else:
        raise ValueError(task.label_mode)

    loss_fn = losses.standard_mask_loss if task.use_mask_loss else losses.standard_bce_loss
    pit_loss = loss_fn(logits, tgt, lens, slot_mask, label_delay=task.label_delay)

    emb = out["emb"].astype(jnp.float32)
    if task.masked_emb_loss:
        emb_loss = losses.emb_consistency_loss_ls(emb, tgt, lens)
    else:
        emb_loss = losses.emb_consistency_loss(emb, tgt)

    total = pit_loss + task.consis_weight * emb_loss
    # DER proxy over the real-speaker slots only (columns 1..n_spk per
    # sample, like the reference's preds_realspk = p[:, 1:-1] on per-sample
    # (n_spk+2)-column tensors, oln_tfm_enc_dec.py:127-129)
    real_mask = jnp.arange(1, S + 1)[None, :] <= n_spk[:, None]
    counters = losses.diarization_error_counters(
        jax.lax.stop_gradient(logits[..., 1:-1]), tgt[..., 1:-1], lens,
        real_mask, label_delay=task.label_delay)
    metrics = {"pit_loss": pit_loss, "emb_loss": emb_loss, "tot_loss": total,
               **counters}
    return total, (out["state"], metrics)


def _compute_loss_eda(task: TaskConfig, cfg, params, model_state, batch, rng, *,
                      train: bool):
    """EEND-EDA protocol (reference F19, offl_tfm_lstm.py:49-123): PIT over
    ALL speaker columns + attractor-existence BCE; no silence/none slots."""
    from fseend_tpu.models import eend_eda

    feats, labels, lens, n_spk = (batch["feats"], batch["labels"], batch["lens"],
                                  batch["n_spk"])
    B, T, S = labels.shape
    out = eend_eda.eda_forward(params, cfg, feats, n_speakers_max=S,
                               train=train, rngs=rng)
    logits = out["logits"]
    pit_loss, labels_perm, _ = losses.batch_pit_loss(
        logits, labels, lens, n_spk, label_delay=task.label_delay)
    attr_loss = losses.attractor_existence_loss(out["exist_logits"], n_spk)
    total = pit_loss + cfg.attractor_loss_ratio * attr_loss
    slot_mask = jnp.arange(S)[None, :] < n_spk[:, None]
    counters = losses.diarization_error_counters(
        jax.lax.stop_gradient(logits), labels_perm, lens, slot_mask,
        label_delay=task.label_delay)
    metrics = {"pit_loss": pit_loss, "emb_loss": attr_loss, "tot_loss": total,
               **counters}
    return total, (model_state, metrics)


def make_train_step(task: TaskConfig, cfg, tx: optax.GradientTransformation,
                    mesh=None, donate: bool = True) -> Callable:
    """Build the jitted train step. With a mesh, the caller device_puts the
    state with param shardings and batches with batch sharding; XLA inserts
    all collectives."""

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(
            lambda p: compute_loss(task, cfg, p, state.model_state, batch, rng,
                                   train=True), has_aux=True)
        (loss, (new_model_state, metrics)), grads = grad_fn(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, model_state=new_model_state,
                               opt_state=new_opt, step=state.step + 1)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(task: TaskConfig, cfg) -> Callable:
    def step(state: TrainState, batch):
        loss, (_, metrics) = compute_loss(task, cfg, state.params,
                                          state.model_state, batch, None,
                                          train=False)
        return metrics

    return jax.jit(step)


def aggregate_metrics(metric_list: list[dict]) -> dict:
    """Sum counters / average losses across steps; DER = error/scored
    (validation_epoch_end, oln_tfm_enc_dec.py:137-156)."""
    if not metric_list:
        return {}
    keys = metric_list[0].keys()
    agg = {}
    counter_keys = {"speech_scored", "speech_miss", "speech_falarm",
                    "speaker_scored", "speaker_miss", "speaker_falarm",
                    "speaker_error", "diarization_error", "frames", "correct"}
    for k in keys:
        vals = [float(m[k]) for m in metric_list]
        agg[k] = sum(vals) if k in counter_keys else sum(vals) / len(vals)
    if agg.get("speaker_scored", 0) > 0:
        agg["DER"] = agg["diarization_error"] / agg["speaker_scored"]
    return agg
