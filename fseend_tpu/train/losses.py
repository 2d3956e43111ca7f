"""Diarization losses + frame-level DER counters, fully vectorized for XLA.

Re-designs /root/reference/FS-EEND/train/utils/loss.py and
/root/reference/LS-EEND/train/utils/loss.py for fixed-shape batched tensors
with frame/slot masks instead of python lists of ragged tensors:

  * ``standard_bce_loss``        — standard_loss (loss.py:119-125)
  * ``standard_mask_loss``       — loss.py:127-137
  * ``standard_loss_sep``        — LS asymmetric active/inactive BCE
                                   (LS loss.py:123-135)
  * ``batch_pit_loss``           — the O(S^2) rolled-cost PIT with the static
                                   permutation table + per-sample speaker-count
                                   masking (batch_pit_n_speaker_loss,
                                   loss.py:257-327) — entirely on device
  * ``hungarian_pit_permute``    — pit_loss_multispk (LS loss.py:350-380):
                                   logsigmoid cost matrix + Hungarian via a
                                   host callback (S up to 10 => S! too large
                                   for the rolled method)
  * ``emb_consistency_loss``     — FS plain-MSE form (onl_tfm...py:46-57) and
                                   LS masked/Σlen² form (onl_conformer...py:91-113)
  * ``diarization_error_counters`` — calc_diarization_error (loss.py:198-236)
  * ``attractor_existence_loss`` — EDA baseline counter BCE
                                   (offl_tfm_enc_lstm_enc_dec.py:109-127)

All functions take logits (pre-sigmoid) unless noted.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# BCE helpers
# ---------------------------------------------------------------------------


def bce_with_logits(logits, targets):
    """Elementwise binary cross entropy on logits (stable form)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _delay_shift(logits, labels, label_delay: int):
    """pred[t] scored against label[t - delay] (loss.py docstring :76-79)."""
    if label_delay:
        logits = logits[:, label_delay:]
        labels = labels[:, : labels.shape[1] - label_delay]
    return logits, labels


def _masked_per_sample_mean(cell_loss, frame_mask, slot_mask):
    """Mean over valid (t, s) cells per sample: reproduces the reference's
    per-sample ``F.bce(...).mean()`` on (T_b, nspk_b+2) tensors."""
    m = frame_mask[:, :, None] * slot_mask[:, None, :]
    return (cell_loss * m).sum(axis=(1, 2)) / jnp.maximum(m.sum(axis=(1, 2)), 1)


def _combine(per_sample_mean, lens, label_delay: int):
    """loss = sum_b mean_b * (T_b - delay) / sum_b (T_b - delay)
    (loss.py:119-125)."""
    w = jnp.maximum(lens - label_delay, 0)
    return (per_sample_mean * w).sum() / jnp.maximum(w.sum(), 1)


def standard_bce_loss(logits, labels, lens, slot_mask, label_delay: int = 0):
    """logits/labels: (B, T, S); lens: (B,); slot_mask: (B, S)."""
    logits, labels = _delay_shift(logits, labels, label_delay)
    T = logits.shape[1]
    frame_mask = (jnp.arange(T)[None] < (lens[:, None] - label_delay)).astype(logits.dtype)
    cell = bce_with_logits(logits, labels)
    return _combine(_masked_per_sample_mean(cell, frame_mask, slot_mask), lens, label_delay)


def standard_mask_loss(logits, labels, lens, slot_mask, label_delay: int = 0):
    """BCE with cells (label==0 & logit<0) zeroed (loss.py:127-137)."""
    logits, labels = _delay_shift(logits, labels, label_delay)
    T = logits.shape[1]
    frame_mask = (jnp.arange(T)[None] < (lens[:, None] - label_delay)).astype(logits.dtype)
    cell = bce_with_logits(logits, labels)
    cell = jnp.where((labels == 0) & (logits < 0), 0.0, cell)
    return _combine(_masked_per_sample_mean(cell, frame_mask, slot_mask), lens, label_delay)


def standard_loss_sep(logits, labels, lens, slot_mask, label_delay: int = 0):
    """LS asymmetric loss: BCE-with-logits on active cells, BCE on |logit|
    for inactive cells (LS loss.py:123-135)."""
    logits, labels = _delay_shift(logits, labels, label_delay)
    T = logits.shape[1]
    frame_mask = (jnp.arange(T)[None] < (lens[:, None] - label_delay)).astype(logits.dtype)
    active = bce_with_logits(logits, labels)
    # F.binary_cross_entropy(|y|, t) with t==0 -> -log(1 - |y|); |y| clipped
    absy = jnp.clip(jnp.abs(logits), 0.0, 1.0 - 1e-7)
    inactive = -jnp.log1p(-absy)
    cell = jnp.where(labels == 1, active, inactive)
    return _combine(_masked_per_sample_mean(cell, frame_mask, slot_mask), lens, label_delay)


# ---------------------------------------------------------------------------
# rolled-cost PIT (device-side, static permutation table)
# ---------------------------------------------------------------------------


def _perm_table(S: int):
    perms = np.array(list(itertools.permutations(range(S))), dtype=np.int32)
    y_ind = np.arange(S, dtype=np.int32)
    t_inds = np.mod(perms - y_ind, S)  # (P, S): shift index per output column
    # validity[n, p] == 1 iff perm p's first n entries permute range(n)
    valid = np.zeros((S + 1, len(perms)), dtype=bool)
    for n in range(S + 1):
        valid[n] = [sorted(p[:n]) == list(range(n)) for p in perms]
    return jnp.asarray(perms), jnp.asarray(t_inds), jnp.asarray(valid)


def batch_pit_loss(logits, labels, lens, n_speakers, label_delay: int = 0,
                   from_logits: bool = True):
    """Rolled-cost PIT over real-speaker columns (loss.py:257-327), O(S^2)
    cost build + S! table lookup, all on device.

    logits/labels: (B, T, S). n_speakers: (B,) true count per sample (columns
    >= n are padding; invalid permutations are masked like the reference).
    from_logits=False scores post-sigmoid probabilities instead (the
    reference's batch_pit_n_speaker_loss2, loss.py:406-476).
    Returns (loss, permuted_labels (B, T, S), perm_idx (B, S)).
    """
    B, T, S = logits.shape
    perms, t_inds, valid = _perm_table(S)
    logits_d, labels_d = _delay_shift(logits, labels, label_delay)
    Td = logits_d.shape[1]
    frame_mask = (jnp.arange(Td)[None] < (lens[:, None] - label_delay)).astype(logits.dtype)

    # cost[b, i, j] = summed BCE of logit column i against label column (i+j)%S
    rolled = jnp.stack([jnp.roll(labels_d, -j, axis=2) for j in range(S)], axis=3)
    if from_logits:
        cell = bce_with_logits(logits_d[..., None], rolled)  # (B, Td, S, S)
    else:
        p = jnp.clip(logits_d[..., None], 1e-7, 1 - 1e-7)
        cell = -(rolled * jnp.log(p) + (1 - rolled) * jnp.log1p(-p))
    costs = (cell * frame_mask[:, :, None, None]).sum(axis=1)  # (B, S, S)

    # losses_perm[b, p] = mean_i costs[b, i, t_inds[p, i]]
    losses_perm = jnp.take_along_axis(
        costs[:, None, :, :],  # (B, 1, S, S)
        t_inds[None, :, :, None],  # (1, P, S, 1)
        axis=3,
    )[..., 0].mean(axis=2)  # (B, P)

    invalid = ~valid[n_speakers]  # (B, P)
    losses_perm = jnp.where(invalid, jnp.inf, losses_perm)
    best = jnp.argmin(losses_perm, axis=1)  # (B,)
    min_loss = jnp.take_along_axis(losses_perm, best[:, None], axis=1).sum()
    min_loss = min_loss / jnp.maximum((lens - label_delay).sum(), 1)

    perm = perms[best]  # (B, S)
    labels_perm = jnp.take_along_axis(labels, perm[:, None, :], axis=2)
    return min_loss, labels_perm, perm


# ---------------------------------------------------------------------------
# Hungarian PIT (host callback; eval/finetune path for S up to 10)
# ---------------------------------------------------------------------------


def _hungarian_host(cost, n_speakers):
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost)
    n_speakers = np.asarray(n_speakers)
    B, S, _ = cost.shape
    out = np.zeros((B, S), dtype=np.int32)
    for i in range(B):
        c = cost[i].copy()
        n = int(n_speakers[i])
        if n < S:
            big = np.abs(c).sum()
            c[n:, :] = big
            c[:, n:] = big
        _, ref_alig = linear_sum_assignment(c)
        out[i] = ref_alig.astype(np.int32)
    return out


def hungarian_pit_permute(logits, labels, lens, n_speakers):
    """LS pit_loss_multispk (LS loss.py:350-380): build the logsigmoid cost
    matrix on device, solve assignment on host (non-differentiable), return
    labels permuted to best match logits' columns."""
    B, T, S = logits.shape
    frame_mask = (jnp.arange(T)[None] < lens[:, None]).astype(logits.dtype)
    lg = jax.lax.stop_gradient(logits) * frame_mask[..., None]
    lb = labels * frame_mask[..., None]
    cost = (
        -jnp.einsum("bts,btc->bsc", jax.nn.log_sigmoid(lg), lb)
        - jnp.einsum("bts,btc->bsc", jax.nn.log_sigmoid(-lg), (1 - lb) * frame_mask[..., None])
    )
    ref_alig = jax.pure_callback(
        _hungarian_host,
        jax.ShapeDtypeStruct((B, S), jnp.int32),
        cost, n_speakers,
        vmap_method="sequential",
    )
    return jnp.take_along_axis(labels, ref_alig[:, None, :], axis=2), ref_alig


# ---------------------------------------------------------------------------
# embedding-consistency loss
# ---------------------------------------------------------------------------


def _cos_map(x, eps=1e-6):
    m = jnp.einsum("btd,bsd->bts", x, x, preferred_element_type=jnp.float32)
    # safe norm: torch.norm defines the subgradient at 0 as 0; naive
    # sqrt(sum_sq) yields NaN grads (inf * zero-cotangent) on exactly-zero
    # rows, which masked padded frames hit every step
    sq = jnp.sum(jnp.square(x), axis=-1)
    n = jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)
    return m / (n[:, :, None] * n[:, None, :] + eps)


def emb_consistency_loss(emb, slot_labels, lens=None, masked: bool = False):
    """MSE between the cosine-similarity map of frame embeddings and the label
    co-activity map.

    masked=False: FS plain mean over the full (B, T, T) map (onl_tfm...py:46-57).
    masked=True:  LS form — zero out padded frames and normalize by
    sum(len_b^2) (onl_conformer...py:91-113). Requires lens.
    """
    attn_map = _cos_map(emb)
    label_map = _cos_map(slot_labels)
    if not masked:
        return jnp.mean(jnp.square(attn_map - label_map))
    T = emb.shape[1]
    fm = (jnp.arange(T)[None] < lens[:, None]).astype(emb.dtype)
    pair = fm[:, :, None] * fm[:, None, :]
    sq = jnp.square(attn_map - label_map) * pair
    return sq.sum() / jnp.maximum(jnp.square(lens.astype(emb.dtype)).sum(), 1)


def emb_consistency_loss_ls(emb, slot_labels, lens):
    """LS variant: embeddings are pre-masked (emb * len_mask) before the map
    (onl_conformer...py:97), then sum-MSE / Σlen² on the full padded map."""
    T = emb.shape[1]
    fm = (jnp.arange(T)[None] < lens[:, None]).astype(emb.dtype)
    attn_map = _cos_map(emb * fm[..., None])
    label_map = _cos_map(slot_labels)
    sq = jnp.square(attn_map - label_map)
    return sq.sum() / jnp.maximum(jnp.square(lens.astype(emb.dtype)).sum(), 1)


# ---------------------------------------------------------------------------
# attractor existence loss (EDA baseline)
# ---------------------------------------------------------------------------


def attractor_existence_loss(exist_logits, n_speakers):
    """exist_logits: (B, C) from the EDA counter; labels are 1 for the first
    n_spk attractors, 0 for attractor n_spk, ignored beyond
    (offl_tfm_enc_lstm_enc_dec.py:109-127: BCE over n_spk+1 entries)."""
    B, C = exist_logits.shape
    idx = jnp.arange(C)[None, :]
    labels = (idx < n_speakers[:, None]).astype(exist_logits.dtype)
    mask = (idx <= n_speakers[:, None]).astype(exist_logits.dtype)
    cell = bce_with_logits(exist_logits, labels) * mask
    return cell.sum() / jnp.maximum(mask.sum(), 1)


# ---------------------------------------------------------------------------
# frame-level DER counters (train-time proxy metric)
# ---------------------------------------------------------------------------


def diarization_error_counters(logits, labels, lens, slot_mask,
                               label_delay: int = 0, from_logits: bool = True):
    """Vectorized calc_diarization_error (loss.py:198-236) over a batch.

    Returns a dict of scalar counters; aggregate across steps/devices by
    summation (psum on the data axis replaces Lightning's sync_dist)."""
    logits, labels = _delay_shift(logits, labels, label_delay)
    T = logits.shape[1]
    fm = (jnp.arange(T)[None] < (lens[:, None] - label_delay))
    sm = slot_mask[:, None, :]
    probs = jax.nn.sigmoid(logits) if from_logits else logits
    decisions = (probs > 0.5) & sm & fm[..., None]
    labels_b = (labels > 0.5) & sm & fm[..., None]
    n_ref = labels_b.sum(axis=-1)
    n_sys = decisions.sum(axis=-1)
    fm_i = fm.astype(jnp.int32)
    res = {
        "speech_scored": ((n_ref > 0) & fm).sum(),
        "speech_miss": ((n_ref > 0) & (n_sys == 0) & fm).sum(),
        "speech_falarm": ((n_ref == 0) & (n_sys > 0) & fm).sum(),
        "speaker_scored": (n_ref * fm_i).sum(),
        "speaker_miss": (jnp.maximum(n_ref - n_sys, 0) * fm_i).sum(),
        "speaker_falarm": (jnp.maximum(n_sys - n_ref, 0) * fm_i).sum(),
    }
    n_map = (labels_b & decisions).sum(axis=-1)
    res["speaker_error"] = ((jnp.minimum(n_ref, n_sys) - n_map) * fm_i).sum()
    res["correct"] = ((labels_b == decisions).all(axis=-1) & fm).sum()
    res["diarization_error"] = (
        res["speaker_miss"] + res["speaker_falarm"] + res["speaker_error"])
    res["frames"] = fm.sum()
    return res


def der_from_counters(c: dict) -> jnp.ndarray:
    return c["diarization_error"] / jnp.maximum(c["speaker_scored"], 1)
