"""Label protocol: first-activity ordering + silence/none attractor slots.

Vectorized jnp re-design of the per-batch label preprocessing every reference
task module repeats (FS-EEND/train/oln_tfm_enc_dec.py:56-75):

  1. sort real speaker columns by their first active frame (so attractor slot
     k consistently means "k-th speaker to appear");
  2. prepend a silence column (active when no speaker speaks);
  3. append an all-zero "none speaker" column.

Static-shape policy (XLA-friendly, SURVEY.md §7): labels come in as a fixed
(B, T, S_max) block with per-sample ``n_spk`` and ``lens``; output is
(B, T, S_max + 2) with a slot-validity mask.  The reference dynamically uses
``max(n_spk)+2`` slots per batch; we always run the model with S_max+2 slots
(which is also what its inference mode does — test() always passes
``max_speakers+2``, oln_tfm_enc_dec.py:186) and mask the loss per sample.
"""

from __future__ import annotations

import jax.numpy as jnp

INF = jnp.inf


def sort_by_first_activity(labels: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    """labels: (B, T, S) 0/1 -> columns stably sorted by first active frame;
    inactive columns go last. Frames beyond lens are ignored."""
    B, T, S = labels.shape
    frame_idx = jnp.arange(1, T + 1)[None, :, None]
    valid = (jnp.arange(T)[None, :, None] < lens[:, None, None])
    marked = jnp.where((labels > 0) & valid, frame_idx, INF)
    first = jnp.min(marked, axis=1)  # (B, S)
    order = jnp.argsort(first, axis=1, stable=True)  # (B, S)
    return jnp.take_along_axis(labels, order[:, None, :], axis=2)


def add_silence_none_slots(labels: jnp.ndarray) -> jnp.ndarray:
    """(B, T, S) -> (B, T, S+2): [silence, speakers..., none]."""
    silence = 1.0 - jnp.max(labels, axis=-1, keepdims=True)
    none = jnp.zeros_like(silence)
    return jnp.concatenate([silence, labels, none], axis=-1)


def prepare_labels(labels: jnp.ndarray, lens: jnp.ndarray, n_spk: jnp.ndarray):
    """Full protocol. Returns (slot_labels (B,T,S+2), slot_mask (B,S+2)).

    slot_mask marks the reference's per-sample ``nspk + 2`` loss columns
    (silence + nspk sorted speakers + one zero column,
    oln_tfm_enc_dec.py:75).

    Frames beyond ``lens`` are ALL-ZERO (including the silence slot): the
    reference truncates the protocol labels to [:ilen] per sample and the
    models re-pad them with 0 (oln_tfm_enc_dec.py:75, pad_sequence in
    onl_tfm...py:51-52) — the emb-consistency label map must see zeros
    there, not silence=1."""
    B, T, S = labels.shape
    slot_labels = add_silence_none_slots(sort_by_first_activity(labels, lens))
    frame_mask = (jnp.arange(T)[None, :] < lens[:, None])
    slot_labels = slot_labels * frame_mask[..., None]
    slot_mask = jnp.arange(S + 2)[None, :] < (n_spk[:, None] + 2)
    return slot_labels.astype(jnp.float32), slot_mask


def pin_silence_none(slot_labels: jnp.ndarray):
    """Split protocol labels into (silence, speakers, none) views — the
    speaker-PIT finetune permutes only the real-speaker columns and keeps
    silence/none pinned (oln_tfm_enc_dec_spk_pit.py:78-87)."""
    return slot_labels[..., :1], slot_labels[..., 1:-1], slot_labels[..., -1:]
