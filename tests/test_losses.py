"""Loss + label-protocol tests against brute-force numpy oracles."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from fseend_tpu.train import labels as L
from fseend_tpu.train import losses as LS


def _bce(y, t):
    return np.maximum(y, 0) - y * t + np.log1p(np.exp(-np.abs(y)))


def test_standard_bce_loss_matches_reference_formula(rng):
    B, T, S = 3, 12, 4
    logits = rng.standard_normal((B, T, S)).astype(np.float32)
    labels = (rng.uniform(size=(B, T, S)) > 0.6).astype(np.float32)
    lens = np.array([12, 9, 7])
    nslots = np.array([4, 3, 2])
    slot_mask = np.arange(S)[None] < nslots[:, None]
    # reference: sum_b mean(bce over (T_b, nslots_b)) * T_b / sum T_b
    acc = 0.0
    for b in range(B):
        cell = _bce(logits[b, : lens[b], : nslots[b]], labels[b, : lens[b], : nslots[b]])
        acc += cell.mean() * lens[b]
    expect = acc / lens.sum()
    got = LS.standard_bce_loss(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(lens), jnp.asarray(slot_mask))
    np.testing.assert_allclose(float(got), expect, rtol=1e-5)


def test_standard_bce_loss_label_delay(rng):
    B, T, S, d = 2, 10, 3, 2
    logits = rng.standard_normal((B, T, S)).astype(np.float32)
    labels = (rng.uniform(size=(B, T, S)) > 0.5).astype(np.float32)
    lens = np.array([10, 10])
    slot_mask = np.ones((B, S), bool)
    acc = 0.0
    for b in range(B):
        cell = _bce(logits[b, d:], labels[b, : T - d])
        acc += cell.mean() * (T - d)
    expect = acc / (2 * (T - d))
    got = LS.standard_bce_loss(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(lens), jnp.asarray(slot_mask), label_delay=d)
    np.testing.assert_allclose(float(got), expect, rtol=1e-5)


def test_batch_pit_loss_brute_force(rng):
    B, T, S = 3, 20, 3
    logits = rng.standard_normal((B, T, S)).astype(np.float32)
    labels = (rng.uniform(size=(B, T, S)) > 0.5).astype(np.float32)
    lens = np.full(B, T)
    n_spk = np.array([3, 3, 3])
    loss, perm_labels, perm = LS.batch_pit_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(lens), jnp.asarray(n_spk))
    # brute force (reference batch_pit_loss semantics: sum of per-sample min
    # sum-BCE / total frames)
    total = 0.0
    for b in range(B):
        best = np.inf
        for p in itertools.permutations(range(S)):
            val = _bce(logits[b], labels[b][:, list(p)]).mean() * T
            best = min(best, val)
        total += best
    np.testing.assert_allclose(float(loss), total / (B * T), rtol=1e-5)
    # permuted labels achieve that minimum under the plain standard loss
    sl = LS.standard_bce_loss(jnp.asarray(logits), perm_labels, jnp.asarray(lens),
                              jnp.ones((B, S), bool))
    np.testing.assert_allclose(float(sl), total / (B * T), rtol=1e-5)


def test_batch_pit_loss_speaker_count_masking(rng):
    """Samples with fewer speakers only consider perms fixing their columns."""
    B, T, S = 2, 10, 3
    logits = rng.standard_normal((B, T, S)).astype(np.float32)
    labels = np.zeros((B, T, S), np.float32)
    labels[:, :, 0] = 1.0
    n_spk = np.array([1, 3])
    _, _, perm = LS.batch_pit_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.full((B,), T), jnp.asarray(n_spk))
    # sample 0 has 1 speaker: its perm must map column 0 -> 0
    assert int(perm[0, 0]) == 0


def test_hungarian_permute_recovers_shuffle(rng):
    B, T, S = 2, 30, 5
    labels = (rng.uniform(size=(B, T, S)) > 0.5).astype(np.float32)
    shuffle = [3, 0, 4, 1, 2]
    # logits strongly predict labels under `shuffle`
    logits = 8.0 * labels[:, :, shuffle] - 4.0
    perm_labels, alig = LS.hungarian_pit_permute(
        jnp.asarray(logits), jnp.asarray(labels), jnp.full((B,), T), jnp.full((B,), S))
    np.testing.assert_array_equal(np.asarray(perm_labels), labels[:, :, shuffle])


def test_emb_consistency_loss(rng):
    B, T, D, S = 2, 8, 6, 3
    emb = rng.standard_normal((B, T, D)).astype(np.float32)
    lab = (rng.uniform(size=(B, T, S)) > 0.5).astype(np.float32)

    def cosmap(x):
        n = np.linalg.norm(x, axis=-1, keepdims=True)
        return (x @ x.transpose(0, 2, 1)) / (n @ n.transpose(0, 2, 1) + 1e-6)

    expect = np.mean((cosmap(emb) - cosmap(lab)) ** 2)
    got = LS.emb_consistency_loss(jnp.asarray(emb), jnp.asarray(lab))
    np.testing.assert_allclose(float(got), expect, rtol=1e-4)


def test_diarization_counters_match_manual(rng):
    B, T, S = 2, 15, 4
    logits = rng.standard_normal((B, T, S)).astype(np.float32)
    labels = (rng.uniform(size=(B, T, S)) > 0.5).astype(np.float32)
    lens = np.array([15, 11])
    slot_mask = np.ones((B, S), bool)
    c = LS.diarization_error_counters(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(lens), jnp.asarray(slot_mask))
    # manual
    sp_scored = sp_miss = sp_fa = sp_err = 0
    for b in range(B):
        y = 1 / (1 + np.exp(-logits[b, : lens[b]])) > 0.5
        t = labels[b, : lens[b]] > 0.5
        n_ref = t.sum(-1)
        n_sys = y.sum(-1)
        sp_scored += n_ref.sum()
        sp_miss += np.maximum(n_ref - n_sys, 0).sum()
        sp_fa += np.maximum(n_sys - n_ref, 0).sum()
        sp_err += (np.minimum(n_ref, n_sys) - (t & y).sum(-1)).sum()
    assert int(c["speaker_scored"]) == sp_scored
    assert int(c["speaker_miss"]) == sp_miss
    assert int(c["speaker_falarm"]) == sp_fa
    assert int(c["speaker_error"]) == sp_err
    assert int(c["frames"]) == 15 + 11


def test_label_protocol(rng):
    T, S = 10, 3
    lab = np.zeros((1, T, S), np.float32)
    lab[0, 5:, 0] = 1  # speaker 0 appears at t=5
    lab[0, 2:4, 1] = 1  # speaker 1 appears at t=2 (first)
    # speaker 2 never speaks
    slot_labels, slot_mask = L.prepare_labels(
        jnp.asarray(lab), jnp.array([T]), jnp.array([2]))
    assert slot_labels.shape == (1, T, S + 2)
    # column order: [silence, spk1(first), spk0, empty, none]
    np.testing.assert_array_equal(np.asarray(slot_labels[0, :, 1]), lab[0, :, 1])
    np.testing.assert_array_equal(np.asarray(slot_labels[0, :, 2]), lab[0, :, 0])
    # silence column complements speech
    speech = lab[0].max(-1)
    np.testing.assert_array_equal(np.asarray(slot_labels[0, :, 0]), 1 - speech)
    # none column zero
    assert float(slot_labels[0, :, -1].sum()) == 0
    # slot_mask covers n_spk + 2 = 4 slots
    np.testing.assert_array_equal(np.asarray(slot_mask[0]), [1, 1, 1, 1, 0])


def test_attractor_existence_loss():
    logits = jnp.asarray(np.array([[5.0, 5.0, -5.0, 0.0]], np.float32))
    n_spk = jnp.array([2])
    # labels [1,1,0], mask first 3; near-perfect prediction -> small loss
    loss = LS.attractor_existence_loss(logits, n_spk)
    assert float(loss) < 0.01


def test_batch_pit_loss_post_sigmoid_variant(rng):
    """from_logits=False == batch_pit_n_speaker_loss2 semantics."""
    B, T, S = 2, 10, 2
    logits = rng.standard_normal((B, T, S)).astype(np.float32)
    labels = (rng.uniform(size=(B, T, S)) > 0.5).astype(np.float32)
    lens = np.full(B, T)
    n_spk = np.full(B, S)
    l1, p1, _ = LS.batch_pit_loss(jnp.asarray(logits), jnp.asarray(labels),
                                  jnp.asarray(lens), jnp.asarray(n_spk))
    probs = 1 / (1 + np.exp(-logits))
    l2, p2, _ = LS.batch_pit_loss(jnp.asarray(probs), jnp.asarray(labels),
                                  jnp.asarray(lens), jnp.asarray(n_spk),
                                  from_logits=False)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
