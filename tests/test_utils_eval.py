"""rttm / DER scorer / checkpoint / postprocess / sampler / loader tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fseend_tpu.utils import checkpoint as CKPT
from fseend_tpu.utils import metrics as MET
from fseend_tpu.utils import postprocess as PP
from fseend_tpu.utils import rttm as RTTM


def test_activity_to_segments():
    act = np.array([0, 1, 1, 0, 0, 1, 0, 1, 1])
    assert RTTM.activity_to_segments(act) == [(1, 3), (5, 6), (7, 9)]


def test_make_rttm_roundtrip(tmp_path):
    T, S = 100, 2
    pred = np.zeros((T, S))
    pred[20:60, 0] = 0.9
    pred[50:90, 1] = 0.9
    f = tmp_path / "out.rttm"
    RTTM.make_rttm("rec1", pred, frame_shift=80, subsampling=10,
                   sampling_rate=8000, out_rttm_file=f)
    parsed = RTTM.read_rttm(f)
    assert "rec1" in parsed
    segs = sorted(parsed["rec1"], key=lambda x: x[1])
    # frame 20 * 80*10/8000 = 2.0 s
    np.testing.assert_allclose(segs[0][1], 2.0, atol=0.01)
    np.testing.assert_allclose(segs[0][2], 6.0, atol=0.01)


def test_der_perfect_hypothesis():
    ref = [("a", 0.0, 10.0), ("b", 5.0, 15.0)]
    hyp = [("x", 0.0, 10.0), ("y", 5.0, 15.0)]
    c = MET.der_components(ref, hyp, collar=0.0)
    assert c.der == 0.0
    assert c.total == 20.0


def test_der_miss_and_falarm():
    ref = [("a", 0.0, 10.0)]
    hyp = [("x", 0.0, 8.0), ("x", 12.0, 14.0)]
    c = MET.der_components(ref, hyp, collar=0.0)
    np.testing.assert_allclose(c.miss, 2.0)
    np.testing.assert_allclose(c.falarm, 2.0)
    np.testing.assert_allclose(c.total, 10.0)
    np.testing.assert_allclose(c.der, 0.4)


def test_der_confusion_with_mapping():
    # two ref speakers; hyp swaps speaker identity halfway for one of them
    ref = [("a", 0.0, 10.0), ("b", 10.0, 20.0)]
    hyp = [("x", 0.0, 10.0), ("x", 10.0, 13.0), ("y", 13.0, 20.0)]
    c = MET.der_components(ref, hyp, collar=0.0)
    # optimal map x->a, y->b; 3s of b labeled x => confusion
    np.testing.assert_allclose(c.confusion, 3.0)
    np.testing.assert_allclose(c.miss, 0.0)
    np.testing.assert_allclose(c.falarm, 0.0)


def test_der_collar_excludes_boundaries():
    ref = [("a", 10.0, 20.0)]
    # hypothesis misses 0.2 right after onset: inside collar of 0.5 => forgiven
    hyp = [("x", 10.2, 20.0)]
    c = MET.der_components(ref, hyp, collar=0.5)
    assert c.der == 0.0
    # but a miss of 1.0 is only partially forgiven
    hyp2 = [("x", 11.0, 20.0)]
    c2 = MET.der_components(ref, hyp2, collar=0.5)
    np.testing.assert_allclose(c2.miss, 0.75)  # 10.25..11.0 counted


def test_score_frames_protocol():
    T = 200
    ref = np.zeros((T, 2), np.int32)
    ref[50:150, 0] = 1
    hyp = np.zeros((T // 10, 2), np.float32)
    hyp[5:15, 1] = 0.9  # subsampled frames 5..15 == frames 50..150, wrong slot
    c = MET.score_frames(ref, hyp, collar_frames=0.0, median=1, subsampling=10)
    # single ref/hyp speaker pair maps optimally -> DER 0
    assert c.der == 0.0


def test_checkpoint_roundtrip_and_average(tmp_path):
    tree = {"a": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "b": [np.zeros(3, np.float32), np.ones(2, np.float32)]}
    CKPT.save_pytree(tmp_path / "ck_epoch=1.npz", tree, extra={"step": 10})
    tree2 = jax.tree.map(lambda x: x + 2, tree)
    CKPT.save_pytree(tmp_path / "ck_epoch=2.npz", tree2)
    loaded = CKPT.load_pytree(tmp_path / "ck_epoch=1.npz", tree)
    np.testing.assert_array_equal(loaded["a"]["kernel"], tree["a"]["kernel"])
    assert CKPT.load_extra(tmp_path / "ck_epoch=1.npz")["step"] == 10
    avg = CKPT.average_checkpoints(
        CKPT.find_epoch_checkpoints(tmp_path), tree)
    np.testing.assert_allclose(avg["a"]["kernel"], tree["a"]["kernel"] + 1)
    assert len(CKPT.find_epoch_checkpoints(tmp_path, 2, 2)) == 1


def test_oracle_sad():
    probs = np.array([[0.9, 0.1], [0.3, 0.2], [0.1, 0.1]], np.float32)
    speech = np.array([0, 1, 0])
    out = PP.oracle_sad_rescore(probs, speech)
    # frame 0/2 non-speech -> zeroed
    assert out[0].max() == 0 and out[2].max() == 0
    # frame 1 is speech but nothing fires -> argmax forced on
    assert out[1, 0] > 0.5


def test_h5_roundtrip(tmp_path):
    p = np.random.default_rng(0).uniform(size=(20, 3)).astype(np.float32)
    PP.save_h5_probs(tmp_path / "x.h5", p)
    np.testing.assert_allclose(PP.load_h5_probs(tmp_path / "x.h5"), p)
    np.save(tmp_path / "l.npy", np.zeros((5, 2), np.float32))
    PP.logits_npy_to_h5(tmp_path / "l.npy", tmp_path / "l.h5")
    np.testing.assert_allclose(PP.load_h5_probs(tmp_path / "l.h5"), 0.5)


def test_sharded_sampler_determinism():
    from fseend_tpu.data.sampler import ShardedSampler

    # union over ranks covers all items; items identical across runs
    all_items = []
    for rank in range(4):
        s = ShardedSampler(10, num_replicas=4, rank=rank, seed=7)
        s.set_epoch(3)
        all_items += s.indices()
    idxs = sorted(i for i, _ in all_items)
    assert set(idxs) == set(range(10))  # padded duplicates allowed
    # same (index -> seed) mapping on every rank
    seed_map = {}
    for i, seed in all_items:
        assert seed_map.setdefault(i, seed) == seed
    # single-replica run yields the same item seeds
    s1 = ShardedSampler(10, num_replicas=1, rank=0, seed=7)
    s1.set_epoch(3)
    for i, seed in s1.indices():
        assert seed_map[i] == seed


def test_pad_collate_shapes():
    from fseend_tpu.data.loader import pad_collate

    items = [(np.ones((5, 4), np.float32), np.ones((5, 2), np.float32), "r1"),
             (np.ones((3, 4), np.float32), np.ones((3, 1), np.float32), "r2")]
    b = pad_collate(items, chunk_size=6, max_speakers=3, input_dim=4)
    assert b["feats"].shape == (2, 6, 4)
    assert b["labels"].shape == (2, 6, 3)
    assert list(b["lens"]) == [5, 3]
    assert list(b["n_spk"]) == [2, 1]
