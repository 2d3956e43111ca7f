"""aux training-utility tests (curriculum, FIFO buffer, enrollment, scaler)."""

import numpy as np

from fseend_tpu.train import aux_utils as AU


def test_split_inp():
    f = [np.ones((10, 3)), np.ones((7, 3))]
    l = [np.ones((10, 2)), np.ones((7, 2))]
    fs, ls = AU.split_inp(f, l, 4)
    assert [x.shape[0] for x in fs] == [4, 4, 2, 4, 3]
    assert all(a.shape[0] == b.shape[0] for a, b in zip(fs, ls))


def test_resize_chunk_bounds():
    rng = np.random.default_rng(0)
    for _ in range(20):
        t = AU.resize_chunk(300, rng)
        assert 1 <= t <= 300


def test_fifo_buffer():
    xb, yb = AU.update_buffer_fifo(np.zeros((5, 2)), np.ones((4, 2)),
                                   np.zeros((5, 3)), np.ones((4, 3)), 6)
    assert xb.shape == (6, 2)
    assert xb[-1, 0] == 1 and xb[0, 0] == 0


def test_enrollment_helpers():
    T = 60
    d = np.zeros((T, 4), np.int32)  # [silence, s1, s2, s3]
    d[:10, 0] = 1          # silence 0..10
    d[10:30, 1] = 1        # spk1 long utterance
    d[30:34, 2] = 1        # spk2 short (below floor)
    d[34:50, 3] = 1        # spk3 utterance
    feats = np.arange(T)[:, None].repeat(2, 1).astype(np.float32)
    preds = d.astype(np.float32)

    idx, spks, n = AU.find_enroll_segment(d, utt_floor=5)
    assert 0 in spks and 1 in spks and 3 in spks and 2 not in spks

    ex, ey = AU.find_enroll_single_spk_frames(feats, preds, d, utt_floor=5)
    # structure: silence + spk + silence + spk + silence
    assert len(ex) == 10 + 20 + 10 + 16 + 10

    sel = AU.select_single_spk_frames(d, list(range(10)), mod_frame=5)
    assert len(sel) > 0 and all(s >= 10 for s in sel)


def test_scaler_modes():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((50, 8)).astype(np.float32) * 3 + 1
    inst = AU.Scaler("instance", "standard", dims=(0,))
    y = inst(x)
    np.testing.assert_allclose(y.mean(0), 0, atol=1e-5)
    np.testing.assert_allclose(y.std(0), 1, atol=1e-3)
    mm = AU.Scaler("instance", "minmax", dims=(0,))(x)
    assert mm.min() >= 0 and mm.max() <= 1
    ds = AU.Scaler("dataset", "standard", dims=(0,)).fit([x, x])
    np.testing.assert_allclose(ds(x).mean(0), 0, atol=1e-4)
