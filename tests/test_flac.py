"""Native FLAC codec + flac predict-path coverage.

The reference's predict dataset reads .flac via soundfile
(FS-EEND/datasets/diarization_dataset_predict.py:66); this image has no
external codec, so data/flac.py decodes (and, for fixtures, encodes) FLAC
natively. Round-trips are bit-exact: FLAC is lossless and the encoder
quantizes exactly like the decoder's inverse scaling."""

import numpy as np
import pytest

from fseend_tpu.data.flac import read_flac, write_flac


def _quant(x, depth=16):
    full = 1 << (depth - 1)
    return np.clip(np.round(np.asarray(x, np.float64) * full), -full, full - 1)


def test_roundtrip_mono_tonal():
    """Smooth signal -> FIXED-predictor subframes with Rice residuals."""
    rng = np.random.default_rng(0)
    t = np.arange(20000) / 8000.0
    x = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.1 * rng.standard_normal(len(t))).astype(np.float32) * 0.5
    write_flac("/tmp/flac_mono.flac", x, 8000)
    y, sr = read_flac("/tmp/flac_mono.flac")
    assert sr == 8000 and y.shape == (20000,)
    np.testing.assert_array_equal(_quant(y), _quant(x))


def test_roundtrip_stereo_partial_final_block():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((7001, 2)) * 0.2).astype(np.float32)
    write_flac("/tmp/flac_st.flac", x, 16000)
    y, sr = read_flac("/tmp/flac_st.flac")
    assert sr == 16000 and y.shape == (7001, 2)
    np.testing.assert_array_equal(_quant(y), _quant(x))


def test_roundtrip_noise_verbatim_and_constant():
    rng = np.random.default_rng(2)
    xn = (rng.standard_normal(5000) * 0.9).astype(np.float32)
    write_flac("/tmp/flac_n.flac", xn, 8000)
    yn, _ = read_flac("/tmp/flac_n.flac")
    np.testing.assert_array_equal(_quant(yn), _quant(xn))
    xc = np.full(3000, 0.25, np.float32)
    write_flac("/tmp/flac_c.flac", xc, 8000)
    yc, _ = read_flac("/tmp/flac_c.flac")
    np.testing.assert_array_equal(_quant(yc), _quant(xc))


def test_read_flac_rejects_non_flac(tmp_path):
    p = tmp_path / "not.flac"
    p.write_bytes(b"RIFFxxxx")
    with pytest.raises(ValueError, match="not a FLAC"):
        read_flac(p)


def test_predict_dataset_globs_flac(tmp_path):
    """PredictDataset serves .flac next to .wav with identical features for
    identical audio (reference F4 parity)."""
    from fseend_tpu.data.dataset import FeatureConfig, PredictDataset
    from fseend_tpu.ops import features as F

    rng = np.random.default_rng(3)
    t = np.arange(16000) / 8000.0
    x = (0.4 * np.sin(2 * np.pi * 300 * t)
         + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    # write the SAME quantized samples as wav and flac
    full = 1 << 15
    xi = np.clip(np.round(x.astype(np.float64) * full), -full, full - 1)
    xq = (xi / full).astype(np.float32)
    import wave

    with wave.open(str(tmp_path / "a_rec.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(xi.astype("<i2").tobytes())
    write_flac(tmp_path / "b_rec.flac", xq, 8000)

    ds = PredictDataset(str(tmp_path), FeatureConfig())
    assert len(ds) == 2
    feats = {rec: f for f, rec in (ds[i] for i in range(2))}
    assert set(feats) == {"a_rec", "b_rec"}
    np.testing.assert_allclose(feats["a_rec"], feats["b_rec"], atol=1e-6)

    # the kaldi piped/scp path decodes flac too (read_audio dispatch)
    d2, sr2 = F.read_audio(tmp_path / "b_rec.flac")
    np.testing.assert_array_equal(_quant(d2), xi)


def test_rice_residual_rejects_negative_partition(monkeypatch):
    """A malformed frame whose first Rice partition is shorter than the
    predictor order (count < 0) must be rejected, not written out-of-bounds
    (native) or silently wrap-indexed (python)."""
    from fseend_tpu.data import flac as flac_mod

    # partition order 3 over n=16 samples -> 2 samples/partition; LPC order
    # 8 makes the first partition's count = 2 - 8 = -6.
    # bitstream: 4 bits part_order=3, then per-partition 4-bit rice params
    # of 0 and all-zero payload bits.
    payload = bytes([0b0011_0000] + [0] * 64)
    if flac_mod._nat is not None and flac_mod._nat.lib is not None:
        with pytest.raises(IndexError, match="overrun"):
            flac_mod._rice_residual(flac_mod._Bits(payload), 16, 8, 4)
    monkeypatch.setattr(flac_mod, "_nat", None)
    with pytest.raises(ValueError, match="overruns"):
        flac_mod._rice_residual(flac_mod._Bits(payload), 16, 8, 4)


def test_native_matches_python_decoder(monkeypatch):
    """The C hot path (data/_native.py: Rice residuals, VERBATIM reads,
    FIXED/LPC restores) decodes bit-identically to the pure-Python oracle
    on a file mixing subframe types."""
    from fseend_tpu.data import flac as flac_mod

    if flac_mod._nat is None or flac_mod._nat.lib is None:
        pytest.skip("native FLAC path unavailable (no C compiler)")
    rng = np.random.default_rng(3)
    t = np.arange(30000) / 8000.0
    x = np.stack([
        0.4 * np.sin(2 * np.pi * 180 * t) + 0.2 * rng.standard_normal(len(t)),
        np.concatenate([np.zeros(10000),                 # constant
                        rng.standard_normal(10000) * 0.9,  # verbatim-ish
                        0.3 * np.sin(2 * np.pi * 90 * t[:10000])]),
    ], axis=1).astype(np.float32)
    write_flac("/tmp/flac_mix.flac", x, 8000)
    y_nat, _ = read_flac("/tmp/flac_mix.flac")
    monkeypatch.setattr(flac_mod, "_nat", None)
    y_py, _ = read_flac("/tmp/flac_mix.flac")
    np.testing.assert_array_equal(y_nat, y_py)
