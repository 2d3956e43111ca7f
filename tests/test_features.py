"""Feature-pipeline tests: STFT/mel against torch oracle + reference quirks."""

import numpy as np
import pytest
import torch

from fseend_tpu.ops import features as F


def test_stft_matches_torch_oracle(rng):
    """Our numpy STFT must equal torch.stft with librosa-equivalent settings."""
    x = rng.standard_normal(8000 + 37).astype(np.float64)
    ours = F.stft(x, frame_size=200, frame_shift=80)

    n_fft = 256
    win = torch.zeros(n_fft, dtype=torch.float64)
    hann = 0.5 - 0.5 * torch.cos(2 * np.pi * torch.arange(200, dtype=torch.float64) / 200)
    win[(n_fft - 200) // 2 : (n_fft - 200) // 2 + 200] = hann
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=80,
        win_length=n_fft,  # window already padded to n_fft
        window=win,
        center=True,
        pad_mode="constant",
        return_complex=True,
    ).numpy().T
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_stft_last_frame_drop_hack(rng):
    """len(data) % hop == 0 -> final frame dropped (feature.py:152-161)."""
    x = rng.standard_normal(8000).astype(np.float32)  # 8000 % 80 == 0
    spec = F.stft(x, 200, 80)
    assert spec.shape[0] == 8000 // 80  # 1 + 8000//80, minus the dropped frame
    assert spec.shape[0] == F.count_frames(8000, 200, 80)

    x2 = rng.standard_normal(8001).astype(np.float32)
    spec2 = F.stft(x2, 200, 80)
    assert spec2.shape[0] == 1 + 8001 // 80
    assert spec2.shape[0] == F.count_frames(8001, 200, 80)


def test_mel_filterbank_slaney_properties():
    mel = F.mel_filterbank(8000, 256, 23)
    assert mel.shape == (23, 129)
    # each filter is a contiguous non-negative triangle
    assert (mel >= 0).all()
    # slaney normalization: peak of filter m ~= 2/(f[m+2]-f[m]); filters
    # overlap such that un-normalized triangles sum to 1 in the interior
    mel_f = F._mel_to_hz_slaney(
        np.linspace(F._hz_to_mel_slaney(0.0), F._hz_to_mel_slaney(4000.0), 25)
    )
    enorm = 2.0 / (mel_f[2:25] - mel_f[:23])
    unnorm = mel / enorm[:, None]
    interior = slice(np.searchsorted(np.linspace(0, 4000, 129), mel_f[1]) + 1,
                     np.searchsorted(np.linspace(0, 4000, 129), mel_f[23]) - 1)
    sums = unnorm.sum(axis=0)[interior]
    np.testing.assert_allclose(sums, 1.0, atol=5e-2)


def test_mel_filterbank_first_principles_values():
    """Hand-derived slaney values for sr=8000, n_fft=256, n_mels=23 —
    guards against silent formula drift."""
    mel = F.mel_filterbank(8000, 256, 23)
    # slaney mel edges: mel(4000 Hz) = 15 + 27*ln(4)/ln(6.4)
    mel_max = 15 + 27 * np.log(4.0) / np.log(6.4)
    edge1_hz = (mel_max / 24) * (200.0 / 3)  # first edge is in linear region
    edge2_hz = (2 * mel_max / 24) * (200.0 / 3)
    # filter 0 at fft bin 1 (31.25 Hz): rising ramp * enorm
    enorm0 = 2.0 / edge2_hz
    np.testing.assert_allclose(mel[0, 1], (31.25 / edge1_hz) * enorm0, rtol=1e-6)
    assert mel[0, 0] == 0.0
    # peak position of filter 0 is the bin nearest edge1
    assert np.argmax(mel[0]) == round(edge1_hz / 31.25)


@pytest.mark.parametrize("ttype", ["logmel23", "logmel23_mn", "logmel23_mvn",
                                   "logmel23_swn", "logmel23_cummn"])
def test_transform_family_shapes(rng, ttype):
    x = rng.standard_normal(16000).astype(np.float32)
    Y = F.stft(x, 200, 80)
    out = F.transform(Y, ttype)
    assert out.shape == (Y.shape[0], 23)
    assert out.dtype == np.float32
    assert np.isfinite(out).all()
    if ttype == "logmel23_mn":
        np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-4)
    if ttype == "logmel23_mvn":
        np.testing.assert_allclose(out.std(axis=0), 1.0, atol=1e-3)


def test_cumulative_mean_is_causal(rng):
    Y = rng.standard_normal((50, 23)).astype(np.float32)
    cm = F.cumulative_mean(Y)
    np.testing.assert_allclose(cm[0], Y[0], atol=1e-6)
    np.testing.assert_allclose(cm[9], Y[:10].mean(axis=0), atol=1e-5)
    # future frames must not affect past norms
    Y2 = Y.copy()
    Y2[30:] += 100.0
    np.testing.assert_allclose(F.cumulative_mean(Y2)[:30], cm[:30], atol=1e-5)


def test_splice_matches_reference_semantics(rng):
    Y = rng.standard_normal((20, 3)).astype(np.float32)
    S = F.splice(Y, context_size=2)
    assert S.shape == (20, 15)
    # frame 5 = concat(Y[3..7])
    np.testing.assert_array_equal(S[5], Y[3:8].reshape(-1))
    # zero padding at edges
    np.testing.assert_array_equal(S[0, :6], np.zeros(6, np.float32))
    np.testing.assert_array_equal(S[0, 6:], Y[:3].reshape(-1))


def test_input_dim():
    assert F.get_input_dim(200, 7, "logmel23") == 345
    assert F.get_input_dim(1024, 7, "log") == 15 * 513


def test_extract_fbank_on_bundled_wav():
    feats = F.extract_fbank(
        "/root/reference/FS-EEND/test_samples/mix_0000176.wav",
        context_size=7, frame_size=200, frame_shift=80,
        input_transform="logmel23", subsampling=10,
    )
    assert feats.ndim == 2 and feats.shape[1] == 345
    assert feats.dtype == np.float32
    assert np.isfinite(feats).all()
    # ~8kHz wav, frames at 100Hz then /10 -> about duration in seconds * 10
    data, sr = F.read_wav("/root/reference/FS-EEND/test_samples/mix_0000176.wav")
    expected_T = (F.count_frames(len(data), 200, 80) + 9) // 10
    assert feats.shape[0] == expected_T


def test_read_wav_scaling():
    data, sr = F.read_wav("/root/reference/FS-EEND/test_samples/mix_0000176.wav")
    assert sr == 8000
    assert data.dtype == np.float32
    assert np.abs(data).max() <= 1.0
    assert np.abs(data).max() > 1e-3  # not silence


def test_config_ref_interpolation(tmp_path):
    from fseend_tpu.utils.config import load_config

    p = tmp_path / "c.yaml"
    p.write_text(
        "data:\n  chunk_size: 500\n"
        "model:\n  params:\n    max_seqlen: !ref <data[chunk_size]>\n"
        "    twice: !ref <data[chunk_size]> * 2\n"
    )
    cfg = load_config(p)
    assert cfg["model"]["params"]["max_seqlen"] == 500
    assert cfg["model"]["params"]["twice"] == 1000
    cfg2 = load_config(p, overrides={"data.chunk_size": 100})
    assert cfg2["model"]["params"]["max_seqlen"] == 100


def test_enhancement_hook(rng):
    from fseend_tpu.ops.enhancement import (IdentityEnhancer,
                                            SpectralSubtractionEnhancer,
                                            enhance_features)

    logmel = rng.standard_normal((40, 23)).astype(np.float32) - 5.0
    assert np.array_equal(enhance_features(logmel, None), logmel)
    assert np.array_equal(enhance_features(logmel, IdentityEnhancer()), logmel)
    enh = SpectralSubtractionEnhancer()
    out = enh(logmel)
    assert out.shape == logmel.shape
    assert (out >= 0).all()  # noise floor subtracted in log domain
    # causal: future frames don't change the past
    logmel2 = logmel.copy()
    logmel2[30:] += 50
    np.testing.assert_array_equal(enh(logmel2)[:30], out[:30])


def test_tpu_frontend_matches_host_pipeline(rng):
    """On-device logmel_frontend == host stft->transform->splice->subsample
    for every supported transform, incl. the % hop == 0 last-frame hack."""
    import jax.numpy as jnp

    from fseend_tpu.ops import features as F
    from fseend_tpu.ops.features_tpu import logmel_frontend

    for n_samples in (8000, 8000 + 37):  # hop-divisible and not
        audio = rng.standard_normal((2, n_samples)).astype(np.float32) * 0.1
        for tf in ("logmel23", "logmel23_mn", "logmel23_mvn",
                   "logmel23_cummn"):
            dev = np.asarray(logmel_frontend(
                jnp.asarray(audio), frame_size=200, frame_shift=80,
                context_size=3, subsampling=5, input_transform=tf))
            for b in range(2):
                Y = F.transform(F.stft(audio[b], 200, 80), tf)
                host = F.subsample(F.splice(Y, 3), subsampling=5)
                assert dev[b].shape == host.shape, (tf, n_samples)
                np.testing.assert_allclose(dev[b], host, atol=2e-4,
                                           err_msg=f"{tf}@{n_samples}")


def test_streaming_logmel_equals_offline(rng):
    """StreamingLogmel over fixed audio blocks + flush == the offline host
    pipeline on the concatenated stream, for both causal transforms and for
    hop-divisible & ragged total lengths."""
    from fseend_tpu.ops import features as F
    from fseend_tpu.ops.features_tpu import StreamingLogmel

    for tf in ("logmel23", "logmel23_cummn"):
        for extra in (0, 3):  # total % shift == 0 and != 0 endings
            S = 800  # one block = 10 STFT frames = 1 subsampled feature
            n_blocks = 7
            audio = (rng.standard_normal((2, S * n_blocks + extra))
                     .astype(np.float32) * 0.1)
            sl = StreamingLogmel(2, S, frame_size=200, frame_shift=80,
                                 context_size=7, subsampling=10,
                                 input_transform=tf)
            outs = [sl.process_block(audio[:, i * S:(i + 1) * S])
                    for i in range(n_blocks)]
            # ragged remainder (streams rarely end on a block boundary)
            # rides into flush, which is host-assembled and shape-free
            outs.append(sl.flush(audio[:, S * n_blocks:] if extra else None))
            got = np.concatenate([o for o in outs if o.shape[1]], axis=1)
            for b in range(2):
                Y = F.transform(F.stft(audio[b], 200, 80), tf)
                ref = F.subsample(F.splice(Y, 7), subsampling=10)
                assert got[b].shape == ref.shape
                np.testing.assert_allclose(got[b], ref, atol=2e-4,
                                           err_msg=f"{tf} extra={extra}")
