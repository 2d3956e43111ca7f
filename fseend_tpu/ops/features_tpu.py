"""On-device (TPU) batched feature frontend — jittable mirror of the host
DSP in ops/features.py (reference FS-EEND/datasets/feature.py:26-368).

Why: a single serving chip sustains hundreds of thousands of audio frames
per second (PARITY.md), i.e. tens of thousands of seconds of audio per
wall-second across lanes — far beyond what the host CPU can featurize
(~22.6 ms per 60 s of audio, one core). Moving the frontend into the XLA
graph removes that host bottleneck and ships raw int16/float32 audio over
PCIe instead of spliced features (which are also ~7x larger than the
audio itself at context 7 / subsample 10).

Pipeline (identical math to the host path, verified by parity test):
  center-padded hann STFT (librosa conventions incl. the "drop last frame
  when len % hop == 0" hack) -> |.|^2 -> slaney mel -> log10 ->
  {none, mn, mvn, cummn} normalization -> +/-context splice -> subsample.

`logmel23_swn` (2-means speech-weighted mean) is host-only: its
data-dependent iteration count doesn't belong in a compiled graph, and the
reference uses it for offline training data only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fseend_tpu.ops import features as F


@functools.partial(jax.jit, static_argnames=(
    "frame_size", "frame_shift", "context_size", "subsampling",
    "input_transform", "sr", "n_mels"))
def logmel_frontend(audio: jnp.ndarray, *, frame_size: int = 200,
                    frame_shift: int = 80, context_size: int = 7,
                    subsampling: int = 10,
                    input_transform: str = "logmel23_mn",
                    sr: int = 8000, n_mels: int = 23) -> jnp.ndarray:
    """audio (B, n_samples) float32 -> (B, ceil(T/subsampling), (2c+1)*n_mels).

    Static shapes: T is a function of n_samples only, so one compiled
    program serves any batch of equal-length clips.
    """
    B, n_samples = audio.shape
    n_fft = 1 << (int(frame_size) - 1).bit_length()

    # --- STFT (librosa center=True, constant pad, last-frame hack) ---
    window = jnp.asarray(F._stft_window(frame_size, n_fft), jnp.float32)
    x = jnp.pad(audio, ((0, 0), (n_fft // 2, n_fft // 2)))
    n_frames = 1 + (x.shape[1] - n_fft) // frame_shift
    if n_samples % frame_shift == 0:
        n_frames -= 1
    idx = (jnp.arange(n_frames)[:, None] * frame_shift
           + jnp.arange(n_fft)[None, :])
    frames = x[:, idx] * window                     # (B, T, n_fft)
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2

    # --- slaney mel + log10 ---
    mel = jnp.asarray(F.mel_filterbank(sr, n_fft, n_mels))  # (n_mels, bins)
    out = jnp.maximum(power @ mel.T, 1e-10)
    out = jnp.log10(out)

    # --- normalization family ---
    if input_transform in ("logmel23", "logmel"):
        pass
    elif input_transform.endswith("_mn"):
        out = out - jnp.mean(out, axis=1, keepdims=True)
    elif input_transform.endswith("_mvn"):
        out = out - jnp.mean(out, axis=1, keepdims=True)
        out = out / jnp.maximum(jnp.std(out, axis=1, keepdims=True), 1e-10)
    elif input_transform.endswith("_cummn"):
        csum = jnp.cumsum(out, axis=1)
        counts = jnp.arange(1, out.shape[1] + 1, dtype=out.dtype)[None, :, None]
        out = out - csum / counts
    else:
        raise ValueError(f"unsupported on-device transform: {input_transform}")
    out = out.astype(jnp.float32)

    # --- splice +/- context (zero padded) + subsample ---
    c = context_size
    if c > 0:
        ypad = jnp.pad(out, ((0, 0), (c, c), (0, 0)))
        out = jnp.concatenate(
            [ypad[:, j:j + n_frames] for j in range(2 * c + 1)], axis=-1)
    return out[:, ::subsampling]


def extract_fbank_batch(wavs: np.ndarray, feat_cfg) -> jnp.ndarray:
    """Convenience: (B, n_samples) raw audio + FeatureConfig-like object ->
    on-device features, matching ops.features.extract_fbank per row."""
    return logmel_frontend(
        jnp.asarray(wavs, jnp.float32),
        frame_size=feat_cfg.frame_size, frame_shift=feat_cfg.frame_shift,
        context_size=feat_cfg.context_size, subsampling=feat_cfg.subsampling,
        input_transform=feat_cfg.input_transform or "logmel23",
        sr=feat_cfg.rate)
