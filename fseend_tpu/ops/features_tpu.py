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


class StreamingLogmel:
    """Blockwise raw-audio -> spliced-logmel featurizer with carried state,
    exactly matching the offline pipeline on the stream's concatenation
    (same frames, same cumulative normalization, same splice zeros).

    Feed fixed-size audio blocks with block_samples % (frame_shift *
    subsampling) == 0 (one compiled program for block 1 where the center
    pre-pad eats part of the first hop, one for steady state). Emits
    (B, block_frames/subsampling, (2c+1)*n_mels) per steady block — output
    lags input by `context_size` STFT frames (the splice lookahead), and
    `flush()` drains the pipeline with the offline right-pad semantics.

    Supported transforms: logmel23 (none) and logmel23_cummn — the causal
    family; per-recording mn/mvn need the future by definition.
    """

    def __init__(self, batch: int, block_samples: int, *,
                 frame_size: int = 200, frame_shift: int = 80,
                 context_size: int = 7, subsampling: int = 10,
                 input_transform: str = "logmel23_cummn",
                 sr: int = 8000, n_mels: int = 23):
        if input_transform not in ("logmel23", "logmel23_cummn"):
            raise ValueError(f"streaming transform must be causal, got "
                             f"{input_transform}")
        self.B, self.S = batch, block_samples
        self.shift, self.c, self.sub = frame_shift, context_size, subsampling
        self.n_mels, self.tf = n_mels, input_transform
        self.n_fft = 1 << (int(frame_size) - 1).bit_length()
        assert block_samples % (frame_shift * subsampling) == 0
        self.F = block_samples // frame_shift          # mel frames per block
        self.window = jnp.asarray(F._stft_window(frame_size, self.n_fft),
                                  jnp.float32)
        self.mel = jnp.asarray(F.mel_filterbank(sr, self.n_fft, n_mels))
        self.reset()
        self._step = jax.jit(self._step_impl,
                             static_argnames=("n_frames", "out_take"))

    def reset(self):
        B, p = self.B, self.n_fft // 2
        self.tail = np.zeros((B, p), np.float32)       # center pre-pad
        self.melbuf = jnp.zeros((B, 2 * self.c, self.n_mels), jnp.float32)
        self.cum_sum = jnp.zeros((B, 1, self.n_mels), jnp.float32)
        self.n_mel = 0            # mel frames produced so far
        self.n_spliced = 0        # spliced frames emitted so far
        self.n_samples = 0

    # ------------------------------------------------------------------
    def _step_impl(self, tail, block, melbuf, cum_sum, n_mel_start,
                   *, n_frames: int, out_take: tuple):
        x = jnp.concatenate([tail, block], axis=1)
        idx = (jnp.arange(n_frames)[:, None] * self.shift
               + jnp.arange(self.n_fft)[None, :])
        frames = x[:, idx] * self.window
        spec = jnp.fft.rfft(frames, axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        mel = jnp.log10(jnp.maximum(power @ self.mel.T, 1e-10))
        if self.tf.endswith("_cummn"):
            csum = cum_sum + jnp.cumsum(mel, axis=1)
            counts = (n_mel_start
                      + jnp.arange(1, n_frames + 1, dtype=jnp.float32)
                      )[None, :, None]
            mel_n = mel - csum / counts
            cum_sum = csum[:, -1:, :]
        else:
            mel_n = mel
        new_tail = x[:, n_frames * self.shift:]
        # splice pipeline: cat(prev 2c, new) -> emit centers lagging by c
        cat = jnp.concatenate([melbuf, mel_n], axis=1)
        T_emit = n_frames
        parts = [cat[:, j:j + T_emit] for j in range(2 * self.c + 1)]
        spliced = jnp.concatenate(parts, axis=-1)
        out = spliced[:, jnp.asarray(out_take, jnp.int32)] if out_take else \
            spliced[:, :0]
        return new_tail, cat[:, -2 * self.c:], cum_sum, out

    def process_block(self, block: np.ndarray) -> np.ndarray:
        """block: (B, block_samples) -> (B, n_emitted, (2c+1)*n_mels)."""
        assert block.shape == (self.B, self.S)
        avail = self.tail.shape[1] + self.S
        n_frames = 1 + (avail - self.n_fft) // self.shift
        # this step's spliced tensor covers centers
        # [n_mel - c, n_mel + n_frames - c); emit the valid, subsampled ones
        start_center = self.n_mel - self.c
        take = tuple(t - start_center
                     for t in range(max(0, start_center),
                                    self.n_mel + n_frames - self.c)
                     if t % self.sub == 0)
        tail, self.melbuf, self.cum_sum, out = self._step(
            jnp.asarray(self.tail), jnp.asarray(block, jnp.float32),
            self.melbuf, self.cum_sum, jnp.float32(self.n_mel),
            n_frames=n_frames, out_take=take)
        self.tail = np.asarray(tail)
        self.n_mel += n_frames
        self.n_samples += self.S
        self.n_spliced += len(take)
        return np.asarray(out)

    def flush(self, last: np.ndarray | None = None) -> np.ndarray:
        """End of stream: apply the offline right-pad (n_fft//2 zeros), the
        hop-divisible last-frame drop, and drain the splice lookahead.

        last: optional ragged final audio chunk (B, r) with r <
        block_samples — streams rarely end on a block boundary, and this
        path is host-assembled anyway, so the tail needs no fixed shape."""
        p = self.n_fft // 2
        if last is not None and last.shape[1]:
            assert last.shape[0] == self.B and last.shape[1] < self.S
            self.tail = np.concatenate(
                [self.tail, np.asarray(last, np.float32)], axis=1)
            self.n_samples += last.shape[1]
        # total offline mel frames for the stream
        total = F.count_frames(self.n_samples, self.n_fft, self.shift)
        x = np.concatenate([self.tail, np.zeros((self.B, p), np.float32)],
                           axis=1)
        n_frames = total - self.n_mel
        outs = []
        if n_frames > 0:
            need = n_frames * self.shift + self.n_fft - self.shift
            if x.shape[1] < need:  # last-frame window may run past the pad
                x = np.pad(x, ((0, 0), (0, need - x.shape[1])))
            idx = (np.arange(n_frames)[:, None] * self.shift
                   + np.arange(self.n_fft)[None, :])
            frames = jnp.asarray(x[:, idx]) * self.window
            spec = jnp.fft.rfft(frames, axis=-1)
            power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
            mel = jnp.log10(jnp.maximum(power @ self.mel.T, 1e-10))
            if self.tf.endswith("_cummn"):
                csum = self.cum_sum + jnp.cumsum(mel, axis=1)
                counts = (self.n_mel + np.arange(1, n_frames + 1,
                                                 dtype=np.float32))[None, :, None]
                mel = mel - csum / counts
            self.melbuf = jnp.concatenate([self.melbuf, mel], axis=1)
            self.n_mel = total
        # drain: zero future frames (offline splice zero-pads past T)
        cat = np.asarray(jnp.concatenate(
            [self.melbuf, jnp.zeros((self.B, self.c, self.n_mels))], axis=1))
        remaining = [t for t in range(total)
                     if t % self.sub == 0][self.n_spliced:]
        F_feats = np.zeros((self.B, len(remaining),
                            (2 * self.c + 1) * self.n_mels), np.float32)
        off = self.n_mel - (cat.shape[1] - self.c)  # index of cat[:,0]
        for i, t in enumerate(remaining):
            for j in range(2 * self.c + 1):
                src = t - self.c + j - off
                if 0 <= src < cat.shape[1]:
                    F_feats[:, i, j * self.n_mels:(j + 1) * self.n_mels] = \
                        cat[:, src]
        self.n_spliced += len(remaining)
        return F_feats
