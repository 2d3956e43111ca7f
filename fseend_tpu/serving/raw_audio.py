"""Raw-audio streaming serving: 8 kHz samples in -> speaker probabilities
out, with BOTH the feature frontend and the model on the chip.

Composes the two on-device stages that already exist separately:

  StreamingLogmel   (ops/features_tpu.py)  raw samples -> spliced logmel,
                                           carried STFT/norm/splice state
  BlockStreamingServer (serving/runtime.py) K-frame blocks -> probabilities,
                                           carried retention/KV state

The host's only job is moving int16/float32 audio to the device and
re-batching the featurizer's ragged early output (the splice lookahead makes
block 1 short by `context_size` STFT frames) into the model's fixed K-frame
blocks — a numpy concat on tiny (lanes, <K, 345) arrays.

The reference has no raw-audio streaming server at all: its per-frame demo
featurizes the whole wav up front on the host
(FS-EEND/streaming_infer_dia.py:24-36 `extract_fbank` before the frame
loop; LS-EEND/streaming_infer_dia.py:104-135 likewise).  Here the audio is
consumed incrementally, so an actual live stream can be served; output
equals the offline host pipeline + batch forward exactly (tested).
"""

from __future__ import annotations

import numpy as np

from fseend_tpu.ops.features_tpu import StreamingLogmel


class RawAudioPipeline:
    """End-to-end streaming diarization over raw audio blocks.

    server: a BlockStreamingServer (LS or FS).  Feed fixed-size audio blocks
    via process_audio(); call flush() once at end of stream.  Every call
    returns the newly finalized probabilities (n_lanes, n_new, n_slots-1);
    concatenating all returns gives exactly the offline batch output over
    the stream's T spliced frames.
    """

    def __init__(self, server, *, frame_size: int = 200,
                 frame_shift: int = 80, context_size: int = 7,
                 subsampling: int = 10, input_transform: str = "logmel23",
                 sr: int = 8000, n_mels: int = 23,
                 audio_block_samples: int | None = None):
        if audio_block_samples is None:
            # one model block's worth of samples per audio block
            audio_block_samples = server.block * frame_shift * subsampling
        self.srv = server
        self.K = server.block
        self.fe = StreamingLogmel(
            server.n_lanes, audio_block_samples, frame_size=frame_size,
            frame_shift=frame_shift, context_size=context_size,
            subsampling=subsampling, input_transform=input_transform,
            sr=sr, n_mels=n_mels)
        self.feat_dim = (2 * context_size + 1) * n_mels
        self._buf = np.zeros((server.n_lanes, 0, self.feat_dim), np.float32)
        self._fed = 0       # model blocks fed to the server
        self._T = 0         # spliced frames produced by the featurizer
        self._done = False

    @property
    def audio_block_samples(self) -> int:
        return self.fe.S

    def _feed_full_blocks(self):
        outs = []
        while self._buf.shape[1] >= self.K:
            blk = self._buf[:, :self.K]
            self._buf = self._buf[:, self.K:]
            probs = self.srv.process_block(blk)
            self._fed += 1
            if self._fed > 1:     # call 1 emits warm-up garbage
                outs.append(np.asarray(probs))
        if outs:
            return np.concatenate(outs, axis=1)
        return np.zeros((self.srv.n_lanes, 0, self.srv.n_slots - 1),
                        np.float32)

    def process_audio(self, audio: np.ndarray) -> np.ndarray:
        """audio: (n_lanes, audio_block_samples) -> newly finalized probs
        (n_lanes, n_new, n_slots-1); n_new varies with pipeline fill."""
        assert not self._done, "stream already flushed; build a new pipeline"
        feats = self.fe.process_block(np.asarray(audio, np.float32))
        self._T += feats.shape[1]
        self._buf = np.concatenate([self._buf, feats], axis=1)
        return self._feed_full_blocks()

    def flush(self, last_audio: np.ndarray | None = None) -> np.ndarray:
        """End of stream: drain the featurizer (offline right-pad semantics),
        the final partial model block (zero-padded + h_mask for exact parity
        with the batch re-pad), and the one-block emission lag.

        last_audio: optional ragged final samples (n_lanes, r) with
        r < audio_block_samples — streams rarely end on a block boundary."""
        assert not self._done
        self._done = True
        feats = self.fe.flush(last_audio)
        self._T += feats.shape[1]
        self._buf = np.concatenate([self._buf, feats], axis=1)
        outs = [self._feed_full_blocks()]
        valid = self._buf.shape[1]
        if valid:
            blk = np.zeros((self.srv.n_lanes, self.K, self.feat_dim),
                           np.float32)
            blk[:, :valid] = self._buf
            probs = self.srv.process_block(
                blk, h_mask=np.arange(self.K) < valid)
            self._fed += 1
            if self._fed > 1:
                outs.append(np.asarray(probs))
            self._buf = self._buf[:, :0]
        if self._fed:
            # drain the one-block lag with a zero-embedding flush block
            zeros = np.zeros((self.srv.n_lanes, self.K, self.feat_dim),
                             np.float32)
            outs.append(np.asarray(self.srv.process_block(zeros, flush=True)))
        out = np.concatenate(outs, axis=1)
        # lifetime emissions = _fed * K frames covering blocks 0..m-1; the
        # excess over T is the final block's zero padding — all at the end
        excess = self._fed * self.K - self._T
        return out[:, :out.shape[1] - excess] if excess else out


def stream_audio_file(server, audio: np.ndarray, **feat_kw) -> np.ndarray:
    """Convenience: run one recording's raw samples (n_samples,) through a
    fresh pipeline on lane 0, returning (T, n_slots-1) probabilities equal to
    the offline extract_fbank + batch forward."""
    pipe = RawAudioPipeline(server, **feat_kw)
    S = pipe.audio_block_samples
    n = len(audio)
    xs = np.broadcast_to(np.asarray(audio, np.float32)[None],
                         (server.n_lanes, n))
    outs = []
    for st in range(0, n - n % S, S):
        outs.append(pipe.process_audio(xs[:, st:st + S]))
    outs.append(pipe.flush(xs[:, n - n % S:] if n % S else None))
    return np.concatenate([o[0] for o in outs], axis=0)
