"""Profiling / tracing subsystem (SURVEY.md §5.1).

The reference instantiates a Lightning AdvancedProfiler but never wires it in
(train_dia.py:144) and otherwise uses manual wall-clock prints.  Here:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
    TensorBoard-loadable trace of TPU execution;
  * ``StepTimer`` — rolling wall-clock stats with RTF (real-time factor)
    reporting at the 10 Hz post-subsampling frame rate, the reference's
    ad-hoc ``ms/frame``/``rtf`` prints made first-class
    (LS streaming_infer_dia.py:147-152, tfm_STB.py:213-216);
  * ``annotate(name)`` — named trace region (shows up in the profile).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

FRAME_RATE_HZ = 10.0  # 100 Hz features / 10x subsampling


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling timing stats; report() returns p50/p95/mean ms and, given
    frames-per-step, the realtime factor."""

    def __init__(self, max_samples: int = 1000):
        self.samples: list[float] = []
        self.max_samples = max_samples
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.samples.append(time.perf_counter() - self._t0)
        if len(self.samples) > self.max_samples:
            self.samples = self.samples[-self.max_samples:]

    def report(self, frames_per_step: float | None = None) -> dict:
        if not self.samples:
            return {}
        s = np.asarray(self.samples)
        out = {
            "steps": len(s),
            "mean_ms": float(s.mean() * 1e3),
            "p50_ms": float(np.percentile(s, 50) * 1e3),
            "p95_ms": float(np.percentile(s, 95) * 1e3),
        }
        if frames_per_step:
            fps = frames_per_step / s.mean()
            out["frames_per_sec"] = float(fps)
            out["rtf"] = float(fps / FRAME_RATE_HZ)  # x real time
        return out
