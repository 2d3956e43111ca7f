"""Synthetic multi-speaker mixture generator (kaldi-dir format).

Stand-in for the reference's simulated SWB/SRE mixtures (BASELINE.md data;
no corpora ship in this sandbox): each global "speaker" has a fixed harmonic
signature (distinct f0 + formant-ish partials), each recording mixes
n_speakers of them with exponential on/off segment patterns (overlap
included, like the beta-overlap simulation recipe), over low white noise.

Writes wav.scp / segments / utt2spk / reco2dur (what data.kaldi reads) plus
a ref.rttm for collar-based scoring with cli.score.

  python tools/make_simu_data.py --out /tmp/simu/tr_ns2 --n_spk 2 \
      --n_recs 20 --dur 60 --pool 40 --seed 0
"""

from __future__ import annotations

import argparse
import os
import wave

import numpy as np


def write_wav(path, data, sr):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(data, -1, 1) * 32767).astype("<i2").tobytes())


def speaker_signal(f0: float, n: int, sr: int, rng) -> np.ndarray:
    """Harmonic stack + slight vibrato — a crude 'voice' with a stable
    spectral identity the logmel front-end can separate."""
    t = np.arange(n) / sr
    vib = 1.0 + 0.01 * np.sin(2 * np.pi * 3.0 * t + rng.uniform(0, 6.28))
    sig = np.zeros(n)
    for h, a in ((1, 1.0), (2, 0.6), (3, 0.35), (4, 0.2)):
        f = f0 * h * vib
        if f0 * h < sr / 2 * 0.9:
            sig += a * np.sin(2 * np.pi * np.cumsum(f) / sr)
    return sig / np.abs(sig).max()


def gen_segments(dur: float, rng, mean_on=3.0, mean_off=4.0, min_len=0.4):
    """Exponential on/off alternation -> [(start, end)] within [0, dur]."""
    segs, t = [], float(rng.exponential(mean_off) * 0.5)
    while t < dur - min_len:
        on = max(min_len, rng.exponential(mean_on))
        end = min(t + on, dur)
        segs.append((round(t, 2), round(end, 2)))
        t = end + max(0.2, rng.exponential(mean_off))
    return segs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n_spk", type=int, default=2)
    ap.add_argument("--min_spk", type=int, default=None,
                    help="mix speaker counts: recording r gets "
                         "min_spk..n_spk speakers (balanced round-robin) — "
                         "the reference's pooled stage sets, e.g. "
                         "swb_sre_tr_ns1n2n3n4_... in LS-EEND/conf/*.yaml "
                         "comment history")
    ap.add_argument("--n_recs", type=int, default=20)
    ap.add_argument("--dur", type=float, default=60.0)
    ap.add_argument("--pool", type=int, default=40, help="global speaker pool")
    ap.add_argument("--sr", type=int, default=8000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noise", type=float, default=0.02)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    # log-spaced fundamentals keep signatures separable in mel space
    f0s = np.exp(np.linspace(np.log(110), np.log(600), args.pool))
    rng.shuffle(f0s)

    wav_l, seg_l, utt_l, dur_l, rttm_l = [], [], [], [], []
    n = int(args.sr * args.dur)
    lo = args.min_spk if args.min_spk is not None else args.n_spk
    for r in range(args.n_recs):
        k = lo + r % (args.n_spk - lo + 1)   # balanced speaker counts
        rec = f"rec{k}spk_{r:04d}"
        spk_ids = rng.choice(args.pool, size=k, replace=False)
        audio = args.noise * rng.standard_normal(n)
        for si, sid in enumerate(spk_ids):
            voice = speaker_signal(f0s[sid], n, args.sr, rng)
            gain = rng.uniform(0.15, 0.3)
            for ui, (st, ed) in enumerate(gen_segments(args.dur, rng)):
                i0, i1 = int(st * args.sr), int(ed * args.sr)
                ramp = min(160, (i1 - i0) // 4)
                env = np.ones(i1 - i0)
                env[:ramp] = np.linspace(0, 1, ramp)
                env[-ramp:] = np.linspace(1, 0, ramp)
                audio[i0:i1] += gain * env * voice[i0:i1]
                utt = f"{rec}_spk{sid:03d}_{ui:03d}"
                seg_l.append(f"{utt} {rec} {st:.2f} {ed:.2f}")
                utt_l.append(f"{utt} spk{sid:03d}")
                rttm_l.append(
                    f"SPEAKER {rec} 1 {st:.2f} {ed - st:.2f} "
                    f"<NA> <NA> spk{sid:03d} <NA> <NA>")
        path = os.path.join(args.out, rec + ".wav")
        write_wav(path, audio, args.sr)
        wav_l.append(f"{rec} {path}")
        dur_l.append(f"{rec} {args.dur}")

    for name, lines in (("wav.scp", wav_l), ("segments", seg_l),
                        ("utt2spk", utt_l), ("reco2dur", dur_l),
                        ("ref.rttm", rttm_l)):
        with open(os.path.join(args.out, name), "w") as f:
            f.write("\n".join(lines) + "\n")
    print(f"{args.out}: {args.n_recs} recs x {args.dur:.0f}s, "
          f"{lo}-{args.n_spk} spk (pool {args.pool})")


if __name__ == "__main__":
    main()
