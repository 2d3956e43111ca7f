"""Serving/training throughput sweep: runs bench.py across lane counts,
block sizes and dtypes on the real chip, tabulating frames/s + MFU so the
production defaults are chosen from measurements, not guesses.

MXU alignment note: K (frames per blockwise call) and the lane count are
the two matmul dims XLA tiles onto the 128x128 systolic array — K=100
wastes 22% of every (K x K) retention tile, so 128/256 are swept alongside
the reference-protocol 100.

  python tools/sweep_serving.py --out /tmp/sweep.json
  python tools/sweep_serving.py --train   # training-step sweep instead
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(env_over: dict, timeout: int = 1200) -> dict:
    env = dict(os.environ)
    env.update({k: str(v) for k, v in env_over.items()})
    proc = subprocess.run([sys.executable, "bench.py"], cwd=HERE, env=env,
                          capture_output=True, text=True, timeout=timeout)
    rec = {"env": env_over, "rc": proc.returncode}
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rec["result"] = json.loads(line)
            except json.JSONDecodeError:
                pass
    # per-mode lines ride on stderr
    rec["modes"] = re.findall(r"\[bench\] (.+)", proc.stderr)
    if proc.returncode != 0:
        rec["stderr_tail"] = proc.stderr[-800:]
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/serving_sweep.json")
    ap.add_argument("--lanes", default="128,256,512")
    ap.add_argument("--blocks", default="100,128,256")
    ap.add_argument("--train", action="store_true",
                    help="sweep the training step (dtype x batch) instead")
    args = ap.parse_args()

    runs = []
    if args.train:
        for dt, b in itertools.product(("f32", "bf16"), (16, 32)):
            over = {"BENCH_NO_SERVE": "1",
                    "BENCH_TRAIN_DTYPE": dt, "BENCH_TRAIN_B": b}
            rec = run_bench(over)
            runs.append(rec)
            print(json.dumps(rec, indent=None), flush=True)
    else:
        for lanes, K in itertools.product(
                [int(x) for x in args.lanes.split(",")],
                [int(x) for x in args.blocks.split(",")]):
            over = {"BENCH_LANES": lanes, "BENCH_BLOCKWISE_K": K,
                    "BENCH_NO_TRAIN": "1", "BENCH_SKIP_PERFRAME": "1",
                    "BENCH_NO_PALLAS": "1"}
            rec = run_bench(over)
            runs.append(rec)
            print(json.dumps(rec, indent=None), flush=True)

    with open(args.out, "w") as f:
        json.dump(runs, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
