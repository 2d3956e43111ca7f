"""Progressive 1->N-speaker curriculum on synthetic mixtures, end to end.

Reproduces the reference's curriculum protocol (successive runs warm-started
via init_ckpt from the previous stage's averaged checkpoint — the
LS-EEND/conf finetune pattern and FS-EEND/README "training on simulated
data" chain) with this framework's CLI, all the way through checkpoint
averaging -> --test_from_folder h5 dump -> collar-scored DER (cli.score),
for either model family:

  python tools/run_curriculum.py --model fs --work /tmp/curr_fs \
      --stages 1,2,3,4 --epochs 6

Writes WORK/RESULTS.md with the DER-vs-epoch table per stage (from the run's
metrics.jsonl) and the final collar DER per stage.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(args, **kw):
    print("+", " ".join(args), flush=True)
    return subprocess.run(args, check=True, cwd=HERE, text=True,
                          capture_output=True, **kw)


def make_config(path, *, model, tr_dir, cv_dir, max_spk, epochs, init_ckpt,
                n_units, batch_size, log_dir, name, on_the_fly,
                enc_layers=2, dec_layers=1, ff_dim=256, chunk=100,
                rec_chunk=100, ff_expansion=2, lr=0.001):
    # reference protocol: average the LAST ~10 epochs (FS-EEND/README.md:56)
    avg_start = max(0, epochs - 10)
    lines = [
        "log:",
        f"  model_name: {name}",
        f"  log_dir: {log_dir}/x",
        f"  start_epoch: {avg_start}",
        f"  end_epoch: {epochs - 1}",
        "training:",
        f"  batch_size: {batch_size}",
        # plain adam: at these tiny step counts (~20 steps/epoch) the Noam
        # peak lands near the END of the run and destabilizes late epochs —
        # exactly the window the checkpoint average samples.  1e-3 suits the
        # small models; the 256-unit production model needs ~3e-4 (1e-3
        # diverges after ~7 epochs, measured)
        f"  lr: {lr}",
        "  opt: adam",
        f"  max_epochs: {epochs}",
        "  grad_clip: 5",
        "  grad_accm: 1",
        "  warm_steps: 200",
        "  schedule_scale: 0.5",
        "  seed: 777",
        f"  init_ckpt: {init_ckpt or ''}",
        "model:",
        f"  arch: {'ls_eend' if model == 'ls' else 'fs_eend'}",
        "  params:",
        f"    n_units: {n_units}",
        "    n_heads: 4",
        f"    enc_n_layers: {enc_layers}",
        f"    dec_n_layers: {dec_layers}",
        f"    {'dec_dim_feedforward' if model == 'ls' else 'enc_dim_feedforward'}: {ff_dim}",
    ]
    if model == "fs":
        lines.append(f"    dec_dim_feedforward: {ff_dim}")
    else:
        lines += ["    conv_kernel_size: 16",
                  f"    recurrent_chunk_size: {rec_chunk}",
                  f"    feed_forward_expansion_factor: {ff_expansion}"]
    lines += [
        "    dropout: 0.1",
        "    conv_delay: 9",
        "data:",
        "  num_speakers:",
        f"  max_speakers: {max_spk}",
        "  context_recp: 7",
        "  label_delay: 0",
        "  feat_type: logmel23_mn",
        f"  chunk_size: {chunk}",
        "  subsampling: 10",
        "  use_last_samples: True",
    ]
    if on_the_fly:
        lines.append(f"  chunk_step: {chunk // 2}")
    lines += [
        "  feat: {sample_rate: 8000, win_length: 200, n_fft: 1024, "
        "hop_length: 80, n_mels: 23}",
        f"  train_data_dir: {tr_dir}",
        f"  val_data_dir: {cv_dir}",
        "task:",
        "  label_mode: fixed",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def epoch_der_table(log_root, name):
    """val/DER rows for a stage, merged across ALL version dirs (a stage
    interrupted by SIGTERM resumes into a fresh version_N; the early epochs'
    metrics live in the older one)."""
    rows = {}
    for vdir in all_versions(log_root, name):
        path = os.path.join(vdir, "metrics.jsonl")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if "val/DER" in rec:
                    rows[rec["step"]] = rec["val/DER"]
    return sorted(rows.items())


def all_versions(log_root, name):
    base = os.path.join(log_root, name)
    if not os.path.isdir(base):
        return []
    vs = sorted(int(v.split("_")[1]) for v in os.listdir(base)
                if v.startswith("version_"))
    return [os.path.join(base, f"version_{v}") for v in vs]


def latest_version(log_root, name):
    return all_versions(log_root, name)[-1]


def stage_status(log_root, name):
    """('done', vdir) | ('resume', preempt_ckpt) | ('fresh', None)."""
    versions = all_versions(log_root, name)
    if not versions:
        return "fresh", None
    vdir = versions[-1]
    if os.path.exists(os.path.join(vdir, "avg_model.npz")):
        return "done", vdir
    pre = os.path.join(vdir, "ckpt_preempt.npz")
    if os.path.exists(pre):
        return "resume", pre
    return "fresh", None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["fs", "ls"], default="fs")
    ap.add_argument("--work", required=True)
    ap.add_argument("--stages", default="1,2,3,4")
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--n_recs", type=int, default=24)
    ap.add_argument("--dur", type=float, default=60.0)
    ap.add_argument("--n_units", type=int, default=64)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--max_spk", type=int, default=4)
    # production-size knobs (VERDICT r2 #5: run the real config's model —
    # --n_units 256 --enc_layers 4 --dec_layers 2 --ff_dim 2048 --chunk 500)
    ap.add_argument("--enc_layers", type=int, default=2)
    ap.add_argument("--dec_layers", type=int, default=1)
    ap.add_argument("--ff_dim", type=int, default=256)
    ap.add_argument("--ff_expansion", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--lr", type=float, default=0.001)
    ap.add_argument("--init_ckpt", default=None,
                    help="warm-start the FIRST stage in --stages from this "
                         "checkpoint (chain a partial rerun, e.g. stages "
                         "5,6,7,8, off an earlier run's stage-4 avg ckpt)")
    # round-5 protocol fixes (the r4 2-4-spk collar-DER collapse was almost
    # pure FALSE ALARM from attractor slots the stage never trained: the
    # per-sample nspk+2 loss masking — the reference's own protocol,
    # oln_tfm_enc_dec.py:75 — leaves slots > nspk+2 untrained, and scoring
    # every stage with the GLOBAL max_speakers+2 slots counts their firing
    # as FA):
    ap.add_argument("--pooled", action="store_true",
                    help="stage N trains/validates on mixtures of 1..N "
                         "speakers (the reference's pooled stage sets, "
                         "e.g. swb_sre_tr_ns1n2n3n4_beta2n2n5n9_100000 in "
                         "LS-EEND/conf comment history) instead of "
                         "N-speaker-only data")
    ap.add_argument("--per_stage_slots", action="store_true",
                    help="score stage N with max_speakers=N (N+2 slots), "
                         "like the reference's per-corpus infer configs "
                         "(callhome 7 / ami 4 / dihard 10 = the corpus's "
                         "own speaker count); the global --max_spk still "
                         "bounds the final flagship eval")
    ap.add_argument("--final_eval", action="store_true",
                    help="after the last stage, score EVERY stage's val set "
                         "with the final averaged checkpoint at the global "
                         "max_speakers — the reference's single-checkpoint "
                         "Simu1-8spk table protocol (README.md:66-70)")
    ap.add_argument("--stage_epochs", default=None,
                    help="comma list overriding --epochs per stage "
                         "(len == len(--stages))")
    ap.add_argument("--stage_recs", default=None,
                    help="comma list overriding --n_recs per stage")
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    stages = [int(s) for s in args.stages.split(",")]
    py = sys.executable
    stage_epochs = ([int(e) for e in args.stage_epochs.split(",")]
                    if args.stage_epochs else [args.epochs] * len(stages))
    stage_recs = ([int(r) for r in args.stage_recs.split(",")]
                  if args.stage_recs else [args.n_recs] * len(stages))
    assert len(stage_epochs) == len(stages) and len(stage_recs) == len(stages)

    # 1) data: one (train, val) pair per stage
    for ns, nrec in zip(stages, stage_recs):
        for split, n, seed in (("tr", nrec, 100 + ns), ("cv", 6, 200 + ns)):
            d = os.path.join(args.work, f"{split}_ns{ns}")
            if not os.path.exists(os.path.join(d, "wav.scp")):
                cmd = [py, "tools/make_simu_data.py", "--out", d,
                       "--n_spk", str(ns), "--n_recs", str(n),
                       "--dur", str(args.dur), "--seed", str(seed)]
                if args.pooled and split == "tr":
                    # pool the TRAIN split only: val/test sets stay
                    # exactly-N-speaker, like the reference's per-count
                    # SimuNspk eval rows (README.md:66-70) — and comparable
                    # with the r3/r4 runs' stage tables
                    cmd += ["--min_spk", "1"]
                sh(cmd)

    results = []
    init_ckpt = args.init_ckpt
    for ns, ep, _ in zip(stages, stage_epochs, stage_recs):
        name = f"curr_{args.model}_ns{ns}"
        cfg_path = os.path.join(args.work, f"{name}.yaml")
        make_config(cfg_path, model=args.model,
                    tr_dir=os.path.join(args.work, f"tr_ns{ns}"),
                    cv_dir=os.path.join(args.work, f"cv_ns{ns}"),
                    max_spk=(min(ns, args.max_spk) if args.per_stage_slots
                             else args.max_spk),
                    epochs=ep,
                    init_ckpt=init_ckpt, n_units=args.n_units,
                    batch_size=args.batch_size, log_dir=args.work, name=name,
                    on_the_fly=(args.model == "ls"),
                    enc_layers=args.enc_layers, dec_layers=args.dec_layers,
                    ff_dim=args.ff_dim, ff_expansion=args.ff_expansion,
                    chunk=args.chunk, rec_chunk=args.chunk, lr=args.lr)
        for attempt in (0, 1, 2):
            status, payload = stage_status(args.work, name)
            if status == "done":
                print(f"stage ns{ns}: already complete ({payload}), skipping "
                      f"training", flush=True)
                break
            cmd = [py, "-m", "cli.train", "--configs", cfg_path]
            if status == "resume":
                print(f"stage ns{ns}: resuming from {payload}", flush=True)
                cmd += ["--checkpoint_resume", payload]
            try:
                sh(cmd)
                break
            except subprocess.CalledProcessError as e:
                # transient remote-compile failures (helper SIGKILL under
                # host contention) must not sink a multi-hour chain: retry
                # once from the preemption checkpoint if one was written
                print(f"stage ns{ns} attempt {attempt} failed (rc="
                      f"{e.returncode}); stderr tail:\n"
                      f"{(e.stderr or '')[-2000:]}", flush=True)
                if attempt == 2:
                    raise
        vdir = latest_version(args.work, name)
        init_ckpt = os.path.join(vdir, "avg_model.npz")

        # averaged-ckpt eval -> h5 -> collar DER
        sh([py, "-m", "cli.train", "--configs", cfg_path,
            "--test_from_folder", vdir])
        out = sh([py, "-m", "cli.score", "--configs", cfg_path,
                  "--hyp_dir", os.path.join(vdir, "preds_h5")])
        m = re.search(r"mean der: ([\d.]+)", out.stdout)
        collar_der = float(m.group(1)) if m else float("nan")
        results.append((ns, vdir, epoch_der_table(args.work, name), collar_der))
        print(f"stage ns{ns}: collar DER {collar_der:.4f}", flush=True)

    # flagship protocol: the FINAL chain checkpoint scored on every stage's
    # val set at the global slot count (the reference's single-checkpoint
    # Simu1-8spk table, README.md:66-70 + ..._infer.yaml max_speakers)
    final_rows = []
    if args.final_eval and results:
        final_name = f"curr_{args.model}_ns{stages[-1]}"
        final_vdir = results[-1][1]
        for ns in stages:
            ev = os.path.join(args.work, "final_eval", f"ns{ns}")
            os.makedirs(ev, exist_ok=True)
            for fn in os.listdir(final_vdir):
                if fn.startswith("ckpt_epoch=") and \
                        not os.path.exists(os.path.join(ev, fn)):
                    os.symlink(os.path.join(final_vdir, fn),
                               os.path.join(ev, fn))
            cfg_path = os.path.join(ev, "eval.yaml")
            make_config(cfg_path, model=args.model,
                        tr_dir=os.path.join(args.work, f"tr_ns{ns}"),
                        cv_dir=os.path.join(args.work, f"cv_ns{ns}"),
                        max_spk=args.max_spk, epochs=stage_epochs[-1],
                        init_ckpt=None, n_units=args.n_units,
                        batch_size=args.batch_size, log_dir=ev,
                        name=f"final_ns{ns}",
                        on_the_fly=(args.model == "ls"),
                        enc_layers=args.enc_layers,
                        dec_layers=args.dec_layers,
                        ff_dim=args.ff_dim, ff_expansion=args.ff_expansion,
                        chunk=args.chunk, rec_chunk=args.chunk, lr=args.lr)
            sh([py, "-m", "cli.train", "--configs", cfg_path,
                "--test_from_folder", ev])
            out = sh([py, "-m", "cli.score", "--configs", cfg_path,
                      "--hyp_dir", os.path.join(ev, "preds_h5")])
            m = re.search(r"mean der: ([\d.]+)", out.stdout)
            final_rows.append((ns, float(m.group(1)) if m else float("nan")))
            print(f"final ckpt on ns{ns} val: collar DER {final_rows[-1][1]:.4f}",
                  flush=True)

    with open(os.path.join(args.work, "RESULTS.md"), "w") as f:
        f.write(f"# {args.model.upper()}-EEND progressive curriculum "
                f"(synthetic mixtures)\n\n")
        for ns, vdir, table, collar_der in results:
            f.write(f"## stage {ns}-spk ({vdir})\n\n")
            f.write("| epoch | val frame-DER |\n|---|---|\n")
            for e, (step, der) in enumerate(table):
                f.write(f"| {e} | {der:.4f} |\n")
            f.write(f"\ncollar-0.25s DER of averaged checkpoint: "
                    f"**{collar_der:.4f}**\n\n")
        if final_rows:
            f.write("## final checkpoint on every stage's val set "
                    f"(single ckpt, max_speakers={args.max_spk})\n\n")
            f.write("| val set | collar DER |\n|---|---|\n")
            for ns, d in final_rows:
                f.write(f"| {ns}-spk | {d:.4f} |\n")
            f.write("\n")
    print(f"results -> {os.path.join(args.work, 'RESULTS.md')}")


if __name__ == "__main__":
    main()
