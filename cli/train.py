"""Training entry point — unified replacement for the reference's six entry
scripts (train_dia.py, train_dia_fintn_ch.py, train_offl_eend_eda.py,
LS train_dia_simu.py, train_dia_fintun_real.py), driven by one yaml config.

Usage:
  python -m cli.train --configs configs/fs_simu.yaml
  python -m cli.train --configs configs/ls_simu.yaml --test_from_folder DIR
  python -m cli.train --configs ... --checkpoint_resume CKPT
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_model(configs):
    """Model family + init fn + TaskConfig from the config's model.arch."""
    import jax

    from fseend_tpu.models import eend_eda, fs_eend, ls_eend
    from fseend_tpu.train import trainer as trainer_lib

    arch = configs["model"]["arch"]
    p = dict(configs["model"].get("params") or {})
    data = configs["data"]
    in_size = (2 * data["context_recp"] + 1) * data["feat"]["n_mels"]
    max_spk = data["max_speakers"]
    label_mode = configs.get("task", {}).get("label_mode", "fixed")

    if arch.startswith("ls") or "conformer" in arch:
        cfg = ls_eend.LSEENDConfig(
            in_size=in_size, n_units=p.get("n_units", 256),
            n_heads=p.get("n_heads", 4), enc_n_layers=p.get("enc_n_layers", 4),
            dec_n_layers=p.get("dec_n_layers", 2), dropout=p.get("dropout", 0.1),
            chunk_size=p.get("recurrent_chunk_size", 500),
            ff_expansion=p.get("feed_forward_expansion_factor", 4),
            conv_expansion=p.get("conv_expansion_factor", 2),
            conv_kernel_size=p.get("conv_kernel_size", 16),
            dec_dim_feedforward=p.get("dec_dim_feedforward", 2048),
            conv_delay=p.get("conv_delay", 9),
            mask_delay=p.get("mask_delay", 0), max_nspks=max_spk + 2,
            use_pallas=p.get("use_pallas", False),
            use_fused_ret=p.get("use_fused_ret", False),
            use_fused_dec=p.get("use_fused_dec", False),
            fused_dec_chunk=p.get("fused_dec_chunk"),
            remat=p.get("remat", False))
        init = lambda key: ls_eend.init_ls_eend(key, cfg)
        task = trainer_lib.TaskConfig(
            model="ls", label_mode=label_mode, masked_emb_loss=True,
            compute_dtype=configs.get("training", {}).get("precision", "f32"),
            label_delay=data.get("label_delay", 0),
            consis_weight=configs.get("task", {}).get(
                "spk_attractor", {}).get("consis_weight", 1.0))
    elif "eda" in arch or "offl" in arch:
        cfg = eend_eda.EDAConfig(
            in_size=in_size, n_units=p.get("n_units", 256),
            n_heads=p.get("n_heads", 4), n_layers=p.get("enc_n_layers", 4),
            dropout=p.get("dropout", 0.1))
        init = lambda key: eend_eda.init_eend_eda(key, cfg)
        task = trainer_lib.TaskConfig(model="eda", label_mode="pit")
    else:
        cfg = fs_eend.FSEENDConfig(
            in_size=in_size, n_units=p.get("n_units", 256),
            n_heads=p.get("n_heads", 4), enc_n_layers=p.get("enc_n_layers", 4),
            dec_n_layers=p.get("dec_n_layers", 2), dropout=p.get("dropout", 0.1),
            enc_dim_feedforward=p.get("enc_dim_feedforward", 2048),
            dec_dim_feedforward=p.get("dec_dim_feedforward", 2048),
            conv_delay=p.get("conv_delay", 9), mask_delay=p.get("mask_delay", 0),
            max_nspks=max_spk + 2)
        init = lambda key: fs_eend.init_fs_eend(key, cfg)
        task = trainer_lib.TaskConfig(
            model="fs", label_mode=label_mode,
            compute_dtype=configs.get("training", {}).get("precision", "f32"),
            label_delay=data.get("label_delay", 0),
            consis_weight=configs.get("task", {}).get(
                "spk_attractor", {}).get("consis_weight", 1.0))
    return cfg, init, task


def evaluate_folder(configs, folder):
    """Reference --test_from_folder path (train_dia.py:166-185): average the
    folder's epoch checkpoints, run model.test over the val set with
    max_speakers+2 attractor slots, report the frame-level DER table, and
    dump per-recording probability h5 files for the scoring pipeline."""
    import jax
    import jax.numpy as jnp

    from fseend_tpu.data.dataset import DiarizationDataset, FeatureConfig
    from fseend_tpu.data.loader import batched
    from fseend_tpu.models import fs_eend, ls_eend
    from fseend_tpu.train import labels as labels_lib
    from fseend_tpu.train import losses, trainer as trainer_lib
    from fseend_tpu.utils import checkpoint as ckpt_lib
    from fseend_tpu.utils.postprocess import save_h5_probs

    data = configs["data"]
    feat = FeatureConfig(
        frame_size=data["feat"]["win_length"], frame_shift=data["feat"]["hop_length"],
        context_size=data["context_recp"], subsampling=data["subsampling"],
        rate=data["feat"]["sample_rate"], input_transform=data["feat_type"])
    ds = DiarizationDataset(
        data["val_data_dir"], feat, chunk_size=data["chunk_size"],
        use_last_samples=data.get("use_last_samples", True),
        n_speakers=data.get("num_speakers"))
    model_cfg, init_fn, task = build_model(configs)
    params, mstate = init_fn(jax.random.PRNGKey(0))
    paths = ckpt_lib.find_epoch_checkpoints(
        folder, configs["log"].get("start_epoch"), configs["log"].get("end_epoch"))
    if paths:
        params = ckpt_lib.average_checkpoints(
            paths, {"params": jax.tree.map(np.asarray, params)})["params"]
        loaded = ckpt_lib.load_pytree(
            paths[-1], {"params": jax.tree.map(np.asarray, params),
                        "model_state": jax.tree.map(np.asarray, mstate)})
        mstate = loaded["model_state"]
        print(f"averaged {len(paths)} checkpoints from {folder}")

    test_fn = ls_eend.ls_test if task.model == "ls" else fs_eend.fs_test
    max_slots = data["max_speakers"] + 2
    h5_dir = os.path.join(folder, "preds_h5")
    os.makedirs(h5_dir, exist_ok=True)
    # batched publication-protocol eval: one compiled program per batch
    # shape (the ragged final batch adds at most one more); chunks of one
    # recording stay index-ordered, so per-rec reassembly is unchanged
    eval_bs = int(configs.get("training", {}).get("val_batch_size")
                  or configs.get("training", {}).get("batch_size", 8))
    jit_test = jax.jit(lambda feats, lens: test_fn(
        params, mstate, model_cfg, feats, lens, max_slots))
    ms = []
    per_rec: dict[str, list] = {}
    for batch in batched(ds, range(len(ds)), eval_bs, data["chunk_size"],
                         data["max_speakers"], feat.input_dim, drop_last=False):
        recs = batch.pop("recs")
        b = {k: jnp.asarray(v) for k, v in batch.items()}
        out = jit_test(b["feats"], b["lens"])
        slot_labels, _ = labels_lib.prepare_labels(b["labels"], b["lens"], b["n_spk"])
        # frame-level DER proxy over real-speaker slots (test_step :186-194)
        stats = losses.diarization_error_counters(
            out["logits"][..., 1:1 + data["max_speakers"]],
            slot_labels[..., 1:1 + data["max_speakers"]], b["lens"],
            jnp.arange(data["max_speakers"])[None] < b["n_spk"][:, None])
        ms.append(jax.tree.map(np.asarray, stats))
        probs_all = np.asarray(jax.nn.sigmoid(out["logits"][..., 1:]))
        lens_np = np.asarray(b["lens"])
        for i, rec in enumerate(recs):
            per_rec.setdefault(rec, []).append(probs_all[i, : lens_np[i]])
    for rec, parts in per_rec.items():
        save_h5_probs(os.path.join(h5_dir, rec + ".h5"),
                      np.concatenate(parts, axis=0))
    agg = trainer_lib.aggregate_metrics(ms)
    print({f"test/{k}": round(float(v), 5) for k, v in agg.items()})
    print(f"h5 predictions -> {h5_dir} (score with cli.score --hyp_dir)")
    return agg


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", required=True)
    parser.add_argument("--checkpoint_resume", default=None)
    parser.add_argument("--test_from_folder", default=None,
                        help="average epoch ckpts in folder and evaluate")
    parser.add_argument("--max_epochs", type=int, default=None)
    args = parser.parse_args()

    import jax

    from fseend_tpu.data.dataset import (DiarizationDataset, FeatureConfig,
                                          OnTheFlyDiarizationDataset)
    from fseend_tpu.train import loop, optim, trainer as trainer_lib
    from fseend_tpu.utils.config import dump_config, load_config

    configs = load_config(args.configs)
    data = configs["data"]
    tr = configs["training"]
    np.random.seed(tr.get("seed", 777))

    if args.test_from_folder:
        return evaluate_folder(configs, args.test_from_folder)

    feat = FeatureConfig(
        frame_size=data["feat"]["win_length"], frame_shift=data["feat"]["hop_length"],
        context_size=data["context_recp"], subsampling=data["subsampling"],
        rate=data["feat"]["sample_rate"], input_transform=data["feat_type"])

    on_the_fly = "chunk_step" in data
    DS = OnTheFlyDiarizationDataset if on_the_fly else DiarizationDataset
    train_set = DS(data["train_data_dir"], feat, chunk_size=data["chunk_size"],
                   use_last_samples=data.get("use_last_samples", True),
                   label_delay=data.get("label_delay", 0),
                   n_speakers=data.get("num_speakers"))
    val_set = DiarizationDataset(
        data["val_data_dir"], feat,
        chunk_size=data.get("val_chunk_size", data["chunk_size"]),
        use_last_samples=data.get("use_last_samples", True),
        label_delay=data.get("label_delay", 0),
        n_speakers=data.get("num_speakers"))

    # ---- device mesh (the reference's `dist_strategy: ddp`,
    # train_dia.py:145-156, plus an optional tensor-parallel axis) ----
    mesh = None
    mesh_cfg = tr.get("mesh")
    if mesh_cfg or tr.get("dist_strategy") in ("ddp", "dp"):
        from fseend_tpu.parallel import mesh as pmesh

        n_dev = len(jax.devices())
        if mesh_cfg:
            n_model = int(mesh_cfg.get("model", 1))
            n_data = int(mesh_cfg.get("data", 0)) or n_dev // n_model
        else:
            n_data, n_model = n_dev, 1
        if n_data * n_model > 1:
            mesh = pmesh.make_mesh(n_data=n_data, n_model=n_model)
            print(f"mesh: {n_data} data x {n_model} model "
                  f"({n_dev} devices visible)")
        else:
            print("dist requested but only 1 device visible; single-chip run")

    model_cfg, init_fn, task = build_model(configs)
    tx = optim.build_optimizer(
        tr.get("opt", "noam"), lr=tr.get("lr", 1.0),
        d_model=configs["model"]["params"].get("n_units", 256),
        warmup_steps=tr.get("warm_steps", 100_000),
        schedule_scale=tr.get("schedule_scale", 1.0),
        grad_clip=tr.get("grad_clip", 5.0), grad_accum=tr.get("grad_accm", 1))

    logger = loop.MetricsLogger(
        os.path.dirname(configs["log"]["log_dir"]) or "./logs",
        configs["log"]["model_name"])
    dump_config(configs, logger.dir / "config.yaml")

    debug = configs.get("debug") or {}
    import contextlib

    mesh_ctx = jax.set_mesh(mesh) if mesh is not None else contextlib.nullcontext()
    with mesh_ctx:
        state, ckpt_dir = loop.run_training(
            task=task, model_cfg=model_cfg, init_fn=init_fn,
            train_dataset=train_set, val_dataset=val_set, tx=tx, logger=logger,
            batch_size=tr["batch_size"], chunk_size=data["chunk_size"],
            max_speakers=data["max_speakers"], input_dim=feat.input_dim,
            max_epochs=args.max_epochs or tr["max_epochs"], seed=tr.get("seed", 777),
            early_stop_patience=tr.get("early_stop_epoch"),
            val_interval=tr.get("val_interval", 1),
            init_ckpt=tr.get("init_ckpt"), resume_from=args.checkpoint_resume,
            on_the_fly=on_the_fly, mesh=mesh,
            log_every=debug.get("log_every_n_steps", 100),
            limit_train_batches=debug.get("limit_train_batches"),
            limit_val_batches=debug.get("limit_val_batches"))

    # post-training checkpoint averaging (train_dia.py:166-184); BN running
    # stats ride along from the last epoch so avg_model.npz is standalone
    try:
        avg, avg_mstate, paths = loop.average_epoch_range(
            ckpt_dir, jax.tree.map(np.asarray, state.params),
            configs["log"].get("start_epoch"), configs["log"].get("end_epoch"),
            model_state_template=jax.tree.map(np.asarray, state.model_state))
        from fseend_tpu.utils import checkpoint as ckpt_lib

        out = configs["log"].get("save_avg_path") or str(ckpt_dir / "avg_model.npz")
        tree = {"params": avg}
        if avg_mstate is not None:
            tree["model_state"] = avg_mstate
        ckpt_lib.save_pytree(out, tree)
        print(f"averaged {len(paths)} checkpoints -> {out}")
    except FileNotFoundError:
        pass


if __name__ == "__main__":
    main()
