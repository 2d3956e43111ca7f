"""End-to-end integration: synthetic kaldi data dir -> chunked dataset ->
training loop -> checkpoint averaging -> batch & streaming inference ->
RTTM -> DER scoring. Exercises the same path as the reference's
train_dia.py / dia_pred.py / metrics.py chain, miniaturized."""

import os
import wave

import jax
import numpy as np
import pytest

from fseend_tpu.data.dataset import DiarizationDataset, FeatureConfig
from fseend_tpu.models import fs_eend
from fseend_tpu.train import loop, optim, trainer as trainer_lib


def write_wav(path, data, sr=8000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(data, -1, 1) * 32767).astype("<i2").tobytes())


@pytest.fixture(scope="module")
def kaldi_dir(tmp_path_factory):
    """Two 8-second recordings with 2 'speakers' (distinct band noises)."""
    d = tmp_path_factory.mktemp("kaldi")
    rng = np.random.default_rng(0)
    sr, dur = 8000, 8.0
    seg_lines, utt_lines, wav_lines, dur_lines = [], [], [], []
    for r in range(2):
        rec = f"rec{r}"
        n = int(sr * dur)
        audio = 0.01 * rng.standard_normal(n)
        # spk A active 0.5-4.0s (low tone), spk B active 3.0-7.5s (high tone)
        t = np.arange(n) / sr
        a = (t >= 0.5) & (t < 4.0)
        b = (t >= 3.0) & (t < 7.5)
        audio += a * 0.3 * np.sin(2 * np.pi * 220 * t)
        audio += b * 0.3 * np.sin(2 * np.pi * 1400 * t)
        write_wav(d / f"{rec}.wav", audio, sr)
        wav_lines.append(f"{rec} {d / f'{rec}.wav'}")
        dur_lines.append(f"{rec} {dur}")
        seg_lines += [f"{rec}_A_0 {rec} 0.5 4.0", f"{rec}_B_0 {rec} 3.0 7.5"]
        utt_lines += [f"{rec}_A_0 spkA_{r}", f"{rec}_B_0 spkB_{r}"]
    (d / "wav.scp").write_text("\n".join(wav_lines) + "\n")
    (d / "segments").write_text("\n".join(seg_lines) + "\n")
    (d / "utt2spk").write_text("\n".join(utt_lines) + "\n")
    (d / "reco2dur").write_text("\n".join(dur_lines) + "\n")
    return d


FEAT = FeatureConfig(frame_size=200, frame_shift=80, context_size=3,
                     subsampling=5, rate=8000, input_transform="logmel23_mn")


def test_dataset_end_to_end(kaldi_dir):
    ds = DiarizationDataset(str(kaldi_dir), FEAT, chunk_size=80,
                            use_last_samples=True)
    assert len(ds) >= 2
    Y, T, rec = ds[0]
    assert Y.shape[1] == FEAT.input_dim == 7 * 23
    assert T.shape[1] == 2
    assert Y.shape[0] == T.shape[0] == 80
    # labels align with construction: speaker activity exists
    assert T.sum() > 0
    full_T, rec2 = ds.full_labels(0)
    assert full_T.shape[0] >= 80 * FEAT.subsampling - FEAT.subsampling


def test_mini_training_and_inference(kaldi_dir, tmp_path):
    cfg = fs_eend.FSEENDConfig(
        in_size=FEAT.input_dim, n_units=32, n_heads=4, enc_n_layers=1,
        dec_n_layers=1, enc_dim_feedforward=64, dec_dim_feedforward=64,
        dropout=0.0, conv_delay=2, max_nspks=4)
    ds = DiarizationDataset(str(kaldi_dir), FEAT, chunk_size=80)
    task = trainer_lib.TaskConfig(model="fs", label_mode="fixed")
    tx = optim.build_optimizer("adam", lr=2e-3)
    logger = loop.MetricsLogger(str(tmp_path / "logs"), "mini")
    state, ckpt_dir = loop.run_training(
        task=task, model_cfg=cfg,
        init_fn=lambda key: fs_eend.init_fs_eend(key, cfg),
        train_dataset=ds, val_dataset=ds, tx=tx, logger=logger,
        batch_size=2, chunk_size=80, max_speakers=2, input_dim=FEAT.input_dim,
        max_epochs=3, seed=0, log_every=1)
    # every-epoch checkpoints exist
    from fseend_tpu.utils import checkpoint as ckpt_lib

    cks = ckpt_lib.find_epoch_checkpoints(ckpt_dir)
    assert len(cks) == 3
    # metrics were logged
    assert (ckpt_dir / "metrics.jsonl").read_text().count("\n") > 0

    # checkpoint averaging (BN stats from the last ckpt ride along)
    avg, avg_mstate, paths = loop.average_epoch_range(
        ckpt_dir, jax.tree.map(np.asarray, state.params), 1, 2,
        model_state_template=jax.tree.map(np.asarray, state.model_state))
    assert len(paths) == 2
    assert avg_mstate is not None
    np.testing.assert_allclose(
        np.asarray(avg_mstate["bn"]["mean"]),
        np.asarray(state.model_state["bn"]["mean"]), atol=1e-6)

    # inference + rttm + scoring close the loop
    import jax.numpy as jnp

    from fseend_tpu.utils.metrics import score_frames
    from fseend_tpu.utils.rttm import make_rttm

    Y, T, rec = ds[0]
    out = fs_eend.fs_test({k: v for k, v in avg.items()}, state.model_state,
                          cfg, jnp.asarray(Y)[None], jnp.array([len(Y)]), 4)
    probs = np.asarray(jax.nn.sigmoid(out["logits"][0, :, 1:]))
    text = make_rttm(rec, probs, frame_shift=80, subsampling=5,
                     sampling_rate=8000)
    full_T, _ = ds.full_labels(0)
    c = score_frames(np.asarray(full_T), probs, collar_frames=10,
                     subsampling=5)
    assert np.isfinite(c.der)


def test_evaluate_folder_cli_path(kaldi_dir, tmp_path):
    """cli.train.evaluate_folder: ckpt averaging + test pass + h5 dump."""
    import sys

    sys.path.insert(0, "/root/repo")
    from cli.train import evaluate_folder

    cfg = fs_eend.FSEENDConfig(
        in_size=FEAT.input_dim, n_units=32, n_heads=4, enc_n_layers=1,
        dec_n_layers=1, enc_dim_feedforward=64, dec_dim_feedforward=64,
        dropout=0.0, conv_delay=2, max_nspks=4)
    params, mstate = fs_eend.init_fs_eend(jax.random.PRNGKey(0), cfg)
    from fseend_tpu.utils import checkpoint as ckpt_lib

    folder = tmp_path / "ckpts"
    ckpt_lib.save_pytree(folder / "ckpt_epoch=0.npz",
                         {"params": jax.tree.map(np.asarray, params),
                          "model_state": jax.tree.map(np.asarray, mstate)})
    configs = {
        "log": {},
        "model": {"arch": "fs_eend",
                  "params": {"n_units": 32, "n_heads": 4, "enc_n_layers": 1,
                             "dec_n_layers": 1, "enc_dim_feedforward": 64,
                             "dec_dim_feedforward": 64,
                             "dropout": 0.0, "conv_delay": 2}},
        "data": {"max_speakers": 2, "context_recp": FEAT.context_size,
                 "label_delay": 0, "feat_type": FEAT.input_transform,
                 "chunk_size": 80, "subsampling": FEAT.subsampling,
                 "use_last_samples": True, "num_speakers": None,
                 "val_data_dir": str(kaldi_dir),
                 "feat": {"sample_rate": 8000, "win_length": 200,
                          "hop_length": 80, "n_mels": 23}},
        "task": {"label_mode": "fixed"},
    }
    # enc_dim_feedforward differs from the CLI default (2048); patch in-place
    import cli.train as CT

    agg = evaluate_folder(configs, str(folder))
    assert "DER" in agg
    import glob

    import h5py

    h5s = sorted(glob.glob(str(folder / "preds_h5" / "*.h5")))
    assert len(h5s) >= 1

    # batched eval (val_batch_size=3, ragged final batch) must reproduce the
    # batch=1 h5 outputs and counters exactly
    ref = {}
    for f in h5s:
        with h5py.File(f, "r") as z:
            ref[f] = np.asarray(z["T_hat"]) if "T_hat" in z else np.asarray(
                z[list(z.keys())[0]])
    configs["training"] = {"val_batch_size": 3}
    agg_b = evaluate_folder(configs, str(folder))
    for f in h5s:
        with h5py.File(f, "r") as z:
            got = np.asarray(z[list(z.keys())[0]])
        np.testing.assert_allclose(got, ref[f], atol=1e-6)
    np.testing.assert_allclose(agg_b["DER"], agg["DER"], atol=1e-6)


def test_streaming_inference_on_real_features(kaldi_dir):
    """Batch == streaming on actual extracted features (not random data)."""
    import jax.numpy as jnp

    cfg = fs_eend.FSEENDConfig(
        in_size=FEAT.input_dim, n_units=32, n_heads=4, enc_n_layers=1,
        dec_n_layers=1, enc_dim_feedforward=64, dec_dim_feedforward=64,
        dropout=0.0, conv_delay=2, max_nspks=4)
    params, mstate = fs_eend.init_fs_eend(jax.random.PRNGKey(0), cfg)
    ds = DiarizationDataset(str(kaldi_dir), FEAT, chunk_size=80)
    Y, _, _ = ds[0]
    xs = jnp.asarray(Y)[None]
    batch = fs_eend.fs_test(params, mstate, cfg, xs, jnp.array([len(Y)]), 4)
    st = fs_eend.fs_stream_init(cfg, 1, len(Y) + cfg.conv_delay, 4)
    logits_s, _ = fs_eend.fs_stream_scan(params, st, cfg, mstate["bn"], xs, 4)
    np.testing.assert_allclose(np.asarray(logits_s),
                               np.asarray(batch["logits"]), atol=1e-4)
