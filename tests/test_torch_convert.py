"""End-to-end parity with the reference models via the checkpoint converter.

Goldens were generated once from random-initialized reference models in eval
mode (state dicts + inputs + outputs stored as data); the framework must
reproduce reference `model.test` outputs bit-closely after conversion.
This is the guarantee that released reference checkpoints work here.
"""

import pathlib

import jax.numpy as jnp
import numpy as np

from fseend_tpu.models import fs_eend as FS
from fseend_tpu.models import ls_eend as LS
from fseend_tpu.utils import torch_convert as TC

GOLDENS = pathlib.Path(__file__).parent / "goldens"


def _load(name):
    g = np.load(GOLDENS / name)
    sd = {k[len("sd__"):]: g[k] for k in g.files if k.startswith("sd__")}
    return g, sd


def test_fs_checkpoint_parity():
    g, sd = _load("fs_model_ref.npz")
    cfg = FS.FSEENDConfig(in_size=23, n_units=32, n_heads=4, enc_n_layers=2,
                          dec_n_layers=2, enc_dim_feedforward=2048,
                          dec_dim_feedforward=64, conv_delay=9, max_nspks=4)
    params, state = TC.fs_from_state_dict(sd, cfg)
    xs = jnp.asarray(g["x"])
    out = FS.fs_test(params, state, cfg, xs, jnp.array([16, 16]), max_nspks=4)
    np.testing.assert_allclose(np.asarray(out["logits"]), g["logits"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["emb"]), g["emb"], atol=2e-4)


def test_ls_checkpoint_parity():
    g, sd = _load("ls_model_ref.npz")
    cfg = LS.LSEENDConfig(in_size=23, n_units=32, n_heads=4, enc_n_layers=2,
                          dec_n_layers=2, chunk_size=8, ff_expansion=2,
                          conv_kernel_size=5, dec_dim_feedforward=64,
                          conv_delay=3, max_nspks=4)
    params, state = TC.ls_from_state_dict(sd, cfg)
    xs = jnp.asarray(g["x"])
    out = LS.ls_test(params, state, cfg, xs, jnp.array([16, 16]), max_nspks=4)
    np.testing.assert_allclose(np.asarray(out["logits"]), g["logits"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["emb"]), g["emb"], atol=2e-4)


def test_ls_streaming_on_converted_weights():
    """Converted reference weights drive the O(1) streaming path too; batch
    (recurrent mode) == streaming on real (not just random-init) params."""
    g, sd = _load("ls_model_ref.npz")
    cfg = LS.LSEENDConfig(in_size=23, n_units=32, n_heads=4, enc_n_layers=2,
                          dec_n_layers=2, chunk_size=8, ff_expansion=2,
                          conv_kernel_size=5, dec_dim_feedforward=64,
                          conv_delay=3, max_nspks=4)
    params, state = TC.ls_from_state_dict(sd, cfg)
    xs = jnp.asarray(g["x"])
    batch = LS.ls_forward(params, state, cfg, xs, jnp.array([16, 16]), 4,
                          time_mode="recurrent")
    st = LS.ls_stream_init(cfg, 2, n_slots=4)
    logits_s, _ = LS.ls_stream_scan(params, st, cfg, state, xs, n_slots=4)
    np.testing.assert_allclose(np.asarray(logits_s), np.asarray(batch["logits"]),
                               atol=1e-4)
    # and the streaming output is within the reference's accepted drift of the
    # chunkwise golden (LS streaming_infer_dia.py checks atol=1e-3)
    assert float(np.abs(np.asarray(logits_s) - g["logits"]).max()) < 5e-2


def _load_prod(name):
    """Production-shape goldens ship f16 state dicts (both sides compute
    from bit-identical f16-representable weights; tools/regen_goldens.py
    ::prod_goldens rounds the reference model before running it)."""
    g = np.load(GOLDENS / name)
    sd = {k[len("sd__"):]: (np.asarray(g[k], np.float32)
                            if g[k].dtype == np.float16 else g[k])
          for k in g.files if k.startswith("sd__")}
    return g, sd


def test_fs_checkpoint_parity_production_shape():
    """n_units=256, 4+2 layers, T=1500 — the published-DER shape. Measured
    drift 2.3e-5 (f32 accumulation over 1500-frame causal attention)."""
    g, sd = _load_prod("fs_model_prod.npz")
    cfg = FS.FSEENDConfig(in_size=345, n_units=256, n_heads=4, enc_n_layers=4,
                          dec_n_layers=2, enc_dim_feedforward=2048,
                          dec_dim_feedforward=2048, conv_delay=9, max_nspks=6)
    params, state = TC.fs_from_state_dict(sd, cfg)
    out = FS.fs_test(params, state, cfg, jnp.asarray(np.asarray(g["x"], np.float32)),
                     jnp.array([1500]), max_nspks=6)
    np.testing.assert_allclose(np.asarray(out["logits"]), g["logits"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["emb"]), g["emb"], atol=1e-5)


def test_ls_checkpoint_parity_production_shape():
    """n_units=256, 4+2 layers, chunk=500, T=1537 (pads to 2000: 3 chunk
    boundaries + ragged tail) — pins the cross-chunk retention recursion
    (retention.py:146-194) and chunk-multiple padding at size. Measured
    drift 2.9e-4, within the reference's own 1e-3 streaming check
    (LS-EEND/streaming_infer_dia.py:157-160)."""
    g, sd = _load_prod("ls_model_prod.npz")
    cfg = LS.LSEENDConfig(in_size=345, n_units=256, n_heads=4, enc_n_layers=4,
                          dec_n_layers=2, chunk_size=500, ff_expansion=4,
                          conv_kernel_size=16, dec_dim_feedforward=2048,
                          conv_delay=9, max_nspks=10)
    params, state = TC.ls_from_state_dict(sd, cfg)
    out = LS.ls_test(params, state, cfg, jnp.asarray(np.asarray(g["x"], np.float32)),
                     jnp.array([1537]), max_nspks=10)
    np.testing.assert_allclose(np.asarray(out["logits"]), g["logits"], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["emb"]), g["emb"], atol=1e-5)


def test_average_state_dicts():
    sd1 = {"a": np.ones((2, 2), np.float32)}
    sd2 = {"a": np.full((2, 2), 3.0, np.float32)}
    avg = TC.average_state_dicts([sd1, sd2])
    np.testing.assert_allclose(avg["a"], 2.0)


def test_load_torch_ckpt_quirks(tmp_path):
    """load_torch_ckpt handles {'state_dict': ...} wrapping, the Lightning
    'model.' prefix and the legacy decoder key remap (dia_pred.py:44-50,
    LS streaming_infer_dia.py:124-130) — exercised on a real torch file."""
    import torch

    g, sd = _load("fs_model_ref.npz")
    wrapped = {"state_dict": {f"model.{k}": torch.from_numpy(v.copy())
                              for k, v in sd.items()}}
    path = tmp_path / "ref.ckpt"
    torch.save(wrapped, path)
    loaded = TC.load_torch_ckpt(str(path))
    # prefix stripped, legacy remap applied
    assert not any(k.startswith("model.") for k in loaded)
    assert not any("attractor_decoder" in k for k in loaded)
    assert any(k.startswith("dec.layers.0.") for k in loaded)
    cfg = FS.FSEENDConfig(in_size=23, n_units=32, n_heads=4, enc_n_layers=2,
                          dec_n_layers=2, enc_dim_feedforward=2048,
                          dec_dim_feedforward=64, conv_delay=9, max_nspks=4)
    params, state = TC.fs_from_state_dict(loaded, cfg)
    out = FS.fs_test(params, state, cfg, jnp.asarray(g["x"]),
                     jnp.array([16, 16]), max_nspks=4)
    np.testing.assert_allclose(np.asarray(out["logits"]), g["logits"], atol=2e-4)
