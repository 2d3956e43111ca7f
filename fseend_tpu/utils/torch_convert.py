"""PyTorch checkpoint -> fseend_tpu param-pytree converter.

Lets users of the reference load its *released checkpoints* directly into the
TPU framework.  Tolerates every format quirk the reference tolerates
(SURVEY.md §5.4): raw state-dict vs {"state_dict": ...} wrapping, the
Lightning "model." prefix (FS-EEND/dia_pred.py:44-50), and the legacy key
remap ``dec.attractor_decoder.layers.*`` -> ``dec.layers.*``
(LS-EEND/streaming_infer_dia.py:124-130).

Pure numpy on dict-of-arrays: torch is only needed to *read* .ckpt files
(``load_torch_ckpt``); converters accept any mapping of numpy arrays.
"""

from __future__ import annotations

import numpy as np

from fseend_tpu.models.fs_eend import FSEENDConfig
from fseend_tpu.models.ls_eend import LSEENDConfig
from fseend_tpu.ops import nn


def load_torch_ckpt(path: str) -> dict:
    """Read a torch .ckpt/.pt file into {name: np.ndarray} with the
    reference's unwrapping + prefix-stripping applied."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    out = {}
    for k, v in sd.items():
        if k.startswith("model."):
            k = k[len("model."):]
        k = k.replace("dec.attractor_decoder.layers.", "dec.layers.")
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def average_state_dicts(sds: list[dict]) -> dict:
    """Uniform parameter averaging (the reference's avg_ckpt,
    FS-EEND/utlis/avg_ckpt.py:6-22) on numpy state dicts."""
    keys = sds[0].keys()
    return {k: np.mean([sd[k].astype(np.float64) for sd in sds], axis=0).astype(sds[0][k].dtype)
            for k in keys}


def normalize_keys(sd: dict) -> dict:
    """Apply the reference's key tolerances to an already-loaded dict:
    strip 'model.' and remap dec.attractor_decoder.layers -> dec.layers."""
    out = {}
    for k, v in sd.items():
        if k.startswith("model."):
            k = k[len("model."):]
        k = k.replace("dec.attractor_decoder.layers.", "dec.layers.")
        out[k] = v
    return out


def _lin(sd, name):
    return {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T),
            "bias": sd[f"{name}.bias"].copy()}


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"].copy(), "bias": sd[f"{name}.bias"].copy()}


def _mha(sd, name, n_heads):
    return {
        "in_proj": {"kernel": np.ascontiguousarray(sd[f"{name}.in_proj_weight"].T),
                    "bias": sd[f"{name}.in_proj_bias"].copy()},
        "out_proj": _lin(sd, f"{name}.out_proj"),
        "_n_heads": nn.static_int(n_heads),
    }


def _conv1d(sd, name, groups=1, bias=True):
    p = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].transpose(2, 1, 0)),
         "_groups": nn.static_int(groups)}
    if bias:
        p["bias"] = sd[f"{name}.bias"].copy()
    return p


def _retention(sd, name):
    return {proj: _lin(sd, f"{name}.{proj}")
            for proj in ["q_proj", "k_proj", "v_proj", "g_proj", "out_proj"]}


def fs_from_state_dict(sd: dict, cfg: FSEENDConfig):
    """Reference OnlineTransformerDADiarization state dict -> (params, state)."""
    sd = normalize_keys(sd)
    enc_layers = []
    for i in range(cfg.enc_n_layers):
        pre = f"enc.transformer_encoder.layers.{i}"
        enc_layers.append({
            "self_attn": _mha(sd, f"{pre}.self_attn", cfg.n_heads),
            "linear1": _lin(sd, f"{pre}.linear1"),
            "linear2": _lin(sd, f"{pre}.linear2"),
            "norm1": _ln(sd, f"{pre}.norm1"),
            "norm2": _ln(sd, f"{pre}.norm2"),
        })
    dec_layers = []
    for i in range(cfg.dec_n_layers):
        pre = f"dec.layers.{i}"
        dec_layers.append({
            "time_attn": _mha(sd, f"{pre}.self_attn1", cfg.n_heads),
            "spk_attn": _mha(sd, f"{pre}.self_attn2", cfg.n_heads),
            "linear1": _lin(sd, f"{pre}.linear1"),
            "linear2": _lin(sd, f"{pre}.linear2"),
            "norm11": _ln(sd, f"{pre}.norm11"),
            "norm12": _ln(sd, f"{pre}.norm12"),
            "norm21": _ln(sd, f"{pre}.norm21"),
            "norm22": _ln(sd, f"{pre}.norm22"),
        })
    params = {
        "enc": {
            "bn": {"scale": sd["enc.bn.weight"].copy(), "bias": sd["enc.bn.bias"].copy()},
            "proj": _lin(sd, "enc.encoder"),
            "norm": _ln(sd, "enc.encoder_norm"),
            "layers": enc_layers,
        },
        "cnn": _conv1d(sd, "cnn"),
        "dec": {"convert": _lin(sd, "dec.convert"), "layers": dec_layers},
    }
    state = {"bn": {"mean": sd["enc.bn.running_mean"].copy(),
                    "var": sd["enc.bn.running_var"].copy()}}
    return params, state


def ls_from_state_dict(sd: dict, cfg: LSEENDConfig):
    """Reference OnlineConformerRetentionDADiarization state dict ->
    (params, state)."""
    sd = normalize_keys(sd)
    blocks, conv_bn = [], []
    for i in range(cfg.enc_n_layers):
        pre = f"enc.encoder.layers.{i}.sequential"
        def ff(j):
            return {
                "norm": _ln(sd, f"{pre}.{j}.module.sequential.0"),
                "linear1": _lin(sd, f"{pre}.{j}.module.sequential.1.linear"),
                "linear2": _lin(sd, f"{pre}.{j}.module.sequential.4.linear"),
            }
        cm = f"{pre}.2.module.sequential"
        pw1_w = sd[f"{cm}.2.conv.weight"]  # (2D, D, 1)
        pw2_w = sd[f"{cm}.7.conv.weight"]  # (D, D, 1)
        blocks.append({
            "ff1": ff(0),
            "ret_norm": _ln(sd, f"{pre}.1.module.layer_norm"),
            "ret": _retention(sd, f"{pre}.1.module.self_attn"),
            "conv": {
                "norm": _ln(sd, f"{cm}.0"),
                "pw1": {"kernel": np.ascontiguousarray(pw1_w[:, :, 0].T),
                        "bias": sd[f"{cm}.2.conv.bias"].copy()},
                "dw": {"kernel": np.ascontiguousarray(
                           sd[f"{cm}.4.conv.weight"].transpose(2, 1, 0)),
                       "_groups": nn.static_int(cfg.n_units)},
                "bn": {"scale": sd[f"{cm}.5.weight"].copy(),
                       "bias": sd[f"{cm}.5.bias"].copy()},
                "pw2": {"kernel": np.ascontiguousarray(pw2_w[:, :, 0].T),
                        "bias": sd[f"{cm}.7.conv.bias"].copy()},
            },
            "ff2": ff(3),
            "final_norm": _ln(sd, f"{pre}.4"),
        })
        conv_bn.append({"mean": sd[f"{cm}.5.running_mean"].copy(),
                        "var": sd[f"{cm}.5.running_var"].copy()})
    dec_layers = []
    for i in range(cfg.dec_n_layers):
        pre = f"dec.layers.{i}"
        dec_layers.append({
            "time_ret": _retention(sd, f"{pre}.self_attn1"),
            "spk_attn": _mha(sd, f"{pre}.self_attn2", cfg.n_heads),
            "linear1": _lin(sd, f"{pre}.linear1"),
            "linear2": _lin(sd, f"{pre}.linear2"),
            "norm11": _ln(sd, f"{pre}.norm11"),
            "norm21": _ln(sd, f"{pre}.norm21"),
            "norm22": _ln(sd, f"{pre}.norm22"),
        })
    params = {
        "enc": {
            "proj": _lin(sd, "enc.encoder.input_projection.linear"),
            "norm": _ln(sd, "enc.encoder.layer_norm"),
            "blocks": blocks,
        },
        "cnn": _conv1d(sd, "cnn"),
        "dec": {"convert": _lin(sd, "dec.convert"), "layers": dec_layers},
    }
    state = {"conv_bn": conv_bn}
    return params, state
