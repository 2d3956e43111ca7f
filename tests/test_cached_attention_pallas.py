"""Parity: flash cached-attention kernel (interpret mode) vs the pure
`nn.mha_core` masked path it replaces, at op level and through the full
FS blockwise serving step."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fseend_tpu.kernels.cached_attention_pallas import (
    cached_attention_block, flash_cached_attention)
from fseend_tpu.models import fs_eend
from fseend_tpu.ops import nn


def _oracle(q, k, v, start):
    cap = k.shape[-2]
    K = q.shape[-2]
    pos = jnp.arange(cap)[None, :]
    qpos = start + jnp.arange(K)[:, None]
    mask = jnp.where(pos <= qpos, 0.0, nn.NEG_INF)
    return nn.mha_core(q, k, v, mask)


@pytest.mark.parametrize("start", [0, 8, 24, 40])
@pytest.mark.parametrize("R,K,hd,cap,bk", [(4, 8, 16, 64, 16),
                                           (8, 16, 32, 64, 64)])
def test_flash_matches_masked_softmax(start, R, K, hd, cap, bk):
    rng = np.random.default_rng(start + R)
    q = jnp.asarray(rng.standard_normal((R, K, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((R, cap, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((R, cap, hd)), jnp.float32)
    ref = _oracle(q, k, v, start)
    out = flash_cached_attention(q, k, v, start, interpret=True, block_kv=bk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


def test_flash_leading_dims_wrapper():
    """Decoder-shaped (B, C, H, K, hd) call equals the oracle."""
    rng = np.random.default_rng(0)
    B, C, H, K, hd, cap = 2, 3, 2, 8, 16, 32
    q = jnp.asarray(rng.standard_normal((B, C, H, K, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, C, H, cap, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, C, H, cap, hd)), jnp.float32)
    ref = _oracle(q, k, v, 8)
    out = cached_attention_block(q, k, v, 8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


def test_flash_bf16_rounding():
    rng = np.random.default_rng(1)
    R, K, hd, cap = 4, 8, 16, 32
    q = jnp.asarray(rng.standard_normal((R, K, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((R, cap, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((R, cap, hd)), jnp.bfloat16)
    ref = _oracle(q, k, v, 8).astype(jnp.float32)
    out = flash_cached_attention(q, k, v, 8, interpret=True,
                                 block_kv=16).astype(jnp.float32)
    assert out.dtype == jnp.float32 and float(jnp.abs(out - ref).max()) < 2e-2


def test_fs_blockstream_flash_matches_default():
    """Three blockwise serving steps with use_flash_attn == without."""
    cfg = fs_eend.FSEENDConfig(in_size=23, n_units=32, n_heads=2,
                               enc_n_layers=2, dec_n_layers=1, conv_delay=3,
                               enc_dim_feedforward=64, dec_dim_feedforward=64,
                               max_nspks=4)
    fcfg = dataclasses.replace(cfg, use_flash_attn=True)
    params, mstate = fs_eend.init_fs_eend(jax.random.PRNGKey(0), cfg)
    bn = mstate["bn"]
    B, K, cap = 2, 8, 32
    rng = np.random.default_rng(2)
    xs = jnp.asarray(rng.standard_normal((B, 3 * K, cfg.in_size)), jnp.float32)
    outs = {}
    for name, c in (("ref", cfg), ("flash", fcfg)):
        st = fs_eend.fs_blockstream_init(c, B, cap, cfg.max_nspks, K)
        ys = []
        for i in range(3):
            st, y = fs_eend.fs_blockstream_step(
                params, st, c, bn, xs[:, i * K:(i + 1) * K], cfg.max_nspks)
            ys.append(y)
        outs[name] = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(outs["flash"]),
                               np.asarray(outs["ref"]), atol=1e-5, rtol=1e-5)
