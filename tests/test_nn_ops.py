"""Parity of core ops vs torch oracles (the modules the reference builds on)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fseend_tpu.ops import nn


def _t(x):
    return torch.from_numpy(np.asarray(x).copy())


def copy_mha_to_torch(p, m):
    with torch.no_grad():
        m.in_proj_weight.copy_(_t(p["in_proj"]["kernel"]).T)
        m.in_proj_bias.copy_(_t(p["in_proj"]["bias"]))
        m.out_proj.weight.copy_(_t(p["out_proj"]["kernel"]).T)
        m.out_proj.bias.copy_(_t(p["out_proj"]["bias"]))


def test_mha_matches_torch(rng):
    D, H, T, B = 32, 4, 10, 2
    p = nn.mha_init(jax.random.PRNGKey(0), D, H)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    m = torch.nn.MultiheadAttention(D, H, batch_first=True)
    copy_mha_to_torch(p, m)
    m.eval()
    mask = nn.causal_mask(T)
    with torch.no_grad():
        ref, _ = m(_t(x), _t(x), _t(x), attn_mask=_t(mask))
    ours = nn.mha(p, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), mask[None, None])
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


def test_mha_attention_weight_dropout(rng):
    """Train-mode dropout hits the softmax WEIGHT matrix (inverted dropout,
    nn.MultiheadAttention semantics): stochastic, unbiased (mean over draws
    -> eval output), and eval mode is exactly dropout-free."""
    D, H, T, B = 16, 4, 6, 2
    p = nn.mha_init(jax.random.PRNGKey(0), D, H)
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    ev = nn.mha(p, x, x, x)
    # eval / rate=0 / no-rng are all identical
    np.testing.assert_array_equal(
        np.asarray(nn.mha(p, x, x, x, rng=jax.random.PRNGKey(1),
                          dropout_rate=0.5, train=False)), np.asarray(ev))
    one = nn.mha(p, x, x, x, rng=jax.random.PRNGKey(1), dropout_rate=0.5,
                 train=True)
    assert np.abs(np.asarray(one) - np.asarray(ev)).max() > 1e-3  # stochastic
    keys = jax.random.split(jax.random.PRNGKey(2), 4000)
    outs = jax.vmap(lambda k: nn.mha(p, x, x, x, rng=k, dropout_rate=0.5,
                                     train=True))(keys)
    mean = np.asarray(outs).mean(0)
    # unbiased: E[w/keep * mask] = w, and v-combine + out_proj are affine
    np.testing.assert_allclose(mean, np.asarray(ev), atol=0.05)
    assert float(np.asarray(outs).std(0).mean()) > 0.01  # real variance


def test_transformer_layer_matches_torch(rng):
    D, H, FF, T, B = 32, 4, 64, 12, 3
    tl = nn.transformer_layer_init(jax.random.PRNGKey(1), D, H, FF)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    tt = torch.nn.TransformerEncoderLayer(D, H, FF, dropout=0.0, batch_first=True)
    copy_mha_to_torch(tl["self_attn"], tt.self_attn)
    with torch.no_grad():
        tt.linear1.weight.copy_(_t(tl["linear1"]["kernel"]).T)
        tt.linear1.bias.copy_(_t(tl["linear1"]["bias"]))
        tt.linear2.weight.copy_(_t(tl["linear2"]["kernel"]).T)
        tt.linear2.bias.copy_(_t(tl["linear2"]["bias"]))
        tt.norm1.weight.copy_(_t(tl["norm1"]["scale"]))
        tt.norm1.bias.copy_(_t(tl["norm1"]["bias"]))
        tt.norm2.weight.copy_(_t(tl["norm2"]["scale"]))
        tt.norm2.bias.copy_(_t(tl["norm2"]["bias"]))
    tt.eval()
    mask = nn.causal_mask(T)
    with torch.no_grad():
        ref = tt(_t(x), src_mask=_t(mask))
    ours = nn.transformer_layer(tl, jnp.asarray(x), mask[None, None])
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


def test_conv1d_matches_torch(rng):
    D, T, B, K = 16, 30, 2, 19
    cp = nn.conv1d_init(jax.random.PRNGKey(2), D, D, K)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    tc = torch.nn.Conv1d(D, D, K, padding=K // 2)
    with torch.no_grad():
        tc.weight.copy_(_t(np.asarray(cp["kernel"]).transpose(2, 1, 0)))
        tc.bias.copy_(_t(cp["bias"]))
    with torch.no_grad():
        ref = tc(_t(x).transpose(1, 2)).transpose(1, 2)
    ours = nn.lookahead_conv(cp, jnp.asarray(x), K // 2)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


def test_causal_depthwise_conv_matches_torch(rng):
    D, T, B, K = 8, 25, 2, 16
    cp = nn.conv1d_init(jax.random.PRNGKey(3), D, D, K, groups=D, bias=False)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    tc = torch.nn.Conv1d(D, D, K, padding=K - 1, groups=D, bias=False)
    with torch.no_grad():
        tc.weight.copy_(_t(np.asarray(cp["kernel"]).transpose(2, 1, 0)))
    with torch.no_grad():
        ref = tc(_t(x).transpose(1, 2))[:, :, :T].transpose(1, 2)
    ours = nn.causal_depthwise_conv(cp, jnp.asarray(x), K)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


def test_batch_norm_matches_torch(rng):
    D, T, B = 345, 50, 4
    p, s = nn.batch_norm_init(D)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    tb = torch.nn.BatchNorm1d(D)
    # train mode: batch stats + running update
    tb.train()
    with torch.no_grad():
        ref = tb(_t(x).transpose(1, 2)).transpose(1, 2)
    ours, s2 = nn.batch_norm(p, s, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2["mean"]), tb.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2["var"]), tb.running_var.numpy(), atol=1e-4)
    # eval mode uses running stats
    tb.eval()
    with torch.no_grad():
        ref_e = tb(_t(x).transpose(1, 2)).transpose(1, 2)
    ours_e, _ = nn.batch_norm(p, s2, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours_e), ref_e.numpy(), atol=1e-4)


def test_batchnorm_grads_skip_static_metadata():
    p = nn.mha_init(jax.random.PRNGKey(0), 16, 2)
    x = jnp.ones((1, 4, 16))
    g = jax.grad(lambda pp: nn.mha(pp, x, x, x).sum())(p)
    assert isinstance(g["_n_heads"], nn.static_int)
    assert len(jax.tree.leaves(g)) == 4  # in_proj k/b, out_proj k/b


def test_sinusoidal_table_matches_torch_reference():
    import math

    pe = np.asarray(nn.sinusoidal_table(10, 16))
    position = torch.arange(0, 10, dtype=torch.float).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, 16, 2).float() * (-math.log(10000.0) / 16))
    ref = torch.zeros(10, 16)
    ref[:, 0::2] = torch.sin(position * div_term)
    ref[:, 1::2] = torch.cos(position * div_term)
    # atol only (values are O(1)); the remote CPU codegen's transcendental
    # rounding differs from local builds by ~1e-7
    np.testing.assert_allclose(pe, ref.numpy(), rtol=0, atol=1e-5)
