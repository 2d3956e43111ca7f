"""Fully fused retention-layer kernel (projections + chunkwise core +
norm/gate/out-proj in one pallas_call): parity vs the pure-JAX stateful op
in interpret mode on CPU, plus the custom-VJP gradient path and model-level
wiring through LSEENDConfig.use_fused_ret."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fseend_tpu.kernels.retention_layer_pallas import fused_retention_layer
from fseend_tpu.ops import retention as R


def _setup(rng, *, use_decay=False, B=4, T=24, D=32, H=4, chunk=8):
    cfg = R.RetentionConfig(embed_dim=D, num_heads=H, chunk_size=chunk,
                            use_decay=use_decay)
    p = R.init_retention(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.5, jnp.float32)
    return cfg, p, x


@pytest.mark.parametrize("use_decay", [False, True])
def test_fused_layer_matches_pure_fresh(rng, use_decay):
    cfg, p, x = _setup(rng, use_decay=use_decay)
    y_ref, st_ref = R.retention_chunkwise_stateful(p, x, None, cfg)
    y_k, st_k = fused_retention_layer(p, x, None, cfg, True)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_k["kv"]), np.asarray(st_ref["kv"]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_k["scale"]),
                               np.asarray(st_ref["scale"]), atol=2e-5)


@pytest.mark.parametrize("use_decay", [False, True])
def test_fused_layer_matches_pure_carried_state(rng, use_decay):
    """Continue from a genuine mid-stream state (the serving pattern)."""
    cfg, p, x = _setup(rng, use_decay=use_decay, T=48)
    _, st = R.retention_chunkwise_stateful(p, x[:, :24], None, cfg)
    y_ref, st_ref = R.retention_chunkwise_stateful(p, x[:, 24:], st, cfg)
    y_k, st_k = fused_retention_layer(p, x[:, 24:], st, cfg, True)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_k["kv"]), np.asarray(st_ref["kv"]),
                               atol=2e-5)


def test_fused_layer_multi_chunk_carry(rng):
    """N > 1 chunks in ONE call must thread the VMEM-scratch state across
    the minor grid axis identically to the scanned pure path."""
    cfg, p, x = _setup(rng, T=40, chunk=8)  # N = 5
    y_ref, st_ref = R.retention_chunkwise_stateful(p, x, None, cfg)
    y_k, st_k = fused_retention_layer(p, x, None, cfg, True)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_k["kv"]), np.asarray(st_ref["kv"]),
                               atol=2e-5)


def test_flag_reaches_kernel_through_op(rng, monkeypatch):
    """cfg.use_fused_ret actually routes through the fused kernel (guards
    against the round-2 class of dropped-flag vacuous comparisons)."""
    import fseend_tpu.kernels.retention_layer_pallas as KL

    cfg, p, x = _setup(rng)
    called = {}
    orig = KL._forward

    def spy(*a, **kw):
        called["hit"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(KL, "_forward", spy)
    cfg_f = dataclasses.replace(cfg, use_fused_ret=True)
    y_f, _ = R.retention_chunkwise_stateful(p, x, None, cfg_f)
    assert called.get("hit"), "use_fused_ret did not reach the fused kernel"
    y_ref, _ = R.retention_chunkwise_stateful(p, x, None, cfg)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref), atol=2e-5)


def test_fused_layer_gradients_match_pure(rng):
    """custom-VJP backward (pure-path recompute) == differentiating the
    pure path directly."""
    cfg, p, x = _setup(rng, B=2, T=16, chunk=8)

    def loss_pure(p_, x_):
        y, _ = R.retention_chunkwise_stateful(p_, x_, None, cfg)
        return jnp.sum(y ** 2)

    def loss_fused(p_, x_):
        y, _ = fused_retention_layer(p_, x_, None, cfg, True)
        return jnp.sum(y ** 2)

    gp_ref, gx_ref = jax.grad(loss_pure, argnums=(0, 1))(p, x)
    gp_k, gx_k = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    for key in gp_ref:
        np.testing.assert_allclose(
            np.asarray(gp_k[key]["kernel"]), np.asarray(gp_ref[key]["kernel"]),
            rtol=1e-4, atol=1e-4)


def test_ls_blockstream_with_fused_ret_matches_batch(rng):
    """Model-level: blockwise streaming with use_fused_ret == the plain
    batch chunkwise pass (the serving bit-exactness property, now through
    the fused kernel)."""
    from fseend_tpu.models import ls_eend as M

    cfg = M.LSEENDConfig(in_size=23, n_units=32, n_heads=4, enc_n_layers=2,
                         dec_n_layers=1, chunk_size=8, dec_dim_feedforward=64,
                         conv_kernel_size=4, conv_delay=2, max_nspks=4)
    cfg_f = dataclasses.replace(cfg, use_fused_ret=True)
    params, mstate = M.init_ls_eend(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((2, 32, 23)), jnp.float32)
    lens = jnp.array([32, 32])

    y_ref = M.ls_forward(params, mstate, cfg, x, lens, 4)["logits"]
    y_fused = M.ls_forward(params, mstate, cfg_f, x, lens, 4)["logits"]
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-5)

    y_stream = M.ls_blockstream_run(params, cfg_f, mstate, x, 4, 8)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_fused),
                               atol=2e-5)
