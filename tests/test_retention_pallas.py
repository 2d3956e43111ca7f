"""Pallas chunkwise-retention kernel: parity vs the pure-JAX op (interpret
mode on CPU) + gradient path via the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fseend_tpu.kernels import retention_pallas as KP
from fseend_tpu.ops import retention as R


def _qkv(rng, BH=4, T=24, dk=16, dv=16):
    q = jnp.asarray(rng.standard_normal((BH, T, dk)) * 0.2, jnp.float32)
    k = jnp.asarray(rng.standard_normal((BH, T, dk)) * 0.2, jnp.float32)
    v = jnp.asarray(rng.standard_normal((BH, T, dv)), jnp.float32)
    return q, k, v


def test_kernel_matches_pure_core(rng):
    q, k, v = _qkv(rng)
    out_k = KP.chunkwise_retention(q, k, v, 8, True)  # interpret mode
    out_p = KP._pure_core(q, k, v, 8)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_p), atol=1e-5)


def test_kernel_matches_op_level_chunkwise(rng):
    """ops.retention_chunkwise(use_pallas) == reference-faithful pure path
    (the op auto-selects interpret mode off-TPU)."""
    cfg = R.RetentionConfig(embed_dim=32, num_heads=4, chunk_size=8)
    cfg_pk = R.RetentionConfig(embed_dim=32, num_heads=4, chunk_size=8,
                               use_pallas=True)
    p = R.init_retention(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.uniform(0, 1, (2, 24, 32)), jnp.float32)
    y_ref = R.retention_chunkwise(p, x, cfg)
    y_pal = R.retention_chunkwise(p, x, cfg_pk)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), atol=1e-5)


@pytest.mark.parametrize("use_decay", [False, True])
def test_stateful_kernel_matches_pure(rng, use_decay):
    """Carried-state kernel == pure stateful path, γ=1 and the retnet γ<1
    schedule, continuing from a non-trivial mid-stream state."""
    cfg = R.RetentionConfig(embed_dim=32, num_heads=4, chunk_size=8,
                            use_decay=use_decay)
    cfg_pk = R.RetentionConfig(embed_dim=32, num_heads=4, chunk_size=8,
                               use_decay=use_decay, use_pallas=True)
    p = R.init_retention(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.uniform(0, 1, (2, 48, 32)), jnp.float32)
    # build a genuine mid-stream state by running the first 24 frames pure
    _, st = R.retention_chunkwise_stateful(p, x[:, :24], None, cfg)
    y_ref, st_ref = R.retention_chunkwise_stateful(p, x[:, 24:], st, cfg)
    y_pal, st_pal = R.retention_chunkwise_stateful(p, x[:, 24:], st, cfg_pk)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_pal["kv"]), np.asarray(st_ref["kv"]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_pal["scale"]),
                               np.asarray(st_ref["scale"]), atol=2e-5)


def test_stateful_kernel_blockwise_equals_one_shot(rng):
    """Two kernel calls with carried state == one fresh-state call over the
    concatenation — the blockwise-recurrent serving invariant."""
    cfg_pk = R.RetentionConfig(embed_dim=32, num_heads=4, chunk_size=8,
                               use_pallas=True)
    p = R.init_retention(jax.random.PRNGKey(0), cfg_pk)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32)), jnp.float32)
    st0 = R.chunk_state_init(cfg_pk, 2)
    y1, st1 = R.retention_chunkwise_stateful(p, x[:, :16], st0, cfg_pk)
    y2, _ = R.retention_chunkwise_stateful(p, x[:, 16:], st1, cfg_pk)
    y_full = R.retention_chunkwise(p, x, R.RetentionConfig(
        embed_dim=32, num_heads=4, chunk_size=8))
    got = jnp.concatenate([y1, y2], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(y_full), atol=2e-5)


def test_custom_vjp_grads_match_pure(rng):
    q, k, v = _qkv(rng, BH=2, T=16, dk=8, dv=8)

    def f_kernel(q, k, v):
        return jnp.sum(KP.chunkwise_retention(q, k, v, 8, True) ** 2)

    def f_pure(q, k, v):
        return jnp.sum(KP._pure_core(q, k, v, 8) ** 2)

    gk = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(f_pure, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pure_core_matches_ops_retention_math(rng):
    """_pure_core (kernel's backward surrogate) must equal the op-level math
    on pre-projected q/k/v."""
    cfg = R.RetentionConfig(embed_dim=32, num_heads=4, chunk_size=8)
    p = R.init_retention(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.uniform(0, 1, (2, 24, 32)), jnp.float32)
    q, k, v, g = R._project_qkv(p, x, cfg)
    B, H, T, dk = q.shape
    out_core = KP._pure_core(q.reshape(B * H, T, dk), k.reshape(B * H, T, dk),
                             v.reshape(B * H, T, dk), 8).reshape(B, H, T, dk)
    y_core = R._finish(p, out_core, g, cfg)
    y_ref = R.retention_chunkwise(p, x, cfg)
    np.testing.assert_allclose(np.asarray(y_core), np.asarray(y_ref), atol=1e-5)


def test_pick_group_vmem_cap():
    """The row-group G must stay within the measured VMEM budget: G=8 at
    serving/training chunks (128/125), capped to G=2 at chunk 500 (an
    uncapped G=8/L=128 variant at BH=5120 OOMed Mosaic's 16 MB scoped-vmem
    stack on the real chip — see kernels/retention_pallas.py)."""
    from fseend_tpu.kernels.retention_pallas import _pick_group

    assert _pick_group(512, 128) == 8
    assert _pick_group(16, 125) == 8
    assert _pick_group(8, 500) == 2     # (G,L,L) f32 budget caps G
    assert _pick_group(6, 128) == 2     # divisibility: 8,4 don't divide 6
    assert _pick_group(5, 128) == 1
