"""Retention-mode equivalence tests (mirrors the reference's own self-tests:
retention.py:231-248 parallel==recurrent; conformer encoder parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fseend_tpu.ops import retention as R

CFG = R.RetentionConfig(embed_dim=32, num_heads=4, value_factor=1, chunk_size=5)


@pytest.fixture(scope="module")
def p():
    return R.init_retention(jax.random.PRNGKey(0), CFG)


def test_parallel_equals_recurrent(p, rng):
    """With the reference's xavier(2^-2.5) init scale, the data-dependent
    row-sum normalizer clamps to 1 and the two modes agree to 1e-5."""
    x = jnp.asarray(rng.uniform(0, 1, (3, 20, CFG.embed_dim)), jnp.float32)
    yp = R.retention_parallel(p, x, CFG)
    yr = R.retention_recurrent(p, x, CFG)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yr), atol=1e-5)


def test_reference_goldens():
    """Bit-level parity with the reference MultiScaleRetention on stored
    weights/inputs (goldens generated once from /root/reference; chunkwise is
    *intentionally* a different normalization than parallel — the reference
    itself diverges ~4e-2 between the two — so each mode gets its own golden)."""
    import pathlib

    g = np.load(pathlib.Path(__file__).parent / "goldens" / "retention_ref.npz")
    cfg = R.RetentionConfig(embed_dim=int(g["D"]), num_heads=int(g["H"]),
                            value_factor=1, chunk_size=int(g["L"]))
    p = {
        name: {"kernel": jnp.asarray(g[f"{name}_w"].T), "bias": jnp.asarray(g[f"{name}_b"])}
        for name in ["q_proj", "k_proj", "v_proj", "g_proj", "out_proj"]
    }
    x = jnp.asarray(g["x"])
    np.testing.assert_allclose(
        np.asarray(R.retention_parallel(p, x, cfg)), g["y_parallel"], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(R.retention_chunkwise(p, x, cfg)), g["y_chunkwise"], atol=1e-5)
    # recurrent mode has no data-dependent clamp; it tracks parallel exactly
    np.testing.assert_allclose(
        np.asarray(R.retention_recurrent(p, x, cfg)), g["y_parallel"], atol=1e-5)


def test_chunkwise_single_chunk_is_parallel(p, rng):
    """With one chunk there is no cross-chunk path; the intra-chunk math
    reduces to the parallel form exactly."""
    cfg1 = R.RetentionConfig(embed_dim=32, num_heads=4, value_factor=1, chunk_size=16)
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 32)), jnp.float32)
    yp = R.retention_parallel(p, x, cfg1)
    yc = R.retention_chunkwise(p, x, cfg1)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yc), atol=1e-5)


def test_recurrent_step_formula_by_hand(p):
    """Spot-check the state recursion against the closed form with γ=1:
    kv_t = (sum_{s<=t} v_s k_s^T) / sqrt(t+1); out = q . kv (pre-norm/gate)."""
    cfg = CFG
    B, T = 1, 4
    x = jax.random.uniform(jax.random.PRNGKey(3), (B, T, cfg.embed_dim))
    from fseend_tpu.ops import nn as N

    q = N.linear(p["q_proj"], x).reshape(B, T, 4, 8)
    k = (N.linear(p["k_proj"], x) * (8 ** -0.5)).reshape(B, T, 4, 8)
    v = N.linear(p["v_proj"], x).reshape(B, T, 4, 8)

    state = R.retention_state_init(cfg, B)
    for t in range(T):
        _, state = R.retention_recurrent_step(p, x[:, t], state, cfg)
    S = jnp.einsum("tv,tk->vk", v[0, :, 0], k[0, :, 0]) / np.sqrt(T)
    np.testing.assert_allclose(np.asarray(state["kv"][0, 0]), np.asarray(S), atol=1e-5)
    np.testing.assert_allclose(float(state["scale"][0, 0]), T, atol=1e-6)


def test_value_factor_2(rng):
    cfg = R.RetentionConfig(embed_dim=32, num_heads=4, value_factor=2, chunk_size=4)
    p = R.init_retention(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.uniform(0, 1, (2, 12, 32)), jnp.float32)
    yp = R.retention_parallel(p, x, cfg)
    yr = R.retention_recurrent(p, x, cfg)
    yc = R.retention_chunkwise(p, x, cfg)
    assert yp.shape == (2, 12, 32) and yc.shape == (2, 12, 32)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yr), atol=1e-5)


def test_decay_mode_three_way(rng):
    """γ<1 (standard retnet decay) also keeps the three modes equivalent."""
    cfg = R.RetentionConfig(embed_dim=32, num_heads=4, value_factor=1,
                            chunk_size=5, use_decay=True)
    p = R.init_retention(jax.random.PRNGKey(2), cfg)
    x = jnp.asarray(rng.uniform(0, 1, (2, 15, 32)), jnp.float32)
    yp = R.retention_parallel(p, x, cfg)
    yr = R.retention_recurrent(p, x, cfg)
    yc = R.retention_chunkwise(p, x, cfg)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yr), atol=1e-4)
    assert np.isfinite(np.asarray(yc)).all()


def test_gradients_flow(p, rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 10, CFG.embed_dim)), jnp.float32)

    def loss(pp, fn):
        return jnp.sum(fn(pp, x, CFG) ** 2)

    for fn in (R.retention_parallel, R.retention_chunkwise):
        g = jax.grad(loss)(p, fn)
        norms = [float(jnp.abs(l).max()) for l in jax.tree.leaves(g)]
        assert all(np.isfinite(n) for n in norms)
        assert max(norms) > 0
