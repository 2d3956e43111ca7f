"""Sequence-parallel ops == single-device ops on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fseend_tpu.ops import nn
from fseend_tpu.ops import retention as R
from fseend_tpu.parallel import mesh as pmesh
from fseend_tpu.parallel import sp


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices (see tests/conftest.needs_mesh)")
    return pmesh.make_mesh(n_data=8, n_model=1)


def test_sp_causal_mha_matches_single_device(mesh, rng):
    D, H, B, T = 32, 4, 2, 32
    p = nn.mha_init(jax.random.PRNGKey(0), D, H)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    ref = nn.mha(p, x, x, x, nn.causal_mask(T)[None, None])
    got = sp.sp_causal_mha(p, x, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_sp_retention_parallel_matches_single_device(mesh, rng):
    cfg = R.RetentionConfig(embed_dim=32, num_heads=4, chunk_size=8)
    p = R.init_retention(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32)), jnp.float32)
    ref = R.retention_parallel(p, x, cfg)
    got = sp.sp_retention_parallel(p, x, cfg, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fs_forward_sp_matches_single_device(mesh, rng):
    """FULL sequence-parallel FS-EEND forward (attention all-gathers +
    conv halo exchange) == single-device fs_forward."""
    from fseend_tpu.models import fs_eend

    cfg = fs_eend.FSEENDConfig(
        in_size=23, n_units=32, n_heads=4, enc_n_layers=2, dec_n_layers=1,
        enc_dim_feedforward=64, dec_dim_feedforward=64, dropout=0.0,
        conv_delay=3, max_nspks=4)
    params, state = fs_eend.init_fs_eend(jax.random.PRNGKey(0), cfg)
    B, T = 2, 64
    xs = jnp.asarray(rng.standard_normal((B, T, cfg.in_size)), jnp.float32)
    ref = fs_eend.fs_forward(params, state, cfg, xs, jnp.full((B,), T), 4)
    got = sp.fs_forward_sp(params, state, cfg, xs, mesh, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref["logits"]),
                               atol=1e-4)
