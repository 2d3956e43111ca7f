"""Fused decoder fusion-layer TRAIN kernels (fwd + hand-written bwd) ==
the pure-JAX chunkwise path (kernels/dec_train_fusion_pallas.py).

The backward is hand-derived (not autodiff through the kernel), so these
tests pin BOTH the forward outputs and the FULL gradient pytree against the
XLA path at dropout 0, where the two are mathematically identical.  With
dropout on, the mask RNGs differ by construction (in-kernel counter hash vs
jax.random), so we check determinism, keep-rate statistics, and
weight-direction finite differences instead.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fseend_tpu.models import ls_eend
from fseend_tpu.kernels.dec_train_fusion_pallas import fused_fusion_layer


def tiny_cfg(**kw):
    base = dict(in_size=23, n_units=32, n_heads=2, enc_n_layers=1,
                dec_n_layers=2, dec_dim_feedforward=48, chunk_size=8,
                conv_kernel_size=4, conv_delay=3, max_nspks=4, dropout=0.0)
    base.update(kw)
    return ls_eend.LSEENDConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    return cfg, params, mstate, rng


def test_decode_fused_matches_xla(setup):
    cfg, params, _, rng = setup
    B, T, C = 3, 24, 4
    emb = jnp.asarray(rng.standard_normal((B, T, cfg.n_units)), jnp.float32)
    ref = ls_eend.decode(params, cfg, emb, C, train=False)
    out = ls_eend.decode(params, dataclasses.replace(cfg, use_fused_dec=True),
                         emb, C, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradients_match_xla_full_pytree(setup):
    """The hand-written backward == jax.grad of the pure path: every leaf
    (projections, MHA, FFN, all three LayerNorms) at dropout 0."""
    cfg, params, _, rng = setup
    B, T, C = 2, 16, 4
    emb = jnp.asarray(rng.standard_normal((B, T, cfg.n_units)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((B, T, C, cfg.n_units)), jnp.float32)

    def loss(p, c, e):
        y = ls_eend.decode(p, c, e, C, train=False)
        return jnp.sum(y * tgt)

    cfgF = dataclasses.replace(cfg, use_fused_dec=True)
    g_ref, ge_ref = jax.grad(loss, argnums=(0, 2))(params, cfg, emb)
    g_out, ge_out = jax.grad(loss, argnums=(0, 2))(params, cfgF, emb)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-4), g_ref, g_out)
    np.testing.assert_allclose(np.asarray(ge_out), np.asarray(ge_ref),
                               atol=2e-4)


def test_parity_at_every_chunk_size(setup):
    """The kernel is faithful to the XLA chunkwise path at EVERY equal chunk
    size (the internal chunk is exact parity when it matches chunk_size —
    the default, fused_dec_chunk=None)."""
    cfg, params, _, rng = setup
    B, T, C = 2, 16, 4
    emb = jnp.asarray(rng.standard_normal((B, T, cfg.n_units)), jnp.float32)
    for L in (4, 8, 16):
        ref = ls_eend.decode(params, dataclasses.replace(cfg, chunk_size=L),
                             emb, C, train=False)
        out = ls_eend.decode(
            params, dataclasses.replace(cfg, chunk_size=L, use_fused_dec=True),
            emb, C, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, err_msg=f"chunk {L}")


def test_internal_chunk_knob_bounded_by_reference_sensitivity(setup):
    """fused_dec_chunk < chunk_size changes numerics ONLY through the
    reference formulation's own chunk-size sensitivity (the group-norm eps
    interacting with the chunk-dependent renormalization scale — see the
    kernel docstring): the kernel-at-L vs XLA-at-chunk_size deviation must
    match the XLA-at-L vs XLA-at-chunk_size deviation, i.e. the kernel adds
    nothing on top."""
    cfg, params, _, rng = setup
    B, T, C = 2, 16, 4
    emb = jnp.asarray(rng.standard_normal((B, T, cfg.n_units)), jnp.float32)
    ref16 = ls_eend.decode(params, dataclasses.replace(cfg, chunk_size=16),
                           emb, C, train=False)
    for L in (4, 8):
        xla_L = ls_eend.decode(params, dataclasses.replace(cfg, chunk_size=L),
                               emb, C, train=False)
        kern_L = ls_eend.decode(
            params, dataclasses.replace(cfg, chunk_size=16, use_fused_dec=True,
                                        fused_dec_chunk=L),
            emb, C, train=False)
        # kernel@L == XLA@L (exact), hence same distance from the L=16 run
        np.testing.assert_allclose(np.asarray(kern_L), np.asarray(xla_L),
                                   atol=2e-5, err_msg=f"chunk {L}")
        d_xla = float(jnp.abs(xla_L - ref16).max())
        d_kern = float(jnp.abs(kern_L - ref16).max())
        assert abs(d_kern - d_xla) < 1e-4, (L, d_kern, d_xla)


def test_dropout_deterministic_and_rate(setup):
    cfg, params, _, rng = setup
    lp = params["dec"]["layers"][0]
    B, C, T, D = 2, 4, 16, 32
    x = jnp.asarray(rng.standard_normal((B, C, T, D)), jnp.float32)
    seed = jnp.array([[777]], jnp.int32)
    y1 = fused_fusion_layer(lp, x, seed, cfg.n_heads, 8, 0.1, True)
    y2 = fused_fusion_layer(lp, x, seed, cfg.n_heads, 8, 0.1, True)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3 = fused_fusion_layer(lp, x, jnp.array([[778]], jnp.int32),
                            cfg.n_heads, 8, 0.1, True)
    assert float(jnp.abs(y1 - y3).max()) > 1e-4  # seed actually matters
    # keep-rate statistics of the mask hash itself
    from fseend_tpu.kernels.dec_train_fusion_pallas import _hash_keep

    m = _hash_keep(jnp.int32(42), jnp.int32(1), jnp.int32(2), 3,
                   (64, 512), 0.1, jnp.float32)
    frac = float((m > 0).mean())
    assert abs(frac - 0.9) < 0.01, frac


def _oracle_layer(lp, x, seed, n_heads, L, rate):
    """Plain-JAX oracle for fused_fusion_layer: scans `_chunk_fwd` (the
    kernel's own pure-jnp chunk body, which carries the reference's
    stop-gradient renormalizers) over chunks in Python.  Fully autodiff-able
    — jax.grad of this is the ground truth for the hand-written backward,
    INCLUDING dropout (the counter-hash masks are identical by
    construction)."""
    from fseend_tpu.kernels.dec_train_fusion_pallas import _chunk_fwd, _pack

    B, C, T, D = x.shape
    N = T // L
    ops = _pack(lp, x.dtype)
    F = ops[8].shape[1]
    H = n_heads
    dk = D // H
    outs = []
    for b in range(B):
        kv = jnp.zeros((H, C, dk, dk), jnp.float32)
        s = jnp.ones((H, C, 1, 1), jnp.float32)
        ys = []
        for n in range(N):
            xc = x[b, :, n * L:(n + 1) * L]
            y, kv, s, _ = _chunk_fwd(
                xc, kv, s, ops, seed[0, 0], jnp.int32(b), jnp.int32(n),
                C=C, L=L, D=D, H=H, F=F, rate=rate, collect=False)
            ys.append(y)
        outs.append(jnp.concatenate(ys, axis=1))
    return jnp.stack(outs).astype(x.dtype)


def test_dropout_grads_match_autodiff_oracle(setup):
    """With dropout ON: the hand-written backward == jax.grad of the plain
    JAX oracle built from the kernel's own chunk body (identical hash masks,
    identical stop-gradient renormalizer semantics) — every weight leaf and
    the input cotangent."""
    cfg, params, _, rng = setup
    lp = params["dec"]["layers"][0]
    B, C, T, D = 2, 4, 16, 32
    x = jnp.asarray(rng.standard_normal((B, C, T, D)), jnp.float32)
    seed = jnp.array([[1234]], jnp.int32)
    tgt = jnp.asarray(rng.standard_normal((B, C, T, D)), jnp.float32)

    def loss_k(lp_, x_):
        y = fused_fusion_layer(lp_, x_, seed, cfg.n_heads, 8, 0.1, True)
        return jnp.sum(y * tgt)

    def loss_o(lp_, x_):
        return jnp.sum(_oracle_layer(lp_, x_, seed, cfg.n_heads, 8, 0.1) * tgt)

    # forward agreement first (same masks, same math)
    np.testing.assert_allclose(float(loss_k(lp, x)), float(loss_o(lp, x)),
                               rtol=1e-5)
    gk, gxk = jax.grad(loss_k, argnums=(0, 1))(lp, x)
    go, gxo = jax.grad(loss_o, argnums=(0, 1))(lp, x)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-4), go, gk)
    np.testing.assert_allclose(np.asarray(gxk), np.asarray(gxo), atol=2e-4)


def test_train_step_with_fused_dec(setup):
    """Full trainer step (label protocol -> fused decoder -> losses -> adam)
    runs and matches the XLA path's loss at dropout 0."""
    import optax

    from fseend_tpu.train import trainer

    cfg, params, mstate, rng = setup
    B, T, S = 2, 16, 2
    batch = {
        "feats": jnp.asarray(rng.standard_normal((B, T, cfg.in_size)),
                             jnp.float32),
        "labels": jnp.asarray((rng.uniform(size=(B, T, S)) > 0.6),
                              jnp.float32),
        "lens": jnp.asarray([16, 12], jnp.int32),
        "n_spk": jnp.asarray([2, 1], jnp.int32),
    }
    task = trainer.TaskConfig(model="ls", label_mode="fixed",
                              masked_emb_loss=True)
    for c in (cfg, dataclasses.replace(cfg, use_fused_dec=True)):
        c = dataclasses.replace(c, dropout=0.0)
        loss, (_, m) = trainer.compute_loss(task, c, params, mstate, batch,
                                            None, train=True)
        if c.use_fused_dec:
            np.testing.assert_allclose(float(loss), ref_loss, atol=1e-5)
        else:
            ref_loss = float(loss)
    # and one optimizer step end-to-end (dropout on, bf16 mixed precision)
    tx = optax.adam(1e-3)
    cF = dataclasses.replace(cfg, use_fused_dec=True)
    taskb = trainer.TaskConfig(model="ls", label_mode="fixed",
                               masked_emb_loss=True, compute_dtype="bf16")
    state = trainer.TrainState.create(params, mstate, tx)
    step = trainer.make_train_step(taskb, cF, tx, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["tot_loss"]))
    assert int(new_state.step) == 1


def test_bf16_close_to_f32(setup):
    cfg, params, _, rng = setup
    B, T, C = 2, 16, 4
    emb32 = jnp.asarray(rng.standard_normal((B, T, cfg.n_units)), jnp.float32)
    cfgF = dataclasses.replace(cfg, use_fused_dec=True)
    ref = ls_eend.decode(params, cfgF, emb32, C, train=False)
    pb = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                      if x.dtype == jnp.float32 else x, params)
    out = ls_eend.decode(pb, cfgF, emb32.astype(jnp.bfloat16), C, train=False)
    assert float(jnp.abs(out.astype(jnp.float32) - ref).max()) < 0.15


def test_internal_chunk_pads_exactly(setup):
    """An explicit fused_dec_chunk that does not divide T end-pads the slot
    grid instead of silently falling back to chunk_size (real-TPU Mosaic
    rejects non-8-aligned chunks, so the explicit aligned choice must win).
    Causality makes the padding exact: the padded run's first T frames ==
    the same-L unpadded oracle on a longer sequence that shares the prefix
    — which itself is pinned == the XLA chunkwise path."""
    cfg, params, _, rng = setup
    B, C, T_long, T = 2, 4, 20, 18
    emb_long = jnp.asarray(
        rng.standard_normal((B, T_long, cfg.n_units)), jnp.float32)
    # oracle at L=4 (divides 20, no padding) — exact vs XLA by
    # test_parity_at_every_chunk_size
    ref = ls_eend.decode(
        params, dataclasses.replace(cfg, chunk_size=4, use_fused_dec=True),
        emb_long, C, train=False)
    xla = ls_eend.decode(params, dataclasses.replace(cfg, chunk_size=4),
                         emb_long, C, train=False)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(xla), atol=2e-5)
    # padded run: T=18 % L=4 != 0 -> pads to 20 internally
    out = ls_eend.decode(
        params, dataclasses.replace(cfg, chunk_size=6, use_fused_dec=True,
                                    fused_dec_chunk=4),
        emb_long[:, :T], C, train=False)
    assert out.shape[1] == T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[:, :T]),
                               atol=2e-5)
