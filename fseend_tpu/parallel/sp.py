"""Sequence parallelism (SP) for the O(T^2) parallel-mode ops.

The reference scales sequence length algorithmically on one device
(retention, SURVEY.md §5.7) — cross-device SP "is not needed for parity but
the chunk dimension is the natural axis if added later".  Here it is, for
the offline/parallel-mode paths where time is NOT sequential:

  * ``sp_causal_mha``          — causal masked attention with the TIME axis
    sharded over a mesh axis: queries stay local, k/v are all-gathered over
    ICI, the causal mask uses global positions.  Work per device: T/n x T.
  * ``sp_retention_parallel``  — same treatment for γ=1 parallel retention
    (the row-normalizers depend only on global row indices, so each shard
    computes its own rows exactly).

Both are `shard_map`s: drop-in, bit-equal to the single-device op (tested on
the virtual 8-device mesh).  Streaming modes need no SP — their state is
O(1) and the lane (stream) axis is the natural data-parallel axis
(serving/runtime.shard_server_over_mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fseend_tpu.ops import nn
from fseend_tpu.ops import retention as R


def sp_causal_mha(p, x: jnp.ndarray, mesh: Mesh, axis: str = "data",
                  mask_delay: int = 0) -> jnp.ndarray:
    """Causal MHA with x: (B, T, D) sharded on T over `axis`.

    Equivalent to nn.mha(p, x, x, x, causal_mask(T)) with the time axis
    distributed; the all-gather of k/v rides the mesh interconnect.
    """
    B, T, D = x.shape
    n = mesh.shape[axis]
    assert T % n == 0, f"T={T} must divide over the {axis} axis ({n})"
    Tl = T // n

    def local(x_local):
        idx = jax.lax.axis_index(axis)
        q, k, v = nn.mha_project_qkv(p, x_local, x_local, x_local)
        # gather keys/values from every shard: (..., H, T, hd)
        k_all = jax.lax.all_gather(k, axis, axis=2, tiled=True)
        v_all = jax.lax.all_gather(v, axis, axis=2, tiled=True)
        qpos = idx * Tl + jnp.arange(Tl)[:, None]   # global query rows
        kpos = jnp.arange(T)[None, :]
        mask = jnp.where(kpos <= qpos + mask_delay, 0.0, nn.NEG_INF)
        out = nn.mha_core(q, k_all, v_all, mask)
        out = nn._merge_heads(out)
        return nn.linear(p["out_proj"], out)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(None, axis, None),
    )(x)


def sp_retention_parallel(p, x: jnp.ndarray, cfg: R.RetentionConfig,
                          mesh: Mesh, axis: str = "data") -> jnp.ndarray:
    """γ=1 parallel retention with the time axis sharded over `axis`.

    Row i's decay normalization (1/sqrt(i+1)) and the data-dependent
    row-sum clamp both depend only on row-local quantities, so each shard
    reproduces its rows of the full computation exactly.
    """
    B, T, D = x.shape
    n = mesh.shape[axis]
    assert T % n == 0
    Tl = T // n
    H, dk, dv = cfg.num_heads, cfg.key_dim, cfg.head_dim

    def local(x_local):
        idx = jax.lax.axis_index(axis)
        q = nn.linear(p["q_proj"], x_local).reshape(B, Tl, H, dk).swapaxes(1, 2)
        k = (nn.linear(p["k_proj"], x_local) * (dk ** -0.5)).reshape(
            B, Tl, H, dk).swapaxes(1, 2)
        v = nn.linear(p["v_proj"], x_local).reshape(B, Tl, H, dv).swapaxes(1, 2)
        g = nn.linear(p["g_proj"], x_local)
        k_all = jax.lax.all_gather(k, axis, axis=2, tiled=True)
        v_all = jax.lax.all_gather(v, axis, axis=2, tiled=True)
        qpos = idx * Tl + jnp.arange(Tl)[:, None]
        kpos = jnp.arange(T)[None, :]
        tri = kpos <= qpos  # (Tl, T) causal rows at global positions
        mask = jnp.where(tri, 1.0, 0.0) / jnp.sqrt(qpos.astype(jnp.float32) + 1.0)
        qk = jnp.einsum("bhqd,bhkd->bhqk", q, k_all,
                        preferred_element_type=jnp.float32) * mask
        denom = jnp.abs(jax.lax.stop_gradient(qk).sum(-1, keepdims=True))
        qk = qk / jnp.clip(denom, 1.0, None)
        out = jnp.einsum("bhqk,bhkd->bhqd", qk, v_all,
                         preferred_element_type=jnp.float32)
        return R._finish(p, out, g, cfg)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(None, axis, None),
    )(x)


def _halo_exchange(h: jnp.ndarray, delay: int, axis: str):
    """Gather ±delay edge frames from ring neighbors (zero beyond the global
    sequence). h: (B, Tl, D) local shard -> (B, Tl + 2*delay, D)."""
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    right_edge = h[:, -delay:]   # goes to the right neighbor's left halo
    left_edge = h[:, :delay]     # goes to the left neighbor's right halo
    left_halo = jax.lax.ppermute(right_edge, axis,
                                 [(i, (i + 1) % n) for i in range(n)])
    right_halo = jax.lax.ppermute(left_edge, axis,
                                  [(i, (i - 1) % n) for i in range(n)])
    left_halo = jnp.where(idx == 0, 0.0, left_halo)       # global left edge
    right_halo = jnp.where(idx == n - 1, 0.0, right_halo)  # global right edge
    return jnp.concatenate([left_halo, h, right_halo], axis=1)


def _sp_batch_norm_train(p, st, x, axis: str, n_global: int,
                         momentum: float = 0.1, eps: float = 1e-5):
    """nn.batch_norm train mode with the leading (batch, time) statistics
    axes DISTRIBUTED: two psum'd passes (mean, then squared deviations) so
    the result tracks the single-device op to f32 rounding.  Every shard
    computes identical global stats, so the running-state update is
    replicated for free."""
    mean = jax.lax.psum(jnp.sum(x, axis=(0, 1)), axis) / n_global
    var = jax.lax.psum(jnp.sum(jnp.square(x - mean), axis=(0, 1)),
                       axis) / n_global
    unbiased = var * (n_global / max(n_global - 1, 1))
    new_state = {
        "mean": (1 - momentum) * st["mean"]
        + momentum * mean.astype(jnp.float32),
        "var": (1 - momentum) * st["var"]
        + momentum * unbiased.astype(jnp.float32),
    }
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype), new_state


def fs_forward_sp_train(params, state, cfg, xs: jnp.ndarray, lens: jnp.ndarray,
                        mesh: Mesh, n_slots: int, axis: str = "data", *,
                        train: bool = True, rngs=None):
    """TRAIN-mode FS-EEND forward with the TIME axis sharded over `axis` —
    the missing half of `fs_forward_sp` (which is eval-only): differentiable
    end to end, so `jax.grad` through it yields the sequence-parallel
    BACKWARD for free (all_gather transposes to reduce-scatter, the halo
    ppermute to the reverse ppermute; replicated param inputs transpose to
    a psum of the per-shard weight cotangents).

    Train-mode deltas vs fs_forward_sp:
      * BatchNorm uses GLOBAL batch statistics via psum (bit-matches the
        single-device op to f32 rounding) and returns the updated running
        state (replicated);
      * all five dropout sites of the reference layer stack run per shard
        from fold_in(rng, shard_index) — a valid iid dropout field, though
        not bit-identical to the single-device mask layout (equality tests
        pin dropout=0, like every other train-parity test in this repo);
      * returns the fs_forward contract {"logits", "emb", "attractors",
        "state"} with logits/emb/attractors sharded on T.

    Semantics anchors: encode/decode in models/fs_eend.py (themselves
    pinned to FS-EEND/nnet/model/onl_tfm...py:147-166 and
    merge_tfm_encoder.py:356-374); this function only re-spells WHERE each
    op runs, never what it computes.
    """
    from fseend_tpu.models import fs_eend  # noqa: F401  (parity anchor)

    B, T, F = xs.shape
    n = mesh.shape[axis]
    assert T % n == 0, f"T={T} must divide over the {axis} axis ({n})"
    Tl = T // n
    delay = cfg.conv_delay
    rate = cfg.dropout

    def local(p, bn_state, xs_l, lens_, rng_):
        idx = jax.lax.axis_index(axis)
        pos = idx * Tl + jnp.arange(Tl)
        len_mask = pos[None, :] < lens_[:, None]          # (B, Tl)
        x_in = jnp.where(len_mask[..., None], xs_l, -1.0)
        if train:
            h, bn_new = _sp_batch_norm_train(
                p["enc"]["bn"], bn_state["bn"], x_in, axis, n_global=B * T)
        else:
            h, bn_new = nn.batch_norm(p["enc"]["bn"], bn_state["bn"], x_in,
                                      train=False)
        h = nn.layer_norm(p["enc"]["norm"], nn.linear(p["enc"]["proj"], h))

        rloc = (jax.random.fold_in(rng_, idx) if train and rate > 0.0
                else None)
        r_enc, r_dec = (jax.random.split(rloc) if rloc is not None
                        else (None, None))
        qpos = pos[:, None]
        kpos = jnp.arange(T)[None, :]
        t_mask = jnp.where(kpos <= qpos + cfg.mask_delay, 0.0, nn.NEG_INF)

        def sp_attn(attn_p, xq, rng):
            q, k, v = nn.mha_project_qkv(attn_p, xq, xq, xq)
            t_ax = k.ndim - 2
            k_all = jax.lax.all_gather(k, axis, axis=t_ax, tiled=True)
            v_all = jax.lax.all_gather(v, axis, axis=t_ax, tiled=True)
            out = nn.mha_core(q, k_all, v_all, t_mask, rng=rng,
                              dropout_rate=rate, train=train)
            return nn.linear(attn_p["out_proj"], nn._merge_heads(out))

        rs_e = (jax.random.split(r_enc, cfg.enc_n_layers)
                if r_enc is not None else [None] * cfg.enc_n_layers)
        for i, lp in enumerate(p["enc"]["layers"]):
            # nn.transformer_layer, with the attention SP'd
            r1, r2, r3 = (jax.random.split(rs_e[i], 3) if rs_e[i] is not None
                          else (None, None, None))
            a = sp_attn(lp["self_attn"], h, r1)
            h = nn.layer_norm(lp["norm1"], h + nn.dropout(r2, a, rate, train))
            h = nn.layer_norm(lp["norm2"],
                              h + nn.ff_block(lp, h, rng=r3, rate=rate,
                                              train=train))
        h = jnp.where(len_mask[..., None], h, 0.0)

        window = _halo_exchange(h, delay, axis)           # (B, Tl+2d, D)
        emb = nn.conv1d(p["cnn"], window, padding=[(0, 0)])
        emb = nn.l2_normalize(emb)

        pe = nn.sinusoidal_table(cfg.pe_max_len, cfg.n_units)[:n_slots] \
            .astype(emb.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(emb[:, :, None, :],
                              (B, Tl, n_slots, cfg.n_units)),
             jnp.broadcast_to(pe[None, None],
                              (B, Tl, n_slots, cfg.n_units))], axis=-1)
        x = nn.linear(p["dec"]["convert"], x)
        rs_d = (jax.random.split(r_dec, cfg.dec_n_layers)
                if r_dec is not None else [None] * cfg.dec_n_layers)
        for i, lp in enumerate(p["dec"]["layers"]):
            # models/fs_eend.fusion_layer, time attention SP'd
            r = (jax.random.split(rs_d[i], 4) if rs_d[i] is not None
                 else [None] * 4)
            xt = x.swapaxes(1, 2)                         # (B, C, Tl, D)
            a = sp_attn(lp["time_attn"], xt, r[0])
            xt = nn.layer_norm(lp["norm11"],
                               xt + nn.dropout(r[1], a, rate, train))
            x = xt.swapaxes(1, 2)
            s = nn.mha(lp["spk_attn"], x, x, x, None, rng=r[2],
                       dropout_rate=rate, train=train)
            x = nn.layer_norm(lp["norm21"],
                              x + nn.dropout(r[3], s, rate, train))
            x = nn.layer_norm(lp["norm22"],
                              x + nn.ff_block(lp, x, rate=rate, train=train))
        attractors = nn.l2_normalize(x)
        logits = jnp.einsum("btd,btcd->btc", emb, attractors,
                            preferred_element_type=jnp.float32)
        return logits, emb, attractors, {"bn": bn_new}

    rng_arg = rngs if rngs is not None else jax.random.PRNGKey(0)
    logits, emb, attractors, new_state = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(None, axis, None), P(), P()),
        out_specs=(P(None, axis, None), P(None, axis, None),
                   P(None, axis, None, None), P()),
    )(params, state, xs, lens, rng_arg)
    return {"logits": logits, "emb": emb, "attractors": attractors,
            "state": new_state}


def make_fs_train_step_sp(task, cfg, tx, mesh: Mesh, axis: str = "data", *,
                          donate: bool = True):
    """Sequence-parallel FS TRAIN step: the full trainer chain
    (label protocol -> SP forward -> PIT/emb losses -> grads -> optimizer)
    with the time axis of every O(T^2) op sharded over `axis`.

    The loss/label machinery is the stock trainer.compute_loss — only the
    model pass is swapped (forward_fn) for the shard_map'd SP forward, and
    jax.grad differentiates THROUGH the shard_map (psum'd weight grads,
    reduce-scatter'd activation grads).  Losses/metrics consume the
    T-sharded logits under GSPMD, which partitions their reductions along
    the same mesh axis.  Bit-equality with trainer.make_train_step at
    dropout=0 is pinned by tests/test_sp.py."""
    import optax

    from fseend_tpu.train import trainer as trainer_lib

    def forward_fn(task_, cfg_, params, model_state, feats, lens, n_slots,
                   train, rngs):
        assert task_.model == "fs", "SP train step is FS-only (LS trains " \
            "chunkwise at O(T*chunk): no O(T^2) op to shard)"
        return fs_forward_sp_train(params, model_state, cfg_, feats, lens,
                                   mesh, n_slots, axis, train=train,
                                   rngs=rngs)

    def step(state: "trainer_lib.TrainState", batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(
            lambda p: trainer_lib.compute_loss(
                task, cfg, p, state.model_state, batch, rng, train=True,
                forward_fn=forward_fn), has_aux=True)
        (loss, (new_model_state, metrics)), grads = grad_fn(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = trainer_lib.TrainState(
            params=new_params, model_state=new_model_state,
            opt_state=new_opt, step=state.step + 1)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def fs_forward_sp(params, state, cfg, xs: jnp.ndarray, mesh: Mesh,
                  n_slots: int, axis: str = "data") -> jnp.ndarray:
    """FULL FS-EEND forward with the TIME axis sharded over `axis` — the
    long-form offline scoring path (each chip holds T/n frames).

    Collectives per pass: one k/v all-gather per attention layer (enc
    layers + decoder time attention) and one ±conv_delay halo exchange
    (ppermute) for the look-ahead conv.  Pointwise pieces (BN-eval, FFs,
    norms, speaker attention, logits) need no communication.
    Bit-equal to fs_forward (eval mode, full-length input).
    """
    from fseend_tpu.models import fs_eend

    B, T, F = xs.shape
    n = mesh.shape[axis]
    assert T % n == 0
    Tl = T // n
    delay = cfg.conv_delay

    def local(x_local):
        idx = jax.lax.axis_index(axis)
        h, _ = nn.batch_norm(params["enc"]["bn"], state["bn"], x_local,
                             train=False)
        h = nn.layer_norm(params["enc"]["norm"],
                          nn.linear(params["enc"]["proj"], h))

        def sp_attn(attn_p, x):
            q, k, v = nn.mha_project_qkv(attn_p, x, x, x)
            # time is the second-to-last axis of the per-head tensors
            t_ax = k.ndim - 2
            k_all = jax.lax.all_gather(k, axis, axis=t_ax, tiled=True)
            v_all = jax.lax.all_gather(v, axis, axis=t_ax, tiled=True)
            qpos = idx * Tl + jnp.arange(Tl)[:, None]
            kpos = jnp.arange(T)[None, :]
            mask = jnp.where(kpos <= qpos + cfg.mask_delay, 0.0, nn.NEG_INF)
            out = nn._merge_heads(nn.mha_core(q, k_all, v_all, mask))
            return nn.linear(attn_p["out_proj"], out)

        for lp in params["enc"]["layers"]:
            a = sp_attn(lp["self_attn"], h)
            h = nn.layer_norm(lp["norm1"], h + a)
            h = nn.layer_norm(lp["norm2"], h + nn.ff_block(lp, h))

        # look-ahead conv with halo exchange
        window = _halo_exchange(h, delay, axis)  # (B, Tl+2d, D)
        emb = nn.conv1d(params["cnn"], window, padding=[(0, 0)])
        emb = nn.l2_normalize(emb)

        # decoder: time attention SP'd per slot, speaker attention local
        pe = nn.sinusoidal_table(cfg.pe_max_len, cfg.n_units)[:n_slots]
        x = jnp.concatenate(
            [jnp.broadcast_to(emb[:, :, None, :], (B, Tl, n_slots, cfg.n_units)),
             jnp.broadcast_to(pe[None, None], (B, Tl, n_slots, cfg.n_units))],
            axis=-1)
        x = nn.linear(params["dec"]["convert"], x)
        for lp in params["dec"]["layers"]:
            xt = x.swapaxes(1, 2)  # (B, C, Tl, D)
            a = sp_attn(lp["time_attn"], xt)
            xt = nn.layer_norm(lp["norm11"], xt + a)
            x = xt.swapaxes(1, 2)
            s = nn.mha(lp["spk_attn"], x, x, x, None)
            x = nn.layer_norm(lp["norm21"], x + s)
            x = nn.layer_norm(lp["norm22"], x + nn.ff_block(lp, x))
        attractors = nn.l2_normalize(x)
        return jnp.einsum("btd,btcd->btc", emb, attractors,
                          preferred_element_type=jnp.float32)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(None, axis, None),
    )(xs)
