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
        assert task_.model == "fs", \
            "use make_ls_train_step_sp for the LS family"
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


def _sp_retention_chunkwise(p, x_local: jnp.ndarray, cfg_r: R.RetentionConfig,
                            axis: str) -> jnp.ndarray:
    """γ=1 chunkwise retention with the TIME axis sharded over `axis`
    (call inside a shard_map; x_local: (B, Tl, D) local shard).

    The reference pins γ=1 (retention.py:20), which makes the cross-chunk
    carry a PURE PREFIX SUM of per-chunk kv contributions
    (retention_chunkwise_stateful's scan with cross_decay=1) — and the
    running scale is a memoryless function of that prefix.  So sequence
    parallelism needs NO sequential cross-device chain: each shard sums its
    own chunk contributions, one all_gather shares the per-device totals,
    and every shard seeds its local chunk scan with the sum of the devices
    before it.  Bit-equal to the single-device op (the local scan then
    reproduces the global scan's states exactly)."""
    assert not cfg_r.use_xpos and not cfg_r.use_decay, \
        "SP chunkwise retention implements the reference's γ=1/no-xpos " \
        "setting only (the prefix-sum carry identity needs γ=1)"
    B, Tl, D = x_local.shape
    L = cfg_r.chunk_size
    assert Tl % L == 0, f"local T={Tl} must hold whole chunks of {L}"
    Nl = Tl // L
    H, dk, dv = cfg_r.num_heads, cfg_r.key_dim, cfg_r.head_dim
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    q, k, v, g = R._project_qkv(p, x_local, cfg_r)       # (B, H, Tl, d*)
    gammas = R.decay_gammas(cfg_r)                       # ones (γ=1)
    mask, scale = R._decay_mask(L, gammas)               # (H, L, L), (H, L, 1)
    inner_decay = gammas[:, None] ** (
        jnp.arange(L, dtype=jnp.float32)[None, :] + 1)
    inner_decay = inner_decay[:, :, None] / (scale / scale[:, -1:, :])

    qc = q.reshape(B, H, Nl, L, dk).transpose(2, 0, 1, 3, 4)
    kc = k.reshape(B, H, Nl, L, dk).transpose(2, 0, 1, 3, 4)
    vc = v.reshape(B, H, Nl, L, dv).transpose(2, 0, 1, 3, 4)

    qk = jnp.einsum("nbhqd,nbhkd->nbhqk", qc, kc,
                    preferred_element_type=jnp.float32)
    qk = qk * mask[None, None]
    inner_scale = jnp.clip(
        jnp.abs(jax.lax.stop_gradient(qk)).sum(-1, keepdims=True), 1.0, None)
    inner_out = jnp.einsum("nbhqk,nbhkd->nbhqd", qk / inner_scale, vc,
                           preferred_element_type=jnp.float32)

    kv_chunks = jnp.einsum(
        "nbhlk,nbhlv->nbhkv", kc, vc * mask[None, None, :, -1, :, None],
        preferred_element_type=jnp.float32)

    # cross-device prefix: sum of every EARLIER device's chunk total.
    # all_gather is differentiable (transposes to psum_scatter), so the
    # backward of the whole op stays sequence-parallel for free.
    dev_sum = kv_chunks.sum(0)                           # (B, H, dk, dv)
    gathered = jax.lax.all_gather(dev_sum, axis)         # (n, B, H, dk, dv)
    before = jnp.where(
        (jnp.arange(n) < idx).reshape(n, 1, 1, 1, 1), gathered, 0.0).sum(0)
    init_scale = jnp.clip(
        jnp.abs(jax.lax.stop_gradient(before)).sum(-2, keepdims=True)
        .max(-1, keepdims=True), 1.0, None)

    def scan_body(carry, kv_c):
        kv_state, kv_scale = carry
        kv_rec = kv_state / kv_scale
        cross_scale = kv_scale
        kv_state = kv_state + kv_c                       # cross_decay = 1
        kv_scale = jnp.clip(
            jnp.abs(jax.lax.stop_gradient(kv_state)).sum(-2, keepdims=True)
            .max(-1, keepdims=True), 1.0, None)
        return (kv_state, kv_scale), (kv_rec, cross_scale)

    _, (kv_recurrent, cross_scale) = jax.lax.scan(
        scan_body, (before, init_scale), kv_chunks)

    cross_out = jnp.einsum("nbhlk,nbhkv->nbhlv", qc * inner_decay[None, None],
                           kv_recurrent, preferred_element_type=jnp.float32)
    all_scale = jnp.maximum(inner_scale, cross_scale)
    out = inner_out * (inner_scale / all_scale) \
        + cross_out * (cross_scale / all_scale)
    out = out.transpose(1, 2, 0, 3, 4).reshape(B, H, Tl, dv) \
        .astype(x_local.dtype)
    return R._finish(p, out, g, cfg_r)


def _halo_causal_conv(p, h: jnp.ndarray, kernel: int, axis: str):
    """Causal depthwise conv (left-pad k-1) with the time axis sharded:
    gather k-1 left-halo frames from the left neighbor (zeros at the global
    left edge) — nn.causal_depthwise_conv re-spelled for a shard."""
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    right_edge = h[:, -(kernel - 1):]
    left_halo = jax.lax.ppermute(right_edge, axis,
                                 [(i, (i + 1) % n) for i in range(n)])
    left_halo = jnp.where(idx == 0, 0.0, left_halo)
    window = jnp.concatenate([left_halo, h], axis=1)
    return nn.conv1d(p, window, padding=[(0, 0)])


def ls_forward_sp_train(params, state, cfg, xs: jnp.ndarray, lens: jnp.ndarray,
                        mesh: Mesh, n_slots: int, axis: str = "data", *,
                        train: bool = True, rngs=None):
    """TRAIN-mode LS-EEND forward with the TIME axis sharded over `axis` —
    hour-scale single-recording training past the single-chip memory wall
    (PARITY.md's measured B=64/T=2000 compile failure).  Differentiable end
    to end; jax.grad through the shard_map yields the sequence-parallel
    backward (all_gathers transpose to reduce-scatters, halo ppermutes to
    reverse ppermutes, replicated params to psum'd weight cotangents).

    Collectives per pass: one kv all_gather per retention site (enc blocks
    + decoder time retention), one (k-1)-frame halo ppermute per conformer
    conv, one ±conv_delay halo for the look-ahead cnn, psums for the conv
    BatchNorm train stats.  Everything else is frame-local.

    Train-mode deltas vs ls_forward (same policy as fs_forward_sp_train):
    conv-module BatchNorm uses GLOBAL psum'd stats (bit-matches the
    single-device op to f32 rounding; padded frames included in the stats
    exactly like the reference); dropout fields are iid per shard from
    fold_in(rng, shard) — distribution-identical, not bit-identical
    (equality tests pin dropout=0).  Semantics anchors: models/ls_eend.py
    encode/decode (themselves pinned to LS-EEND/nnet/conformer/encoder.py:
    76-110 and merge_retnet_layer.py:233-253).
    """
    B, T0, F = xs.shape
    n = mesh.shape[axis]
    from fseend_tpu.models import ls_eend  # parity anchor

    xs = ls_eend.pad_to_chunk(xs, n * cfg.chunk_size)
    T = xs.shape[1]
    Tl = T // n
    rate = cfg.dropout
    rc = cfg.ret_cfg

    def local(p, mstate, xs_l, lens_, rng_):
        idx = jax.lax.axis_index(axis)
        pos = idx * Tl + jnp.arange(Tl)
        len_mask = (pos[None, :] < lens_[:, None])[..., None]   # (B, Tl, 1)
        x_in = jnp.where(len_mask, xs_l, 0.0)

        rloc = (jax.random.fold_in(rng_, idx) if train and rate > 0.0
                else None)
        r_enc, r_dec = (jax.random.split(rloc) if rloc is not None
                        else (None, None))
        rs_e = (jax.random.split(r_enc, cfg.enc_n_layers)
                if r_enc is not None else [None] * cfg.enc_n_layers)

        h = nn.layer_norm(p["enc"]["norm"], nn.linear(p["enc"]["proj"], x_in))
        new_bn = []
        for i, bp in enumerate(p["enc"]["blocks"]):
            rs = (jax.random.split(rs_e[i], 4) if rs_e[i] is not None
                  else [None] * 4)
            # ConformerEncoderBlock (ls_eend._block), retention + conv SP'd
            h = h + cfg.ff_factor * ls_eend._ff(bp["ff1"], h, rng=rs[0],
                                                rate=rate, train=train)
            r = nn.layer_norm(bp["ret_norm"], h)
            r = _sp_retention_chunkwise(bp["ret"], r, rc, axis)
            h = h + nn.dropout(rs[1], r, rate, train)
            # conv module (ls_eend._conv_module) with halo'd causal conv
            # and psum'd train-mode BatchNorm stats
            c = nn.layer_norm(bp["conv"]["norm"], h)
            c = nn.linear(bp["conv"]["pw1"], c)
            a, b = jnp.split(c, 2, axis=-1)
            c = a * jax.nn.sigmoid(b)
            c = _halo_causal_conv(bp["conv"]["dw"], c, cfg.conv_kernel_size,
                                  axis)
            if train:
                c, bn_new = _sp_batch_norm_train(
                    bp["conv"]["bn"], mstate["conv_bn"][i], c, axis,
                    n_global=B * T)
            else:
                c, bn_new = nn.batch_norm(bp["conv"]["bn"],
                                          mstate["conv_bn"][i], c,
                                          train=False)
            c = jax.nn.silu(c)
            c = nn.linear(bp["conv"]["pw2"], c)
            h = h + nn.dropout(rs[2], c, rate, train)
            h = h + cfg.ff_factor * ls_eend._ff(bp["ff2"], h, rng=rs[3],
                                                rate=rate, train=train)
            h = nn.layer_norm(bp["final_norm"], h)
            new_bn.append(bn_new)
        h = jnp.where(len_mask, h, 0.0)                  # re-pad before cnn

        window = _halo_exchange(h, cfg.conv_delay, axis)
        emb = nn.conv1d(p["cnn"], window, padding=[(0, 0)])
        emb = nn.l2_normalize(emb)

        # decoder: fusion layers (ls_eend.fusion_layer), time retention SP'd
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
            rs = (jax.random.split(rs_d[i], 4) if rs_d[i] is not None
                  else [None] * 4)
            xt = x.swapaxes(1, 2).reshape(B * n_slots, Tl, cfg.n_units)
            a = _sp_retention_chunkwise(lp["time_ret"], xt, rc, axis)
            xt = nn.layer_norm(lp["norm11"],
                               xt + nn.dropout(rs[0], a, rate, train))
            x = xt.reshape(B, n_slots, Tl, cfg.n_units).swapaxes(1, 2)
            s = nn.mha(lp["spk_attn"], x, x, x, None, rng=rs[1],
                       dropout_rate=rate, train=train)
            x = nn.layer_norm(lp["norm21"],
                              x + nn.dropout(rs[2], s, rate, train))
            x = nn.layer_norm(lp["norm22"],
                              x + nn.ff_block(lp, x, rng=rs[3], rate=rate,
                                              train=train))
        attractors = nn.l2_normalize(x)
        logits = jnp.einsum("btd,btcd->btc", emb, attractors,
                            preferred_element_type=jnp.float32)
        return logits, emb, attractors, {"conv_bn": new_bn}

    rng_arg = rngs if rngs is not None else jax.random.PRNGKey(0)
    logits, emb, attractors, new_state = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(None, axis, None), P(), P()),
        out_specs=(P(None, axis, None), P(None, axis, None),
                   P(None, axis, None, None), P()),
    )(params, state, xs, lens, rng_arg)
    return {"logits": logits[:, :T0], "emb": emb[:, :T0],
            "attractors": attractors[:, :T0], "state": new_state}


def make_ls_train_step_sp(task, cfg, tx, mesh: Mesh, axis: str = "data", *,
                          donate: bool = True):
    """Sequence-parallel LS TRAIN step: the full trainer chain with every
    O(T)-activation op's time axis sharded over `axis` — each device holds
    T/n frames of the (B, T, C, D) decoder slot grid, which is what blows
    the single-chip memory wall at long T (PARITY.md's B=64/T=2000 row).
    Same wiring as make_fs_train_step_sp; bit-equality with
    trainer.make_train_step at dropout=0 is pinned by tests/test_sp.py."""
    import optax

    from fseend_tpu.train import trainer as trainer_lib

    def forward_fn(task_, cfg_, params, model_state, feats, lens, n_slots,
                   train, rngs):
        assert task_.model == "ls"
        return ls_forward_sp_train(params, model_state, cfg_, feats, lens,
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
