"""LS-EEND: long-form streaming EEND (conformer-retention encoder +
retention attractor decoder, O(1)-state streaming).

TPU-native re-design of
/root/reference/LS-EEND/nnet/model/onl_conformer_retention_enc_1dcnn_tfm_retention_enc_linear_non_autoreg_pos_enc_l2norm_emb_loss_mask.py
plus its submodules (conformer/{encoder,convolution,attention,feed_forward}.py
and modules/merge_retnet_layer.py).

Three compile modes over ONE parameter pytree:
  * batch/chunkwise (training): conformer blocks with chunkwise retention,
    sequences padded to a multiple of ``chunk_size`` exactly like the
    reference (onl_conformer...py:82-85);
  * recurrent streaming: a per-frame `lax.scan` carrying `LSStreamState` —
    retention kv states + causal-conv rings per block; state size is O(1) in
    stream length (THE reason this model family exists, SURVEY.md §5.7);
  * one-step API for real-time serving (same function the scan uses).

Conformer block (encoder.py:76-110): ½FF → retention (pre-LN) → causal conv
module → ½FF → LN; the conv module (convolution.py:138-152) is
LN → pointwise(2D) → GLU → causal depthwise(k) → BatchNorm1d → swish →
pointwise → dropout.

Decoder fusion layer (merge_retnet_layer.py:233-276): time axis = retention
(chunkwise in training, recurrent in streaming), speaker axis = full MHA,
shared FFN, post-norm.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from fseend_tpu.ops import nn
from fseend_tpu.ops import retention as R

Params = dict


@dataclasses.dataclass(frozen=True)
class LSEENDConfig:
    in_size: int = 345
    n_units: int = 256
    n_heads: int = 4
    enc_n_layers: int = 4
    dec_n_layers: int = 2
    dropout: float = 0.1
    chunk_size: int = 500              # retention recurrent_chunk_size
    ff_expansion: int = 4              # feed_forward_expansion_factor
    conv_expansion: int = 2
    conv_kernel_size: int = 16         # conformer causal depthwise conv
    dec_dim_feedforward: int = 2048
    conv_delay: int = 9                # look-ahead cnn between enc and dec
    mask_delay: int = 0
    max_nspks: int = 10                # max_speakers + 2
    pe_max_len: int = 5000
    half_step_residual: bool = True
    use_pallas: bool = False   # fused TPU kernel for chunkwise retention
    use_fused_ret: bool = False  # FULLY fused retention layer (projections +
                                 # core + norm/gate/out-proj in one kernel;
                                 # kernels/retention_layer_pallas.py)
    use_fused_dec: bool = False  # fully fused decoder fusion layers in the
                                 # batch/chunkwise (TRAINING) pass: fwd AND
                                 # hand-written bwd Pallas kernels with
                                 # VMEM-resident slot-grid activations +
                                 # in-kernel dropout
                                 # (kernels/dec_train_fusion_pallas.py)
    fused_dec_chunk: int | None = None
                                 # internal retention chunk of the fused
                                 # decoder kernels.  None (default) = use
                                 # chunk_size: numerically EXACT vs the XLA
                                 # chunkwise path.  Smaller values are a perf/
                                 # VMEM knob: gamma=1 chunkwise retention is
                                 # chunk-size invariant up to the group-norm
                                 # eps (pre-norm outputs are per-row
                                 # proportional to ~4e-5; eps=0 diff 7e-7 —
                                 # the eps=1e-6 sensitivity is the REFERENCE
                                 # formulation's own, retention.py:162/180 +
                                 # the eps of retention.py:86).  Must divide
                                 # the padded T, else falls back to chunk_size
    remat: bool = False        # jax.checkpoint each conformer block (trade
                               # FLOPs for memory on hour-long sequences)

    @property
    def lookahead_kernel(self) -> int:
        return 2 * self.conv_delay + 1

    @property
    def ret_cfg(self) -> R.RetentionConfig:
        return R.RetentionConfig(self.n_units, self.n_heads, 1, self.chunk_size,
                                 use_pallas=self.use_pallas,
                                 use_fused_ret=self.use_fused_ret)

    @property
    def ff_factor(self) -> float:
        return 0.5 if self.half_step_residual else 1.0


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_ff(key, d: int, expansion: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "norm": nn.layer_norm_init(d),
        "linear1": nn.torch_linear_init(k1, d, d * expansion),
        "linear2": nn.torch_linear_init(k2, d * expansion, d),
    }


def _init_conv_module(key, d: int, expansion: int, kernel: int):
    k1, k2, k3 = jax.random.split(key, 3)
    bn_p, bn_s = nn.batch_norm_init(d)
    params = {
        "norm": nn.layer_norm_init(d),
        "pw1": nn.torch_linear_init(k1, d, d * expansion),
        "dw": nn.conv1d_init(k2, d, d, kernel, groups=d, bias=False),
        "bn": bn_p,
        "pw2": nn.torch_linear_init(k3, d, d),
    }
    return params, bn_s


def _init_block(key, cfg: LSEENDConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    conv_p, conv_s = _init_conv_module(k3, cfg.n_units, cfg.conv_expansion,
                                       cfg.conv_kernel_size)
    params = {
        "ff1": _init_ff(k1, cfg.n_units, cfg.ff_expansion),
        "ret_norm": nn.layer_norm_init(cfg.n_units),
        "ret": R.init_retention(k2, cfg.ret_cfg),
        "conv": conv_p,
        "ff2": _init_ff(k4, cfg.n_units, cfg.ff_expansion),
        "final_norm": nn.layer_norm_init(cfg.n_units),
    }
    return params, conv_s


def init_fusion_layer(key, cfg: LSEENDConfig) -> Params:
    """Retention fusion decoder layer (merge_retnet_layer.py:71-96)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "time_ret": R.init_retention(k1, cfg.ret_cfg),
        "spk_attn": nn.mha_init(k2, cfg.n_units, cfg.n_heads),
        "linear1": nn.torch_linear_init(k3, cfg.n_units, cfg.dec_dim_feedforward),
        "linear2": nn.torch_linear_init(k4, cfg.dec_dim_feedforward, cfg.n_units),
        "norm11": nn.layer_norm_init(cfg.n_units),
        "norm21": nn.layer_norm_init(cfg.n_units),
        "norm22": nn.layer_norm_init(cfg.n_units),
    }


def init_ls_eend(key, cfg: LSEENDConfig):
    keys = jax.random.split(key, 4 + cfg.enc_n_layers + cfg.dec_n_layers)
    blocks, conv_states = [], []
    for i in range(cfg.enc_n_layers):
        p, s = _init_block(keys[4 + i], cfg)
        blocks.append(p)
        conv_states.append(s)
    params = {
        "enc": {
            "proj": nn.xavier_linear_init(keys[0], cfg.in_size, cfg.n_units),
            "norm": nn.layer_norm_init(cfg.n_units),
            "blocks": blocks,
        },
        "cnn": nn.conv1d_init(keys[1], cfg.n_units, cfg.n_units, cfg.lookahead_kernel),
        "dec": {
            "convert": nn.torch_linear_init(keys[2], 2 * cfg.n_units, cfg.n_units),
            "layers": [init_fusion_layer(keys[4 + cfg.enc_n_layers + i], cfg)
                       for i in range(cfg.dec_n_layers)],
        },
    }
    state = {"conv_bn": conv_states}
    return params, state


# ---------------------------------------------------------------------------
# batch/chunkwise mode (training + offline inference)
# ---------------------------------------------------------------------------


def _ff(p: Params, x, *, rng=None, rate=0.0, train=False):
    """FeedForwardModule (feed_forward.py:47-57): LN→Linear→swish→Drop→Linear→Drop."""
    h = nn.layer_norm(p["norm"], x)
    r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
    h = nn.dropout(r1, jax.nn.silu(nn.linear(p["linear1"], h)), rate, train)
    return nn.dropout(r2, nn.linear(p["linear2"], h), rate, train)


def _conv_module(p: Params, bn_state, x, cfg: LSEENDConfig, *, rng=None,
                 rate=0.0, train=False):
    """ConformerConvModule batch form (convolution.py:138-152)."""
    h = nn.layer_norm(p["norm"], x)
    h = nn.linear(p["pw1"], h)
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)  # GLU over channel dim
    h = nn.causal_depthwise_conv(p["dw"], h, cfg.conv_kernel_size)
    h, bn_state = nn.batch_norm(p["bn"], bn_state, h, train=train)
    h = jax.nn.silu(h)
    h = nn.linear(p["pw2"], h)
    return nn.dropout(rng, h, rate, train), bn_state


def _retention_seq(p, x, cfg: LSEENDConfig, time_mode: str):
    """Whole-sequence retention in the requested mode. `chunkwise` is the
    training default (merge_retnet_layer.py:286-287); `recurrent` reproduces
    streaming exactly (used by parity tests, like the reference's
    forward_recurrent); `parallel` for short sequences."""
    rc = cfg.ret_cfg
    if time_mode == "chunkwise":
        return R.retention_chunkwise(p, x, rc)
    if time_mode == "recurrent":
        return R.retention_recurrent(p, x, rc)
    if time_mode == "parallel":
        return R.retention_parallel(p, x, rc)
    raise ValueError(f"unknown time_mode: {time_mode}")


def _block(p: Params, bn_state, x, cfg: LSEENDConfig, *, rng=None, train=False,
           time_mode: str = "chunkwise"):
    """ConformerEncoderBlock batch form (encoder.py:112-113)."""
    rs = jax.random.split(rng, 4) if rng is not None else [None] * 4
    rate = cfg.dropout
    x = x + cfg.ff_factor * _ff(p["ff1"], x, rng=rs[0], rate=rate, train=train)
    h = nn.layer_norm(p["ret_norm"], x)
    h = _retention_seq(p["ret"], h, cfg, time_mode)
    x = x + nn.dropout(rs[1], h, rate, train)
    h, bn_state = _conv_module(p["conv"], bn_state, x, cfg, rng=rs[2], rate=rate,
                               train=train)
    x = x + h
    x = x + cfg.ff_factor * _ff(p["ff2"], x, rng=rs[3], rate=rate, train=train)
    return nn.layer_norm(p["final_norm"], x), bn_state


def encode(params: Params, state, cfg: LSEENDConfig, xs: jnp.ndarray, *,
           train=False, rngs=None, time_mode: str = "chunkwise"):
    """xs: (B, T, in_size) with T % chunk_size == 0 (pad upstream)."""
    h = nn.layer_norm(params["enc"]["norm"], nn.linear(params["enc"]["proj"], xs))
    rs = (jax.random.split(rngs, cfg.enc_n_layers) if rngs is not None
          else [None] * cfg.enc_n_layers)
    new_bn = []
    if cfg.remat:
        def block_fn(bp, bs, h, rng):
            return jax.checkpoint(
                lambda bp_, bs_, h_: _block(bp_, bs_, h_, cfg, rng=rng,
                                            train=train, time_mode=time_mode)
            )(bp, bs, h)
    else:
        def block_fn(bp, bs, h, rng):
            return _block(bp, bs, h, cfg, rng=rng, train=train,
                          time_mode=time_mode)
    for i, bp in enumerate(params["enc"]["blocks"]):
        h, s = block_fn(bp, state["conv_bn"][i], h, rs[i])
        new_bn.append(s)
    return h, {"conv_bn": new_bn}


def fusion_layer(p: Params, x: jnp.ndarray, cfg: LSEENDConfig, *, rng=None,
                 train=False, time_mode: str = "chunkwise") -> jnp.ndarray:
    """x: (B, T, C, D). Chunkwise retention over T per slot; MHA over C per
    frame; FFN; post-norm (merge_retnet_layer.py:233-253)."""
    rs = jax.random.split(rng, 4) if rng is not None else [None] * 4
    rate = cfg.dropout
    B, T, C, D = x.shape
    xt = x.swapaxes(1, 2).reshape(B * C, T, D)
    a = _retention_seq(p["time_ret"], xt, cfg, time_mode)
    xt = nn.layer_norm(p["norm11"], xt + nn.dropout(rs[0], a, rate, train))
    x = xt.reshape(B, C, T, D).swapaxes(1, 2)
    a = nn.mha(p["spk_attn"], x, x, x, None, rng=rs[1], dropout_rate=rate, train=train)
    x = nn.layer_norm(p["norm21"], x + nn.dropout(rs[2], a, rate, train))
    x = nn.layer_norm(p["norm22"], x + nn.ff_block(p, x, rng=rs[3], rate=rate,
                                                   train=train))
    return x


def decode(params: Params, cfg: LSEENDConfig, emb: jnp.ndarray, n_slots: int, *,
           train=False, rngs=None, time_mode: str = "chunkwise") -> jnp.ndarray:
    B, T, D = emb.shape
    rs = (jax.random.split(rngs, cfg.dec_n_layers) if rngs is not None
          else [None] * cfg.dec_n_layers)
    if cfg.use_fused_dec and time_mode == "chunkwise":
        return _decode_fused(params, cfg, emb, n_slots, train=train, rs=rs)
    pe = nn.sinusoidal_table(cfg.pe_max_len, cfg.n_units)[:n_slots].astype(emb.dtype)
    x = jnp.concatenate(
        [jnp.broadcast_to(emb[:, :, None, :], (B, T, n_slots, D)),
         jnp.broadcast_to(pe[None, None], (B, T, n_slots, D))], axis=-1)
    x = nn.linear(params["dec"]["convert"], x)
    for i, lp in enumerate(params["dec"]["layers"]):
        x = fusion_layer(lp, x, cfg, rng=rs[i], train=train, time_mode=time_mode)
    return x


def _decode_fused(params: Params, cfg: LSEENDConfig, emb: jnp.ndarray,
                  n_slots: int, *, train: bool, rs) -> jnp.ndarray:
    """Attractor decoder through the fused TRAIN kernels
    (kernels/dec_train_fusion_pallas.py): the whole stack runs SLOT-MAJOR
    (B, C, T, D) — zero per-layer transposes (the XLA fusion_layer relayouts
    the 20-50M-element slot grid twice per layer) — and each fusion layer is
    one fwd + one hand-written bwd pallas_call with VMEM-resident
    activations.  Dropout runs in-kernel from per-layer integer seeds
    (counter-hash masks; distribution-identical to the XLA path, different
    bits).  Returns the decode() contract shape (B, T, C, D)."""
    from fseend_tpu.kernels.dec_train_fusion_pallas import fused_fusion_layer

    B, T, D = emb.shape
    pe = nn.sinusoidal_table(cfg.pe_max_len, cfg.n_units)[:n_slots].astype(emb.dtype)
    x = jnp.concatenate(
        [jnp.broadcast_to(emb[:, None, :, :], (B, n_slots, T, D)),
         jnp.broadcast_to(pe[None, :, None, :], (B, n_slots, T, D))], axis=-1)
    x = nn.linear(params["dec"]["convert"], x)           # (B, C, T, D)
    L = cfg.fused_dec_chunk or cfg.chunk_size
    # an explicitly-chosen internal chunk must WIN even when it does not
    # divide T: retention + the causal per-frame layers never look ahead,
    # so end-padding the slot grid is exact on the first T frames (pinned
    # by tests/test_dec_train_fusion.py::test_internal_chunk_pads_exactly).
    # This matters on real TPUs: Mosaic rejects the kernel at non-8-aligned
    # chunks (L=125 hit "infer-vector-layout: unsupported shape cast" +
    # compile-helper OOM on 2026-08-19; L=128 compiles in 284 s and runs),
    # so production trains set fused_dec_chunk=128 regardless of the
    # encoder's swept chunk_size.
    Tpad = (-T) % L
    if Tpad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Tpad), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    for i, lp in enumerate(params["dec"]["layers"]):
        if train and rs[i] is not None and cfg.dropout > 0.0:
            seed = jax.random.randint(rs[i], (1, 1), 0, 2 ** 31 - 1, jnp.int32)
            rate = cfg.dropout
        else:
            seed = jnp.zeros((1, 1), jnp.int32)
            rate = 0.0
        x = fused_fusion_layer(lp, x, seed, cfg.n_heads, L, rate, interpret)
    if Tpad:
        x = x[:, :, :T]
    return x.swapaxes(1, 2)                              # (B, T, C, D)


def pad_to_chunk(xs: jnp.ndarray, chunk: int) -> jnp.ndarray:
    T = xs.shape[1]
    pad = (-T) % chunk
    if pad:
        xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)))
    return xs


def ls_forward(params: Params, state, cfg: LSEENDConfig, xs: jnp.ndarray,
               lens: jnp.ndarray, n_slots: int, *, train=False, rngs=None,
               time_mode: str = "chunkwise"):
    """Full batch pass. xs (B, T, F) is padded to a chunk multiple internally
    (reference pads both before the encoder and before the cnn,
    onl_conformer...py:82-85 + EmbeddingEncoderModule:282-283)."""
    r_enc, r_dec = jax.random.split(rngs) if rngs is not None else (None, None)
    T0 = xs.shape[1]
    xs = pad_to_chunk(xs, cfg.chunk_size)
    T = xs.shape[1]
    len_mask = jnp.arange(T)[None, :] < lens[:, None]
    xs = jnp.where(len_mask[..., None], xs, 0.0)
    h, new_state = encode(params, state, cfg, xs, train=train, rngs=r_enc,
                          time_mode=time_mode)
    h = jnp.where(len_mask[..., None], h, 0.0)  # re-pad with zeros before cnn
    emb = nn.lookahead_conv(params["cnn"], h, cfg.conv_delay)
    emb = nn.l2_normalize(emb)
    attractors = decode(params, cfg, emb, n_slots, train=train, rngs=r_dec,
                        time_mode=time_mode)
    attractors = nn.l2_normalize(attractors)
    logits = jnp.einsum("btd,btcd->btc", emb, attractors,
                        preferred_element_type=jnp.float32)
    return {
        "logits": logits[:, :T0],
        "emb": emb[:, :T0],
        "attractors": attractors[:, :T0],
        "state": new_state,
    }


def ls_test(params: Params, state, cfg: LSEENDConfig, xs, lens,
            max_nspks: int | None = None):
    n_slots = max_nspks if max_nspks is not None else cfg.max_nspks
    return ls_forward(params, state, cfg, xs, lens, n_slots, train=False)


# ---------------------------------------------------------------------------
# streaming mode — O(1) state per stream
# ---------------------------------------------------------------------------


def ls_stream_init(cfg: LSEENDConfig, batch: int, n_slots: int | None = None,
                   dtype=jnp.float32) -> Params:
    """O(1)-size StreamState: retention kv states + conv rings. NO growth with
    stream length (contrast fs_eend.fs_stream_init)."""
    C = n_slots if n_slots is not None else cfg.max_nspks
    rc = cfg.ret_cfg
    return {
        # per-LANE stream position: lanes serve independent streams that
        # start/flush at different times (continuous batching); γ=1 retention
        # is position-independent, so this is the only per-lane clock needed
        "t": jnp.zeros((batch,), jnp.int32),
        "enc": [
            {"ret": R.retention_state_init(rc, batch, dtype),
             "conv": jnp.zeros((batch, cfg.conv_kernel_size - 1, cfg.n_units), dtype)}
            for _ in range(cfg.enc_n_layers)
        ],
        "cnn_buf": jnp.zeros((batch, cfg.lookahead_kernel, cfg.n_units), dtype),
        "dec": [R.retention_state_init(rc, batch * C, dtype)
                for _ in range(cfg.dec_n_layers)],
    }


def _conv_module_step(p: Params, bn_state, x_t: jnp.ndarray, cache: jnp.ndarray,
                      cfg: LSEENDConfig):
    """One-step causal conv module (convolution.py:154-167). x_t: (B, D);
    cache: (B, k-1, D) post-GLU history."""
    h = nn.layer_norm(p["norm"], x_t)
    h = nn.linear(p["pw1"], h)
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)  # (B, D)
    window = jnp.concatenate([cache, h[:, None, :]], axis=1)  # (B, k, D)
    new_cache = window[:, 1:]
    # depthwise conv over the window: kernel (k, 1, D)
    y = jnp.einsum("bkd,kd->bd", window, p["dw"]["kernel"][:, 0, :])
    y, _ = nn.batch_norm(p["bn"], bn_state, y, train=False)
    y = jax.nn.silu(y)
    y = nn.linear(p["pw2"], y)
    return y, new_cache


def _block_step(p: Params, bn_state, x_t: jnp.ndarray, st: Params,
                cfg: LSEENDConfig):
    """One-step conformer block (encoder.py:115-123)."""
    x_t = x_t.astype(st["conv"].dtype)
    x = x_t + cfg.ff_factor * _ff(p["ff1"], x_t)
    h = nn.layer_norm(p["ret_norm"], x)
    h, ret_state = R.retention_recurrent_step(p["ret"], h, st["ret"], cfg.ret_cfg)
    x = x + h
    h, conv_cache = _conv_module_step(p["conv"], bn_state, x, st["conv"], cfg)
    x = x + h
    x = x + cfg.ff_factor * _ff(p["ff2"], x)
    x = nn.layer_norm(p["final_norm"], x)
    return x, {"ret": ret_state, "conv": conv_cache.astype(st["conv"].dtype)}


def ls_stream_step(params: Params, state: Params, cfg: LSEENDConfig, model_state,
                   x_t: jnp.ndarray, n_slots: int, flush=False):
    """One O(1) streaming step. x_t: (B, in_size). flush pushes a zero
    vector into the look-ahead cnn without running the encoder
    (LS streaming_infer_dia.py:91-95); scalar or PER-LANE (B,) — lanes
    serve independent streams, so one lane can drain its conv tail while
    others keep consuming audio. Returns (new_state, out); out["valid"]
    is (B,)."""
    t = state["t"]
    B = x_t.shape[0]
    flush = jnp.broadcast_to(jnp.asarray(flush, bool), (B,))

    def lane_keep(keep_old, new, old):
        """Per-leaf lane select; leaves lead with B (or B*C for the
        decoder, handled by the caller via repeat)."""
        return jax.tree.map(
            lambda n, o: jnp.where(
                keep_old.reshape(keep_old.shape + (1,) * (n.ndim - 1)), o, n),
            new, old)

    # --- conformer encoder, one frame ---
    h = nn.layer_norm(params["enc"]["norm"], nn.linear(params["enc"]["proj"], x_t))
    new_enc = []
    for bp, bs, st in zip(params["enc"]["blocks"], model_state["conv_bn"], state["enc"]):
        h, new_st = _block_step(bp, bs, h, st, cfg)
        new_st = lane_keep(flush, new_st, st)
        new_enc.append(new_st)
    h = jnp.where(flush[:, None], 0.0, h)
    # --- look-ahead cnn ring ---
    cnn_buf = jnp.concatenate([state["cnn_buf"][:, 1:], h[:, None, :]], axis=1)
    y = jnp.einsum("bkd,kdo->bo", cnn_buf, params["cnn"]["kernel"]) + params["cnn"]["bias"]
    valid = t >= cfg.conv_delay
    emb = nn.l2_normalize(y)
    # --- retention attractor decoder, one frame ---
    pe = nn.sinusoidal_table(cfg.pe_max_len, cfg.n_units)[:n_slots].astype(emb.dtype)
    x = jnp.concatenate(
        [jnp.broadcast_to(emb[:, None, :], (B, n_slots, cfg.n_units)),
         jnp.broadcast_to(pe[None], (B, n_slots, cfg.n_units))], axis=-1)
    x = nn.linear(params["dec"]["convert"], x)  # (B, C, D)
    valid_slots = jnp.repeat(valid, n_slots)  # decoder states are (B*C, ...)
    new_dec = []
    for lp, st in zip(params["dec"]["layers"], state["dec"]):
        xt = x.reshape(B * n_slots, cfg.n_units)
        a, ret_state = R.retention_recurrent_step(lp["time_ret"], xt, st, cfg.ret_cfg)
        ret_state = lane_keep(~valid_slots, ret_state, st)
        x = nn.layer_norm(lp["norm11"], x + a.reshape(B, n_slots, cfg.n_units))
        s = nn.mha(lp["spk_attn"], x, x, x, None)
        x = nn.layer_norm(lp["norm21"], x + s)
        x = nn.layer_norm(lp["norm22"], x + nn.ff_block(lp, x))
        new_dec.append(ret_state)
    attractors = nn.l2_normalize(x)
    logits = jnp.einsum("bd,bcd->bc", emb, attractors, preferred_element_type=jnp.float32)
    sd = state["cnn_buf"].dtype
    # the clock counts STEPS (real + flush): a flush step still slides the
    # conv window, so `valid` must keep advancing or a stream shorter than
    # conv_delay would never emit (its outputs all surface during flush)
    new_state = {
        "t": t + 1,
        "enc": new_enc,
        "cnn_buf": cnn_buf.astype(sd),
        "dec": new_dec,
    }
    return new_state, {"logits": logits, "emb": emb, "valid": valid}


def ls_stream_scan(params: Params, state: Params, cfg: LSEENDConfig, model_state,
                   xs: jnp.ndarray, n_slots: int):
    """Whole-clip fused streaming scan, time-aligned to the batch output."""
    B, T, F = xs.shape
    pad = jnp.zeros((B, cfg.conv_delay, F), xs.dtype)
    seq = jnp.concatenate([xs, pad], axis=1).swapaxes(0, 1)
    flush = jnp.arange(T + cfg.conv_delay) >= T

    def step(carry, inp):
        x_t, fl = inp
        new_state, out = ls_stream_step(params, carry, cfg, model_state, x_t,
                                        n_slots, flush=fl)
        return new_state, (out["logits"], out["emb"])

    _, (logits, emb) = jax.lax.scan(step, state, (seq, flush))
    return logits[cfg.conv_delay:].swapaxes(0, 1), emb[cfg.conv_delay:].swapaxes(0, 1)


def ls_stream_scan_fused(params: Params, state: Params, cfg: LSEENDConfig,
                         model_state, xs: jnp.ndarray, n_slots: int,
                         interpret: bool | None = None,
                         enc_kernel: bool = True) -> jnp.ndarray:
    """Whole-clip per-frame-semantics inference through the frame-scan
    kernels — drop-in for `ls_stream_scan`'s logits (same conv-delay
    alignment: pads the clip and drains the look-ahead with flush steps)."""
    B, T, F = xs.shape
    pad = jnp.zeros((B, cfg.conv_delay, F), xs.dtype)
    seq = jnp.concatenate([xs, pad], axis=1)
    flush = jnp.broadcast_to(
        (jnp.arange(T + cfg.conv_delay) >= T)[:, None],
        (T + cfg.conv_delay, B))
    _, (logits, _valid) = ls_stream_block_fused(
        params, state, cfg, model_state, seq, flush, n_slots,
        interpret=interpret, enc_kernel=enc_kernel)
    return logits[cfg.conv_delay:].swapaxes(0, 1)


def ls_stream_block_fused(params: Params, state: Params, cfg: LSEENDConfig,
                          model_state, xs: jnp.ndarray, flush: jnp.ndarray,
                          n_slots: int, interpret: bool | None = None,
                          enc_kernel: bool = True):
    """K-frame per-frame-streaming block with the DECODER fused into one
    Pallas frame-scan kernel (kernels/dec_frame_scan_pallas.py).

    Semantically identical to scanning `ls_stream_step` over the block (same
    per-frame latency semantics, same per-lane flush/valid gating): the
    encoder + look-ahead cnn run as an XLA scan/batched conv; the attractor
    decoder — whose (B*C, H, dv, dk) retention states dominate the scan's
    HBM traffic — runs with its states VMEM-resident across the block.

    xs: (B, K, in_size); flush: (K, B) bool.
    Returns (new_state, (logits (K, B, C) f32, valid (K, B)))."""
    from fseend_tpu.kernels import dec_frame_scan_pallas as DFS

    if interpret is None:  # off-TPU (tests, CPU mesh) -> interpreter kernels
        interpret = jax.default_backend() != "tpu"
    B, T, _ = xs.shape
    C = n_slots
    D = cfg.n_units
    dt = state["cnn_buf"].dtype

    if enc_kernel:
        # --- encoder: fused Pallas frame-scan over all conformer blocks ---
        from fseend_tpu.kernels import enc_frame_scan_pallas as EFS

        # proj+LN batched in xs.dtype, then cast to the state dtype — the
        # same order as _block_step's entry cast in the per-frame scan
        h0 = nn.layer_norm(params["enc"]["norm"],
                           nn.linear(params["enc"]["proj"], xs)).astype(dt)
        ew = EFS.pack_enc_weights(params["enc"]["blocks"],
                                  model_state["conv_bn"], cfg, h0.dtype)
        ekv0, es0, ering0 = EFS.pack_enc_state(state["enc"])
        h_t, ekv_f, es_f, ering_f = EFS.enc_frame_scan(
            h0.transpose(1, 2, 0), flush.astype(h0.dtype)[:, None, :], *ew,
            ekv0, es0, ering0, ffac=cfg.ff_factor, interpret=interpret)
        h_seq = h_t.transpose(2, 0, 1)                   # (B, T, D)
        h_seq = jnp.where(flush.T[:, :, None], jnp.zeros((), h_seq.dtype),
                          h_seq)
        new_enc = EFS.unpack_enc_state(ekv_f, es_f, ering_f,
                                       like=state["enc"])
    else:
        # --- encoder: per-frame XLA scan of the conformer blocks ---
        def enc_step(enc_sts, inp):
            x_t, fl = inp
            h = nn.layer_norm(params["enc"]["norm"],
                              nn.linear(params["enc"]["proj"], x_t))
            new_sts = []
            for bp, bs, st in zip(params["enc"]["blocks"],
                                  model_state["conv_bn"], enc_sts):
                h, new_st = _block_step(bp, bs, h, st, cfg)
                new_st = jax.tree.map(
                    lambda n, o: jnp.where(
                        fl.reshape(fl.shape + (1,) * (n.ndim - 1)), o, n),
                    new_st, st)
                new_sts.append(new_st)
            h = jnp.where(fl[:, None], jnp.zeros((), h.dtype), h)
            return new_sts, h

        new_enc, h_seq = jax.lax.scan(enc_step, state["enc"],
                                      (xs.swapaxes(0, 1), flush))
        h_seq = h_seq.swapaxes(0, 1)                     # (B, T, D)

    # --- look-ahead cnn as ONE batched valid conv over the carried window ---
    win = jnp.concatenate([state["cnn_buf"][:, 1:].astype(h_seq.dtype), h_seq],
                          axis=1)                        # (B, k-1+T, D)
    y = nn.conv1d(params["cnn"], win, padding=[(0, 0)])  # (B, T, D)
    new_cnn_buf = win[:, T - 1:T - 1 + cfg.lookahead_kernel].astype(dt)
    emb = nn.l2_normalize(y)                             # (B, T, D)

    t0 = state["t"]
    valid = (t0[None, :] + jnp.arange(T)[:, None]) >= cfg.conv_delay  # (T, B)

    # --- decoder: fused frame-scan kernel, states VMEM-resident ---
    convert = params["dec"]["convert"]
    wc = convert["kernel"].astype(emb.dtype)
    embp = emb @ wc[:D]                                  # (B, T, D)
    pe = nn.sinusoidal_table(cfg.pe_max_len, D)[:C].astype(emb.dtype)
    pe_part = (pe @ wc[D:]).T                            # (D, C)
    if "bias" in convert:
        pe_part = pe_part + convert["bias"].astype(emb.dtype)[:, None]
    dkv0 = state["dec"][0]["kv"]
    G = DFS.pick_groups(B, C, cfg.n_heads, dkv0.shape[2], dkv0.shape[3],
                        cfg.dec_n_layers, dkv0.dtype.itemsize)
    pe_t = jnp.repeat(pe_part, B // G, axis=1)           # (D, C*Bg) slot-major

    kv0, s0 = DFS.pack_dec_state(state["dec"], B, C, groups=G)
    packed = DFS.pack_dec_weights(params["dec"], cfg, emb.dtype)
    logits_k, kv_f, s_f = DFS.dec_frame_scan(
        embp.transpose(1, 2, 0), emb.transpose(1, 2, 0),
        valid.astype(emb.dtype)[:, None, :], pe_t, *packed, kv0, s0,
        C=C, groups=G, interpret=interpret)
    logits = (logits_k.reshape(T, G, C, B // G).transpose(0, 1, 3, 2)
              .reshape(T, B, C))
    new_dec = DFS.unpack_dec_state(kv_f, s_f, B, C, cfg.n_heads,
                                   like=state["dec"], groups=G)

    new_state = {"t": t0 + T, "enc": new_enc, "cnn_buf": new_cnn_buf,
                 "dec": new_dec}
    return new_state, (logits, valid)


# ---------------------------------------------------------------------------
# blockwise-recurrent streaming — MXU-granularity serving
# ---------------------------------------------------------------------------
#
# Process K frames per step using the CHUNKWISE retention math with carried
# cross-block state (ops/retention.py retention_chunkwise_stateful): every
# op becomes a (B, K, D)-shaped matmul instead of K sequential per-frame
# vector ops.  This is the throughput serving mode (adds K/10Hz of batching
# latency); the per-frame `ls_stream_step` remains the low-latency mode.
#
# Numerics: identical to a batch ls_forward in chunkwise time_mode with
# chunk_size=K (verified in tests) — i.e. the same normalization family the
# model TRAINS with; the reference itself tolerates chunkwise-vs-recurrent
# drift at atol=1e-3 (LS streaming_infer_dia.py:157-160).


def _block_ret_cfg(cfg: LSEENDConfig, K: int) -> R.RetentionConfig:
    # propagate use_pallas so the carried-state kernel actually serves
    # blockwise traffic when model.params.use_pallas is set
    return R.RetentionConfig(cfg.n_units, cfg.n_heads, 1, K,
                             use_pallas=cfg.use_pallas,
                             use_fused_ret=cfg.use_fused_ret)


def ls_blockstream_init(cfg: LSEENDConfig, batch: int, n_slots: int | None = None,
                        block: int = 100, dtype=jnp.float32) -> Params:
    """O(1) state for blockwise streaming with one-block emission lag.

    The step consuming block m emits the logits of block m-1: the look-ahead
    conv needs `conv_delay` future encoder frames, which are exactly the head
    of block m.  This keeps the decoder's time axis aligned from frame 0
    (EXACT parity with the batch chunkwise pass — no warm-up garbage) with
    fully static shapes.  Requires block >= conv_delay."""
    assert block >= cfg.conv_delay, "block must be >= conv_delay"
    C = n_slots if n_slots is not None else cfg.max_nspks
    rc = cfg.ret_cfg
    return {
        "enc": [
            {"ret": R.chunk_state_init(rc, batch, dtype),
             "conv": jnp.zeros((batch, cfg.conv_kernel_size - 1, cfg.n_units), dtype)}
            for _ in range(cfg.enc_n_layers)
        ],
        "h_prev": jnp.zeros((batch, block, cfg.n_units), dtype),
        "h_tail2": jnp.zeros((batch, cfg.conv_delay, cfg.n_units), dtype),
        # PER-LANE block counter: the m==0 gate keeps the warm-up block's
        # garbage emission out of the decoder retention state; per-lane so
        # a reset lane is re-gated (exact lane reuse) while others continue
        "m": jnp.zeros((batch,), jnp.int32),
        "dec": [R.chunk_state_init(rc, batch * C, dtype)
                for _ in range(cfg.dec_n_layers)],
    }


def _conv_module_block(p: Params, bn_state, x: jnp.ndarray, cache: jnp.ndarray,
                       cfg: LSEENDConfig):
    """Causal conformer conv over a K-frame block with (k-1)-frame cache."""
    h = nn.layer_norm(p["norm"], x)
    h = nn.linear(p["pw1"], h)
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)  # (B, K, D) post-GLU
    window = jnp.concatenate([cache, h], axis=1)  # (B, k-1+K, D)
    new_cache = window[:, -(cfg.conv_kernel_size - 1):]
    y = nn.conv1d(p["dw"], window, padding=[(0, 0)])  # valid -> (B, K, D)
    y, _ = nn.batch_norm(p["bn"], bn_state, y, train=False)
    y = jax.nn.silu(y)
    y = nn.linear(p["pw2"], y)
    return y, new_cache


def _enc_block_blockstream(p: Params, bn_state, x: jnp.ndarray, st: Params,
                           cfg: LSEENDConfig, rc: R.RetentionConfig):
    x = x + cfg.ff_factor * _ff(p["ff1"], x)
    h = nn.layer_norm(p["ret_norm"], x)
    h, ret_state = R.retention_chunkwise_stateful(p["ret"], h, st["ret"], rc)
    x = x + h
    h, conv_cache = _conv_module_block(p["conv"], bn_state, x, st["conv"], cfg)
    x = x + h
    x = x + cfg.ff_factor * _ff(p["ff2"], x)
    x = nn.layer_norm(p["final_norm"], x)
    return x, {"ret": ret_state, "conv": conv_cache}


def ls_blockstream_step(params: Params, state: Params, cfg: LSEENDConfig,
                        model_state, xs: jnp.ndarray, n_slots: int,
                        enc_bypass=False, h_mask: jnp.ndarray | None = None):
    """Consume block m (B, K, in_size); emit logits (B, K, n_slots) of block
    m-1 (garbage for m=0 — the caller discards the first emitted block).

    enc_bypass=True feeds zero embeddings (the stream-end flush; also used
    to drain the final real block).  h_mask (K,) zeroes this block's
    embeddings per frame (padding frames, mirroring the batch re-pad)."""
    B, K, _ = xs.shape
    rc = _block_ret_cfg(cfg, K)
    enc_bypass = jnp.asarray(enc_bypass)
    # --- encoder on block m ---
    h = nn.layer_norm(params["enc"]["norm"], nn.linear(params["enc"]["proj"], xs))
    new_enc = []
    for bp, bs, st in zip(params["enc"]["blocks"], model_state["conv_bn"],
                          state["enc"]):
        h, new_st = _enc_block_blockstream(bp, bs, h, st, cfg, rc)
        new_st = jax.tree.map(lambda new, old: jnp.where(enc_bypass, old, new),
                              new_st, st)
        new_enc.append(new_st)
    h = jnp.where(enc_bypass, 0.0, h)
    if h_mask is not None:
        # zero padding-frame embeddings, matching the batch path's re-pad
        # (ls_forward: h = where(len_mask, h, 0))
        h = h * h_mask[None, :, None].astype(h.dtype)
    # --- look-ahead cnn emits block m-1 ---
    window = jnp.concatenate(
        [state["h_tail2"], state["h_prev"], h[:, :cfg.conv_delay]], axis=1)
    emb = nn.conv1d(params["cnn"], window, padding=[(0, 0)])  # (B, K, D)
    emb = nn.l2_normalize(emb)
    # --- decoder block (time axis aligned from frame 0 of the stream) ---
    pe = nn.sinusoidal_table(cfg.pe_max_len, cfg.n_units)[:n_slots].astype(emb.dtype)
    x = jnp.concatenate(
        [jnp.broadcast_to(emb[:, :, None, :], (B, K, n_slots, cfg.n_units)),
         jnp.broadcast_to(pe[None, None], (B, K, n_slots, cfg.n_units))], axis=-1)
    x = nn.linear(params["dec"]["convert"], x)  # (B, K, C, D)
    first = state["m"] == 0                    # (B,) per-lane warm-up gate
    first_slots = jnp.repeat(first, n_slots)   # decoder states are (B*C, ...)
    new_dec = []
    for lp, st in zip(params["dec"]["layers"], state["dec"]):
        xt = x.swapaxes(1, 2).reshape(B * n_slots, K, cfg.n_units)
        a, ret_state = R.retention_chunkwise_stateful(lp["time_ret"], xt, st, rc)
        # block 0's emission is garbage; don't let it pollute decoder state
        ret_state = jax.tree.map(
            lambda new, old: jnp.where(
                first_slots.reshape(first_slots.shape + (1,) * (new.ndim - 1)),
                old, new),
            ret_state, st)
        xt = nn.layer_norm(lp["norm11"], xt + a)
        x = xt.reshape(B, n_slots, K, cfg.n_units).swapaxes(1, 2)
        s = nn.mha(lp["spk_attn"], x, x, x, None)
        x = nn.layer_norm(lp["norm21"], x + s)
        x = nn.layer_norm(lp["norm22"], x + nn.ff_block(lp, x))
        new_dec.append(ret_state)
    attractors = nn.l2_normalize(x)
    logits = jnp.einsum("bkd,bkcd->bkc", emb, attractors,
                        preferred_element_type=jnp.float32)
    new_state = {
        "enc": new_enc,
        "h_prev": h,
        "h_tail2": state["h_prev"][:, -cfg.conv_delay:],
        "m": state["m"] + 1,
        "dec": new_dec,
    }
    return new_state, logits


def ls_blockstream_run(params: Params, cfg: LSEENDConfig, model_state,
                       xs: jnp.ndarray, n_slots: int, block: int):
    """Whole-clip blockwise streaming, time-aligned output (B, T, n_slots).
    Exactly equals ls_forward(time_mode="chunkwise") with chunk_size=block."""
    B, T, F = xs.shape
    state = ls_blockstream_init(cfg, B, n_slots, block, xs.dtype)
    padT = (-T) % block
    xs_p = jnp.pad(xs, ((0, 0), (0, padT), (0, 0)))
    outs = []
    for st_i in range(0, T + padT, block):
        h_mask = (jnp.arange(st_i, st_i + block) < T)
        state, logits = ls_blockstream_step(
            params, state, cfg, model_state, xs_p[:, st_i:st_i + block],
            n_slots, h_mask=h_mask)
        outs.append(logits)  # block (st_i/block - 1); first is garbage
    # drain the final real block with one enc-bypass call
    state, logits = ls_blockstream_step(
        params, state, cfg, model_state,
        jnp.zeros((B, block, F), xs.dtype), n_slots, enc_bypass=True)
    outs.append(logits)
    full = jnp.concatenate(outs[1:], axis=1)  # drop the m=0 garbage block
    return full[:, :T]
