"""Training-step performance sweep on the real chip (the train-side
counterpart of tools/sweep_serving.py).

Two parts:
  A. component breakdown of one train step at the benchmarked config
     (where do the milliseconds go: encoder fwd+bwd, decoder fwd+bwd,
     losses, optimizer);
  B. config sweep over compute dtype / batch / retention chunk / remat,
     reporting frames/s + XLA-counted MFU for each.

Run:  python tools/sweep_train.py            (full sweep, ~15 min cold cache)
      SWEEP_PART=A python tools/sweep_train.py   (breakdown only)
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses _sync / compiled_flops / device_peak_flops)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from fseend_tpu.models import ls_eend  # noqa: E402
from fseend_tpu.train import losses, optim, trainer  # noqa: E402


def make_batch(rng, B, T, S, in_size):
    return {
        "feats": jnp.asarray(rng.standard_normal((B, T, in_size)), jnp.float32),
        "labels": jnp.asarray((rng.uniform(size=(B, T, S)) > 0.7), jnp.float32),
        "lens": jnp.full((B,), T, jnp.int32),
        "n_spk": jnp.full((B,), S, jnp.int32),
    }


def timeit(fn, *args, n=10, donate_state=False):
    """Returns (ms_per_call, result). fn must return something jax."""
    out = fn(*args)
    bench._sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    bench._sync(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def part_a(cfg, B=16, T=500, S=4):
    print(f"=== A. component breakdown (B={B}, T={T}, f32) ===", flush=True)
    rng = np.random.default_rng(0)
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), cfg)
    batch = make_batch(rng, B, T, S, cfg.in_size)
    task = trainer.TaskConfig(model="ls", label_mode="fixed",
                              masked_emb_loss=True)
    tx = optim.build_optimizer("noam", d_model=cfg.n_units, warmup_steps=100_000)
    state = trainer.TrainState.create(params, mstate, tx)
    key = jax.random.PRNGKey(1)

    # full step
    tstep = trainer.make_train_step(task, cfg, tx, donate=False)
    ms, _ = timeit(lambda: tstep(state, batch, key))
    print(f"full train step:        {ms:8.2f} ms", flush=True)

    # loss fwd only
    fwd = jax.jit(lambda p: trainer.compute_loss(task, cfg, p, mstate, batch,
                                                 key, train=True)[0])
    ms_f, _ = timeit(lambda: fwd(params))
    print(f"loss forward only:      {ms_f:8.2f} ms", flush=True)

    # value+grad, no optimizer
    vg = jax.jit(lambda p: jax.value_and_grad(
        lambda q: trainer.compute_loss(task, cfg, q, mstate, batch, key,
                                       train=True)[0])(p)[1])
    ms_g, _ = timeit(lambda: vg(params))
    print(f"fwd+bwd (no optimizer): {ms_g:8.2f} ms", flush=True)

    # encoder-only fwd+bwd
    xs = batch["feats"]
    enc_g = jax.jit(lambda p: jax.grad(
        lambda q: jnp.sum(ls_eend.encode(q, mstate, cfg, xs, train=True,
                                         rngs=None, time_mode="chunkwise")[0]
                          ))(p))
    ms_e, _ = timeit(lambda: enc_g(params))
    print(f"encoder fwd+bwd:        {ms_e:8.2f} ms", flush=True)

    # decoder-only fwd+bwd on a fixed emb
    emb = jnp.asarray(np.random.default_rng(1).standard_normal(
        (B, T, cfg.n_units)), jnp.float32)
    dec_g = jax.jit(lambda p: jax.grad(
        lambda q: jnp.sum(ls_eend.decode(q, cfg, emb, S + 2, train=True,
                                         rngs=None, time_mode="chunkwise")
                          ))(p))
    ms_d, _ = timeit(lambda: dec_g(params))
    print(f"decoder fwd+bwd:        {ms_d:8.2f} ms", flush=True)

    # emb-consistency loss fwd+bwd on fixed emb/labels
    slot_labels = jnp.concatenate(
        [1 - batch["labels"].max(-1, keepdims=True), batch["labels"],
         jnp.zeros((B, T, 1))], axis=-1)
    el_g = jax.jit(lambda e: jax.grad(
        lambda x: losses.emb_consistency_loss_ls(x, slot_labels,
                                                 batch["lens"]))(e))
    ms_l, _ = timeit(lambda: el_g(emb))
    print(f"emb-loss fwd+bwd:       {ms_l:8.2f} ms", flush=True)
    print(f"(unaccounted: step - fwd+bwd = optimizer+counters "
          f"{ms - ms_g:8.2f} ms)", flush=True)


def part_b(cfg, S=4):
    print("=== B. config sweep (full train step) ===", flush=True)
    rng = np.random.default_rng(0)
    rows = []
    env = os.environ.get("SWEEP_VARIANTS")
    if env:
        # "bf16:64:500:125:0[:fused],..." -> (dtype, B, T, chunk, remat,
        # use_fused_ret) — the optional 6th field routes retention layers
        # through the fused Pallas kernel (recompute-backward)
        variants = []
        for spec in env.split(","):
            d, B, T, c, r, *f = spec.split(":")
            variants.append((d, int(B), int(T), int(c), bool(int(r)),
                             bool(int(f[0])) if f else False))
    else:
        variants = []
        for dtype in ("f32", "bf16"):
            for B, T in ((16, 500), (32, 500), (64, 500)):
                variants.append((dtype, B, T, cfg.chunk_size, False, False))
        # chunk-size variants at the bf16 default batch
        for chunk in (125, 250):
            variants.append(("bf16", 16, 500, chunk, False, False))
        # remat at the default
        variants.append(("bf16", 16, 500, cfg.chunk_size, True, False))
        variants.append(("bf16", 64, 2000, cfg.chunk_size, False, False))

    for dtype, B, T, chunk, remat, fused in variants:
        vcfg = dataclasses.replace(cfg, chunk_size=chunk, remat=remat,
                                   use_fused_ret=fused)
        task = trainer.TaskConfig(model="ls", label_mode="fixed",
                                  masked_emb_loss=True, compute_dtype=dtype)
        tx = optim.build_optimizer("noam", d_model=cfg.n_units,
                                   warmup_steps=100_000)
        params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), vcfg)
        state = trainer.TrainState.create(params, mstate, tx)
        batch = make_batch(rng, B, T, S, cfg.in_size)
        key = jax.random.PRNGKey(1)
        tstep = trainer.make_train_step(task, vcfg, tx, donate=True)
        try:
            flops = bench.compiled_flops(tstep, state, batch, key)
            state, met = tstep(state, batch, key)
            bench._sync(met["tot_loss"])
            n = 10
            t0 = time.perf_counter()
            for _ in range(n):
                state, met = tstep(state, batch, key)
            bench._sync(met["tot_loss"])
            el = time.perf_counter() - t0
            fps = B * T * n / el
            mfu = bench._mfu(flops, n, el)
            rows.append((dtype, B, T, chunk, remat, fused, el / n * 1e3, fps, mfu))
            print(f"dtype={dtype:4s} B={B:3d} T={T:5d} chunk={chunk:3d} "
                  f"remat={int(remat)} fused={int(fused)}: "
                  f"{el / n * 1e3:7.1f} ms/step "
                  f"{fps:9.0f} f/s  MFU "
                  f"{100 * mfu if mfu else float('nan'):.2f}%", flush=True)
        except Exception as e:
            print(f"dtype={dtype} B={B} T={T} chunk={chunk} remat={remat} "
                  f"fused={int(fused)}: "
                  f"FAILED {type(e).__name__}: {e}", flush=True)
    return rows


def part_c(cfg, B=None, T=None, S=4):
    B = B or int(os.environ.get("SWEEP_B", "16"))
    T = T or int(os.environ.get("SWEEP_T", "500"))
    """Component breakdown of the SHIPPED round-5 default train step
    (bf16, chunk 125, fused-dec L=128) — part A profiles the f32 XLA
    path, which round 5 no longer ships."""
    import dataclasses as _dc

    train_chunk = int(os.environ.get("SWEEP_CHUNK", "125"))
    fused_L = int(os.environ.get("SWEEP_FUSED_CHUNK", "128"))
    # SWEEP_SKIP_FUSED=1: CPU smoke mode — the fused kernel only runs in
    # interpret mode off-TPU, far too slow even at toy dims
    skip_fused = bool(os.environ.get("SWEEP_SKIP_FUSED"))
    vcfg = _dc.replace(cfg, chunk_size=train_chunk,
                       use_fused_dec=not skip_fused,
                       fused_dec_chunk=fused_L)
    print(f"=== C. component breakdown of the shipped step "
          f"(B={B}, T={T}, bf16, chunk={train_chunk}, fused L={fused_L}) ===",
          flush=True)
    rng = np.random.default_rng(0)
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), vcfg)
    batch = make_batch(rng, B, T, S, vcfg.in_size)
    task = trainer.TaskConfig(model="ls", label_mode="fixed",
                              masked_emb_loss=True, compute_dtype="bf16")
    tx = optim.build_optimizer("noam", d_model=vcfg.n_units,
                               warmup_steps=100_000)
    state = trainer.TrainState.create(params, mstate, tx)
    key = jax.random.PRNGKey(1)

    # donate=True matches bench.py's fused-dec variant exactly, so the
    # production compile cache entry is reused (the kernel's cold compile
    # is ~284 s through the relay)
    tstep = trainer.make_train_step(task, vcfg, tx, donate=True)
    # private copy: donation must not invalidate `params`, reused below
    st = jax.tree.map(jnp.array, state)
    st, met = tstep(st, batch, key)
    bench._sync(met["tot_loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        st, met = tstep(st, batch, key)
    bench._sync(met["tot_loss"])
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"full train step:            {ms:8.2f} ms", flush=True)

    vg = jax.jit(lambda p: jax.value_and_grad(
        lambda q: trainer.compute_loss(task, vcfg, q, mstate, batch, key,
                                       train=True)[0])(p)[1])
    ms_g, _ = timeit(lambda: vg(params))
    print(f"fwd+bwd (no optimizer):     {ms_g:8.2f} ms", flush=True)

    bf16 = lambda t: jax.tree.map(  # noqa: E731
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)
    pb, xb = bf16(params), batch["feats"].astype(jnp.bfloat16)

    enc_g = jax.jit(lambda p: jax.grad(
        lambda q: jnp.sum(ls_eend.encode(q, mstate, vcfg, xb, train=True,
                                         rngs=None, time_mode="chunkwise")[0]
                          .astype(jnp.float32)))(p))
    ms_e, _ = timeit(lambda: enc_g(pb))
    print(f"encoder fwd+bwd (bf16):     {ms_e:8.2f} ms", flush=True)

    emb = jnp.asarray(np.random.default_rng(1).standard_normal(
        (B, T, vcfg.n_units)), jnp.bfloat16)
    dec_variants = [("xla", _dc.replace(vcfg, use_fused_dec=False))]
    if not skip_fused:
        dec_variants.insert(0, ("fused", vcfg))
    for name, dcfg in dec_variants:
        dec_g = jax.jit(lambda p, c=dcfg: jax.grad(
            lambda q: jnp.sum(ls_eend.decode(q, c, emb, S + 2, train=True,
                                             rngs=None, time_mode="chunkwise")
                              .astype(jnp.float32)))(p))
        ms_d, _ = timeit(lambda: dec_g(pb))
        print(f"decoder fwd+bwd ({name:5s}):    {ms_d:8.2f} ms", flush=True)

    # loss tail on FIXED model outputs: label protocol + BCE + emb-loss +
    # DER counters + their backward into (logits, emb)
    from fseend_tpu.train import labels as labels_lib
    logits = jnp.asarray(rng.standard_normal((B, T, S + 2)), jnp.float32)
    embf = emb.astype(jnp.float32)

    def loss_tail(lg, e):
        slot_labels, slot_mask = labels_lib.prepare_labels(
            batch["labels"], batch["lens"], batch["n_spk"])
        pit = losses.standard_bce_loss(lg, slot_labels, batch["lens"],
                                       slot_mask, label_delay=0)
        el = losses.emb_consistency_loss_ls(e, slot_labels, batch["lens"])
        real_mask = jnp.arange(1, S + 1)[None, :] <= batch["n_spk"][:, None]
        counters = losses.diarization_error_counters(
            jax.lax.stop_gradient(lg[..., 1:-1]), slot_labels[..., 1:-1],
            batch["lens"], real_mask, label_delay=0)
        return pit + 0.01 * el + 0.0 * sum(
            jnp.sum(v.astype(jnp.float32)) for v in counters.values())

    tail_g = jax.jit(lambda lg, e: jax.grad(loss_tail, argnums=(0, 1))(lg, e))
    ms_t, _ = timeit(lambda: tail_g(logits, embf))
    print(f"loss tail fwd+bwd:          {ms_t:8.2f} ms", flush=True)

    # the logits matmul itself: emb (B,T,D) x attractors (B,T,C,D)
    attr = jnp.asarray(rng.standard_normal((B, T, S + 2, vcfg.n_units)),
                       jnp.bfloat16)

    def logits_fn(e, a):
        en = e / jnp.maximum(jnp.linalg.norm(e.astype(jnp.float32), axis=-1,
                                             keepdims=True), 1e-12).astype(e.dtype)
        an = a / jnp.maximum(jnp.linalg.norm(a.astype(jnp.float32), axis=-1,
                                             keepdims=True), 1e-12).astype(a.dtype)
        return jnp.sum(jnp.einsum("btd,btcd->btc", en, an).astype(jnp.float32))

    lg_g = jax.jit(lambda e, a: jax.grad(logits_fn, argnums=(0, 1))(e, a))
    ms_lg, _ = timeit(lambda: lg_g(emb, attr))
    print(f"l2norm+logits fwd+bwd:      {ms_lg:8.2f} ms", flush=True)
    print(f"(optimizer+overhead: step - fwd+bwd = {ms - ms_g:8.2f} ms)",
          flush=True)


if __name__ == "__main__":
    cfg = ls_eend.LSEENDConfig()
    part = os.environ.get("SWEEP_PART", "AB")
    # B first: the actionable sweep lands even if the run is cut short
    if "B" in part:
        part_b(cfg)
    if "A" in part:
        part_a(cfg)
    if "C" in part:
        part_c(cfg)
