"""Optimizers + Noam schedule (reference: FS-EEND/utlis/scheduler.py:3-28,
optimizer build at FS-EEND/train_dia.py:76-100)."""

from __future__ import annotations

import optax


def noam_schedule(d_model: int, warmup_steps: int, scale: float = 1.0,
                  base_lr: float = 1.0):
    """lr(step) = base_lr * scale * d_model^-0.5 * min(s^-0.5, s*warmup^-1.5)
    with s = max(1, step), applied per optimizer step."""

    def schedule(step):
        s = (step + 1).astype(float) if hasattr(step, "astype") else float(max(1, step))
        return base_lr * scale * (d_model ** -0.5) * _min(s ** -0.5, s * (warmup_steps ** -1.5))

    def _min(a, b):
        import jax.numpy as jnp

        return jnp.minimum(a, b)

    return schedule


def build_optimizer(opt_name: str = "noam", lr: float = 1.0, *,
                    d_model: int = 256, warmup_steps: int = 100_000,
                    schedule_scale: float = 1.0, grad_clip: float = 5.0,
                    grad_accum: int = 1) -> optax.GradientTransformation:
    """Mirror of the reference's optimizer matrix:
      noam -> Adam(betas=(0.9, 0.98), eps=1e-9) + per-step Noam schedule
      adam -> plain Adam(lr)
      sgd  -> SGD(lr)
    with global-norm clipping (Trainer(gradient_clip_val), train_dia.py:150)
    and optional gradient accumulation (grad_accm)."""
    name = opt_name.lower()
    if name == "noam":
        lr_fn = noam_schedule(d_model, warmup_steps, schedule_scale, lr)
        core = optax.adam(lr_fn, b1=0.9, b2=0.98, eps=1e-9)
    elif name == "adam":
        core = optax.adam(lr)
    elif name == "sgd":
        core = optax.sgd(lr)
    else:
        raise NotImplementedError(f"optimizer {opt_name}")
    chain = [optax.clip_by_global_norm(grad_clip), core] if grad_clip else [core]
    tx = optax.chain(*chain)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx
