"""LR schedules and optimizers.

Capability parity: the reference genre's Adam/Adadelta + Noam or
reduce-on-plateau scheduling, grad-clip ~5.0 (SURVEY.md §2a "Solver / trainer").
"""

from __future__ import annotations

import optax

from pytorch_end2end_speech_recognition_tpu.utils.config import TrainConfig


def make_schedule(cfg: TrainConfig):
    if cfg.schedule == "noam":
        # lr * min(step^-0.5, step * warmup^-1.5) * warmup^0.5 (Transformer LR)
        def noam(step):
            s = (step + 1).astype(float) if hasattr(step, "astype") else float(
                step + 1
            )
            return cfg.lr * (cfg.warmup_steps ** 0.5) * min_(
                s ** -0.5, s * cfg.warmup_steps ** -1.5
            )

        import jax.numpy as jnp

        def min_(a, b):
            return jnp.minimum(a, b)

        return noam
    if cfg.schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.lr, cfg.warmup_steps, cfg.steps
        )
    if cfg.schedule == "constant":
        return lambda step: cfg.lr
    if cfg.schedule == "plateau":
        # plateau is driven host-side via Solver.lr_scale; base is constant
        return lambda step: cfg.lr
    raise ValueError(f"unknown schedule {cfg.schedule}")


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    sched = make_schedule(cfg)
    if cfg.optimizer == "adamw":
        opt = optax.adamw(sched, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "adam":
        opt = optax.adam(sched)
    elif cfg.optimizer == "adadelta":
        opt = optax.chain(
            optax.scale_by_adadelta(), optax.scale_by_learning_rate(sched)
        )
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer}")
    chain = [optax.clip_by_global_norm(cfg.grad_clip), opt]
    # host-driven plateau decay multiplies a mutable scalar into updates
    tx = optax.chain(*chain)
    if cfg.grad_accum_steps > 1:
        # k micro-batches per optimizer update (large effective batch on a
        # fixed memory budget); params change only every k-th step
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx
