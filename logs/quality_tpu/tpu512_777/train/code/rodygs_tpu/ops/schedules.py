"""Learning-rate schedules as jnp-traceable functions of the step.

Capability parity with `get_expon_lr_func` (`src/utils/general_utils.py:40-73`)
and `linear_warmup_cosine_annealing_func` (`src/trainer/optim.py:20-28`).
Unlike the reference (host-side Python called per step, then poked into the
optimizer), these are pure functions of a traced step so the whole train step
stays inside one XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1_000_000):
    """Log-linear interpolation from lr_init to lr_final over max_steps with
    an optional reverse-cosine delay ramp. Returns 0 where disabled."""
    step = jnp.asarray(step, jnp.float32)
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(step)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    lr = delay_rate * log_lerp
    return jnp.where(step < 0, 0.0, lr)


def warmup_cosine_lr(step, max_lr: float, warmup_steps: int, total_steps: int):
    """Linear warmup then cosine annealing to zero."""
    step = jnp.asarray(step, jnp.float32)
    if warmup_steps > 0:
        warm = max_lr * (step / warmup_steps)
    else:
        warm = jnp.full_like(step, max_lr)
    progress = (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1)
    cos = max_lr * 0.5 * (1 + jnp.cos(jnp.pi * progress))
    return jnp.where(step < warmup_steps, warm, cos)
