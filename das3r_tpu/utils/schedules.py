"""Learning-rate schedules (pure functions of the step, usable inside jit
and as optax schedules).

``expon_lr`` is the log-linear interpolation with optional warmup-delay used
by all stage-2 parameter groups (reference utils/general_utils.py:29-62);
``cosine_lr`` / ``linear_lr`` / ``cycled_lr`` are the global-alignment
schedules (reference dynamic_predictor/dust3r/cloud_opt/commons.py:88-103).
"""
from __future__ import annotations

import jax.numpy as jnp


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1_000_000):
    """Log-lerp decay from lr_init to lr_final over max_steps, with a cosine
    delay ramp. Returns 0.0 when step < 0 or both lrs are 0 (matching the
    reference's disabled-parameter convention)."""
    step = jnp.asarray(step, jnp.float32)
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(step)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    out = delay_rate * log_lerp
    return jnp.where(step < 0, 0.0, out)


def cosine_lr(t, lr_base: float, lr_min: float = 0.0):
    """t in [0,1] -> cosine from lr_base to lr_min."""
    t = jnp.asarray(t, jnp.float32)
    return lr_min + (lr_base - lr_min) * (jnp.cos(t * jnp.pi) + 1) / 2


def linear_lr(t, lr_base: float, lr_min: float = 0.0):
    t = jnp.asarray(t, jnp.float32)
    return lr_base * (1 - t) + lr_min * t


def cycled_lr(t, lr_base: float, lr_min: float = 0.0, num_cycles: int = 2):
    """Restarted cosine cycles over t in [0,1] (commons.py:96-103)."""
    t = jnp.asarray(t, jnp.float32)
    cycle_t = (t * num_cycles) % 1.0
    return cosine_lr(cycle_t, lr_base, lr_min)
