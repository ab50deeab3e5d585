"""2D rotary position embedding (RoPE) — jnp equivalent of CroCo v2's
``RoPE2D`` / the curope CUDA kernel (reference README.md:47-53; model config
``pos_embed='RoPE100'`` i.e. base frequency 100, DAS3R_b32_g4.sh:5).

Per attention head of dim D: the first D/2 channels are rotated by the token's
y position, the last D/2 by its x position; within each half, standard 1D
RoPE with ``rotate_half`` pairing and inv_freq = base^(-2i/(D/2)).

On TPU this is pure VPU elementwise work fused into the attention matmuls —
no custom kernel needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=16)
def _inv_freq(half_dim: int, base: float):
    import numpy as np
    return np.asarray(
        1.0 / (base ** (np.arange(0, half_dim, 2, dtype=np.float64)
                        / half_dim)), np.float32)


def _rope_1d(tokens: jax.Array, pos: jax.Array, base: float) -> jax.Array:
    """tokens [..., N, D], pos [..., N] int -> rotated tokens."""
    D = tokens.shape[-1]
    inv = jnp.asarray(_inv_freq(D, base))                 # [D//2]
    ang = pos[..., None].astype(jnp.float32) * inv        # [..., N, D//2]
    ang = jnp.concatenate([ang, ang], -1)                 # [..., N, D]
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)
    x1, x2 = jnp.split(tokens, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], -1)
    return tokens * cos + rotated * sin


def rope_2d(tokens: jax.Array, positions: jax.Array,
            base: float = 100.0) -> jax.Array:
    """tokens [B, heads, N, D], positions [B, N, 2] (y, x) int."""
    y_tok, x_tok = jnp.split(tokens, 2, axis=-1)
    ypos = positions[:, None, :, 0]                        # [B, 1, N]
    xpos = positions[:, None, :, 1]
    return jnp.concatenate([
        _rope_1d(y_tok, ypos, base),
        _rope_1d(x_tok, xpos, base),
    ], -1)
