"""k-nearest-neighbor mean squared distance — TPU replacement for
``simple_knn._C.distCUDA2`` (reference call site scene/gaussian_model.py:21,
213, 641-642; semantics per SURVEY.md §2.10).

Used once at Gaussian init to size initial scales, so throughput matters more
than asymptotics: a blocked brute-force O(N^2 / block) pairwise distance with
top-k over 128-wide lanes maps straight onto the MXU/VPU and stays
static-shape. For the typical N (tens of thousands to a few hundred
thousand) this is a few big fused matmul-shaped ops on TPU — no spatial
hashing needed.

Exactness beyond "mean squared distance of the 3 nearest neighbors" is not
required by the reference; we are exact anyway.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "block"))
def knn_mean_sq_dist(points: jax.Array, k: int = 3,
                     block: int = 2048) -> jax.Array:
    """Mean squared distance from each point to its k nearest neighbors.

    Args:
      points: [N, 3] float array.
      k: neighbor count (3 matches distCUDA2).
      block: query-row block size for the pairwise sweep.

    Returns [N] float array.
    """
    n = points.shape[0]
    dtype = points.dtype
    nb = -(-n // block)
    padded = jnp.pad(points, ((0, nb * block - n), (0, 0)))
    sq = jnp.sum(padded * padded, -1)                       # [Np]

    def one_block(i):
        q = jax.lax.dynamic_slice_in_dim(padded, i * block, block)  # [B, 3]
        qsq = jax.lax.dynamic_slice_in_dim(sq, i * block, block)
        # squared distances via the expansion |q - p|^2 = |q|^2 - 2qp + |p|^2
        d2 = (qsq[:, None] - 2.0 * (q @ padded.T) + sq[None, :])    # [B, Np]
        # mask self-distance and padding columns
        rows = i * block + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        bad = (rows == cols) | (cols >= n)
        d2 = jnp.where(bad, jnp.inf, jnp.maximum(d2, 0.0))
        neg_top, _ = jax.lax.top_k(-d2, k)                  # [B, k]
        return jnp.mean(-neg_top, -1)

    out = jax.lax.map(one_block, jnp.arange(nb))            # [nb, B]
    return out.reshape(-1)[:n].astype(dtype)
