#!/usr/bin/env python
"""Micro-benchmark: alternatives for the per-Gaussian gradient reduction
(the [T, K] -> [N, 9] scatter-add that costs ~12.7 ms of the 33 ms step).

Candidates (timing-only; index contents are synthetic but statistically
shaped like the real binning output):

  scatter_f32      current: one scatter-add of [T*K, 9] f32 rows into [N, 9]
  scatter_sorted   same + indices_are_sorted hint (ranks ARE sorted per tile)
  scatter_bf16     same in bfloat16 (accuracy cost, latency probe)
  scatter_i32      ONE single-column int32 scatter-set (the price of building
                   an inverse map in the forward)
  gather_blocksum  row-gather [E8, 9] from [T*K+1, 9] + 8-blocksum +
                   [N, 4]-row gather + masked sum (the scatter-free backward,
                   needs scatter_i32 in the forward to build indices)
  gather_nd        [N, D]-row gather from [T*K+1, 9] + sum over D
                   (scatter-free both ways, D=8 dup cap probe)

Run serially on the real chip: python scripts/exp_scatter_reduce.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


T, K, N, E = 768, 1024, 100_000, 786_000
E8 = ((E + 7) // 8) * 8 + 8 * N  # 8-aligned segment padding upper bound
D = 8


def timeit(fn, *args, iters=20):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = jax.jit(fn)(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, out


def chain_timeit(fn, x0, iters=20):
    """Chained scan so the relay can't memoize; returns ms/iter."""
    @jax.jit
    def chained(x):
        def body(c, _):
            return fn(c), ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c

    jax.block_until_ready(chained(x0))
    best = float("inf")
    for k in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(x0 + 1e-6 * (k + 1)))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    ranks = jnp.asarray(
        np.sort(rng.integers(0, N, size=(T, K)), axis=1).astype(np.int32))
    g0 = jnp.asarray(rng.standard_normal((T, K, 9)).astype(np.float32))

    flat_ranks = ranks.reshape(-1)

    def scatter_f32(g):
        return jnp.zeros((N, 9), jnp.float32).at[flat_ranks].add(
            g.reshape(-1, 9))

    def scatter_sorted(g):
        return jax.lax.scatter_add(
            jnp.zeros((N, 9), jnp.float32), flat_ranks[:, None],
            g.reshape(-1, 9),
            jax.lax.ScatterDimensionNumbers(
                update_window_dims=(1,), inserted_window_dims=(0,),
                scatter_dims_to_operand_dims=(0,)),
            indices_are_sorted=False, unique_indices=False)

    def scatter_bf16(g):
        return jnp.zeros((N, 9), jnp.bfloat16).at[flat_ranks].add(
            g.reshape(-1, 9).astype(jnp.bfloat16))

    dst = jnp.asarray(rng.permutation(T * K).astype(np.int32))

    def scatter_i32(g):
        src = (jnp.arange(T * K, dtype=jnp.int32)
               + g.reshape(-1, 9)[:, 0].astype(jnp.int32) * 0)
        return jnp.full((T * K,), -1, jnp.int32).at[dst].set(src)

    # gather_blocksum: E8-row gather + blocksum + [N, 4] block-row gather
    src_rm = jnp.asarray(rng.integers(0, T * K, size=E8).astype(np.int32))
    blk = jnp.asarray(
        np.minimum(rng.integers(0, E8 // 8, size=(N, 4)),
                   E8 // 8 - 1).astype(np.int32))
    nblk = jnp.asarray(rng.integers(1, 5, size=(N, 1)).astype(np.int32))

    def gather_blocksum(g):
        gflat = jnp.concatenate(
            [g.reshape(-1, 9), jnp.zeros((1, 9), jnp.float32)])
        eg = gflat[src_rm]                              # [E8, 9]
        bs = eg.reshape(E8 // 8, 8, 9).sum(axis=1)       # [E8/8, 9]
        parts = bs[blk]                                  # [N, 4, 9]
        mask = (jnp.arange(4)[None, :, None] < nblk[:, :, None])
        return jnp.sum(parts * mask, axis=1)

    nd_idx = jnp.asarray(rng.integers(0, T * K, size=(N, D)).astype(np.int32))

    def gather_nd(g):
        gflat = jnp.concatenate(
            [g.reshape(-1, 9), jnp.zeros((1, 9), jnp.float32)])
        return gflat[nd_idx].sum(axis=1)

    for name, fn in [("scatter_f32", scatter_f32),
                     ("scatter_sorted", scatter_sorted),
                     ("scatter_bf16", scatter_bf16),
                     ("scatter_i32", scatter_i32),
                     ("gather_blocksum", gather_blocksum),
                     ("gather_nd", gather_nd)]:
        def step(g, fn=fn):
            r = fn(g)
            return g + 1e-12 * r.sum().astype(jnp.float32)
        ms = chain_timeit(step, g0)
        print(f"{name:18s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
