#!/usr/bin/env python
"""Follow-up: is scatter-SET of f32 9-col rows as fast as int32 single-col
set (3.3 ns/row), and what does the dense [N, D, 9] reduce cost?

Pipeline under test (the scatter-add-free backward reduction):
    buf = zeros[N*D + T*K, 9].at[dst].set(g_rows)   # injective dst
    out = buf[:N*D].reshape(N, D, 9).sum(axis=1)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

T, K, N, D = 768, 1024, 100_000, 32


def chain_timeit(fn, x0, iters=20):
    @jax.jit
    def chained(x):
        c, _ = jax.lax.scan(lambda c, _: (fn(c), ()), x0, None, length=iters)
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
    g0 = jnp.asarray(rng.standard_normal((T, K, 9)).astype(np.float32))
    # injective dst: ~786k live slots land in random distinct [N*D) rows,
    # the rest in per-slot trash rows
    live = rng.random((T * K,)) < 0.55
    perm = rng.permutation(N * D)[:T * K].astype(np.int32)
    dst_np = np.where(live, perm, N * D + np.arange(T * K, dtype=np.int32))
    dst = jnp.asarray(dst_np)

    def set_rows(g):
        buf = jnp.zeros((N * D + T * K, 9), jnp.float32).at[dst].set(
            g.reshape(-1, 9), unique_indices=True)
        return buf

    def set_rows_reduce(g):
        buf = set_rows(g)
        return buf[:N * D].reshape(N, D, 9).sum(axis=1)

    def reduce_only(g):
        # isolate the dense reduce: reuse g as a fake [N', D, 9]
        big = jnp.broadcast_to(g.reshape(-1, 9)[:N // 8 * D],
                               (8, N // 8 * D, 9)).reshape(N, D, 9)
        return big.sum(axis=1)

    def set_rows_nouniq(g):
        return jnp.zeros((N * D + T * K, 9), jnp.float32).at[dst].set(
            g.reshape(-1, 9))

    for name, fn in [("set_rows", set_rows),
                     ("set_rows_nouniq", set_rows_nouniq),
                     ("set_rows_reduce", set_rows_reduce),
                     ("reduce_only", reduce_only)]:
        def step(g, fn=fn):
            r = fn(g)
            return g + 1e-12 * r.sum()
        print(f"{name:18s} {chain_timeit(step, g0):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
