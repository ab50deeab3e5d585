"""Experiment: does Mosaic support dynamic gathers inside a Pallas TPU
kernel on this toolchain?  Tests three forms a fused binning/blend kernel
would want:

  A. row gather from a VMEM-resident table:  out[k, :] = table[idx[k], :]
  B. jnp.take along axis 0
  C. take_along_axis on the lane axis with a [1, K] index row

Each is timed standalone (chained) if it compiles; failures print the
Mosaic error and move on.  Run on the real chip.
"""
from __future__ import annotations

import functools
import sys
import time
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

N, C = 4096, 16          # table rows, cols (multiples of 8/128 tested too)
K = 1024                  # gathers per call


def run(name, kernel, table, idx):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((K, C), jnp.float32),
        )(table, idx)
        out.block_until_ready()
        # correctness
        import numpy as np
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(table)[np.asarray(idx)],
                                   atol=0)
        print(f"{name}: OK")
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (N, C), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (K,), 0, N, jnp.int32)

    def kern_a(table_ref, idx_ref, o_ref):
        o_ref[...] = table_ref[idx_ref[...], :]

    def kern_b(table_ref, idx_ref, o_ref):
        o_ref[...] = jnp.take(table_ref[...], idx_ref[...], axis=0)

    def kern_c(table_ref, idx_ref, o_ref):
        t = table_ref[...]                       # [N, C]
        ix = idx_ref[...]                        # [K]
        o_ref[...] = jnp.take_along_axis(
            t.T, jnp.broadcast_to(ix[None, :], (C, K)), axis=1).T

    run("A row-index", kern_a, table, idx)
    run("B jnp.take axis0", kern_b, table, idx)
    run("C take_along_axis lanes", kern_c, table, idx)


if __name__ == "__main__":
    main()
