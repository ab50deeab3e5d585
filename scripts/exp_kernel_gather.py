"""Experiment: does Mosaic support dynamic gathers inside a Pallas TPU
kernel on this toolchain?  Result recorded in docs/PERF.md.

  A. row int-indexing table[idx, :]          -> "Cannot do int indexing"
  B. jnp.take(table, idx, axis=0)            -> gather shape mismatch
  C. take_along_axis on the LANE axis of a [C, N] table with [C, K] idx
  D. same as C but one sublane row [1, N] / [1, K]

Run on the real chip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

N, C = 4096, 8            # table cols (lanes) = N, sublanes = C
K = 1024                  # gathers per call


def run(name, kernel, out_shape, args, check):
    try:
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(*args)
        out.block_until_ready()
        np.testing.assert_allclose(np.asarray(out), check, atol=0)
        print(f"{name}: OK")
        return True
    except Exception as e:
        lines = str(e).splitlines() or [repr(e)]
        print(f"{name}: FAIL {type(e).__name__}: {lines[0][:160]}")
        return False


def main():
    tCN = jax.random.normal(jax.random.PRNGKey(0), (C, N), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (K,), 0, N, jnp.int32)
    idxCK = jnp.broadcast_to(idx[None, :], (C, K))
    want = np.asarray(tCN)[:, np.asarray(idx)]

    def kern_c(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=1)

    run("C take_along_axis lanes [C,N]", kern_c, (C, K),
        (tCN, idxCK), want)

    t1 = tCN[:1]
    idx1 = idxCK[:1]
    run("D take_along_axis lanes [1,N]", kern_c, (1, K),
        (t1, idx1), want[:1])


if __name__ == "__main__":
    main()
