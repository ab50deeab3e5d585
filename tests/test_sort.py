"""Pallas bitonic pair-sort correctness (interpret mode on CPU; the same
kernels compile on TPU — see docs/PERF.md for status)."""
import jax.numpy as jnp
import numpy as np
import pytest

from das3r_tpu.ops.sort import sort_pairs


@pytest.mark.parametrize("n,block", [
    (1024, 1024),      # single block
    (4096, 1024),      # multi-block merge
    (5000, 1024),      # non-power-of-two with sentinel padding
    (8192, 2048),
    (300, 512),        # n < block
])
def test_sort_pairs_matches_lax(n, block):
    rng = np.random.default_rng(n)
    keys = rng.integers(0, 2**31, n).astype(np.uint32)
    vals = np.arange(n, dtype=np.int32)
    sk, sv = sort_pairs(jnp.asarray(keys), jnp.asarray(vals), block=block)
    sk, sv = np.asarray(sk), np.asarray(sv)
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(sk, keys[order])
    # value permutation is consistent (keys need not be unique in general
    # use; here they are distinct with high probability)
    np.testing.assert_array_equal(keys[sv], sk)


def test_sort_with_duplicate_keys():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 8, 2048).astype(np.uint32)  # heavy duplicates
    vals = np.arange(2048, dtype=np.int32)
    sk, sv = sort_pairs(jnp.asarray(keys), jnp.asarray(vals), block=512)
    sk, sv = np.asarray(sk), np.asarray(sv)
    assert (np.diff(sk.astype(np.int64)) >= 0).all()
    # every original (key, value) pair appears exactly once
    np.testing.assert_array_equal(np.sort(sv), np.arange(2048))
    np.testing.assert_array_equal(keys[sv], sk)
