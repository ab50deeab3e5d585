import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from das3r_tpu.ops.knn import knn_mean_sq_dist


def test_knn_matches_kdtree():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((500, 3)).astype(np.float32)
    ours = np.asarray(knn_mean_sq_dist(jnp.asarray(pts), k=3, block=128))
    d, _ = cKDTree(pts).query(pts, k=4)  # includes self at distance 0
    expect = (d[:, 1:] ** 2).mean(1)
    np.testing.assert_allclose(ours, expect, rtol=1e-4, atol=1e-5)


def test_knn_blocking_invariance():
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((300, 3)).astype(np.float32)
    a = np.asarray(knn_mean_sq_dist(jnp.asarray(pts), block=64))
    b = np.asarray(knn_mean_sq_dist(jnp.asarray(pts), block=512))
    np.testing.assert_allclose(a, b, rtol=1e-5)
