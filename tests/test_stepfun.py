"""Tests for the mip-NeRF step-function sampler (utils/stepfun.py) and the
cameras.json dump (data/readers.py) — SURVEY inventory items 22/25."""
import json
import os

import numpy as np

from das3r_tpu.utils import stepfun


def test_integrate_weights_endpoints():
    w = np.asarray([0.25, 0.25, 0.25, 0.25])
    cw = stepfun.integrate_weights_np(w)
    assert cw.shape == (5,)
    assert cw[0] == 0.0 and cw[-1] == 1.0
    np.testing.assert_allclose(cw, [0, 0.25, 0.5, 0.75, 1.0])


def test_invert_cdf_uniform_is_linear():
    t = np.linspace(0.0, 4.0, 5)
    logits = np.zeros(4)
    u = np.linspace(0.0, 1.0, 9)
    x = stepfun.invert_cdf_np(u, t, logits)
    np.testing.assert_allclose(x, 4.0 * u, atol=1e-6)


def test_sample_np_deterministic_center_uniform():
    t = np.linspace(0.0, 1.0, 11)
    x = stepfun.sample_np(None, t, np.zeros(10), 5,
                          deterministic_center=True)
    np.testing.assert_allclose(x, [0.1, 0.3, 0.5, 0.7, 0.9], atol=1e-5)


def test_sample_np_stratified_in_support():
    rng = np.random.default_rng(0)
    t = np.linspace(-2.0, 3.0, 8)
    logits = rng.normal(size=7)
    x = stepfun.sample_np(rng, t, logits, 32)
    assert x.min() >= -2.0 and x.max() <= 3.0
    assert np.all(np.diff(x) >= -1e-9)  # stratified => sorted


def test_sample_np_matches_histogram():
    # Samples of a peaked step function concentrate in the heavy interval.
    t = np.asarray([0.0, 1.0, 2.0, 3.0])
    logits = np.log(np.asarray([1e-6, 1.0, 1e-6]))
    x = stepfun.sample_np(None, t, logits, 64, deterministic_center=True)
    assert (np.abs(x - 1.5) < 0.51).mean() > 0.95


def test_resample_const_speed_matches_arclength():
    from das3r_tpu.utils.camera_paths import resample_const_speed
    rng = np.random.default_rng(3)
    pts = np.cumsum(rng.normal(size=(40, 3)), axis=0)
    a = resample_const_speed(pts, 17)
    b = stepfun.resample_const_speed_stepfun(pts, 17)
    # Same polyline, same speed parametrization; stepfun samples interval
    # CENTERS so endpoints are inset by half a step — compare arc spacing.
    da = np.linalg.norm(np.diff(a, axis=0), axis=-1)
    db = np.linalg.norm(np.diff(b, axis=0), axis=-1)
    assert np.std(db) / np.mean(db) < 0.35
    assert abs(np.mean(da) - np.mean(db)) / np.mean(da) < 0.15


def test_cameras_json_schema(tmp_path):
    from das3r_tpu.data import readers

    F, H, W = 3, 32, 48
    rng = np.random.default_rng(0)
    w2c = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    w2c[:, :3, 3] = rng.normal(size=(F, 3)).astype(np.float32)
    data = readers.SceneData(
        images=np.zeros((F, 3, H, W), np.float32),
        poses_c2w=np.linalg.inv(w2c), poses_w2c_colmap=w2c,
        intrinsics=np.tile(np.eye(3, dtype=np.float32), (F, 1, 1)),
        fovx=np.full(F, 1.2, np.float32), fovy=np.full(F, 0.9, np.float32),
        conf=None, depth=None, dyna_avg=None, dyna_max=None,
        dynamic_mask=None, enlarged_dynamic_mask=None, gt_dynamic_mask=None,
        names=[f"frame_{i:04d}.png" for i in range(F)],
        train_idx=np.arange(F), test_idx=np.empty(0, np.int64))
    p = os.path.join(tmp_path, "cameras.json")
    readers.save_cameras_json(p, data)
    with open(p) as f:
        entries = json.load(f)
    assert len(entries) == F
    e = entries[1]
    assert set(e) == {"id", "img_name", "width", "height", "position",
                      "rotation", "fy", "fx"}
    # position is the camera center = -R^T t of the w2c matrix
    c2w = np.linalg.inv(w2c[1])
    np.testing.assert_allclose(e["position"], c2w[:3, 3], atol=1e-5)
    np.testing.assert_allclose(e["rotation"], c2w[:3, :3], atol=1e-6)
    # fov2focal: fx = W / (2 tan(fovx/2))
    np.testing.assert_allclose(e["fx"], W / (2 * np.tan(0.6)), rtol=1e-6)
