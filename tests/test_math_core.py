import math

import jax.numpy as jnp
import numpy as np
import pytest

from das3r_tpu.utils import geometry, image, schedules, sh, transforms
from tests.ref_adapters import ref_loss_utils, ref_sh_utils


class TestProjection:
    def test_projection_matrix_values(self):
        znear, zfar = 0.01, 100.0
        fovx, fovy = 1.2, 0.9
        P = np.asarray(transforms.projection_matrix(znear, zfar, fovx, fovy))
        assert P[0, 0] == pytest.approx(1 / math.tan(fovx / 2), rel=1e-6)
        assert P[1, 1] == pytest.approx(1 / math.tan(fovy / 2), rel=1e-6)
        assert P[3, 2] == 1.0
        # z=znear maps to 0, z=zfar maps to 1 after perspective divide
        for z, expect in [(znear, 0.0), (zfar, 1.0)]:
            p = P @ np.array([0, 0, z, 1.0])
            assert p[2] / p[3] == pytest.approx(expect, abs=1e-6)

    def test_fov_focal_roundtrip(self):
        assert transforms.focal2fov(
            transforms.fov2focal(0.8, 640), 640) == pytest.approx(0.8)

    def test_world_to_view(self):
        rng = np.random.default_rng(0)
        from scipy.spatial.transform import Rotation
        R = Rotation.random(rng=0).as_matrix()
        t = rng.standard_normal(3)
        W = transforms.world_to_view(R, t)
        # W2V stores R^T (COLMAP convention)
        np.testing.assert_allclose(W[:3, :3], R.T, atol=1e-6)
        np.testing.assert_allclose(W[:3, 3], t, atol=1e-6)


class TestGeometry:
    def test_depth_unproject_project_roundtrip(self):
        rng = np.random.default_rng(1)
        h, w = 24, 32
        depth = jnp.asarray(rng.uniform(1, 5, (h, w)).astype(np.float32))
        K = geometry.intrinsics_matrix(50.0, jnp.asarray([w / 2, h / 2]))
        pts = geometry.depthmap_to_camera_coords(depth, K)
        uv = geometry.project_points(pts, K)
        grid = geometry.xy_grid(w, h)
        np.testing.assert_allclose(np.asarray(uv), np.asarray(grid), atol=1e-4)
        np.testing.assert_allclose(np.asarray(pts[..., 2]), np.asarray(depth))

    def test_depthmap_to_pts3d_world(self):
        h, w = 8, 8
        depth = jnp.ones((h, w))
        K = geometry.intrinsics_matrix(10.0, jnp.asarray([4.0, 4.0]))
        c2w = jnp.eye(4).at[:3, 3].set(jnp.asarray([1.0, 2.0, 3.0]))
        pts = geometry.depthmap_to_pts3d(depth, K, c2w)
        assert pts.shape == (h, w, 3)
        np.testing.assert_allclose(np.asarray(pts[4, 4]), [1.0, 2.0, 4.0],
                                   atol=1e-6)

    def test_normalize_avg_dis(self):
        rng = np.random.default_rng(2)
        pts = jnp.asarray(rng.standard_normal((4, 4, 3)).astype(np.float32))
        valid = jnp.ones((4, 4), bool)
        out, s = geometry.normalize_pointcloud_avg_dis(pts, valid)
        assert np.linalg.norm(np.asarray(out), axis=-1).mean() == pytest.approx(
            1.0, rel=1e-5)


class TestSH:
    def test_sh_dc_only(self):
        shc = jnp.zeros((5, 3, 16)).at[:, :, 0].set(1.0)
        dirs = jnp.asarray(np.random.default_rng(0).standard_normal((5, 3)))
        out = sh.eval_sh(3, shc, dirs / jnp.linalg.norm(dirs, axis=-1,
                                                        keepdims=True))
        np.testing.assert_allclose(np.asarray(out), sh.C0, atol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.asarray([[0.2, 0.5, 0.9]])
        np.testing.assert_allclose(
            np.asarray(sh.sh_to_rgb(sh.rgb_to_sh(rgb))), np.asarray(rgb),
            atol=1e-7)

    def test_sh_matches_reference(self):
        ref = ref_sh_utils()
        if ref is None:
            pytest.skip("reference sh_utils unavailable")
        import torch
        rng = np.random.default_rng(3)
        coeffs = rng.standard_normal((32, 3, 16)).astype(np.float32)
        dirs = rng.standard_normal((32, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        for deg in range(4):
            ours = np.asarray(
                sh.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(dirs)))
            theirs = ref.eval_sh(deg, torch.from_numpy(coeffs),
                                 torch.from_numpy(dirs)).numpy()
            np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestImage:
    def test_ssim_identical_images(self):
        img = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (3, 32, 32)), jnp.float32)
        assert float(image.ssim(img, img)) == pytest.approx(1.0, abs=1e-5)

    def test_ssim_matches_reference(self):
        ref = ref_loss_utils()
        if ref is None:
            pytest.skip("reference loss_utils unavailable")
        import torch
        rng = np.random.default_rng(4)
        a = rng.uniform(0, 1, (3, 40, 48)).astype(np.float32)
        b = rng.uniform(0, 1, (3, 40, 48)).astype(np.float32)
        ours_map = np.asarray(
            image.ssim(jnp.asarray(a), jnp.asarray(b), size_average=False))
        theirs_map = ref.ssim(torch.from_numpy(a)[None],
                              torch.from_numpy(b)[None],
                              size_average=False).numpy()[0]
        np.testing.assert_allclose(ours_map, theirs_map, atol=2e-5)
        ours_mean = float(image.ssim(jnp.asarray(a), jnp.asarray(b)))
        theirs_mean = float(ref.ssim(torch.from_numpy(a)[None],
                                     torch.from_numpy(b)[None]))
        assert ours_mean == pytest.approx(theirs_mean, abs=1e-5)

    def test_psnr(self):
        a = jnp.zeros((1, 3, 8, 8))
        b = jnp.full((1, 3, 8, 8), 0.1)
        assert float(image.psnr(b, a)[0, 0]) == pytest.approx(20.0, abs=1e-4)

    def test_inverse_sigmoid(self):
        x = jnp.asarray([0.1, 0.5, 0.9])
        np.testing.assert_allclose(
            np.asarray(1 / (1 + np.exp(-np.asarray(image.inverse_sigmoid(x))))),
            np.asarray(x), atol=1e-6)


class TestSchedules:
    def test_expon_lr_endpoints(self):
        f = lambda s: float(schedules.expon_lr(s, 1e-2, 1e-4, max_steps=1000))
        assert f(0) == pytest.approx(1e-2, rel=1e-5)
        assert f(1000) == pytest.approx(1e-4, rel=1e-5)
        assert f(500) == pytest.approx(1e-3, rel=1e-4)  # log midpoint
        assert f(-1) == 0.0

    def test_expon_lr_delay(self):
        v = float(schedules.expon_lr(0, 1e-2, 1e-4, lr_delay_steps=100,
                                     lr_delay_mult=0.1, max_steps=1000))
        assert v == pytest.approx(1e-3, rel=1e-4)

    def test_alignment_schedules(self):
        assert float(schedules.cosine_lr(0.0, 0.01)) == pytest.approx(0.01)
        assert float(schedules.cosine_lr(1.0, 0.01, 1e-4)) == pytest.approx(1e-4)
        assert float(schedules.linear_lr(0.5, 0.01)) == pytest.approx(0.005)
        assert float(schedules.cycled_lr(0.25, 0.01, 0.0, 2)) == pytest.approx(
            float(schedules.cosine_lr(0.5, 0.01, 0.0)))
