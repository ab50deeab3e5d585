import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from das3r_tpu.eval import masks, trajectory


def random_traj(n, rng, step=0.3):
    poses = np.tile(np.eye(4), (n, 1, 1))
    p = np.zeros(3)
    for i in range(n):
        p = p + rng.normal(0, step, 3)
        poses[i, :3, :3] = Rotation.random(rng=rng).as_matrix()
        poses[i, :3, 3] = p
    return poses


def apply_sim3(poses, s, R, t):
    out = poses.copy()
    out[:, :3, 3] = (s * (R @ poses[:, :3, 3].T)).T + t
    out[:, :3, :3] = np.einsum("ij,fjk->fik", R, poses[:, :3, :3])
    return out


class TestUmeyama:
    def test_recovers_known_sim3(self):
        rng = np.random.default_rng(0)
        src = rng.standard_normal((30, 3))
        R = Rotation.random(rng=rng).as_matrix()
        s, t = 2.7, rng.standard_normal(3)
        dst = (s * (R @ src.T)).T + t
        s2, R2, t2 = trajectory.umeyama_sim3(src, dst)
        assert s2 == pytest.approx(s, rel=1e-9)
        np.testing.assert_allclose(R2, R, atol=1e-9)
        np.testing.assert_allclose(t2, t, atol=1e-9)


class TestTrajectoryMetrics:
    def test_zero_error_after_sim3(self):
        rng = np.random.default_rng(1)
        ref = random_traj(20, rng)
        R = Rotation.random(rng=rng).as_matrix()
        est = apply_sim3(ref, 0.5, R, np.asarray([1.0, -2.0, 3.0]))
        m = trajectory.eval_metrics(est, ref)
        assert m.ate == pytest.approx(0.0, abs=1e-9)
        assert m.rpe_trans == pytest.approx(0.0, abs=1e-9)
        assert m.rpe_rot == pytest.approx(0.0, abs=1e-4)  # arccos noise

    def test_known_translation_noise(self):
        rng = np.random.default_rng(2)
        ref = random_traj(200, rng)
        est = ref.copy()
        noise = rng.normal(0, 0.01, (200, 3))
        est[:, :3, 3] += noise
        m = trajectory.eval_metrics(est, ref)
        # ATE ~= rms of (aligned) noise
        assert 0.005 < m.ate < 0.02
        assert m.rpe_rot == pytest.approx(0.0, abs=1e-4)

    def test_known_rotation_error(self):
        rng = np.random.default_rng(3)
        ref = random_traj(50, rng)
        est = ref.copy()
        # rotate every second frame by 1 degree about z
        dR = Rotation.from_euler("z", 1.0, degrees=True).as_matrix()
        for i in range(1, 50, 2):
            est[i, :3, :3] = est[i, :3, :3] @ dR
        m = trajectory.eval_metrics(est, ref)
        assert m.rpe_rot == pytest.approx(1.0, rel=0.05)

    def test_matches_evo_if_available(self):
        try:
            from evo.core import metrics as evo_metrics  # noqa
        except ImportError:
            pytest.skip("evo not installed (expected in this image)")


class TestMaskMetrics:
    def test_iou(self):
        a = np.zeros((10, 10), bool)
        b = np.zeros((10, 10), bool)
        a[2:6, 2:6] = True
        b[4:8, 4:8] = True
        inter, union = 4, 28
        assert masks.mask_iou(a, b) == pytest.approx(inter / union)
        assert masks.mask_iou(a, a) == 1.0
        assert masks.mask_iou(np.zeros((5, 5)), np.zeros((5, 5))) == 1.0

    def test_boundary_f(self):
        a = np.zeros((32, 32), bool)
        a[8:24, 8:24] = True
        assert masks.boundary_f_measure(a, a) == pytest.approx(1.0)
        b = np.roll(a, 1, axis=0)  # 1px shift, within tolerance for 32px img
        assert masks.boundary_f_measure(b, a) > 0.9
        c = np.zeros_like(a)
        c[0:2, 0:2] = True
        assert masks.boundary_f_measure(c, a) == pytest.approx(0.0)
        assert masks.boundary_f_measure(np.zeros_like(a), a) == 0.0
        assert masks.boundary_f_measure(
            np.zeros_like(a), np.zeros_like(a)) == 1.0

    def test_sequence_iou(self):
        seq_p = np.zeros((3, 8, 8), bool)
        seq_g = np.zeros((3, 8, 8), bool)
        seq_p[:, :4] = True
        seq_g[:, :4] = True
        assert masks.sequence_mask_iou(seq_p, seq_g) == 1.0
