import os

import numpy as np
import pytest

from das3r_tpu.data import colmap, ply, readers, rearrange, trajectory
from das3r_tpu.data.synthetic import make_synthetic_stage1_dir


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    """stage-1 dir -> rearranged COLMAP-style dir."""
    root = tmp_path_factory.mktemp("stage1")
    src = str(root / "seq")
    make_synthetic_stage1_dir(src, n_frames=8, height=48, width=64)
    rearrange.rearrange_scene(src, src + "_rearranged")
    return src + "_rearranged"


class TestColmapIO:
    def test_quat_roundtrip(self):
        rng = np.random.default_rng(0)
        from scipy.spatial.transform import Rotation
        for _ in range(10):
            R = Rotation.random(rng=rng).as_matrix()
            q = colmap.rotmat2qvec(R)
            np.testing.assert_allclose(colmap.qvec2rotmat(q), R, atol=1e-8)

    def test_cameras_images_roundtrip(self, tmp_path):
        K = np.zeros((3, 3, 3))
        K[:, 0, 0] = [100, 110, 120]
        K[:, 1, 1] = [100, 110, 120]
        K[:, 0, 2] = 32
        K[:, 1, 2] = 24
        colmap.write_cameras_text(str(tmp_path / "cameras.txt"), (64, 48), K)
        cams = colmap.read_cameras_text(str(tmp_path / "cameras.txt"))
        assert len(cams) == 3
        assert cams[2].focal_xy == (110.0, 110.0)

        rng = np.random.default_rng(1)
        from scipy.spatial.transform import Rotation
        poses = np.tile(np.eye(4), (3, 1, 1))
        for i in range(3):
            poses[i, :3, :3] = Rotation.random(rng=rng).as_matrix()
            poses[i, :3, 3] = rng.standard_normal(3)
        names = [f"frame_{i:04d}.png" for i in range(3)]
        colmap.write_images_text(str(tmp_path / "images.txt"), poses, names)
        imgs = colmap.read_images_text(str(tmp_path / "images.txt"))
        assert len(imgs) == 3
        for i in range(3):
            im = imgs[i + 1]
            w2c = np.linalg.inv(poses[i])
            np.testing.assert_allclose(colmap.qvec2rotmat(im.qvec),
                                       w2c[:3, :3], atol=1e-6)
            np.testing.assert_allclose(im.tvec, w2c[:3, 3], atol=1e-6)


class TestTrajectory:
    def test_tum_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        from scipy.spatial.transform import Rotation
        poses = np.tile(np.eye(4), (5, 1, 1))
        for i in range(5):
            poses[i, :3, :3] = Rotation.random(rng=rng).as_matrix()
            poses[i, :3, 3] = rng.standard_normal(3)
        pos, quat = trajectory.c2w_to_tum(poses)
        trajectory.write_tum(str(tmp_path / "traj.txt"), pos, quat)
        ts, pos2, quat2 = trajectory.read_tum(str(tmp_path / "traj.txt"))
        back = trajectory.tum_to_c2w(pos2, quat2)
        np.testing.assert_allclose(back, poses, atol=1e-6)


class TestPly:
    def test_point_cloud_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        xyz = rng.standard_normal((20, 3)).astype(np.float32)
        rgb = rng.integers(0, 255, (20, 3)).astype(np.uint8)
        p = str(tmp_path / "pc.ply")
        ply.write_point_cloud(p, xyz, rgb)
        xyz2, rgb2, _ = ply.read_point_cloud(p)
        np.testing.assert_allclose(xyz2, xyz, atol=1e-6)
        np.testing.assert_allclose(rgb2 * 255, rgb, atol=0.5)

    def test_gaussian_schema_roundtrip(self, tmp_path):
        rng = np.random.default_rng(4)
        n = 17
        kw = dict(
            xyz=rng.standard_normal((n, 3)).astype(np.float32),
            f_dc=rng.standard_normal((n, 1, 3)).astype(np.float32),
            f_rest=rng.standard_normal((n, 15, 3)).astype(np.float32),
            opacity_logit=rng.standard_normal((n, 1)).astype(np.float32),
            conf_per_gaussian=rng.uniform(0.1, 1.0, n).astype(np.float32),
            scaling=rng.standard_normal((n, 3)).astype(np.float32),
            rotation=rng.standard_normal((n, 4)).astype(np.float32))
        p = str(tmp_path / "gs.ply")
        ply.write_gaussians(p, **kw)
        back = ply.read_gaussians(p, max_sh_degree=3)
        np.testing.assert_allclose(back["xyz"], kw["xyz"], atol=1e-6)
        np.testing.assert_allclose(back["f_dc"], kw["f_dc"], atol=1e-6)
        np.testing.assert_allclose(back["f_rest"], kw["f_rest"], atol=1e-6)
        # load_ply restores the RAW logit (opacity_ori), ref :377-380
        np.testing.assert_allclose(back["opacity_logit"],
                                   kw["opacity_logit"], atol=1e-6)
        np.testing.assert_allclose(back["conf_static"],
                                   kw["conf_per_gaussian"], atol=1e-6)
        # the modulated channel decodes to sigmoid(logit)*conf
        sig = 1 / (1 + np.exp(-kw["opacity_logit"].reshape(-1)))
        expect = sig * kw["conf_per_gaussian"]
        got = 1 / (1 + np.exp(-back["opacity_modulated_logit"].reshape(-1)))
        np.testing.assert_allclose(got, expect, atol=1e-5)


class TestSceneLoader:
    def test_load_scene_shapes(self, scene_dir):
        sd = readers.load_scene(scene_dir, eval_mode=False)
        assert sd.images.shape == (8, 3, 48, 64)
        assert sd.conf.shape == (8, 48, 64)
        assert sd.depth.shape == (8, 48, 64)
        assert sd.dyna_avg.shape == (8, 48, 64)
        assert sd.dynamic_mask.shape == (8, 48, 64)
        assert sd.poses_c2w.shape == (8, 4, 4)
        assert len(sd.train_idx) == 8 and len(sd.test_idx) == 0
        # colmap w2c must invert the pred_traj c2w
        prod = np.einsum("fij,fjk->fik", sd.poses_w2c_colmap, sd.poses_c2w)
        np.testing.assert_allclose(
            prod, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-4)

    def test_eval_split_protocol(self, scene_dir):
        sd = readers.load_scene(scene_dir, eval_mode=True)
        np.testing.assert_array_equal(sd.test_idx, [5])
        assert len(sd.train_idx) == 7
        tr, te = readers.train_test_split(40, True)
        np.testing.assert_array_equal(te, [5, 15, 25, 35])

    def test_init_from_frames_pipeline(self, scene_dir):
        """Bridge -> loader -> Gaussian init: live points obey the
        confidence threshold and unproject to the stored depths."""
        from das3r_tpu.models.gaussians import init_from_frames
        sd = readers.load_scene(scene_dir)
        params, meta, scene = init_from_frames(
            images=sd.images, depths=sd.depth, confs=sd.conf,
            dyna_avg=sd.dyna_avg, poses_c2w=sd.poses_c2w,
            focals=sd.intrinsics[:, 0, 0], conf_thre=2.0)
        n_live = int(np.asarray(meta.alive).sum())
        expect = int((sd.conf.reshape(-1) > np.log(2.0)).sum())
        assert n_live == expect
        assert scene.n_frames == 8
        # conf_static init = 1 - dyna_avg
        np.testing.assert_allclose(np.asarray(params.conf_static),
                                   1.0 - sd.dyna_avg, atol=1e-6)
