"""Dataset-zoo loaders against synthetic on-disk fixtures that mimic each
reference layout (dynamic_predictor/dust3r/datasets/{tartanair,
spring_dataset,waymo,scannetpp,staticthings3d}.py)."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from das3r_tpu.predictor import dataset_zoo
from das3r_tpu.predictor.datasets import batch_iterator

RES = (64, 48)          # (W, H)
SRC_W, SRC_H = 80, 60


def _write_png(path, rng):
    img = (rng.uniform(0, 255, (SRC_H, SRC_W, 3))).astype(np.uint8)
    cv2.imwrite(path, img)


def _check_clip(clip, z_near=0.0):
    W, H = RES
    for img in (clip.img1, clip.img2):
        assert img.shape == (3, H, W)
        assert img.min() >= -1.0 - 1e-6 and img.max() <= 1.0 + 1e-6
    assert clip.valid_1.shape == (H, W) and clip.valid_1.dtype == bool
    assert clip.valid_1.any(), "fixture depths should be valid"
    assert np.isfinite(clip.gt_pts3d_1[clip.valid_1]).all()
    assert clip.gt_mask_1.shape == (H, W)
    assert (clip.gt_mask_1 == 0).all()      # static dataset
    assert clip.camera_pose_1.shape == (4, 4)
    # depths in the fixtures are ~3m: camera-frame z of the recovered
    # points must sit in that band after un-posing
    w2c = np.linalg.inv(clip.camera_pose_1)
    cam = clip.gt_pts3d_1 @ w2c[:3, :3].T + w2c[:3, 3]
    z = cam[..., 2][clip.valid_1]
    assert z.min() > 1.0 and z.max() < 10.0, (z.min(), z.max())


def test_tartanair_layout(tmp_path):
    rng = np.random.default_rng(0)
    seq = tmp_path / "office" / "Hard" / "P000"
    (seq / "image_left").mkdir(parents=True)
    (seq / "depth_left").mkdir()
    n = 6
    poses = []
    for i in range(n):
        _write_png(str(seq / "image_left" / f"{i:06d}_left.png"), rng)
        np.save(seq / "depth_left" / f"{i:06d}_left_depth.npy",
                np.full((SRC_H, SRC_W), 3.0, np.float32))
        # x y z qx qy qz qw (identity rotation, translated along z)
        poses.append([0.1 * i, 0, 0, 0, 0, 0, 1])
    np.savetxt(seq / "pose_left.txt", np.asarray(poses, float))

    ds = dataset_zoo.TartanAirDataset(str(tmp_path), split="Hard",
                                      strides=(1, 2), clip_step=1,
                                      resolution=RES,
                                      dist_type="linear_1_2", seed=0)
    assert len(ds) > 0
    clip = ds[0]
    _check_clip(clip)
    # NED permutation (tartanair.py:20-32): pose row x=0.1i lands on
    # c2w translation, identity quaternion stays identity rotation
    np.testing.assert_allclose(clip.camera_pose_1[:3, :3], np.eye(3),
                               atol=1e-6)


def test_tartanair_ned_quaternion_is_rotation():
    rng = np.random.default_rng(3)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    row = np.concatenate([rng.normal(size=3), q])
    R = dataset_zoo.TartanAirDataset._ned_to_c2w(row)[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R) > 0.99


def test_spring_layout(tmp_path):
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(1)
    seq = tmp_path / "train" / "0001"
    (seq / "frame_left").mkdir(parents=True)
    (seq / "disp1_left").mkdir()
    (seq / "cam_data").mkdir()
    n, fx = 5, 70.0
    extr, intr = [], []
    for i in range(1, n + 1):
        _write_png(str(seq / "frame_left" / f"frame_left_{i:04d}.png"), rng)
        # disparity at DOUBLE resolution (reference subsamples [::2, ::2]);
        # disp = fx * baseline / depth for depth 3m
        disp = np.full((2 * SRC_H, 2 * SRC_W),
                       fx * dataset_zoo.SpringDataset.BASELINE / 3.0,
                       np.float32)
        with h5py.File(seq / "disp1_left" / f"disp1_left_{i:04d}.dsp5",
                       "w") as f:
            f.create_dataset("disparity", data=disp)
        w2c = np.eye(4)
        w2c[2, 3] = 0.05 * i
        extr.append(w2c.reshape(-1))
        intr.append([fx, fx, SRC_W / 2, SRC_H / 2])
    np.savetxt(seq / "cam_data" / "extrinsics.txt", np.asarray(extr))
    np.savetxt(seq / "cam_data" / "intrinsics.txt", np.asarray(intr))

    ds = dataset_zoo.SpringDataset(str(tmp_path), split="train",
                                   strides=(1,), clip_step=1,
                                   resolution=RES)
    assert len(ds) > 0
    clip = ds[0]
    _check_clip(clip)
    # extrinsics are world-to-cam: c2w translation must be NEGATIVE z
    assert clip.camera_pose_1[2, 3] < 0


def test_spring_remove_seqs(tmp_path):
    (tmp_path / "train" / "0008" / "frame_left").mkdir(parents=True)
    ds = dataset_zoo.SpringDataset(str(tmp_path), split="train",
                                   strides=(1,), remove_seqs=("0008",))
    assert len(ds) == 0


def test_waymo_layout(tmp_path):
    rng = np.random.default_rng(2)
    scene = tmp_path / "seg0"
    scene.mkdir()
    frames = ["f000", "f001", "f002"]
    K = np.array([[70.0, 0, SRC_W / 2], [0, 70.0, SRC_H / 2], [0, 0, 1]],
                 np.float32)
    for k, f in enumerate(frames):
        _write_png(str(scene / (f + ".jpg")), rng)
        cv2.imwrite(str(scene / (f + ".exr")),
                    np.full((SRC_H, SRC_W), 3.0, np.float32))
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 3] = 0.2 * k
        np.savez(scene / (f + ".npz"), intrinsics=K, cam2world=c2w)
    np.savez(tmp_path / "waymo_pairs_video.npz",
             scenes=np.array(["seg0"]), frames=np.array(frames),
             pairs=np.array([[0, 0, 1], [0, 1, 2]]))

    ds = dataset_zoo.WaymoDataset(str(tmp_path), resolution=RES)
    assert len(ds) == 2
    clip = ds[1]
    _check_clip(clip)
    assert abs(clip.camera_pose_1[0, 3] - 0.2) < 1e-6


def test_scannetpp_layout(tmp_path):
    rng = np.random.default_rng(4)
    scene = tmp_path / "sc0"
    (scene / "images").mkdir(parents=True)
    (scene / "depth").mkdir()
    names = ["DSC0", "DSC1"]
    K = np.array([[70.0, 0, SRC_W / 2], [0, 70.0, SRC_H / 2], [0, 0, 1]],
                 np.float32)
    for nm in names:
        _write_png(str(scene / "images" / (nm + ".jpg")), rng)
        cv2.imwrite(str(scene / "depth" / (nm + ".png")),
                    np.full((SRC_H, SRC_W), 3000, np.uint16))  # mm
    np.savez(tmp_path / "all_metadata.npz",
             scenes=np.array(["sc0"]), sceneids=np.array([0, 0]),
             images=np.array(names),
             intrinsics=np.stack([K, K]),
             trajectories=np.stack([np.eye(4, dtype=np.float32)] * 2),
             pairs=np.array([[0, 1]]))

    ds = dataset_zoo.ScanNetppDataset(str(tmp_path), resolution=RES)
    assert len(ds) == 1
    _check_clip(ds[0])


def test_staticthings3d_layout(tmp_path):
    rng = np.random.default_rng(5)
    seq = tmp_path / "TRAIN" / "A" / "0000"
    K = np.array([[70.0, 0, SRC_W / 2], [0, 70.0, SRC_H / 2], [0, 0, 1]],
                 np.float32)
    for cam in ("left", "right"):
        (seq / cam).mkdir(parents=True)
        for i in (6, 7):
            _write_png(str(seq / cam / f"{i:04d}_clean.jpg"), rng)
            dep = np.full((SRC_H, SRC_W), 3.0, np.float32)
            dep[0, 0] = 500.0           # background to be masked
            cv2.imwrite(str(seq / cam / f"{i:04d}.exr"), dep)
            np.savez(seq / cam / f"{i:04d}.npz", intrinsics=K,
                     cam2world=np.eye(4, dtype=np.float32))
    np.save(tmp_path / "staticthings_pairs.npy",
            np.array([(b"A", 0, b"l", 6, b"r", 7)],
                     dtype=[("scene", "S8"), ("seq", "i4"), ("cam1", "S1"),
                            ("im1", "i4"), ("cam2", "S1"), ("im2", "i4")]))
    # structured arrays unpack per-field on iteration; the reference uses a
    # plain object rows array — emulate with a list-like wrapper
    pairs = np.load(tmp_path / "staticthings_pairs.npy", allow_pickle=True)
    rows = np.array([tuple(pairs[0])], dtype=object)
    np.save(tmp_path / "staticthings_pairs.npy", rows, allow_pickle=True)

    ds = dataset_zoo.StaticThings3DDataset(str(tmp_path), resolution=RES)
    assert len(ds) == 1
    clip = ds[0]
    _check_clip(clip)
    # depth > 200 masked out => at least one invalid pixel in the source
    # region survives only if the crop kept it; assert no point beyond 200m
    assert (np.linalg.norm(clip.gt_pts3d_1[clip.valid_1], axis=-1)
            < 200.0).all()


def test_zoo_batches_feed_stage1(tmp_path):
    """Zoo clips flow through the shared batch iterator (static masks)."""
    rng = np.random.default_rng(0)
    seq = tmp_path / "env" / "Hard" / "P000"
    (seq / "image_left").mkdir(parents=True)
    (seq / "depth_left").mkdir()
    poses = []
    for i in range(4):
        _write_png(str(seq / "image_left" / f"{i:06d}_left.png"), rng)
        np.save(seq / "depth_left" / f"{i:06d}_left_depth.npy",
                np.full((SRC_H, SRC_W), 3.0, np.float32))
        poses.append([0, 0, 0.1 * i, 0, 0, 0, 1])
    np.savetxt(seq / "pose_left.txt", np.asarray(poses, float))
    ds = dataset_zoo.TartanAirDataset(str(tmp_path), strides=(1,),
                                      clip_step=1, resolution=RES)
    (im1, im2, batch), = list(batch_iterator(ds, batch_size=2, seed=0))
    assert im1.shape == (2, 3, RES[1], RES[0])
    assert batch.gt_mask_1.shape == (2, RES[1], RES[0])
    assert (batch.gt_mask_1 == 0).all()
