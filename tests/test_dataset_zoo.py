"""Dataset-zoo loaders against synthetic on-disk fixtures that mimic each
reference layout (dynamic_predictor/dust3r/datasets/{tartanair,
spring_dataset,waymo,scannetpp,staticthings3d}.py)."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from das3r_tpu.predictor import dataset_zoo
from das3r_tpu.predictor.datasets import (batch_iterator,
                                          resample_clips_by_stride)


def _cv2_has_exr() -> bool:
    """Some OpenCV builds ship without the OpenEXR codec (cv2.imwrite of
    .exr raises 'could not find a writer'); skip EXR-backed fixtures."""
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        try:
            return bool(cv2.imwrite(os.path.join(d, "probe.exr"),
                                    np.zeros((2, 2), np.float32)))
        except cv2.error:
            return False


needs_exr = pytest.mark.skipif(not _cv2_has_exr(),
                               reason="cv2 lacks the OpenEXR codec")

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


@needs_exr
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


@needs_exr
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


def test_co3d_layout(tmp_path):
    import json
    rng = np.random.default_rng(6)
    inst = tmp_path / "apple" / "110_1"
    (inst / "images").mkdir(parents=True)
    (inst / "depths").mkdir()
    (inst / "masks").mkdir()
    K = np.array([[70.0, 0, SRC_W / 2], [0, 70.0, SRC_H / 2], [0, 0, 1]],
                 np.float32)
    for idx in (0, 1, 2):
        _write_png(str(inst / "images" / f"frame{idx:06d}.jpg"), rng)
        # depth 3m stored as u16 fraction of maximum_depth 6m
        cv2.imwrite(str(inst / "depths" / f"frame{idx:06d}.jpg.geometric.png"),
                    np.full((SRC_H, SRC_W), 32767, np.uint16))
        mask = np.full((SRC_H, SRC_W), 255, np.uint8)
        mask[:4, :4] = 0                        # masked-out background
        cv2.imwrite(str(inst / "masks" / f"frame{idx:06d}.png"), mask)
        np.savez(inst / "images" / f"frame{idx:06d}.npz",
                 camera_pose=np.eye(4, dtype=np.float32),
                 camera_intrinsics=K, maximum_depth=6.0)
    with open(tmp_path / "selected_seqs_train.json", "w") as f:
        json.dump({"apple": {"110_1": [0, 1, 2]}}, f)

    ds = dataset_zoo.Co3dDataset(str(tmp_path), split="train",
                                 resolution=RES)
    assert len(ds) > 0
    clip = ds[0]
    _check_clip(clip)
    # background mask zeroes depth -> those pixels are invalid
    assert not clip.valid_1.all()


def test_wildrgbd_layout(tmp_path):
    import json
    rng = np.random.default_rng(7)
    inst = tmp_path / "cup" / "scene0"
    for sub in ("rgb", "depth", "masks", "metadata"):
        (inst / sub).mkdir(parents=True)
    K = np.array([[70.0, 0, SRC_W / 2], [0, 70.0, SRC_H / 2], [0, 0, 1]],
                 np.float32)
    for idx in (0, 5):
        _write_png(str(inst / "rgb" / f"{idx:05d}.jpg"), rng)
        cv2.imwrite(str(inst / "depth" / f"{idx:05d}.png"),
                    np.full((SRC_H, SRC_W), 3000, np.uint16))  # mm
        cv2.imwrite(str(inst / "masks" / f"{idx:05d}.png"),
                    np.full((SRC_H, SRC_W), 255, np.uint8))
        np.savez(inst / "metadata" / f"{idx:05d}.npz",
                 camera_pose=np.eye(4, dtype=np.float32),
                 camera_intrinsics=K, maximum_depth=0.0)
    with open(tmp_path / "selected_seqs_train.json", "w") as f:
        json.dump({"cup": {"scene0": [0, 5]}}, f)

    ds = dataset_zoo.WildRGBDDataset(str(tmp_path), split="train",
                                     resolution=RES)
    _check_clip(ds[0])


def test_arkitscenes_layout(tmp_path):
    rng = np.random.default_rng(8)
    scene = tmp_path / "Training" / "sc0"
    (scene / "vga_wide").mkdir(parents=True)
    (scene / "lowres_depth").mkdir()
    names = ["img0.png", "img1.png"]
    K = np.array([[70.0, 0, SRC_W / 2], [0, 70.0, SRC_H / 2], [0, 0, 1]],
                 np.float32)
    for nm in names:
        _write_png(str(scene / "vga_wide" / nm.replace(".png", ".jpg")), rng)
        cv2.imwrite(str(scene / "lowres_depth" / nm),
                    np.full((SRC_H, SRC_W), 3000, np.uint16))  # mm
    np.savez(tmp_path / "Training" / "all_metadata.npz",
             scenes=np.array(["sc0"]), sceneids=np.array([0, 0]),
             images=np.array(names),
             intrinsics=np.stack([K, K]),
             trajectories=np.stack([np.eye(4, dtype=np.float32)] * 2),
             pairs=np.array([[0, 1]]))

    ds = dataset_zoo.ARKitScenesDataset(str(tmp_path), split="train",
                                        resolution=RES)
    assert len(ds) == 1
    _check_clip(ds[0])


@needs_exr
def test_blendedmvs_layout(tmp_path):
    rng = np.random.default_rng(9)
    seqh, seql = 0x12, 0x345
    seq = tmp_path / f"{seqh:08x}{seql:016x}"
    seq.mkdir()
    K = np.array([[70.0, 0, SRC_W / 2], [0, 70.0, SRC_H / 2], [0, 0, 1]],
                 np.float32)
    for idx in (0, 1, 2):
        _write_png(str(seq / f"{idx:08d}.jpg"), rng)
        cv2.imwrite(str(seq / f"{idx:08d}.exr"),
                    np.full((SRC_H, SRC_W), 3.0, np.float32))
        np.savez(seq / f"{idx:08d}.npz", intrinsics=K,
                 R_cam2world=np.eye(3, dtype=np.float32),
                 t_cam2world=np.zeros(3, np.float32))
    pairs = np.array([(seqh, seql, 0, 1, 0.5), (seqh, seql, 1, 2, 0.5)],
                     dtype=[("seq_high", "i8"), ("seq_low", "i8"),
                            ("im1", "i4"), ("im2", "i4"), ("score", "f4")])
    np.save(tmp_path / "blendedmvs_pairs.npy", pairs)

    # seq_low % 10 = 5 -> train split keeps it, val drops it
    ds = dataset_zoo.BlendedMVSDataset(str(tmp_path), split="train",
                                       resolution=RES)
    assert len(ds) == 2
    _check_clip(ds[0])
    assert len(dataset_zoo.BlendedMVSDataset(str(tmp_path),
                                             split="val")) == 0


@needs_exr
def test_megadepth_layout(tmp_path):
    rng = np.random.default_rng(10)
    seq = tmp_path / "0001" / "dense0"
    seq.mkdir(parents=True)
    K = np.array([[70.0, 0, SRC_W / 2], [0, 70.0, SRC_H / 2], [0, 0, 1]],
                 np.float32)
    for img in ("a", "b"):
        _write_png(str(seq / (img + ".jpg")), rng)
        cv2.imwrite(str(seq / (img + ".exr")),
                    np.full((SRC_H, SRC_W), 3.0, np.float32))
        np.savez(seq / (img + ".npz"), intrinsics=K,
                 cam2world=np.eye(4, dtype=np.float32))
    pairs = np.array([(0, 0, 1, 0.5)],
                     dtype=[("scene_id", "i4"), ("im1_id", "i4"),
                            ("im2_id", "i4"), ("score", "f4")])
    np.savez(tmp_path / "all_metadata.npz",
             scenes=np.array(["0001 dense0"]),
             images=np.array(["a", "b"]), pairs=pairs)

    ds = dataset_zoo.MegaDepthDataset(str(tmp_path), split="train",
                                      resolution=RES)
    assert len(ds) == 1
    _check_clip(ds[0])
    # scenes 0015/0022 are the val split -> this scene is train-only
    assert len(dataset_zoo.MegaDepthDataset(str(tmp_path),
                                            split="val")) == 0


@needs_exr
def test_habitat_layout(tmp_path):
    import json
    rng = np.random.default_rng(11)
    scene_dir = tmp_path / "room0"
    scene_dir.mkdir()
    K = np.array([[70.0, 0, SRC_W / 2], [0, 70.0, SRC_H / 2], [0, 0, 1]],
                 np.float32)
    for i in range(1, 6):
        _write_png(str(scene_dir / f"key_{i}.jpeg").replace(".jpeg", ".png"),
                   rng)
        os.rename(str(scene_dir / f"key_{i}.png"),
                  str(scene_dir / f"key_{i}.jpeg"))
        cv2.imwrite(str(scene_dir / f"key_{i}_depth.exr"),
                    np.full((SRC_H, SRC_W), 3.0, np.float32))
        with open(scene_dir / f"key_{i}_camera_params.json", "w") as f:
            json.dump({"camera_intrinsics": K.tolist(),
                       "R_cam2world": np.eye(3).tolist(),
                       "t_cam2world": [0.0, 0.0, 0.0]}, f)
    with open(tmp_path / "Habitat_1000_scenes_train.txt", "w") as f:
        f.write("room0/key\n")

    ds = dataset_zoo.HabitatDataset(str(tmp_path), 1000, split="train",
                                    resolution=RES)
    assert len(ds) == 4                       # view 0 paired with 1..4
    _check_clip(ds[0])


def test_dynamic_replica_layout(tmp_path):
    import json
    from PIL import Image
    rng = np.random.default_rng(12)
    (tmp_path / "seqA").mkdir()
    anno = []
    n = 5
    for i in range(n):
        img_rel = f"seqA/img_{i:04d}.png"
        dep_rel = f"seqA/dep_{i:04d}.png"
        _write_png(str(tmp_path / img_rel), rng)
        # f16 depth 3.0 bit-cast into u16 png
        d16 = np.full((SRC_H, SRC_W), 3.0, np.float16).view(np.uint16)
        Image.fromarray(d16).save(tmp_path / dep_rel)
        anno.append({
            "sequence_name": "seqA",
            "image": {"path": img_rel}, "depth": {"path": dep_rel},
            "viewpoint": {
                "focal_length": [2.0, 2.0], "principal_point": [0.0, 0.0],
                "intrinsics_format": "ndc_isotropic",
                "R": np.eye(3).tolist(), "T": [0.0, 0.0, 0.0]}})
    with open(tmp_path / "frame_annotations_train.json", "w") as f:
        json.dump(anno, f)

    ds = dataset_zoo.DynamicReplicaDataset(str(tmp_path), strides=(1, 2),
                                           clip_step=1, resolution=RES,
                                           dist_type="linear_1_2")
    assert len(ds) > 0
    clip = ds[0]
    W, H = RES
    assert clip.img1.shape == (3, H, W)
    assert clip.valid_1.any()
    # NDC isotropic: f_px = 2 * min(W,H)/2 = SRC_H -> a real pinhole;
    # recovered camera-frame depth must be the 3m plane
    w2c = np.linalg.inv(clip.camera_pose_1)
    cam = clip.gt_pts3d_1 @ w2c[:3, :3].T + w2c[:3, 3]
    z = cam[..., 2][clip.valid_1]
    np.testing.assert_allclose(z, 3.0, atol=0.01)


def test_ndc_to_pixel_intrinsics_formats():
    K_iso = dataset_zoo.ndc_to_pixel_intrinsics(
        [2.0, 2.0], [0.1, -0.2], 80, 60, "ndc_isotropic")
    # rescale = min(40, 30) = 30 -> f = 60, pp = (40 - 3, 30 + 6)
    np.testing.assert_allclose(np.diag(K_iso)[:2], [60, 60])
    np.testing.assert_allclose([K_iso[0, 2], K_iso[1, 2]], [37, 36])
    K_b = dataset_zoo.ndc_to_pixel_intrinsics(
        [2.0, 2.0], [0.0, 0.0], 80, 60, "ndc_norm_image_bounds")
    np.testing.assert_allclose(np.diag(K_b)[:2], [80, 60])
    with pytest.raises(ValueError):
        dataset_zoo.ndc_to_pixel_intrinsics([1, 1], [0, 0], 8, 6, "nope")


def test_resample_matches_reference_formula():
    """Keep counts follow tartanair.py:164-170: weights linspace/max, base
    pool = the stride with the LARGEST weight (for linear_1_2 the last
    stride), keep min(pool, w_i * base) per stride."""
    # pools: stride 1 -> 10 clips, stride 2 -> 6, stride 3 -> 4
    clips = ([("a", i, i + 1, 1) for i in range(10)]
             + [("a", i, i + 2, 2) for i in range(6)]
             + [("a", i, i + 3, 3) for i in range(4)])
    out = resample_clips_by_stride(clips, (1, 2, 3), "linear_1_2", seed=0)
    counts = {s: sum(1 for c in out if c[-1] == s) for s in (1, 2, 3)}
    # weights 1, 1.5, 2 -> /max = 0.5, 0.75, 1.0; base = pool(stride 3) = 4
    assert counts == {1: min(10, int(0.5 * 4)),
                      2: min(6, int(0.75 * 4)),
                      3: 4}
    # no duplicates; every kept clip came from the input
    assert len(set(map(tuple, out))) == len(out)
    assert set(map(tuple, out)) <= set(map(tuple, clips))


def test_pointodyssey_uses_shared_resampler(tmp_path):
    """PointOdysseyDataset now applies the one shared reference-formula
    resampler (ADVICE r3: two divergent copies invited drift)."""
    from das3r_tpu.predictor import datasets as ds_mod
    seq = tmp_path / "train" / "seq0"
    (seq / "rgbs").mkdir(parents=True)
    (seq / "trajs_3d").mkdir()
    for i in range(6):
        (seq / "rgbs" / f"rgb_{i:05d}.jpg").write_bytes(b"")
    ds = ds_mod.PointOdysseyDataset(str(tmp_path), split="train",
                                    strides=(1, 2), clip_step=1,
                                    dist_type="linear_1_2", seed=0)
    counts = {s: sum(1 for c in ds.clips if c[-1] == s) for s in (1, 2)}
    # pools: stride1 -> 5, stride2 -> 3; weights [1,2]/2 = [0.5, 1];
    # base = pool(argmax weight) = 3 -> keep {1: int(0.5*3)=1, 2: 3}
    assert counts == {1: 1, 2: 3}


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
