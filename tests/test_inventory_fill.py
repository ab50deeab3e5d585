"""Tests for the SURVEY §2 inventory gap-fill batch: classic-3DGS pcd init,
Blender/NeRF-synthetic reader, binary COLMAP parsers, the linear dust3r
head, mask dilation and the scale-shift-invariant test criterion."""
import json
import os
import struct

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


# ---------------------------------------------------------------- pcd init
def test_init_from_point_cloud():
    from das3r_tpu.models import gaussians as G
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    cols = rng.random((500, 3)).astype(np.float32)
    params, meta, scene = G.init_from_point_cloud(pts, cols, capacity=1024)
    assert scene.capacity == 1024
    assert int(meta.alive.sum()) == 500
    np.testing.assert_allclose(np.asarray(params.xyz[:500]), pts, atol=1e-6)
    # opacity 0.1 exactly (reference gaussian_model.py: inverse_sigmoid(0.1))
    op = jax.nn.sigmoid(params.opacity[:500])
    np.testing.assert_allclose(np.asarray(op), 0.1, atol=1e-5)
    # dead slots render-safe: zero opacity, identity quats
    assert float(jax.nn.sigmoid(params.opacity[500:]).max()) < 1e-6
    np.testing.assert_array_equal(np.asarray(params.rotation[500:, 0]), 1.0)
    # SH DC inverts back to the input colors
    from das3r_tpu.utils import sh as sh_lib
    rgb = np.asarray(sh_lib.sh_to_rgb(params.features_dc[:500, 0]))
    np.testing.assert_allclose(rgb, cols, atol=1e-5)


# ---------------------------------------------------------- Blender reader
def _write_blender_scene(root, n_train=4, n_test=2, hw=(32, 40)):
    from PIL import Image
    h, w = hw
    rng = np.random.default_rng(1)
    for split, n in (("train", n_train), ("test", n_test)):
        frames = []
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for i in range(n):
            c2w = np.eye(4)
            c2w[:3, 3] = [i, 0, 2]
            frames.append({"file_path": f"./{split}/r_{i}",
                           "transform_matrix": c2w.tolist()})
            rgba = rng.integers(0, 255, (h, w, 4), dtype=np.uint8)
            rgba[..., 3] = 255 * (np.arange(w) % 2)[None, :]  # alpha stripes
            Image.fromarray(rgba, "RGBA").save(
                os.path.join(root, split, f"r_{i}.png"))
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)


def test_load_blender_scene(tmp_path):
    from das3r_tpu.data import readers
    _write_blender_scene(str(tmp_path))
    data, (xyz, rgb) = readers.load_blender_scene(
        str(tmp_path), white_background=True, eval_mode=True)
    assert data.n_frames == 6 and data.height == 32 and data.width == 40
    assert list(data.train_idx) == [0, 1, 2, 3]
    assert list(data.test_idx) == [4, 5]
    # white background shows through where alpha == 0
    assert float(data.images[0, :, :, 0].min()) == 1.0
    # OpenGL->COLMAP flip: stored c2w has column 1/2 negated vs identity
    np.testing.assert_allclose(data.poses_c2w[0, :3, 1], [0, -1, 0],
                               atol=1e-6)
    np.testing.assert_allclose(data.poses_c2w[0, :3, 2], [0, 0, -1],
                               atol=1e-6)
    # random pcd generated, persisted, and reloaded identically
    assert xyz.shape == (100_000, 3)
    assert np.abs(xyz).max() <= 1.3 + 1e-6
    data2, (xyz2, _) = readers.load_blender_scene(str(tmp_path),
                                                  eval_mode=False)
    assert data2.test_idx.size == 0 and data2.train_idx.size == 6
    np.testing.assert_allclose(xyz2, xyz, atol=1e-6)


def test_blender_end_to_end_render(tmp_path):
    """Blender scene -> pcd init -> one render: the classic-3DGS entry path
    works without any stage-1 side channels."""
    from das3r_tpu.data import readers
    from das3r_tpu.models import gaussians as G
    _write_blender_scene(str(tmp_path))
    data, (xyz, rgb) = readers.load_blender_scene(str(tmp_path))
    params, meta, scene = G.init_from_point_cloud(
        xyz[:2000].astype(np.float32), rgb[:2000].astype(np.float32),
        capacity=4096, n_frames=data.n_frames,
        height=data.height, width=data.width)
    assert params.conf_static.shape == (6, 32, 40)
    assert bool(jnp.all(params.conf_static == 1.0))


# ------------------------------------------------------------ binary COLMAP
def test_colmap_binary_roundtrip(tmp_path):
    from das3r_tpu.data import colmap
    # points3D.bin with 3 points, varying track lengths
    pts = np.asarray([[1.0, 2.0, 3.0], [-1.0, 0.5, 2.0], [0.0, 0.0, 9.0]])
    rgbs = np.asarray([[255, 0, 0], [0, 255, 0], [10, 20, 30]], np.uint8)
    errs = np.asarray([0.5, 1.5, 0.25])
    p3d = tmp_path / "points3D.bin"
    with open(p3d, "wb") as f:
        f.write(struct.pack("<Q", 3))
        for i in range(3):
            f.write(struct.pack("<QdddBBBd", i + 1, *pts[i], *rgbs[i],
                                errs[i]))
            track = [(7, 11)] * (i + 1)
            f.write(struct.pack("<Q", len(track)))
            for im_id, p2d in track:
                f.write(struct.pack("<ii", im_id, p2d))
    xyz, rgb, err = colmap.read_points3d_binary(str(p3d))
    np.testing.assert_allclose(xyz, pts)
    np.testing.assert_array_equal(rgb, rgbs)
    np.testing.assert_allclose(err, errs)

    # cameras.bin: one PINHOLE camera
    cams_f = tmp_path / "cameras.bin"
    with open(cams_f, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))
        f.write(struct.pack("<dddd", 500.0, 510.0, 320.0, 240.0))
    cams = colmap.read_cameras_binary(str(cams_f))
    assert cams[1].model == "PINHOLE" and cams[1].width == 640
    np.testing.assert_allclose(cams[1].params, [500, 510, 320, 240])

    # images.bin: one image with 2 observed 2D points
    imgs_f = tmp_path / "images.bin"
    q = np.asarray([0.9, 0.1, 0.2, 0.1])
    q = q / np.linalg.norm(q)
    with open(imgs_f, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<idddddddi", 1, *q, 0.3, -0.2, 1.7, 1))
        f.write(b"frame_0000.png\x00")
        f.write(struct.pack("<Q", 2))
        for _ in range(2):
            f.write(struct.pack("<ddq", 1.0, 2.0, -1))
    imgs = colmap.read_extrinsics_binary(str(imgs_f))
    assert imgs[1].name == "frame_0000.png"
    np.testing.assert_allclose(imgs[1].qvec, q)
    np.testing.assert_allclose(imgs[1].tvec, [0.3, -0.2, 1.7])


def test_points3d_text(tmp_path):
    from das3r_tpu.data import colmap
    p = tmp_path / "points3D.txt"
    p.write_text("# comment\n"
                 "1 1.0 2.0 3.0 255 0 0 0.5 1 0\n"
                 "2 -1.0 0.5 2.0 0 255 0 1.5 1 0 2 3\n")
    xyz, rgb, err = colmap.read_points3d_text(str(p))
    np.testing.assert_allclose(xyz, [[1, 2, 3], [-1, 0.5, 2]])
    np.testing.assert_array_equal(rgb, [[255, 0, 0], [0, 255, 0]])
    np.testing.assert_allclose(err, [0.5, 1.5])


# --------------------------------------------------------------- linear head
def test_linear_head_shapes_and_pixel_shuffle():
    from das3r_tpu.models.croco.dust3r import (AsymmetricCroCo3D,
                                               Dust3rConfig)
    cfg = Dust3rConfig(enc_embed_dim=32, enc_depth=2, enc_num_heads=2,
                       dec_embed_dim=24, dec_depth=2, dec_num_heads=2,
                       head_type="linear")
    model = AsymmetricCroCo3D(cfg)
    H = W = 32
    img = jnp.zeros((1, 3, H, W))
    params = model.init(jax.random.PRNGKey(0), img, img)
    res1, res2 = model.apply(params, img, img)
    assert res1["pts3d"].shape == (1, H, W, 3)
    assert res1["conf"].shape == (1, H, W)
    assert res2["dynamic_mask"].shape == (1, H, W)
    assert float(res1["conf"].min()) >= 1.0   # vmin + exp


def test_linear_head_matches_torch_pixel_shuffle():
    """The flax LinearHead must reproduce torch's
    Linear -> view(B,C,h,w) -> pixel_shuffle(p) channel ordering."""
    torch = pytest.importorskip("torch")
    from das3r_tpu.models.croco.dpt import LinearHead
    p, D, hp, wp, C = 4, 16, 2, 3, 3
    rng = np.random.default_rng(2)
    tokens = rng.normal(size=(1, hp * wp, D)).astype(np.float32)
    weight = rng.normal(size=(C * p * p, D)).astype(np.float32) * 0.1
    bias = rng.normal(size=(C * p * p,)).astype(np.float32)

    t_feat = torch.nn.functional.linear(
        torch.from_numpy(tokens), torch.from_numpy(weight),
        torch.from_numpy(bias))
    t_feat = t_feat.transpose(-1, -2).view(1, -1, hp, wp)
    t_out = torch.nn.functional.pixel_shuffle(t_feat, p).numpy()  # [1,C,H,W]

    head = LinearHead(out_ch=C, patch_size=p)
    fparams = {"params": {"proj_shuffle": {"proj": {
        "kernel": jnp.asarray(weight.T), "bias": jnp.asarray(bias)}}}}
    j_out = head.apply(fparams, [jnp.asarray(tokens)], hp * p, wp * p)
    np.testing.assert_allclose(np.asarray(j_out).transpose(0, 3, 1, 2),
                               t_out, atol=1e-5)


# ------------------------------------------------------------ mask dilation
def test_enlarge_seg_masks(tmp_path):
    pytest.importorskip("cv2")
    from PIL import Image
    from das3r_tpu.predictor.runner import enlarge_seg_masks
    m = np.zeros((16, 16), np.uint8)
    m[8, 8] = 255
    Image.fromarray(m).save(tmp_path / "dynamic_mask_0000.png")
    enlarge_seg_masks(str(tmp_path))
    out = np.asarray(Image.open(tmp_path / "enlarged_dynamic_mask_0000.png"))
    # 5x5 dilation: the single pixel becomes a 5x5 block
    assert out[8, 8] == 255 and out[6, 6] == 255 and out[10, 10] == 255
    assert out[5, 8] == 0 and out[8, 5] == 0
    assert out.sum() == 255 * 25


def test_rearrange_copies_enlarged_masks(tmp_path):
    from PIL import Image
    from das3r_tpu.data import rearrange
    src = tmp_path / "stage1"
    src.mkdir()
    rng = np.random.default_rng(3)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)) \
            .save(src / f"frame_{i:04d}.png")
        np.save(src / f"frame_{i:04d}.npy", np.ones((8, 8), np.float32))
        np.save(src / f"conf_{i:04d}.npy", np.ones((8, 8), np.float32))
        np.save(src / f"dyna_avg_{i:04d}.npy", np.zeros((8, 8), np.float32))
        np.save(src / f"dyna_max_{i:04d}.npy", np.zeros((8, 8), np.float32))
        for pre in ("dynamic_mask", "enlarged_dynamic_mask"):
            Image.fromarray(np.zeros((8, 8), np.uint8)).save(
                src / f"{pre}_{i:04d}.png")
    (src / "pred_traj.txt").write_text(
        "0 0 0 0 0 0 0 1\n1 0 0 0 0 0 0 1\n")
    np.savetxt(src / "pred_intrinsics.txt",
               np.tile(np.eye(3).reshape(1, 9) * 8, (2, 1)))
    out = tmp_path / "scene"
    rearrange.rearrange_scene(str(src), str(out))
    assert (out / "enlarged_dynamic_masks" /
            "enlarged_dynamic_mask_0000.png").exists()
    assert (out / "enlarged_dynamic_masks" /
            "enlarged_dynamic_mask_0001.png").exists()
    # and the plain masks dir did NOT pick up the enlarged files
    import os as _os
    assert sorted(_os.listdir(out / "dynamic_masks")) == [
        "dynamic_mask_0000.png", "dynamic_mask_0001.png"]
