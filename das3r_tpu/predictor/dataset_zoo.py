"""Stage-1 dataset zoo: the DUSt3R/MonST3R-inherited loaders beyond the
DAS3R training recipe (reference dynamic_predictor/dust3r/datasets/ —
tartanair.py, spring_dataset.py, waymo.py, scannetpp.py,
staticthings3d.py).  Each dataset yields ``TwoViewClip`` samples exactly
like ``PointOdysseyDataset``; static datasets (no GT dynamic labels in
the reference either) carry all-zero dynamic masks.

Two on-disk conventions exist in the reference zoo and both are kept:

* **strided video clips** (TartanAir tartanair.py:85-102, Spring
  spring_dataset.py:88-110): enumerate ``(seq, i, i+stride)`` windows per
  stride with ``clip_step`` hops, then resample clip counts by the
  ``linear_1_2`` stride distribution (utils/misc.py:10-29).
* **precomputed pair lists** (Waymo waymo.py:29-36 pairs npz, ScanNet++
  scannetpp.py:25-33 all_metadata.npz, StaticThings3D
  staticthings3d.py:27-28 pairs npy).

Everything is host-side numpy (the TPU never sees file IO); batches are
formed by ``datasets.batch_iterator``.
"""
from __future__ import annotations

import glob
import os

import numpy as np

from das3r_tpu.predictor.datasets import (TwoViewClip, center_crop_resize,
                                          depth_to_world_pts, imgnorm)


def _imread_rgb(path):
    import cv2
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _imread_any(path):
    """EXR/16-bit-aware single-channel read (reference imread_cv2 with
    IMREAD_ANYDEPTH for depth maps)."""
    import cv2
    os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
    d = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_UNCHANGED)
    if d is None:
        raise FileNotFoundError(path)
    if d.ndim == 3:
        d = d[..., 0]
    return d.astype(np.float32)


def resample_clips_by_stride(clips, strides, dist_type, seed=0):
    """linear_1_2 stride rebalancing (tartanair.py:133-148): keep
    ``min(pool, dist[i]/max(dist) * largest_pool)`` clips per stride,
    sampled without replacement."""
    if not clips or len(strides) <= 1 or dist_type is None:
        return clips
    start, end = map(float, dist_type.split("_")[1:])
    dist = np.linspace(start, end, len(strides))
    dist = dist / dist.max()
    rng = np.random.default_rng(seed)
    by_stride = {s: [c for c in clips if c[-1] == s] for s in strides}
    biggest = max(len(v) for v in by_stride.values())
    out = []
    for s, frac in zip(strides, dist):
        pool = by_stride[s]
        want = min(len(pool), int(frac * biggest))
        idx = rng.choice(len(pool), want, replace=False)
        out.extend(pool[i] for i in idx)
    return out


class _TwoViewZooDataset:
    """Shared view->clip assembly: subclasses provide ``_load_view(ref)``
    returning (rgb u8 HW3, depth HW f32, K 3x3, c2w 4x4)."""

    resolution = (512, 288)
    z_far = 80.0

    def _clip(self, ref1, ref2) -> TwoViewClip:
        views = []
        for ref in (ref1, ref2):
            rgb, dep, K, c2w = self._load_view(ref)
            rgb, dep, K = center_crop_resize(rgb, dep, np.asarray(K, float),
                                             self.resolution)
            pts, valid = depth_to_world_pts(dep, K, c2w, self.z_far)
            views.append((imgnorm(rgb), pts, valid, c2w))
        (i1, p1, v1, pose1), (i2, p2, v2, _) = views
        zero = np.zeros(v1.shape, np.float32)
        return TwoViewClip(img1=i1, img2=i2, gt_pts3d_1=p1, gt_pts3d_2=p2,
                           camera_pose_1=pose1.astype(np.float32),
                           valid_1=v1, valid_2=v2,
                           gt_mask_1=zero, gt_mask_2=zero)


class _StridedClipZooDataset(_TwoViewZooDataset):
    """Strided-video convention: subclasses fill ``self.clips`` with
    ``(seq_payload, i, j, stride)`` tuples via ``_index_sequences``."""

    def __init__(self, root, split, strides, clip_step, resolution,
                 dist_type, z_far, seed):
        self.resolution = resolution
        self.z_far = z_far
        self.clips = []
        self._index_sequences(root, split, strides, clip_step)
        self.clips = resample_clips_by_stride(self.clips, strides,
                                              dist_type, seed)

    def __len__(self):
        return len(self.clips)

    def __getitem__(self, index):
        seq, i, j, _ = self.clips[index]
        return self._clip((seq, i), (seq, j))


class TartanAirDataset(_StridedClipZooDataset):
    """TartanAir (tartanair.py): ``{root}/{env}/{split}/{run}/image_left/
    %06d_left.png`` + ``depth_left/%06d_left_depth.npy`` +
    ``pose_left.txt`` rows ``x y z qx qy qz qw`` in the NED convention —
    the reference permutes (z,x,y) and (qz,qx,qy,qw)
    (tartanair.py:20-32); intrinsics are the fixed 640x480 pinhole
    fx=fy=320, cx=320, cy=240 (:106-115)."""

    def __init__(self, root, split="Hard", strides=(8,), clip_step=2,
                 resolution=(512, 288), dist_type=None, z_far=80.0,
                 seed=0):
        super().__init__(root, split, strides, clip_step, resolution,
                         dist_type, z_far, seed)

    def _index_sequences(self, root, split, strides, clip_step):
        for seq in sorted(glob.glob(os.path.join(root, "*/", split, "*/"))):
            n = len(os.listdir(os.path.join(seq, "image_left")))
            poses = np.loadtxt(os.path.join(seq, "pose_left.txt"))
            for stride in strides:
                for ii in range(0, n - 2 * stride + 1, clip_step):
                    self.clips.append(((seq, poses), ii, ii + stride,
                                       stride))

    @staticmethod
    def _ned_to_c2w(row):
        z, x, y = row[:3]
        qz, qx, qy, qw = row[3:7]
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.array([
            [1 - 2 * qy * qy - 2 * qz * qz, 2 * qx * qy - 2 * qz * qw,
             2 * qx * qz + 2 * qy * qw],
            [2 * qx * qy + 2 * qz * qw, 1 - 2 * qx * qx - 2 * qz * qz,
             2 * qy * qz - 2 * qx * qw],
            [2 * qx * qz - 2 * qy * qw, 2 * qy * qz + 2 * qx * qw,
             1 - 2 * qx * qx - 2 * qy * qy]], np.float32)
        c2w[:3, 3] = (x, y, z)
        return c2w

    def _load_view(self, ref):
        (seq, poses), i = ref
        rgb = _imread_rgb(os.path.join(seq, "image_left",
                                       f"{i:06d}_left.png"))
        dep = np.load(os.path.join(seq, "depth_left",
                                   f"{i:06d}_left_depth.npy"))
        K = np.array([[320.0, 0, 320.0], [0, 320.0, 240.0], [0, 0, 1]])
        return rgb, dep.astype(np.float32), K, self._ned_to_c2w(poses[i])


class SpringDataset(_StridedClipZooDataset):
    """Spring (spring_dataset.py): ``{root}/{split}/{seq}/frame_left/
    frame_left_%04d.png`` (1-indexed) + dsp5 HDF5 disparities
    (``disp1_left_%04d.dsp5``, key 'disparity', subsampled [::2, ::2]),
    depth = fx * 0.065 / disp (:18-29), ``cam_data/extrinsics.txt`` rows =
    flattened 4x4 world-to-cam (inverted to c2w, :163-164),
    ``cam_data/intrinsics.txt`` rows = fx fy cx cy."""

    BASELINE = 0.065

    def __init__(self, root, split="train", strides=(8,), clip_step=2,
                 resolution=(512, 288), dist_type=None, z_far=80.0,
                 seed=0, remove_seqs=()):
        self._remove = set(remove_seqs)
        super().__init__(root, split, strides, clip_step, resolution,
                         dist_type, z_far, seed)

    def _index_sequences(self, root, split, strides, clip_step):
        for seq in sorted(glob.glob(os.path.join(root, split, "*/"))):
            if os.path.basename(seq.rstrip("/")) in self._remove:
                continue
            n = len(os.listdir(os.path.join(seq, "frame_left")))
            extr = np.loadtxt(os.path.join(seq, "cam_data",
                                           "extrinsics.txt"))
            intr = np.loadtxt(os.path.join(seq, "cam_data",
                                           "intrinsics.txt"))
            for stride in strides:
                for ii in range(1, n - 2 * stride + 2, clip_step):
                    self.clips.append(((seq, extr, intr), ii, ii + stride,
                                       stride))

    def _load_view(self, ref):
        import h5py
        (seq, extr, intr), i = ref
        rgb = _imread_rgb(os.path.join(seq, "frame_left",
                                       f"frame_left_{i:04d}.png"))
        with h5py.File(os.path.join(seq, "disp1_left",
                                    f"disp1_left_{i:04d}.dsp5"), "r") as f:
            disp = np.asarray(f["disparity"], np.float32)
        fx, fy, cx, cy = intr[i - 1]
        with np.errstate(divide="ignore", invalid="ignore"):
            dep = (fx * self.BASELINE / disp)[::2, ::2]
        dep = np.where(np.isfinite(dep), dep, -1.0).astype(np.float32)
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
        c2w = np.linalg.inv(extr[i - 1].reshape(4, 4)).astype(np.float32)
        return rgb, dep, K, c2w


class WaymoDataset(_TwoViewZooDataset):
    """Preprocessed Waymo (waymo.py): ``{root}/{pairs_npz}`` holding
    scenes / frames / pairs (scene_id, img1_id, img2_id); per frame
    ``{scene}/{frame}.jpg`` + ``.exr`` depth + ``.npz`` with 'intrinsics'
    and 'cam2world' (:44-60)."""

    def __init__(self, root, pairs_npz="waymo_pairs_video.npz",
                 resolution=(512, 288), z_far=80.0):
        self.root = root
        self.resolution = resolution
        self.z_far = z_far
        with np.load(os.path.join(root, pairs_npz)) as data:
            self.scenes = [str(s) for s in data["scenes"]]
            self.frames = [str(f) for f in data["frames"]]
            self.pairs = data["pairs"].astype(int)

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, index):
        scene, a, b = self.pairs[index]
        seq = os.path.join(self.root, self.scenes[scene])
        return self._clip((seq, self.frames[a]), (seq, self.frames[b]))

    def _load_view(self, ref):
        seq, frame = ref
        base = os.path.join(seq, frame)
        rgb = _imread_rgb(base + ".jpg")
        dep = _imread_any(base + ".exr")
        cam = np.load(base + ".npz")
        return rgb, dep, np.float32(cam["intrinsics"]), \
            np.float32(cam["cam2world"])


class ScanNetppDataset(_TwoViewZooDataset):
    """Preprocessed ScanNet++ (scannetpp.py): ``all_metadata.npz`` with
    scenes / sceneids / images / intrinsics / trajectories / pairs; RGB at
    ``{scene}/images/{name}.jpg``, depth ``{scene}/depth/{name}.png`` in
    millimeters (:54-56)."""

    def __init__(self, root, resolution=(512, 288), z_far=80.0):
        self.root = root
        self.resolution = resolution
        self.z_far = z_far
        with np.load(os.path.join(root, "all_metadata.npz")) as data:
            self.scenes = [str(s) for s in data["scenes"]]
            self.sceneids = data["sceneids"]
            self.images = [str(s) for s in data["images"]]
            self.intrinsics = data["intrinsics"].astype(np.float32)
            self.trajectories = data["trajectories"].astype(np.float32)
            self.pairs = data["pairs"][:, :2].astype(int)

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, index):
        a, b = self.pairs[index]
        return self._clip(a, b)

    def _load_view(self, view_idx):
        scene = os.path.join(self.root, self.scenes[self.sceneids[view_idx]])
        name = self.images[view_idx]
        rgb = _imread_rgb(os.path.join(scene, "images", name + ".jpg"))
        dep = _imread_any(os.path.join(scene, "depth", name + ".png"))
        dep = np.where(np.isfinite(dep), dep / 1000.0, 0.0)
        return rgb, dep.astype(np.float32), self.intrinsics[view_idx], \
            self.trajectories[view_idx]


class StaticThings3DDataset(_TwoViewZooDataset):
    """StaticThings3D (staticthings3d.py): ``staticthings_pairs.npy``
    rows (scene, seq, cam1, im1, cam2, im2); frames under
    ``TRAIN/{scene}/{seq:04d}/{left|right}/{num:04d}_clean.jpg`` + .exr +
    .npz. ``mask_bg`` zeroes depths > 200 (:46-47) — deterministic here
    (True/False, no rng coin)."""

    def __init__(self, root, resolution=(512, 288), z_far=200.0,
                 mask_bg=True, variant="clean"):
        self.root = root
        self.resolution = resolution
        self.z_far = z_far
        self.mask_bg = mask_bg
        self.variant = variant
        self.pairs = np.load(os.path.join(root, "staticthings_pairs.npy"),
                             allow_pickle=True)

    def __len__(self):
        return len(self.pairs)

    @staticmethod
    def _cam_name(c):
        c = c.decode("ascii") if isinstance(c, bytes) else str(c)
        return {"l": "left", "r": "right"}.get(c, c)

    def __getitem__(self, index):
        scene, seq, cam1, im1, cam2, im2 = self.pairs[index]
        scene = scene.decode("ascii") if isinstance(scene, bytes) \
            else str(scene)
        seq_path = os.path.join(self.root, "TRAIN", scene, f"{int(seq):04d}")
        return self._clip((seq_path, self._cam_name(cam1), int(im1)),
                          (seq_path, self._cam_name(cam2), int(im2)))

    def _load_view(self, ref):
        seq_path, cam, idx = ref
        base = os.path.join(seq_path, cam, f"{idx:04d}")
        rgb = _imread_rgb(f"{base}_{self.variant}.jpg")
        dep = _imread_any(base + ".exr")
        if self.mask_bg:
            dep = np.where(dep > 200.0, 0.0, dep)
        cam_np = np.load(base + ".npz")
        return rgb, dep, np.float32(cam_np["intrinsics"]), \
            np.float32(cam_np["cam2world"])
