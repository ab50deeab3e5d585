"""COLMAP text-format I/O (cameras.txt / images.txt / points3D.txt).

Covers what the DAS3R pipeline actually uses: the rearrange bridge WRITES
per-frame PINHOLE cameras + poses (reference utils/dust3r_utils.py:210-232,
utils/rearrange.py:94-100) and the stage-2 reader PARSES them back
(scene/colmap_loader.py: read_intrinsics_text / read_extrinsics_text).
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np


@dataclasses.dataclass
class ColmapCamera:
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray  # PINHOLE: fx fy cx cy; SIMPLE_PINHOLE: f cx cy

    @property
    def focal_xy(self) -> tuple[float, float]:
        if self.model == "SIMPLE_PINHOLE":
            return float(self.params[0]), float(self.params[0])
        return float(self.params[0]), float(self.params[1])


@dataclasses.dataclass
class ColmapImage:
    id: int
    qvec: np.ndarray   # wxyz, world-to-camera
    tvec: np.ndarray
    camera_id: int
    name: str


def qvec2rotmat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def rotmat2qvec(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> wxyz quaternion (COLMAP convention)."""
    K = np.array([
        [R[0, 0] - R[1, 1] - R[2, 2], 0, 0, 0],
        [R[0, 1] + R[1, 0], R[1, 1] - R[0, 0] - R[2, 2], 0, 0],
        [R[0, 2] + R[2, 0], R[1, 2] + R[2, 1],
         R[2, 2] - R[0, 0] - R[1, 1], 0],
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1],
         R[0, 0] + R[1, 1] + R[2, 2]],
    ]) / 3.0
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    if q[0] < 0:
        q = -q
    return q


def read_cameras_text(path: str) -> dict[int, ColmapCamera]:
    cams = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            cam = ColmapCamera(
                id=int(parts[0]), model=parts[1], width=int(parts[2]),
                height=int(parts[3]),
                params=np.asarray([float(p) for p in parts[4:]]))
            cams[cam.id] = cam
    return cams


def read_images_text(path: str) -> dict[int, ColmapImage]:
    """images.txt has two lines per image; the second (2D points) may be
    empty and is ignored."""
    images = {}
    with open(path) as f:
        lines = [ln.strip() for ln in f
                 if ln.strip() and not ln.strip().startswith("#")]
    i = 0
    while i < len(lines):
        parts = lines[i].split()
        img = ColmapImage(
            id=int(parts[0]),
            qvec=np.asarray([float(p) for p in parts[1:5]]),
            tvec=np.asarray([float(p) for p in parts[5:8]]),
            camera_id=int(parts[8]),
            name=parts[9])
        images[img.id] = img
        # the next line is the (possibly empty) POINTS2D line; we detect it
        # by it NOT looking like an image header (10 fields with a filename)
        if i + 1 < len(lines):
            nxt = lines[i + 1].split()
            looks_like_header = (len(nxt) == 10
                                 and not nxt[-1].replace(".", "").isdigit())
            i += 1 if looks_like_header else 2
        else:
            i += 1
    return images


def write_cameras_text(path: str, sizes_wh, intrinsics: np.ndarray):
    """One PINHOLE camera per frame from [F, 3, 3] K (rearrange bridge)."""
    w, h = sizes_wh
    with open(path, "w") as f:
        f.write("# Camera list with one line of data per camera:\n")
        f.write("#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n")
        for i, K in enumerate(intrinsics):
            f.write(f"{i + 1} PINHOLE {w} {h} "
                    f"{K[0, 0]} {K[1, 1]} {K[0, 2]} {K[1, 2]}\n")


def write_images_text(path: str, poses_c2w: np.ndarray, names):
    """Write world-to-camera extrinsics from c2w poses + image names."""
    with open(path, "w") as f:
        f.write("# Image list with two lines of data per image:\n")
        f.write("#   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n")
        f.write("#   POINTS2D[] as (X, Y, POINT3D_ID)\n")
        for i, (c2w, name) in enumerate(zip(poses_c2w, names)):
            w2c = np.linalg.inv(c2w)
            q = rotmat2qvec(w2c[:3, :3])
            t = w2c[:3, 3]
            f.write(f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                    f"{t[0]} {t[1]} {t[2]} {i + 1} {os.path.basename(name)}\n")
            f.write("\n")
