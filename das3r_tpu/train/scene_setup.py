"""Scene assembly: SceneData -> training state (the functional equivalent of
``Scene.__init__`` + ``create_from_cameras`` + ``init_RT_seq`` + ``init_fov``
+ ``init_test_RT_seq``, reference scene/__init__.py:26-93).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from das3r_tpu.data.readers import SceneData
from das3r_tpu.models.gaussians import (
    GaussianMeta, GaussianParams, GaussianScene, PoseParams, TestPoseParams,
    init_from_frames, init_pose_params, init_test_pose_params)
from das3r_tpu.ops.splat import RasterSettings


@dataclasses.dataclass
class SceneBundle:
    params: GaussianParams
    meta: GaussianMeta
    scene: GaussianScene
    poses: PoseParams
    test_poses: TestPoseParams | None
    settings: RasterSettings
    train_data: SceneData       # train-frame subset (uid-indexed)
    test_data: SceneData | None


def nerfpp_radius(poses_w2c: np.ndarray) -> float:
    """Camera-extent radius used as spatial_lr_scale (getNerfppNorm,
    dataset_readers.py:59-80): 1.1 * max distance of camera centers from
    their mean."""
    c2w = np.linalg.inv(poses_w2c)
    centers = c2w[:, :3, 3]
    d = np.linalg.norm(centers - centers.mean(0), axis=1)
    return float(d.max() * 1.1)


def build_scene(
    data: SceneData,
    sh_degree: int = 3,
    conf_thre: float = 1.0,
    capacity: int | None = None,
    max_per_tile: int = 1024,
    max_tiles_per_gaussian: int = 32,
    tile: int = 16,
    max_points: int | None = 1_500_000,
    entry_cap: int | None = None,
    probe_dup_cap: bool = True,
) -> SceneBundle:
    """``entry_cap``: static rasterizer entry capacity. None = probe this
    scene's occupancy over sampled train views (models/autosize.py) — the
    TPU-native equivalent of the CUDA rasterizer's dynamic buffer growth.

    ``probe_dup_cap``: also tighten ``max_tiles_per_gaussian`` to the
    probed per-Gaussian footprint (never above the passed value) — the
    binning sort domain is N x this cap, so the probe directly shrinks
    the dominant production-scale sort. The trainer regrows it on
    dup_overflow like the entry capacity."""
    train = data.subset(data.train_idx)
    test = data.subset(data.test_idx) if len(data.test_idx) else None

    spatial_lr_scale = nerfpp_radius(train.poses_w2c_colmap)

    params, meta, scene = init_from_frames(
        images=train.images, depths=train.depth, confs=train.conf,
        dyna_avg=train.dyna_avg, poses_c2w=train.poses_c2w,
        focals=train.intrinsics[:, 0, 0], max_sh_degree=sh_degree,
        conf_thre=conf_thre, capacity=capacity,
        spatial_lr_scale=spatial_lr_scale, max_points=max_points)

    poses = init_pose_params(train.poses_w2c_colmap,
                             fovx=float(train.fovx[0]),
                             fovy=float(train.fovy[0]))
    test_poses = (init_test_pose_params(test.poses_w2c_colmap)
                  if test is not None else None)

    settings = RasterSettings(
        image_height=data.height, image_width=data.width,
        sh_degree=0,  # active degree starts at 0 (bumped every 3000 iters)
        tile=tile, max_per_tile=max_per_tile,
        max_tiles_per_gaussian=max_tiles_per_gaussian,
        # placeholder capacity; replaced below (probe or explicit)
        max_total_entries=8 * params.xyz.shape[0],
        depth_sort_bits=0)
    from das3r_tpu.models import autosize
    if entry_cap is None and probe_dup_cap:
        # one probe pass yields all the capacities
        stats = autosize.probe_capacities(
            params, meta, settings, poses.all_poses(),
            float(train.fovx[0]), float(train.fovy[0]))
        entry_cap = -(-max(int(stats.max_total * 1.2), 8 * 1024)
                      // 1024) * 1024
        dup_cap = min(-(-max(int(stats.max_dup * 1.3), 8) // 4) * 4,
                      max_tiles_per_gaussian)
        settings = dataclasses.replace(
            settings, max_tiles_per_gaussian=dup_cap,
            **autosize.auto_split_table(stats, params.xyz.shape[0],
                                        dup_cap))
    elif entry_cap is None:
        # occupancy depends on geometry/opacity only, not SH degree
        entry_cap = autosize.auto_entry_cap(
            params, meta, settings, poses.all_poses(),
            float(train.fovx[0]), float(train.fovy[0]))
    elif probe_dup_cap:
        dup_cap = autosize.auto_dup_cap(
            params, meta, settings, poses.all_poses(),
            float(train.fovx[0]), float(train.fovy[0]))
        settings = dataclasses.replace(settings,
                                       max_tiles_per_gaussian=dup_cap)
    settings = dataclasses.replace(settings, max_total_entries=entry_cap)

    return SceneBundle(params=params, meta=meta, scene=scene, poses=poses,
                       test_poses=test_poses, settings=settings,
                       train_data=train, test_data=test)
