"""Checkpoint / artifact I/O for stage-2 training.

Mirrors the reference's persistence surface (SURVEY.md §5 'Checkpoint /
resume'): full training-state checkpoints incl. both Adam states and the
pose stacks (gaussian_model.capture/restore + chkpnt<N>.pth), PLY scene
snapshots in the dual-opacity schema, and pose npy dumps
(train_gui.save_pose :467-480 — stacks of 4x4 w2c matrices).

Format: a single .npz of flattened pytree leaves (portable, no torch/orbax
dependency); orbax can be layered on for multi-host async later.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from das3r_tpu.models.gaussians import (
    GaussianMeta, GaussianParams, PoseParams, TestPoseParams, per_gaussian_conf)
from das3r_tpu.data import ply as ply_io
from das3r_tpu.train import optim
from das3r_tpu.train.step import TrainState
from das3r_tpu.utils.quat import pose_to_w2c


def _flatten_with_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(path): np.asarray(leaf)
            for path, leaf in flat}


def save_train_state(path: str, state: TrainState,
                     meta: GaussianMeta | None = None) -> None:
    """Full resumable checkpoint. ``meta`` (alive mask + densification
    stats) is stored under a ``meta:`` prefix when given — required for
    bit-exact resume of densifying runs."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = _flatten_with_paths(state)
    if meta is not None:
        payload.update({"meta:" + k: v
                        for k, v in _flatten_with_paths(meta).items()})
    np.savez_compressed(path, **payload)


def _unflatten_from(data, template, prefix=""):
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for pathk, leaf in flat:
        key = prefix + jax.tree_util.keystr(pathk)
        arr = jnp.asarray(data[key])
        assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
        leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_train_state(path: str, template: TrainState,
                     meta_template: GaussianMeta | None = None):
    """Returns TrainState, or (TrainState, GaussianMeta | None) when
    ``meta_template`` is given (None if the file predates meta saving)."""
    data = np.load(path)
    state = _unflatten_from(data, template)
    if meta_template is None:
        return state
    has_meta = any(k.startswith("meta:") for k in data.files)
    meta = (_unflatten_from(data, meta_template, prefix="meta:")
            if has_meta else None)
    return state, meta


def save_scene_ply(path: str, params: GaussianParams,
                   meta: GaussianMeta) -> None:
    """PLY snapshot of LIVE Gaussians (capacity padding stripped) in the
    reference dual-opacity schema."""
    alive = np.asarray(meta.alive)
    conf = np.asarray(per_gaussian_conf(params, meta))
    ply_io.write_gaussians(
        path,
        xyz=np.asarray(params.xyz)[alive],
        f_dc=np.asarray(params.features_dc)[alive],
        f_rest=np.asarray(params.features_rest)[alive],
        opacity_logit=np.asarray(params.opacity)[alive],
        conf_per_gaussian=conf[alive],
        scaling=np.asarray(params.scaling)[alive],
        rotation=np.asarray(params.rotation)[alive])


def save_pose_npy(path: str, poses: PoseParams | TestPoseParams) -> None:
    """[F, 4, 4] w2c stack (the save_pose artifact)."""
    pose7 = jnp.concatenate([poses.Q, poses.T], -1)
    w2c = np.asarray(pose_to_w2c(pose7))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path, w2c)
