"""Optical-flow precomputation for the alignment flow loss — the
``PointCloudOptimizer.get_flow`` equivalent (reference cloud_opt/
optimizer.py:117-151): RAFT fwd+bwd over every edge in fixed-size chunks,
plus OccMask flow-consistency validity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from das3r_tpu.predictor.raft import RAFT, RaftConfig
from das3r_tpu.predictor.warping import occlusion_valid_mask


def load_flow_model(ckpt_path: str):
    """Mirror the reference's model choice (third_party/raft.py:39-73):
    checkpoints with 'M' in the name are SEA-RAFT (RAFT2), others classic
    RAFT. Returns (flax module, params)."""
    import torch
    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = {k.replace("module.", ""): v.numpy() for k, v in sd.items()}
    import os
    import jax
    if "M" in os.path.basename(ckpt_path):
        from das3r_tpu.predictor.searaft import (SeaRaft,
                                                 convert_searaft_state_dict)
        return SeaRaft(), jax.tree.map(jnp.asarray,
                                       convert_searaft_state_dict(sd))
    from das3r_tpu.predictor.raft import convert_raft_state_dict
    return RAFT(), jax.tree.map(jnp.asarray, convert_raft_state_dict(sd))


def compute_edge_flows(raft_params, images01: np.ndarray, edges: list,
                       iters: int = 20, chunk: int = 12,
                       occ_threshold: float = 3.0, model=None):
    """Returns (flow_ij [E,2,H,W], flow_ji, valid_i [E,1,H,W] bool,
    valid_j) as jnp arrays, ready for ``alignment.optimize(flows=...)``."""
    model = model or RAFT(RaftConfig())
    imgs = jnp.asarray(images01, jnp.float32) * 255.0

    @jax.jit
    def flow_fn(a, b):
        return model.apply({"params": raft_params}, a, b, iters=iters)

    ei = np.asarray([i for i, _ in edges])
    ej = np.asarray([j for _, j in edges])
    f_ij, f_ji = [], []
    for s in range(0, len(edges), chunk):
        bi = jnp.asarray(ei[s:s + chunk])
        bj = jnp.asarray(ej[s:s + chunk])
        f_ij.append(flow_fn(imgs[bi], imgs[bj]))
        f_ji.append(flow_fn(imgs[bj], imgs[bi]))
    flow_ij = jnp.concatenate(f_ij, 0)
    flow_ji = jnp.concatenate(f_ji, 0)
    valid_i = occlusion_valid_mask(flow_ij, flow_ji, th=occ_threshold)
    valid_j = occlusion_valid_mask(flow_ji, flow_ij, th=occ_threshold)
    return flow_ij, flow_ji, valid_i, valid_j
