"""Densification & pruning with capacity-padded static shapes.

Functional re-design of the reference's optimizer-surgery approach
(scene/gaussian_model.py:436-570: densify_and_clone :537, densify_and_split
:512, densify_and_prune :552, add_densification_stats :568): instead of
concatenating tensors and rebuilding Adam state, new Gaussians are scattered
into dead capacity slots (their Adam moments are zeros — exactly what the
reference's ``cat_tensors_to_optimizer`` writes for appended rows) and
pruning just clears the alive mask. Shapes never change under jit; when
free slots run out the host grows capacity (``grow_capacity``) and recompiles
once.

The reference ships with clone/split commented out (train_gui.py:612-623,
gaussian_model.py:556-557) and only prunes; both paths are implemented and
flag-gated here so the full INRIA behavior is available.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from das3r_tpu.models.gaussians import GaussianMeta, GaussianParams
from das3r_tpu.train.optim import AdamState
from das3r_tpu.utils.quat import quat_to_rotmat


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    grad_threshold: float = 2e-4
    min_opacity: float = 0.005
    percent_dense: float = 0.01
    split_n: int = 2
    max_screen_size: float = 0.0      # 0 = disabled (no size pruning)
    extent: float = 1.0
    enable_clone: bool = False        # reference default: disabled
    enable_split: bool = False        # reference default: disabled


class DensifyReport(NamedTuple):
    n_cloned: jax.Array
    n_split: jax.Array
    n_pruned: jax.Array
    n_overflow: jax.Array   # candidates dropped for lack of free slots


def add_densification_stats(meta: GaussianMeta, mean2d_grad: jax.Array,
                            radii: jax.Array) -> GaussianMeta:
    """Accumulate screen-space gradient norms over visible Gaussians
    (reference :568-570; visibility_filter == radii > 0)."""
    vis = (radii > 0) & meta.alive
    gnorm = jnp.linalg.norm(mean2d_grad, axis=-1)
    return meta._replace(
        xyz_grad_accum=meta.xyz_grad_accum + jnp.where(vis, gnorm, 0.0),
        denom=meta.denom + vis.astype(meta.denom.dtype),
        max_radii2d=jnp.maximum(meta.max_radii2d,
                                jnp.where(vis, radii.astype(jnp.float32),
                                          0.0)))


def _scatter_rows(dst, src, src_idx, dst_idx, do):
    """dst[dst_idx[k]] = src[src_idx[k]] where do[k] (all [Nc]-sized)."""
    gathered = src[src_idx]
    safe_dst = jnp.where(do, dst_idx, 0)
    updates = jnp.where(
        do.reshape((-1,) + (1,) * (dst.ndim - 1)), gathered, dst[safe_dst])
    return dst.at[safe_dst].set(updates)


def densify_and_prune(params: GaussianParams, meta: GaussianMeta,
                      opt_state: AdamState, key: jax.Array,
                      cfg: DensifyConfig):
    """One densification round. Returns (params, meta, opt_state, report).

    Adam moments of the main group are cleared for every written slot
    (matching the zeros the reference appends) and kept for survivors.
    """
    nc = params.xyz.shape[0]
    alive = meta.alive
    scales = jnp.exp(params.scaling)
    max_scale = scales.max(-1)
    opacity = jax.nn.sigmoid(params.opacity[:, 0])

    grads = jnp.where(meta.denom > 0, meta.xyz_grad_accum / meta.denom, 0.0)
    hot = alive & (grads >= cfg.grad_threshold)
    small = max_scale <= cfg.percent_dense * cfg.extent
    clone_mask = hot & small if cfg.enable_clone else jnp.zeros(nc, bool)
    split_mask = hot & ~small if cfg.enable_split else jnp.zeros(nc, bool)

    prune_mask = alive & (opacity < cfg.min_opacity)
    if cfg.max_screen_size > 0:
        prune_mask |= alive & ((meta.max_radii2d > cfg.max_screen_size)
                               | (max_scale > 0.1 * cfg.extent))
    prune_mask |= split_mask          # split originals are removed (ref :534)

    # --- free-slot allocation (ranked): dead slots sorted first
    idx = jnp.arange(nc, dtype=jnp.int32)
    free_after_prune = ~alive | prune_mask
    free_list = jnp.argsort(jnp.where(free_after_prune, idx, nc + idx))
    n_free = free_after_prune.sum()

    clone_rank = jnp.cumsum(clone_mask) - 1            # rank among clones
    n_clones_want = clone_mask.sum()
    split_rank = jnp.cumsum(split_mask) - 1

    new_alive = alive & ~prune_mask

    # Sources are ALWAYS the pre-write rows: free_list contains the split
    # originals' own slots (they are pruned), so a clone/split write may land
    # in a row a later pass still needs to read. Snapshot before any write.
    src_params = params

    def write_new(params, opt_state, new_alive, dst_slots, do,
                  transform=None):
        """Copy candidate rows k -> free_list[dst_slots[k]]; zero their Adam
        moments. Non-candidates scatter into a sentinel row (nc) that is
        dropped — candidate destinations are unique, so the scatter is
        race-free."""
        do = do & (dst_slots < n_free) & (dst_slots < nc)
        dst_ext = jnp.where(do, free_list[jnp.clip(dst_slots, 0, nc - 1)],
                            nc)

        def scatter_rows(arr, rows):
            ext = jnp.concatenate([arr, jnp.zeros_like(arr[:1])], 0)
            return ext.at[dst_ext].set(rows)[:nc]

        fields = {}
        for name in ("xyz", "features_dc", "features_rest", "scaling",
                     "rotation", "opacity"):
            arr = getattr(params, name)
            rows = getattr(src_params, name)
            if transform and name in transform:
                rows = transform[name](rows)
            fields[name] = scatter_rows(arr, rows)
        new_params = params._replace(**fields)

        def zero_moments(arr):
            if not hasattr(arr, "ndim") or arr.ndim == 0 \
                    or arr.shape[0] != nc:
                return arr
            return scatter_rows(arr, jnp.zeros_like(arr))

        new_opt = AdamState(count=opt_state.count,
                            mu=jax.tree.map(zero_moments, opt_state.mu),
                            nu=jax.tree.map(zero_moments, opt_state.nu))
        alive_ext = jnp.concatenate([new_alive, jnp.zeros(1, bool)])
        new_alive = alive_ext.at[dst_ext].set(True)[:nc]
        return new_params, new_opt, new_alive

    # clones: verbatim copies
    do_clone = clone_mask & (clone_rank < n_free)
    params, opt_state, new_alive = write_new(
        params, opt_state, new_alive, clone_rank, do_clone)

    # splits: cfg.split_n samples from N(0, scale) rotated into world,
    # scale shrunk by 0.8 * N (reference :521-527)
    n_clone_used = do_clone.sum()
    reports_overflow = (n_clones_want - n_clone_used)
    key_iter = jax.random.split(key, cfg.split_n)
    R = quat_to_rotmat(src_params.rotation)
    n_split_written = jnp.zeros((), jnp.int32)
    for s in range(cfg.split_n):
        noise = jax.random.normal(key_iter[s], src_params.xyz.shape) * scales
        offset = jnp.einsum("nij,nj->ni", R, noise)
        transform = {
            "xyz": lambda rows, o=offset: rows + o,
            "scaling": lambda rows: rows - jnp.log(0.8 * cfg.split_n),
        }
        slot = n_clone_used + split_rank * cfg.split_n + s
        do_split = split_mask & (slot < n_free)
        params, opt_state, new_alive = write_new(
            params, opt_state, new_alive, slot, do_split,
            transform=transform)
        reports_overflow += (split_mask.sum() - do_split.sum())
        n_split_written += do_split.sum().astype(jnp.int32)

    # dead slots: force opacity to -inf-ish so they are never binned
    params = params._replace(
        opacity=jnp.where(new_alive[:, None], params.opacity, -1e4))

    meta = meta._replace(
        alive=new_alive,
        xyz_grad_accum=jnp.zeros_like(meta.xyz_grad_accum),
        denom=jnp.zeros_like(meta.denom),
        max_radii2d=jnp.zeros_like(meta.max_radii2d))
    report = DensifyReport(
        n_cloned=n_clone_used.astype(jnp.int32),
        n_split=n_split_written,
        n_pruned=prune_mask.sum().astype(jnp.int32),
        n_overflow=reports_overflow.astype(jnp.int32))
    return params, meta, opt_state, report


def reset_opacity(params: GaussianParams, opt_state: AdamState,
                  max_opacity: float = 0.01):
    """Clamp every opacity to at most ``max_opacity`` and clear the opacity
    leaf's Adam moments (reference ``reset_opacity`` + its
    ``replace_tensor_to_optimizer`` state wipe, gaussian_model.py:426-434,
    445-461; invoked every opacity_reset_interval iters,
    train_gui.py:618-623)."""
    logit = jnp.log(max_opacity / (1.0 - max_opacity))
    new_opacity = jnp.minimum(params.opacity, logit)
    new_opt = AdamState(
        count=opt_state.count,
        mu=opt_state.mu._replace(opacity=jnp.zeros_like(opt_state.mu.opacity)),
        nu=opt_state.nu._replace(opacity=jnp.zeros_like(opt_state.nu.opacity)))
    return params._replace(opacity=new_opacity), new_opt


def grow_capacity(params: GaussianParams, meta: GaussianMeta,
                  opt_state: AdamState, extra: int):
    """Host-side capacity growth (recompiles downstream jits once)."""
    def pad(arr, fill=0.0):
        if arr.ndim == 0 or arr.shape[0] != meta.alive.shape[0]:
            return arr
        pad_block = jnp.full((extra,) + arr.shape[1:], fill, arr.dtype)
        return jnp.concatenate([arr, pad_block], 0)

    new_params = params._replace(
        xyz=pad(params.xyz), features_dc=pad(params.features_dc),
        features_rest=pad(params.features_rest),
        scaling=pad(params.scaling),
        rotation=jnp.concatenate(
            [params.rotation,
             jnp.tile(jnp.asarray([1., 0, 0, 0]), (extra, 1))], 0),
        opacity=pad(params.opacity, fill=-1e4))
    new_meta = GaussianMeta(
        alive=jnp.concatenate([meta.alive, jnp.zeros(extra, bool)]),
        pix_id=pad(meta.pix_id).astype(jnp.int32),
        max_radii2d=pad(meta.max_radii2d),
        xyz_grad_accum=pad(meta.xyz_grad_accum),
        denom=pad(meta.denom))
    new_opt = AdamState(count=opt_state.count,
                        mu=jax.tree.map(pad, opt_state.mu),
                        nu=jax.tree.map(pad, opt_state.nu))
    return new_params, new_meta, new_opt
