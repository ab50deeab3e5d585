"""Quality-parity evidence (VERDICT round-1 item 3a): the fp32 TPU-oriented
trainer must track a float64 run of the same trainer (same init, same
schedule) on a synthetic scene — the PSNR trajectories may not diverge.

This is the strongest end-to-end numerical check available without real
checkpoints/datasets: every stage (preprocess, binning, blend, loss, Adam)
runs at both precisions and any systematic fp32 bias would show up as a
trajectory split. The fp64 FORWARD is itself validated against the
independent NumPy oracle in test_splat.py/test_pallas_blend.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from das3r_tpu.train import step as step_mod
from das3r_tpu.train.config import OptimizationConfig
from das3r_tpu.utils.image import psnr
from tests.test_train import build_synthetic_scene


def _perturb(params, seed=5):
    rng = np.random.default_rng(seed)
    return params._replace(
        xyz=params.xyz + jnp.asarray(
            rng.normal(0, 0.02, params.xyz.shape), params.xyz.dtype),
        features_dc=params.features_dc + jnp.asarray(
            rng.normal(0, 0.15, params.features_dc.shape),
            params.features_dc.dtype))


def _run_trajectory(params, meta, poses, settings, gts, cfg, iters, every):
    from das3r_tpu.models import render as render_mod
    f = gts.shape[0]
    # train_step donates its state: copy so the caller's params survive
    params, poses = jax.tree.map(jnp.copy, (params, poses))
    state = step_mod.init_train_state(params, poses)
    bg = jnp.zeros(3, params.xyz.dtype)
    fov = jnp.asarray(1.0, params.xyz.dtype)
    traj = []
    for it in range(iters):
        uid = jnp.asarray(it % f)
        state, meta, _ = step_mod.train_step(
            state, meta, uid, gts[it % f], fov, fov, bg,
            settings=settings, cfg=cfg)
        if (it + 1) % every == 0:
            img = render_mod.render(state.params, meta, settings,
                                    state.poses.pose(0), bg, fov, fov,
                                    mode="train").image
            traj.append(float(psnr(img, gts[0]).mean()))
    return traj


@pytest.mark.slow
def test_fp32_trainer_tracks_fp64_oracle_trainer():
    params, meta, poses, settings = build_synthetic_scene(
        n=160, cap=256, f=3, hw=64, seed=0)
    from das3r_tpu.models import render as render_mod
    bg = jnp.zeros(3)
    fov = jnp.asarray(1.0)
    gts = jnp.stack([
        render_mod.render(params, meta, settings, poses.pose(u), bg,
                          fov, fov, mode="train").image
        for u in range(3)])

    cfg = OptimizationConfig(psnr_threshold=100.0)   # no camera steps
    p0 = _perturb(params)
    iters, every = 120, 20

    traj32 = _run_trajectory(p0, meta, poses, settings, gts, cfg,
                             iters, every)

    jax.config.update("jax_enable_x64", True)
    try:
        to64 = lambda t: jax.tree.map(
            lambda x: (jnp.asarray(x, jnp.float64)
                       if jnp.issubdtype(x.dtype, jnp.floating) else x), t)
        traj64 = _run_trajectory(to64(p0), to64(meta), to64(poses), settings,
                                 to64(gts), cfg, iters, every)
    finally:
        jax.config.update("jax_enable_x64", False)

    traj32 = np.asarray(traj32)
    traj64 = np.asarray(traj64)
    # training works at all...
    assert traj32[-1] > traj32[0] + 1.0
    # ...and fp32 tracks the fp64 trajectory to a fraction of a dB
    np.testing.assert_allclose(traj32, traj64, atol=0.3)
