"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from das3r_tpu.models import render as render_mod
from das3r_tpu.parallel import make_mesh, sharded
from das3r_tpu.train import step as step_mod
from das3r_tpu.train.config import OptimizationConfig
from tests.test_train import build_synthetic_scene


@pytest.fixture(scope="module")
def scene():
    return build_synthetic_scene(n=120, cap=128, f=4, hw=32, seed=2)


def test_mesh_construction():
    m = make_mesh(data=2, tile=4)
    assert dict(m.shape) == {"data": 2, "gauss": 1, "tile": 4}
    m2 = make_mesh()
    assert (m2.shape["data"] * m2.shape["gauss"] * m2.shape["tile"]
            == len(jax.devices()))
    m3 = make_mesh(data=2, gauss=2, tile=2)
    assert dict(m3.shape) == {"data": 2, "gauss": 2, "tile": 2}
    m4 = make_mesh(gauss=4, tile=2)
    assert dict(m4.shape) == {"data": 1, "gauss": 4, "tile": 2}


def test_sharded_render_matches_single_device(scene):
    params, meta, poses, settings = scene
    bg = jnp.zeros(3)
    fov = jnp.asarray(1.0)
    ref = render_mod.render(params, meta, settings, poses.pose(0), bg, fov,
                            fov, mode="train").image

    mesh = make_mesh(data=2, tile=4)
    with jax.sharding.set_mesh(mesh):
        render_fn = sharded.make_sharded_render(mesh, settings)
        img = render_fn(params, meta, poses.pose(0), bg, fov, fov)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-5)


def test_sharded_train_step_runs_and_matches_grads(scene):
    """The sharded batched step must equal an unsharded batched step
    bit-for-bit (same math, different partitioning)."""
    params, meta, poses, settings = scene
    bg = jnp.zeros(3)
    f = 4
    fovs = jnp.ones(f)
    uids = jnp.arange(f)

    gts = jnp.stack([
        render_mod.render(params, meta, settings, poses.pose(u), bg,
                          fovs[u], fovs[u], mode="train").image
        for u in range(f)])

    # perturb so gradients are non-trivial
    rng = np.random.default_rng(0)
    params0 = params._replace(
        features_dc=params.features_dc + jnp.asarray(
            rng.normal(0, 0.1, params.features_dc.shape), jnp.float32))
    cfg = OptimizationConfig(psnr_threshold=5.0)
    state0 = step_mod.init_train_state(params0, poses)

    mesh = make_mesh(data=2, tile=4)
    with jax.sharding.set_mesh(mesh):
        step = sharded.make_sharded_train_step(mesh, settings, cfg)
        state1, m1 = step(state0, meta, uids, gts, fovs, fovs, bg)
        state1.params.xyz.block_until_ready()

    # unsharded reference of the same batched math
    mesh1 = make_mesh(data=1, tile=1, devices=jax.devices()[:1])
    with jax.sharding.set_mesh(mesh1):
        step_ref = sharded.make_sharded_train_step(mesh1, settings, cfg)
        state2, m2 = step_ref(state0, meta, uids, gts, fovs, fovs, bg)

    assert np.isfinite(float(m1.loss))
    assert float(m1.loss) == pytest.approx(float(m2.loss), rel=1e-5)
    np.testing.assert_allclose(np.asarray(state1.params.features_dc),
                               np.asarray(state2.params.features_dc),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(state1.poses.Q),
                               np.asarray(state2.poses.Q), atol=5e-6)


def test_pallas_sharded_step_matches_unsharded(scene):
    """Tile-sharded Pallas entry-stream blend (shard_map over ``tile``,
    each shard walking its contiguous sub-stream — VERDICT r2 missing #2)
    through the FULL vmapped train step: must reproduce the unsharded
    XLA-blend step numerically, with per-Gaussian gradients psum'd over
    the tile axis at the replicated table's transpose."""
    params, meta, poses, settings = scene
    settings = dataclasses.replace(settings, max_total_entries=8192)
    bg = jnp.zeros(3)
    f = 2
    fovs = jnp.ones(f)
    uids = jnp.arange(f)
    gts = jnp.stack([
        render_mod.render(params, meta, settings, poses.pose(u), bg,
                          fovs[u], fovs[u], mode="train").image
        for u in range(f)])
    rng = np.random.default_rng(3)
    params0 = params._replace(
        features_dc=params.features_dc + jnp.asarray(
            rng.normal(0, 0.1, params.features_dc.shape), jnp.float32))
    cfg = OptimizationConfig(psnr_threshold=5.0)
    state0 = step_mod.init_train_state(params0, poses)

    mesh = make_mesh(data=2, gauss=2, tile=2)
    with jax.sharding.set_mesh(mesh):
        step = sharded.make_sharded_train_step(
            mesh, settings, cfg, gauss_axis="gauss", backend="pallas")
        state1, m1 = step(state0, meta, uids, gts, fovs, fovs, bg)
        state1.params.xyz.block_until_ready()

    mesh1 = make_mesh(data=1, tile=1, devices=jax.devices()[:1])
    with jax.sharding.set_mesh(mesh1):
        step_ref = sharded.make_sharded_train_step(mesh1, settings, cfg)
        state2, m2 = step_ref(state0, meta, uids, gts, fovs, fovs, bg)

    assert np.isfinite(float(m1.loss))
    assert float(m1.loss) == pytest.approx(float(m2.loss), rel=1e-5)
    for a, b in ((state1.params.xyz, state2.params.xyz),
                 (state1.params.features_dc, state2.params.features_dc),
                 (state1.params.opacity, state2.params.opacity),
                 (state1.poses.Q, state2.poses.Q)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_pallas_sharded_render_matches_single_device(scene):
    params, meta, poses, settings = scene
    settings = dataclasses.replace(settings, max_total_entries=8192)
    bg = jnp.zeros(3)
    fov = jnp.asarray(1.0)
    ref = render_mod.render(params, meta, settings, poses.pose(0), bg, fov,
                            fov, mode="train").image

    mesh = make_mesh(data=2, tile=4)
    with jax.sharding.set_mesh(mesh):
        render_fn = sharded.make_sharded_render(mesh, settings,
                                                backend="pallas")
        img = render_fn(params, meta, poses.pose(0), bg, fov, fov)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-5)


def test_gauss_sharded_step_matches_unsharded(scene):
    """Gaussian-axis sharding (params + Adam moments split over ``gauss``,
    prep outputs all-gathered, per-Gaussian grads reduce-scattered) must
    reproduce the unsharded step numerically."""
    params, meta, poses, settings = scene
    bg = jnp.zeros(3)
    f = 2
    fovs = jnp.ones(f)
    uids = jnp.arange(f)
    gts = jnp.stack([
        render_mod.render(params, meta, settings, poses.pose(u), bg,
                          fovs[u], fovs[u], mode="train").image
        for u in range(f)])
    rng = np.random.default_rng(1)
    params0 = params._replace(
        xyz=params.xyz + jnp.asarray(
            rng.normal(0, 0.01, params.xyz.shape), jnp.float32))
    cfg = OptimizationConfig(psnr_threshold=5.0)
    state0 = step_mod.init_train_state(params0, poses)

    mesh = make_mesh(data=2, gauss=2, tile=2)
    with jax.sharding.set_mesh(mesh):
        step = sharded.make_sharded_train_step(mesh, settings, cfg,
                                               gauss_axis="gauss")
        state1, m1 = step(state0, meta, uids, gts, fovs, fovs, bg)
        state1.params.xyz.block_until_ready()
        # param/opt leaves actually live sharded over gauss
        shard_spec = state1.params.xyz.sharding.spec
        assert shard_spec[0] == "gauss", shard_spec

    mesh1 = make_mesh(data=1, tile=1, devices=jax.devices()[:1])
    with jax.sharding.set_mesh(mesh1):
        step_ref = sharded.make_sharded_train_step(mesh1, settings, cfg)
        state2, m2 = step_ref(state0, meta, uids, gts, fovs, fovs, bg)

    assert np.isfinite(float(m1.loss))
    assert float(m1.loss) == pytest.approx(float(m2.loss), rel=1e-5)
    for a, b in ((state1.params.xyz, state2.params.xyz),
                 (state1.params.features_dc, state2.params.features_dc),
                 (state1.params.opacity, state2.params.opacity),
                 (state1.poses.Q, state2.poses.Q)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


class TestHloStats:
    """Collective-bytes accounting (scripts/bench_scaling.py --collectives):
    backend-independent comm volume from the optimized HLO."""

    def test_shape_bytes(self):
        from das3r_tpu.parallel import hlo_stats
        assert hlo_stats.shape_bytes("f32[128,3]") == 128 * 3 * 4
        assert hlo_stats.shape_bytes("bf16[16]") == 32
        assert hlo_stats.shape_bytes("pred[7]") == 7
        assert hlo_stats.shape_bytes("f32[]") == 4
        assert hlo_stats.shape_bytes("token[]") == 0

    def test_counts_psum_all_reduce(self):
        from das3r_tpu.parallel import hlo_stats
        from jax.sharding import PartitionSpec as P
        mesh = make_mesh(data=1, tile=8)

        def f(x):
            return jax.lax.psum(x, "tile")

        fn = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P("tile"),
                                   out_specs=P()))
        txt = fn.lower(jnp.ones((1024,), jnp.float32)).compile().as_text()
        stats = hlo_stats.collective_bytes(txt)
        assert "all-reduce" in stats, stats
        # per-device shard is [128] f32 -> 512 B reduced buffer
        assert stats["all-reduce"]["bytes"] == 512, stats
        assert stats["all-reduce"]["count"] == 1, stats

    def test_async_pairs_counted_once(self):
        from das3r_tpu.parallel import hlo_stats
        txt = """
  %ag0 = f32[64]{0} all-gather-start(f32[8]{0} %x), dimensions={0}
  %ag1 = f32[64]{0} all-gather-done(f32[64]{0} %ag0)
  %ar = (f32[16]{0}, f32[16]{0}) all-reduce(f32[16]{0} %a, f32[16]{0} %b)
"""
        stats = hlo_stats.collective_bytes(txt)
        assert stats["all-gather"] == {"bytes": 256, "count": 1}
        assert stats["all-reduce"] == {"bytes": 128, "count": 1}
