"""Densify/prune machinery: pruning, cloning, splitting, capacity growth —
all under jit with static shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from das3r_tpu.models import densify
from das3r_tpu.train.optim import adam_init
from tests.test_train import build_synthetic_scene


def setup_scene(n=50, cap=128):
    params, meta, poses, settings = build_synthetic_scene(n=n, cap=cap,
                                                          f=2, hw=32)
    opt = adam_init(params)
    return params, meta, opt


class TestStats:
    def test_accumulates_only_visible(self):
        params, meta, opt = setup_scene()
        cap = meta.alive.shape[0]
        grads = jnp.ones((cap, 2))
        radii = jnp.zeros(cap, jnp.int32).at[:10].set(5)
        meta2 = densify.add_densification_stats(meta, grads, radii)
        acc = np.asarray(meta2.xyz_grad_accum)
        assert acc[:10] == pytest.approx(np.sqrt(2.0))
        assert (acc[10:] == 0).all()
        assert np.asarray(meta2.denom)[:10].sum() == 10


class TestPrune:
    def test_prunes_low_opacity(self):
        params, meta, opt = setup_scene()
        # make 5 alive gaussians transparent
        params = params._replace(
            opacity=params.opacity.at[:5].set(-10.0))  # sigmoid ~ 4.5e-5
        cfg = densify.DensifyConfig(min_opacity=0.005)
        key = jax.random.PRNGKey(0)
        p2, m2, o2, rep = jax.jit(
            lambda p, m, o, k: densify.densify_and_prune(p, m, o, k, cfg)
        )(params, meta, opt, key)
        assert int(rep.n_pruned) == 5
        assert not bool(m2.alive[0])
        assert int(m2.alive.sum()) == int(meta.alive.sum()) - 5
        # pruned slots have dead opacity
        assert float(p2.opacity[0, 0]) <= -1e3


class TestCloneSplit:
    def test_clone_into_free_slots(self):
        params, meta, opt = setup_scene(n=50, cap=128)
        meta = meta._replace(
            xyz_grad_accum=meta.xyz_grad_accum.at[:8].set(1.0),
            denom=meta.denom.at[:].set(1.0))
        # small scales -> clone path
        params = params._replace(scaling=params.scaling.at[:].set(-5.0))
        cfg = densify.DensifyConfig(grad_threshold=0.5, enable_clone=True,
                                    extent=10.0)
        p2, m2, o2, rep = densify.densify_and_prune(
            params, meta, opt, jax.random.PRNGKey(0), cfg)
        assert int(rep.n_cloned) == 8
        assert int(m2.alive.sum()) == 50 + 8
        # a cloned row equals its source row
        src = np.asarray(params.xyz[:8])
        new_alive = np.asarray(m2.alive)
        new_xyz = np.asarray(p2.xyz)[new_alive]
        for row in src:
            assert (np.abs(new_xyz - row).sum(1) < 1e-6).sum() >= 2

    def test_split_removes_original_and_adds_two(self):
        params, meta, opt = setup_scene(n=20, cap=128)
        meta = meta._replace(
            xyz_grad_accum=meta.xyz_grad_accum.at[:4].set(1.0),
            denom=meta.denom.at[:].set(1.0))
        # big scales -> split path
        params = params._replace(scaling=params.scaling.at[:4].set(1.0))
        cfg = densify.DensifyConfig(grad_threshold=0.5, enable_split=True,
                                    split_n=2, percent_dense=0.01,
                                    extent=1.0)
        p2, m2, o2, rep = densify.densify_and_prune(
            params, meta, opt, jax.random.PRNGKey(1), cfg)
        assert int(rep.n_split) == 8  # children actually written
        # 20 alive - 4 split originals + 8 children
        assert int(m2.alive.sum()) == 20 - 4 + 8
        # EVERY child's scale is exp(s)/(0.8*N) — exactly one shrink, never a
        # compounded one (free_list overlap bug: children must be sourced from
        # pre-write rows even when a destination slot aliases a source row)
        child_scale = np.exp(1.0) / (0.8 * 2)
        scales_alive = np.exp(np.asarray(p2.scaling)[np.asarray(m2.alive)])
        is_child = np.abs(scales_alive - child_scale).max(1) < 1e-4
        assert is_child.sum() == 8
        # and no row carries a double-shrunk scale exp(s)/(0.8*N)^2
        double = np.exp(1.0) / (0.8 * 2) ** 2
        assert not (np.abs(scales_alive - double).max(1) < 1e-4).any()

    def test_overflow_reported(self):
        params, meta, opt = setup_scene(n=120, cap=128)
        meta = meta._replace(
            xyz_grad_accum=meta.xyz_grad_accum.at[:50].set(1.0),
            denom=meta.denom.at[:].set(1.0))
        params = params._replace(scaling=params.scaling.at[:].set(-5.0))
        cfg = densify.DensifyConfig(grad_threshold=0.5, enable_clone=True,
                                    extent=10.0)
        p2, m2, o2, rep = densify.densify_and_prune(
            params, meta, opt, jax.random.PRNGKey(2), cfg)
        assert int(rep.n_overflow) > 0
        assert int(m2.alive.sum()) == 128  # filled to capacity

    def test_grow_capacity(self):
        params, meta, opt = setup_scene(n=50, cap=64)
        p2, m2, o2 = densify.grow_capacity(params, meta, opt, extra=64)
        assert p2.xyz.shape[0] == 128
        assert m2.alive.shape[0] == 128
        assert int(m2.alive.sum()) == 50
        np.testing.assert_array_equal(np.asarray(p2.xyz[:64]),
                                      np.asarray(params.xyz))
        # render still works after growth
        from das3r_tpu.models import render as render_mod
        from das3r_tpu.ops.splat import RasterSettings
        settings = RasterSettings(image_height=32, image_width=32,
                                  sh_degree=0, max_per_tile=128,
                                  max_tiles_per_gaussian=16)
        pose = jnp.asarray([1.0, 0, 0, 0, 0, 0, 0])
        out = render_mod.render(p2, m2, settings, pose, jnp.zeros(3),
                                jnp.asarray(1.0), jnp.asarray(1.0),
                                mode="no_soft")
        assert np.isfinite(np.asarray(out.image)).all()
