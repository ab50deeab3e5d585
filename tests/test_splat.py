"""Rasterizer acceptance tests (BASELINE config[0]):
tiled XLA forward == brute-force float64 oracle; autodiff backward ==
finite differences of the oracle."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from das3r_tpu.ops.splat import RasterSettings, rasterize
from das3r_tpu.ops.splat.reference import rasterize_reference
from das3r_tpu.utils import transforms


def make_scene(n, rng, spread=1.5, z_range=(2.0, 8.0)):
    """Random Gaussians in front of an identity camera (DAS3R convention:
    viewmatrix = I, Gaussians pre-transformed into the camera frame)."""
    means = np.stack([
        rng.uniform(-spread, spread, n),
        rng.uniform(-spread, spread, n),
        rng.uniform(*z_range, n),
    ], -1).astype(np.float32)
    scales = np.exp(rng.uniform(-3.2, -1.2, (n, 3))).astype(np.float32)
    rotations = rng.standard_normal((n, 4)).astype(np.float32)
    opacities = rng.uniform(0.05, 0.95, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return means, scales, rotations, opacities, colors


def make_camera(settings, fovx=1.1, fovy=1.1, znear=0.01, zfar=100.0):
    P = transforms.projection_matrix(znear, zfar, fovx, fovy)
    projmatrix = np.asarray(P).T  # row-vector form, identity view
    viewmatrix = np.eye(4, dtype=np.float32)
    campos = np.zeros(3, np.float32)
    import math
    return viewmatrix, projmatrix, campos, math.tan(fovx / 2), math.tan(fovy / 2)


def run_both(settings, means, scales, rotations, opacities, colors_or_shs,
             use_shs=False, bg=None):
    view, proj, campos, tfx, tfy = make_camera(settings)
    bg = np.zeros(3, np.float32) if bg is None else bg
    kw = dict(viewmatrix=view, projmatrix=proj, campos=campos, bg=bg,
              tan_fovx=tfx, tan_fovy=tfy, scales=scales, rotations=rotations)
    if use_shs:
        kw["shs"] = colors_or_shs
    else:
        kw["colors_precomp"] = colors_or_shs
    img, radii, aux = jax.jit(
        functools.partial(rasterize, settings=settings),
        static_argnames=(),
    )(jnp.asarray(means), jnp.asarray(opacities),
      **{k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
         for k, v in kw.items()})
    ref_img, ref_radii = rasterize_reference(
        means, opacities, settings, **kw)
    return np.asarray(img), np.asarray(radii), ref_img, ref_radii, aux


class TestForward:
    def test_1k_gaussians_128px(self):
        """The literal BASELINE config[0] scenario."""
        rng = np.random.default_rng(42)
        settings = RasterSettings(image_height=128, image_width=128,
                                  sh_degree=0, max_per_tile=1024,
                                  max_tiles_per_gaussian=64)
        means, scales, rots, ops, colors = make_scene(1000, rng)
        img, radii, ref_img, ref_radii, aux = run_both(
            settings, means, scales, rots, ops, colors)
        assert int(aux.tile_overflow) == 0
        assert int(aux.dup_overflow) == 0
        np.testing.assert_array_equal(radii, ref_radii)
        np.testing.assert_allclose(img, ref_img, atol=2e-4)

    def test_sh_colors(self):
        rng = np.random.default_rng(7)
        settings = RasterSettings(image_height=64, image_width=64,
                                  sh_degree=3, max_per_tile=256,
                                  max_tiles_per_gaussian=32)
        means, scales, rots, ops, _ = make_scene(200, rng)
        shs = (rng.standard_normal((200, 16, 3)) * 0.3).astype(np.float32)
        img, radii, ref_img, ref_radii, _ = run_both(
            settings, means, scales, rots, ops, shs, use_shs=True)
        np.testing.assert_allclose(img, ref_img, atol=2e-4)

    def test_background_and_nonsquare(self):
        rng = np.random.default_rng(3)
        settings = RasterSettings(image_height=48, image_width=80,
                                  sh_degree=0, max_per_tile=256,
                                  max_tiles_per_gaussian=32)
        means, scales, rots, ops, colors = make_scene(150, rng)
        bg = np.asarray([0.9, 0.1, 0.4], np.float32)
        img, _, ref_img, _, _ = run_both(
            settings, means, scales, rots, ops, colors, bg=bg)
        np.testing.assert_allclose(img, ref_img, atol=2e-4)

    def test_near_plane_cull(self):
        """Gaussians with view z <= 0.001 must be dropped (patched cull)."""
        settings = RasterSettings(image_height=32, image_width=32,
                                  sh_degree=0, max_per_tile=64,
                                  max_tiles_per_gaussian=16)
        means = np.asarray([[0, 0, 0.0005], [0, 0, -1.0], [0, 0, 3.0]],
                           np.float32)
        scales = np.full((3, 3), 0.1, np.float32)
        rots = np.tile(np.asarray([1, 0, 0, 0], np.float32), (3, 1))
        ops = np.full(3, 0.9, np.float32)
        colors = np.eye(3, dtype=np.float32)
        img, radii, ref_img, ref_radii, _ = run_both(
            settings, means, scales, rots, ops, colors)
        assert radii[0] == 0 and radii[1] == 0 and radii[2] > 0
        np.testing.assert_array_equal(radii, ref_radii)
        np.testing.assert_allclose(img, ref_img, atol=2e-4)

    def test_empty_scene_renders_bg(self):
        settings = RasterSettings(image_height=32, image_width=32,
                                  sh_degree=0, max_per_tile=64,
                                  max_tiles_per_gaussian=16)
        means = np.zeros((4, 3), np.float32)  # z=0 -> culled
        scales = np.full((4, 3), 0.1, np.float32)
        rots = np.tile(np.asarray([1, 0, 0, 0], np.float32), (4, 1))
        ops = np.full(4, 0.5, np.float32)
        colors = np.zeros((4, 3), np.float32)
        bg = np.asarray([0.2, 0.4, 0.6], np.float32)
        img, radii, ref_img, _, _ = run_both(
            settings, means, scales, rots, ops, colors, bg=bg)
        assert (radii == 0).all()
        np.testing.assert_allclose(
            img, np.broadcast_to(bg[:, None, None], (3, 32, 32)), atol=1e-6)

    def test_opaque_occlusion_early_termination(self):
        """Stack of near-opaque Gaussians: the far ones must not bleed
        through (exercises the 1e-4 transmittance early-out). Opacity is
        chosen so no pixel lands exactly ON the fp32/fp64 boundary —
        opacity 1.0 clips to exactly 0.99 and puts T precisely at 1e-4,
        where the two precisions legitimately diverge (CUDA is fp32 too).
        """
        n = 5
        settings = RasterSettings(image_height=32, image_width=32,
                                  sh_degree=0, max_per_tile=64,
                                  max_tiles_per_gaussian=16)
        means = np.stack([np.zeros(n), np.zeros(n),
                          2.0 + np.arange(n)], -1).astype(np.float32)
        scales = np.full((n, 3), 1.0, np.float32)
        rots = np.tile(np.asarray([1, 0, 0, 0], np.float32), (n, 1))
        ops = np.full(n, 0.95, np.float32)
        colors = np.zeros((n, 3), np.float32)
        colors[0, 0] = 1.0  # front red
        colors[1:, 1] = 1.0  # rest green
        img, _, ref_img, _, _ = run_both(
            settings, means, scales, rots, ops, colors)
        np.testing.assert_allclose(img, ref_img, atol=2e-4)
        center = img[:, 16, 16]
        assert center[0] > 0.94 and center[1] < 0.06


class TestGradients:
    @pytest.fixture()
    def x64(self):
        jax.config.update("jax_enable_x64", True)
        yield
        jax.config.update("jax_enable_x64", False)

    def _loss_args(self, n=24, seed=11):
        rng = np.random.default_rng(seed)
        settings = RasterSettings(image_height=32, image_width=32,
                                  sh_degree=0, max_per_tile=128,
                                  max_tiles_per_gaussian=16)
        means, scales, rots, ops, colors = make_scene(
            n, rng, spread=0.8, z_range=(2.0, 6.0))
        weights = rng.standard_normal((3, 32, 32))
        return settings, means, scales, rots, ops, colors, weights

    def test_grads_match_finite_difference(self, x64):
        (settings, means, scales, rots, ops, colors,
         weights) = self._loss_args()
        view, proj, campos, tfx, tfy = make_camera(settings)
        bg = np.zeros(3)
        wj = jnp.asarray(weights, jnp.float64)

        def loss(means_, scales_, rots_, ops_, colors_):
            img, _, _ = rasterize(
                means_, ops_, settings,
                viewmatrix=jnp.asarray(view, jnp.float64),
                projmatrix=jnp.asarray(proj, jnp.float64),
                campos=jnp.asarray(campos, jnp.float64),
                bg=jnp.asarray(bg, jnp.float64),
                tan_fovx=tfx, tan_fovy=tfy,
                scales=scales_, rotations=rots_, colors_precomp=colors_)
            return jnp.sum(img * wj)

        args = [jnp.asarray(x, jnp.float64)
                for x in (means, scales, rots, ops, colors)]
        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)

        def ref_loss(means_, scales_, rots_, ops_, colors_):
            img, _ = rasterize_reference(
                means_, ops_, settings, viewmatrix=view, projmatrix=proj,
                campos=campos, bg=bg, tan_fovx=tfx, tan_fovy=tfy,
                scales=scales_, rotations=rots_, colors_precomp=colors_)
            return float((img * weights).sum())

        base_args = [np.asarray(x, np.float64)
                     for x in (means, scales, rots, ops, colors)]
        eps = 1e-5
        rng = np.random.default_rng(0)
        for ai, g in enumerate(grads):
            g = np.asarray(g)
            flat = base_args[ai].reshape(-1)
            # probe a random subset of coordinates per tensor
            idxs = rng.choice(flat.size, size=min(12, flat.size),
                              replace=False)
            for idx in idxs:
                pert = [a.copy() for a in base_args]
                pert[ai].reshape(-1)[idx] += eps
                up = ref_loss(*pert)
                pert[ai].reshape(-1)[idx] -= 2 * eps
                dn = ref_loss(*pert)
                fd = (up - dn) / (2 * eps)
                ad = g.reshape(-1)[idx]
                assert ad == pytest.approx(fd, rel=2e-3, abs=2e-5), (
                    f"arg {ai} flat-index {idx}: autodiff {ad} vs fd {fd}")

    def test_mean2d_offset_grad_capture(self, x64):
        """The densification-stats contract: grad w.r.t. the zero offset
        equals the screen-space positional gradient."""
        (settings, means, scales, rots, ops, colors,
         weights) = self._loss_args(n=16, seed=5)
        view, proj, campos, tfx, tfy = make_camera(settings)
        wj = jnp.asarray(weights, jnp.float64)

        def loss(offset):
            img, _, _ = rasterize(
                jnp.asarray(means, jnp.float64),
                jnp.asarray(ops, jnp.float64), settings,
                viewmatrix=jnp.asarray(view, jnp.float64),
                projmatrix=jnp.asarray(proj, jnp.float64),
                campos=jnp.asarray(campos, jnp.float64),
                bg=jnp.zeros(3, jnp.float64),
                tan_fovx=tfx, tan_fovy=tfy,
                scales=jnp.asarray(scales, jnp.float64),
                rotations=jnp.asarray(rots, jnp.float64),
                colors_precomp=jnp.asarray(colors, jnp.float64),
                mean2d_offset=offset)
            return jnp.sum(img * wj)

        g = jax.grad(loss)(jnp.zeros((16, 2), jnp.float64))
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0

    def test_pose_gradients_through_identity_view_trick(self, x64):
        """End-to-end: photometric loss -> camera quaternion/translation,
        the DAS3R learnable-pose path (gaussian_renderer/__init__.py:83-93)."""
        from das3r_tpu.utils import quat as Q
        (settings, means, scales, rots, ops, colors,
         weights) = self._loss_args(n=16, seed=9)
        view, proj, campos, tfx, tfy = make_camera(settings)

        def loss(pose):
            w2c = Q.pose_to_w2c(pose)
            homo = jnp.concatenate(
                [jnp.asarray(means, jnp.float64),
                 jnp.ones((16, 1), jnp.float64)], -1)
            means_cam = (w2c @ homo.T).T[:, :3]
            rots_cam = Q.quat_mul(pose[:4], jnp.asarray(rots, jnp.float64))
            img, _, _ = rasterize(
                means_cam, jnp.asarray(ops, jnp.float64), settings,
                viewmatrix=jnp.asarray(view, jnp.float64),
                projmatrix=jnp.asarray(proj, jnp.float64),
                campos=jnp.asarray(campos, jnp.float64),
                bg=jnp.zeros(3, jnp.float64),
                tan_fovx=tfx, tan_fovy=tfy,
                scales=jnp.asarray(scales, jnp.float64),
                rotations=rots_cam,
                colors_precomp=jnp.asarray(colors, jnp.float64))
            return jnp.sum(img * jnp.asarray(weights, jnp.float64))

        pose0 = jnp.asarray([1.0, 0.01, -0.02, 0.015, 0.05, -0.03, 0.1],
                            jnp.float64)
        g = jax.grad(loss)(pose0)

        # finite differences of the SAME jax loss (oracle cross-check of the
        # rasterizer grads happens in test_grads_match_finite_difference)
        eps = 1e-6
        for i in range(7):
            up = float(loss(pose0.at[i].add(eps)))
            dn = float(loss(pose0.at[i].add(-eps)))
            fd = (up - dn) / (2 * eps)
            assert float(g[i]) == pytest.approx(fd, rel=1e-4, abs=1e-6)


class TestBinningCompaction:
    def test_compacted_matches_exact(self):
        """max_total_entries large enough -> identical image."""
        import dataclasses
        rng = np.random.default_rng(21)
        base = RasterSettings(image_height=64, image_width=64,
                              sh_degree=0, max_per_tile=256,
                              max_tiles_per_gaussian=32)
        compact = dataclasses.replace(base, max_total_entries=300 * 32,
                                      full_sort_below=0)
        means, scales, rots, ops, colors = make_scene(300, rng)
        img_exact, _, _, _, _ = run_both(base, means, scales, rots, ops,
                                         colors)
        img_c, _, _, _, aux = run_both(compact, means, scales, rots, ops,
                                       colors)
        np.testing.assert_allclose(img_c, img_exact, atol=1e-6)

    def test_overflow_drops_farthest(self):
        import dataclasses
        import jax
        from das3r_tpu.ops.splat import preprocess as prep_fn, bin_gaussians
        rng = np.random.default_rng(22)
        settings = dataclasses.replace(
            RasterSettings(image_height=32, image_width=32, sh_degree=0,
                           max_per_tile=64, max_tiles_per_gaussian=16),
            max_total_entries=8, full_sort_below=0)
        means, scales, rots, ops, colors = make_scene(50, rng)
        view, proj, campos, tfx, tfy = make_camera(settings)
        p = prep_fn(jnp.asarray(means), jnp.asarray(ops), settings,
                    viewmatrix=jnp.asarray(view),
                    projmatrix=jnp.asarray(proj),
                    campos=jnp.asarray(campos),
                    colors_precomp=jnp.asarray(colors),
                    scales=jnp.asarray(scales),
                    rotations=jnp.asarray(rots),
                    tan_fovx=tfx, tan_fovy=tfy)
        bins = bin_gaussians(p, settings)
        assert int(bins.entry_overflow) > 0
        assert int(bins.count.sum()) <= 8

    def test_quantized_depth_sort_matches_exact(self):
        """22-bit quantized-depth keys vs exact rank keys: same image for
        scenes without near-coincident depths."""
        import dataclasses
        rng = np.random.default_rng(33)
        base = RasterSettings(image_height=64, image_width=64,
                              sh_degree=0, max_per_tile=256,
                              max_tiles_per_gaussian=32,
                              max_total_entries=300 * 32)
        quant = dataclasses.replace(base, depth_sort_bits=22)
        means, scales, rots, ops, colors = make_scene(300, rng)
        img_e, _, _, _, _ = run_both(base, means, scales, rots, ops, colors)
        img_q, _, ref_img, _, _ = run_both(quant, means, scales, rots, ops,
                                           colors)
        np.testing.assert_allclose(img_q, img_e, atol=1e-6)
        np.testing.assert_allclose(img_q, ref_img, atol=2e-4)


class TestConfidenceRender:
    def test_confidence_mode_renders_staticness(self):
        """mode='confidence': opacity 1, colors = per-gaussian conf -> a
        staticness image (reference render_confidence :410-496)."""
        import jax.numpy as jnp
        from das3r_tpu.models import render as render_mod
        from tests.test_train import build_synthetic_scene
        params, meta, poses, settings = build_synthetic_scene(
            n=100, cap=128, f=2, hw=32)
        conf = jnp.full((128,), 0.25)
        out = render_mod.render(params, meta, settings, poses.pose(0),
                                jnp.zeros(3), jnp.asarray(1.0),
                                jnp.asarray(1.0), mode="confidence",
                                conf_per_gaussian=conf)
        img = np.asarray(out.image)
        assert np.isfinite(img).all()
        # wherever anything is rendered, the value reflects conf=0.25
        covered = img[0] > 0.01
        assert covered.any()
        assert img[0][covered].max() <= 0.26


class TestShDirectionNaNGuard:
    def test_pose_grad_finite_with_origin_camera_and_dead_slots(self):
        """sh_degree>=1 normalizes view directions; dead capacity slots sit
        at xyz=0 and the first rearranged camera is at the origin, so the
        direction norm is exactly 0 there. The safe-norm double-where in
        preprocess must keep pose/xyz grads finite (regression: the iter-3000
        SH bump NaN'd every camera pose in the e2e quality run)."""
        import dataclasses
        from das3r_tpu.models import render as render_mod
        from das3r_tpu.data.synthetic import random_gaussian_scene

        params, meta, poses = random_gaussian_scene(
            200, cap=256, height=32, width=32, seed=0)
        pose = jnp.asarray([1., 0., 0., 0., 0., 0., 0.])  # camera at origin
        bg = jnp.zeros(3)
        s = RasterSettings(image_height=32, image_width=32, sh_degree=1,
                           max_per_tile=1024, max_tiles_per_gaussian=64,
                           max_total_entries=3200)

        def loss_fn(p, pose7):
            out = render_mod.render(p, meta, s, pose7, bg, 1.0, 1.0)
            return jnp.sum(out.image ** 2)

        gp, gpose = jax.grad(loss_fn, argnums=(0, 1))(params, pose)
        assert bool(jnp.isfinite(gpose).all())
        assert bool(jnp.isfinite(gp.xyz).all())
        assert bool(jnp.isfinite(gp.features_rest).all())


def test_permute_rows_vjp_is_inverse_gather():
    """permute_rows: forward equals x[order]; backward equals gathering the
    cotangent by the inverse permutation (the scatter-add XLA would emit
    for a plain gather, but at row-gather cost — docs/PERF.md round 5)."""
    import jax
    import jax.numpy as jnp
    from das3r_tpu.ops.splat.rasterize import permute_rows

    rng = np.random.default_rng(0)
    n = 257
    x = jnp.asarray(rng.normal(size=(n, 9)).astype(np.float32))
    order = jnp.asarray(rng.permutation(n).astype(np.int32))

    y, vjp = jax.vjp(lambda a: permute_rows(a, order), x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x)[order])
    g = jnp.asarray(rng.normal(size=(n, 9)).astype(np.float32))
    (gx,) = vjp(g)
    want = np.zeros((n, 9), np.float32)
    np.add.at(want, np.asarray(order), np.asarray(g))
    np.testing.assert_allclose(np.asarray(gx), want, atol=1e-6)
