"""Pallas blend kernel parity vs the XLA path and the float64 oracle
(interpret mode on CPU; the same kernels compile on TPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from das3r_tpu.ops.splat import RasterSettings, rasterize
from das3r_tpu.ops.splat.reference import rasterize_reference
from tests.test_splat import make_camera, make_scene


def run(settings, means, scales, rots, ops, colors, backend, bg=None):
    view, proj, campos, tfx, tfy = make_camera(settings)
    bg = np.zeros(3, np.float32) if bg is None else bg
    img, radii, aux = jax.jit(
        functools.partial(rasterize, settings=settings, backend=backend))(
        jnp.asarray(means), jnp.asarray(ops),
        viewmatrix=jnp.asarray(view), projmatrix=jnp.asarray(proj),
        campos=jnp.asarray(campos), bg=jnp.asarray(bg),
        tan_fovx=tfx, tan_fovy=tfy,
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        colors_precomp=jnp.asarray(colors))
    return np.asarray(img)


class TestPallasForward:
    @pytest.mark.parametrize("k", [128, 256])
    def test_matches_xla(self, k):
        """Same truncation policy, same result — even under tile overflow."""
        rng = np.random.default_rng(10)
        settings = RasterSettings(image_height=64, image_width=64,
                                  sh_degree=0, max_per_tile=k,
                                  max_tiles_per_gaussian=32)
        means, scales, rots, ops, colors = make_scene(300, rng)
        img_p = run(settings, means, scales, rots, ops, colors, "pallas")
        img_x = run(settings, means, scales, rots, ops, colors, "xla")
        np.testing.assert_allclose(img_p, img_x, atol=1e-5)

    def test_matches_oracle_no_overflow(self):
        rng = np.random.default_rng(13)
        settings = RasterSettings(image_height=64, image_width=64,
                                  sh_degree=0, max_per_tile=256,
                                  max_tiles_per_gaussian=64)
        means, scales, rots, ops, colors = make_scene(100, rng)
        img_p = run(settings, means, scales, rots, ops, colors, "pallas")
        view, proj, campos, tfx, tfy = make_camera(settings)
        ref_img, _ = rasterize_reference(
            means, ops, settings, viewmatrix=view, projmatrix=proj,
            campos=campos, bg=np.zeros(3), tan_fovx=tfx, tan_fovy=tfy,
            scales=scales, rotations=rots, colors_precomp=colors)
        np.testing.assert_allclose(img_p, ref_img, atol=2e-4)

    def test_small_k_divisor_of_128(self):
        rng = np.random.default_rng(11)
        settings = RasterSettings(image_height=32, image_width=32,
                                  sh_degree=0, max_per_tile=64,
                                  max_tiles_per_gaussian=16)
        means, scales, rots, ops, colors = make_scene(60, rng)
        img_p = run(settings, means, scales, rots, ops, colors, "pallas")
        img_x = run(settings, means, scales, rots, ops, colors, "xla")
        np.testing.assert_allclose(img_p, img_x, atol=1e-5)

    def test_background_passthrough(self):
        settings = RasterSettings(image_height=32, image_width=32,
                                  sh_degree=0, max_per_tile=64,
                                  max_tiles_per_gaussian=16)
        means = np.asarray([[0, 0, -1.0]], np.float32)  # culled
        img = run(settings, means, np.full((1, 3), .1, np.float32),
                  np.asarray([[1, 0, 0, 0]], np.float32),
                  np.asarray([0.9], np.float32),
                  np.zeros((1, 3), np.float32), "pallas",
                  bg=np.asarray([0.3, 0.6, 0.9], np.float32))
        np.testing.assert_allclose(
            img, np.broadcast_to(np.asarray([0.3, 0.6, 0.9])[:, None, None],
                                 (3, 32, 32)), atol=1e-6)


class TestPallasBackward:
    def test_grads_match_xla_backward(self):
        """Hand-written backward vs autodiff of the XLA path on identical
        inputs: the two must agree to float tolerance."""
        rng = np.random.default_rng(12)
        settings = RasterSettings(image_height=32, image_width=32,
                                  sh_degree=0, max_per_tile=128,
                                  max_tiles_per_gaussian=16)
        means, scales, rots, ops, colors = make_scene(
            48, rng, spread=0.8, z_range=(2.0, 6.0))
        view, proj, campos, tfx, tfy = make_camera(settings)
        weights = rng.standard_normal((3, 32, 32)).astype(np.float32)
        wj = jnp.asarray(weights)

        def loss(backend, means_, scales_, rots_, ops_, colors_, bg_):
            img, _, _ = rasterize(
                means_, ops_, settings,
                viewmatrix=jnp.asarray(view), projmatrix=jnp.asarray(proj),
                campos=jnp.asarray(campos), bg=bg_,
                tan_fovx=tfx, tan_fovy=tfy,
                scales=scales_, rotations=rots_, colors_precomp=colors_,
                backend=backend)
            return jnp.sum(img * wj)

        args = [jnp.asarray(x) for x in
                (means, scales, rots, ops, colors)]
        bg = jnp.asarray([0.2, 0.1, 0.4])
        g_p = jax.grad(functools.partial(loss, "pallas"),
                       argnums=(0, 1, 2, 3, 4, 5))(*args, bg)
        g_x = jax.grad(functools.partial(loss, "xla"),
                       argnums=(0, 1, 2, 3, 4, 5))(*args, bg)
        names = ["means", "scales", "rots", "ops", "colors", "bg"]
        for name, a, b in zip(names, g_p, g_x):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(b).max() + 1e-6
            np.testing.assert_allclose(
                a, b, atol=2e-4 * scale,
                err_msg=f"gradient mismatch for {name}")
