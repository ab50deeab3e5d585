"""Stage-1 model tests: layout-rule oracles vs torch, converter/model
structure agreement, forward smoke + activation contracts."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from das3r_tpu.models.croco.blocks import PatchEmbed
from das3r_tpu.models.croco.convert import convert_torch_state_dict
from das3r_tpu.models.croco.dpt import PixelShuffleUp, resize_bilinear_ac
from das3r_tpu.models.croco.dust3r import AsymmetricCroCo3D, Dust3rConfig

from das3r_tpu.models.croco.testkit import TINY, random_torch_state_dict  # noqa: E501


class TestLayoutOracles:
    def test_patchify_equals_torch_conv(self):
        rng = np.random.default_rng(0)
        img = rng.standard_normal((2, 3, 32, 48)).astype(np.float32)
        w = rng.standard_normal((64, 3, 16, 16)).astype(np.float32) * 0.02
        b = rng.standard_normal(64).astype(np.float32)

        ref = torch.nn.functional.conv2d(
            torch.from_numpy(img), torch.from_numpy(w),
            torch.from_numpy(b), stride=16)
        ref = ref.flatten(2).transpose(1, 2).numpy()  # B, N, C

        pe = PatchEmbed(16, 64)
        params = {"proj": {"kernel": jnp.asarray(w.reshape(64, -1).T),
                           "bias": jnp.asarray(b)}}
        out, pos = pe.apply({"params": params}, jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
        # positions are (y, x)
        np.testing.assert_array_equal(np.asarray(pos[0, :3]),
                                      [[0, 0], [0, 1], [0, 2]])

    def test_pixelshuffle_equals_torch_convtranspose(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 5, 7, 12)).astype(np.float32)  # NHWC
        w = rng.standard_normal((12, 9, 4, 4)).astype(np.float32) * 0.1
        b = rng.standard_normal(9).astype(np.float32)
        ref = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
            torch.from_numpy(b), stride=4).numpy().transpose(0, 2, 3, 1)

        ps = PixelShuffleUp(9, 4)
        params = {"proj": {"kernel": jnp.asarray(w.reshape(12, -1)),
                           "bias": jnp.asarray(np.repeat(b, 16))}}
        out = ps.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_resize_matches_torch_align_corners(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, 6, 9, 4)).astype(np.float32)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2,
            mode="bilinear", align_corners=True
        ).numpy().transpose(0, 2, 3, 1)
        out = resize_bilinear_ac(jnp.asarray(x), 12, 18)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_rope_matches_torch_reference(self):
        """Independent torch implementation of croco RoPE2D semantics."""
        from das3r_tpu.models.croco.rope import rope_2d
        rng = np.random.default_rng(3)
        B, H, N, D = 2, 3, 6, 16
        tok = rng.standard_normal((B, H, N, D)).astype(np.float32)
        pos = rng.integers(0, 7, (B, N, 2))

        def torch_rope1d(t, p1d, base):
            Dh = t.shape[-1]
            inv = 1.0 / (base ** (torch.arange(0, Dh, 2).float() / Dh))
            ang = p1d.float()[..., None] * inv  # [B, H, N, Dh/2]
            ang = torch.cat([ang, ang], -1)
            cos, sin = ang.cos(), ang.sin()
            x1, x2 = t.chunk(2, -1)
            rot = torch.cat([-x2, x1], -1)
            return t * cos + rot * sin

        t = torch.from_numpy(tok)
        p = torch.from_numpy(pos)
        y, x = t.chunk(2, -1)
        ref = torch.cat([
            torch_rope1d(y, p[:, None, :, 0], 100.0),
            torch_rope1d(x, p[:, None, :, 1], 100.0)], -1).numpy()
        out = rope_2d(jnp.asarray(tok), jnp.asarray(pos))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

class TestConverterAndModel:
    def test_converted_tree_matches_flax_init(self):
        rng = np.random.default_rng(4)
        model = AsymmetricCroCo3D(TINY)
        img = jnp.zeros((1, 3, 32, 48))
        init_params = model.init(jax.random.PRNGKey(0), img, img)["params"]

        torch_sd = random_torch_state_dict(TINY, rng)
        conv = convert_torch_state_dict(torch_sd, TINY)
        conv = jax.tree.map(jnp.asarray, conv)

        flat_init = jax.tree_util.tree_flatten_with_path(init_params)[0]
        flat_conv = jax.tree_util.tree_flatten_with_path(conv)[0]
        paths_init = {jax.tree_util.keystr(k): v.shape
                      for k, v in flat_init}
        paths_conv = {jax.tree_util.keystr(k): v.shape
                      for k, v in flat_conv}
        missing = set(paths_init) - set(paths_conv)
        extra = set(paths_conv) - set(paths_init)
        assert not missing, f"converter missing: {sorted(missing)[:8]}"
        assert not extra, f"converter extra: {sorted(extra)[:8]}"
        for k in paths_init:
            assert paths_init[k] == paths_conv[k], (
                k, paths_init[k], paths_conv[k])

    def test_forward_contract(self):
        rng = np.random.default_rng(5)
        model = AsymmetricCroCo3D(TINY)
        torch_sd = random_torch_state_dict(TINY, rng)
        params = jax.tree.map(jnp.asarray,
                              convert_torch_state_dict(torch_sd, TINY))
        img1 = jnp.asarray(rng.standard_normal((2, 3, 32, 48)), jnp.float32)
        img2 = jnp.asarray(rng.standard_normal((2, 3, 32, 48)), jnp.float32)
        res1, res2 = model.apply({"params": params}, img1, img2)
        assert res1["pts3d"].shape == (2, 32, 48, 3)
        assert res1["conf"].shape == (2, 32, 48)
        assert res1["dynamic_mask"].shape == (2, 32, 48)
        assert res2["pts3d_in_other_view"].shape == (2, 32, 48, 3)
        assert float(res1["conf"].min()) >= 1.0  # exp conf mode: vmin=1
        m = np.asarray(res1["dynamic_mask"])
        assert (m >= 0).all() and (m <= 1).all()
        assert np.isfinite(np.asarray(res1["pts3d"])).all()

    def test_encode_decode_pipeline_equals_call(self):
        rng = np.random.default_rng(6)
        model = AsymmetricCroCo3D(TINY)
        torch_sd = random_torch_state_dict(TINY, rng)
        params = jax.tree.map(jnp.asarray,
                              convert_torch_state_dict(torch_sd, TINY))
        img1 = jnp.asarray(rng.standard_normal((1, 3, 32, 48)), jnp.float32)
        img2 = jnp.asarray(rng.standard_normal((1, 3, 32, 48)), jnp.float32)
        r1, r2 = model.apply({"params": params}, img1, img2)
        f1, p1 = model.apply({"params": params}, img1, method="encode")
        f2, p2 = model.apply({"params": params}, img2, method="encode")
        q1, q2 = model.apply({"params": params}, f1, p1, f2, p2, 32, 48,
                             method="decode")
        np.testing.assert_allclose(np.asarray(r1["pts3d"]),
                                   np.asarray(q1["pts3d"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(r2["conf"]),
                                   np.asarray(q2["conf"]), atol=1e-6)


def test_bf16_trunk_close_to_fp32():
    """bfloat16 encoder/decoder with fp32 heads stays close to full fp32
    (the fast-inference configuration)."""
    import dataclasses
    rng = np.random.default_rng(8)
    params = jax.tree.map(jnp.asarray, convert_torch_state_dict(
        random_torch_state_dict(TINY, rng), TINY))
    img1 = jnp.asarray(rng.standard_normal((1, 3, 32, 48)), jnp.float32)
    img2 = jnp.asarray(rng.standard_normal((1, 3, 32, 48)), jnp.float32)
    r32, _ = AsymmetricCroCo3D(TINY).apply({"params": params}, img1, img2)
    cfg16 = dataclasses.replace(TINY, dtype=jnp.bfloat16)
    r16, _ = AsymmetricCroCo3D(cfg16).apply({"params": params}, img1, img2)
    assert r16["pts3d"].dtype == jnp.float32  # heads stay fp32
    d = np.abs(np.asarray(r16["dynamic_mask"]) -
               np.asarray(r32["dynamic_mask"]))
    assert d.mean() < 0.05
    rel = (np.abs(np.asarray(r16["pts3d"]) - np.asarray(r32["pts3d"]))
           / (np.abs(np.asarray(r32["pts3d"])) + 1e-3))
    assert np.median(rel) < 0.1
