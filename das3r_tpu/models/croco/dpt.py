"""DPT dense-prediction head in flax — reconstructs croco's
``DPTOutputAdapter`` (absent submodule; structure recovered from the
reference's dust3r/heads/dpt_head.py:130-186 forward + recorded intermediate
shapes, and the public CroCo v2 dpt_block).

Four decoder layers (hooks [0, 2/3·L, 3/4·L, L]) are projected to pyramid
resolutions (H/4, H/8, H/16, H/32), fused RefineNet-style back up to H/2,
then a task head (regression: 3D points + conf; semseg: dynamic mask logits)
emits full-resolution maps.

All strided/transposed convs with kernel==stride are expressed as matmuls +
pixel shuffle (MXU-friendly, numerically identical to the torch ops).
Internal layout is NHWC; the public API matches the torch NCHW contract.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def resize_bilinear_ac(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with align_corners=True on [B, H, W, C] (torch
    ``interpolate(..., align_corners=True)`` semantics)."""
    B, H, W, C = x.shape
    if H == out_h and W == out_w:
        return x

    def axis_coords(n_in, n_out):
        if n_out == 1:
            return jnp.zeros((1,), x.dtype)
        return jnp.arange(n_out, dtype=x.dtype) * ((n_in - 1) / (n_out - 1))

    ys = axis_coords(H, out_h)
    xs = axis_coords(W, out_w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = (ys - y0.astype(x.dtype))[None, :, None, None]
    wx = (xs - x0.astype(x.dtype))[None, None, :, None]
    g = lambda yi, xi: x[:, yi][:, :, xi]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


class PixelShuffleUp(nn.Module):
    """ConvTranspose2d(C_in, C_out, k, stride=k) as Dense + pixel shuffle.
    Weight layout matches torch: [C_in, C_out * k * k] with (out, dy, dx)
    flattening handled by the converter."""
    out_ch: int
    factor: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        B, H, W, _ = x.shape
        k = self.factor
        y = nn.Dense(self.out_ch * k * k, dtype=self.dtype, name="proj")(x)
        y = y.reshape(B, H, W, self.out_ch, k, k)
        y = y.transpose(0, 1, 4, 2, 5, 3)                # B, H, k, W, k, C
        return y.reshape(B, H * k, W * k, self.out_ch)


def conv(out, kernel, stride=1, use_bias=True, name=None, dtype=jnp.float32):
    pad = kernel // 2
    return nn.Conv(out, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), use_bias=use_bias,
                   dtype=dtype, name=name)


class ResidualConvUnit(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = conv(self.features, 3, name="conv1", dtype=self.dtype)(out)
        out = nn.relu(out)
        out = conv(self.features, 3, name="conv2", dtype=self.dtype)(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """croco FeatureFusionBlock_custom (deconv=False, bn=False, expand=False,
    align_corners=True)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        out = x
        if skip is not None:
            out = out + ResidualConvUnit(self.features, self.dtype,
                                         name="resConfUnit1")(skip)
        out = ResidualConvUnit(self.features, self.dtype,
                               name="resConfUnit2")(out)
        B, H, W, C = out.shape
        out = resize_bilinear_ac(out, H * 2, W * 2)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="out_conv")(out)


class DPTHead(nn.Module):
    """Full DPT adapter + task head.

    hooks select from the 13-entry token list [enc, dec1..dec12]; dims are
    [enc_dim, dec_dim, dec_dim, dec_dim] (dpt_head.py:300-336).
    """
    num_channels: int
    head_type: str                      # 'regression' | 'semseg'
    hooks: Sequence[int] = (0, 6, 9, 12)
    layer_dims: Sequence[int] = (96, 192, 384, 768)
    feature_dim: int = 256
    last_dim: int = 128
    patch_size: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_list, img_h: int, img_w: int,
                 deterministic: bool = True):
        p = self.patch_size
        nh, nw = img_h // p, img_w // p
        layers = [token_list[h] for h in self.hooks]     # each [B, N, D]
        layers = [t.reshape(t.shape[0], nh, nw, t.shape[-1]).astype(
            self.dtype) for t in layers]

        # act_postprocess: project + resample to pyramid resolutions
        l0 = PixelShuffleUp(self.layer_dims[0], 4, self.dtype,
                            name="act_0_up")(
            nn.Conv(self.layer_dims[0], (1, 1), dtype=self.dtype,
                    name="act_0_proj")(layers[0]))
        l1 = PixelShuffleUp(self.layer_dims[1], 2, self.dtype,
                            name="act_1_up")(
            nn.Conv(self.layer_dims[1], (1, 1), dtype=self.dtype,
                    name="act_1_proj")(layers[1]))
        l2 = nn.Conv(self.layer_dims[2], (1, 1), dtype=self.dtype,
                     name="act_2_proj")(layers[2])
        l3 = conv(self.layer_dims[3], 3, stride=2, name="act_3_down",
                  dtype=self.dtype)(
            nn.Conv(self.layer_dims[3], (1, 1), dtype=self.dtype,
                    name="act_3_proj")(layers[3]))

        rn = [conv(self.feature_dim, 3, use_bias=False,
                   name=f"layer_rn_{i}", dtype=self.dtype)(l)
              for i, l in enumerate([l0, l1, l2, l3])]

        path4 = FeatureFusionBlock(self.feature_dim, self.dtype,
                                   name="refinenet4")(rn[3])
        path4 = path4[:, : rn[2].shape[1], : rn[2].shape[2]]
        path3 = FeatureFusionBlock(self.feature_dim, self.dtype,
                                   name="refinenet3")(path4, rn[2])
        path2 = FeatureFusionBlock(self.feature_dim, self.dtype,
                                   name="refinenet2")(path3, rn[1])
        path1 = FeatureFusionBlock(self.feature_dim, self.dtype,
                                   name="refinenet1")(path2, rn[0])

        if self.head_type == "regression":
            out = conv(self.feature_dim // 2, 3, name="head_conv1",
                       dtype=self.dtype)(path1)
            out = resize_bilinear_ac(out, img_h, img_w)
            out = conv(self.last_dim, 3, name="head_conv2",
                       dtype=self.dtype)(out)
            out = nn.relu(out)
            out = nn.Conv(self.num_channels, (1, 1), dtype=self.dtype,
                          name="head_conv3")(out)
        elif self.head_type == "semseg":
            out = conv(self.feature_dim, 3, use_bias=False,
                       name="head_conv1", dtype=self.dtype)(path1)
            out = nn.relu(out)
            out = nn.Dropout(0.1, deterministic=deterministic)(out)
            out = nn.Conv(self.num_channels, (1, 1), dtype=self.dtype,
                          name="head_conv2")(out)
            out = resize_bilinear_ac(out, img_h, img_w)
        else:
            raise ValueError(self.head_type)
        return out                                        # [B, H, W, C_out]


class LinearHead(nn.Module):
    """LinearPts3d (reference dynamic_predictor/dust3r/heads/linear_head.py:
    12-41): one Dense from the LAST decoder token to (out_ch * p^2), pixel-
    shuffled back to full resolution. Interface-compatible with DPTHead so
    the two are swappable via Dust3rConfig.head_type ('dpt' is what the
    published DAS3R checkpoints use; 'linear' covers the dust3r 224-linear
    family)."""
    out_ch: int
    patch_size: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_list, img_h: int, img_w: int,
                 deterministic: bool = True):
        tokens = token_list[-1]                      # [B, S, D]
        B, S, _ = tokens.shape
        hp, wp = img_h // self.patch_size, img_w // self.patch_size
        assert hp * wp == S, (hp, wp, S)
        x = tokens.reshape(B, hp, wp, -1)
        y = PixelShuffleUp(self.out_ch, self.patch_size, dtype=self.dtype,
                           name="proj_shuffle")(x)
        return y.astype(jnp.float32)                 # [B, H, W, out_ch]
