"""RAFT optical flow in flax — TPU port of the classic RAFT ("large")
configuration the reference vendors (dynamic_predictor/third_party/RAFT/
core/{raft,extractor,update,corr}.py; loaded frozen for the alignment flow
loss, optimizer.py:117-151 with iters=20).

Architecture: BasicEncoder feature/context nets (instance / batch norm),
all-pairs correlation pyramid (4 levels, radius 4) as one big MXU matmul +
bilinear lookups, BasicUpdateBlock (motion encoder + SepConvGRU + flow head)
iterated N times, convex 8x upsampling. BatchNorm runs in inference mode
from checkpoint running stats (the net is always frozen here).

Weight layout conversion from torch checkpoints lives in
``convert_raft_state_dict``.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _conv(out, k, stride=1, name=None, pad=None):
    if pad is None:
        pad = k // 2
    return nn.Conv(out, (k, k), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), name=name)


class InstanceNorm(nn.Module):
    """torch InstanceNorm2d(affine=False) on NHWC."""
    @nn.compact
    def __call__(self, x):
        mu = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-5)


class FrozenBatchNorm(nn.Module):
    """BatchNorm2d in eval mode: affine transform from running stats."""
    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) / jnp.sqrt(var + 1e-5) * scale + bias


def make_norm(norm_fn: str, features: int, name: str):
    if norm_fn == "instance":
        return InstanceNorm(name=name)
    if norm_fn == "batch":
        return FrozenBatchNorm(features, name=name)
    return lambda x: x  # 'none'


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = _conv(self.planes, 3, self.stride, name="conv1")(x)
        y = make_norm(self.norm_fn, self.planes, "norm1")(y)
        y = nn.relu(y)
        y = _conv(self.planes, 3, 1, name="conv2")(y)
        y = make_norm(self.norm_fn, self.planes, "norm2")(y)
        y = nn.relu(y)
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        name="downsample_conv")(x)
            x = make_norm(self.norm_fn, self.planes, "downsample_norm")(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    output_dim: int = 256
    norm_fn: str = "instance"

    @nn.compact
    def __call__(self, x):
        x = _conv(64, 7, 2, name="conv1")(x)
        x = make_norm(self.norm_fn, 64, "norm1")(x)
        x = nn.relu(x)
        for i, (dim, stride) in enumerate(
                [(64, 1), (64, 1), (96, 2), (96, 1), (128, 2), (128, 1)]):
            x = ResidualBlock(dim, self.norm_fn, stride,
                              name=f"res_{i}")(x)
        return nn.Conv(self.output_dim, (1, 1), name="conv2")(x)


class BasicMotionEncoder(nn.Module):
    corr_channels: int = 4 * 9 * 9

    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(_conv(256, 1, name="convc1")(corr))
        c = nn.relu(_conv(192, 3, name="convc2")(c))
        f = nn.relu(_conv(128, 7, name="convf1")(flow))
        f = nn.relu(_conv(64, 3, name="convf2")(f))
        out = nn.relu(_conv(126, 3, name="conv")(
            jnp.concatenate([c, f], -1)))
        return jnp.concatenate([out, flow], -1)          # 128 channels


class SepConvGRU(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, h, x):
        def pass_(h, x, ks, pad, suffix):
            hx = jnp.concatenate([h, x], -1)
            conv = lambda name: nn.Conv(self.hidden, ks, padding=(pad[0],
                                                                  pad[1]),
                                        name=name + suffix)
            z = jax.nn.sigmoid(conv("convz")(hx))
            r = jax.nn.sigmoid(conv("convr")(hx))
            q = jnp.tanh(conv("convq")(
                jnp.concatenate([r * h, x], -1)))
            return (1 - z) * h + z * q

        h = pass_(h, x, (1, 5), ((0, 0), (2, 2)), "1")
        h = pass_(h, x, (5, 1), ((2, 2), (0, 0)), "2")
        return h


class BasicUpdateBlock(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        m = BasicMotionEncoder(name="encoder")(flow, corr)
        # torch concatenates (inp, motion) — channel order matters for the
        # pretrained GRU conv weights (update.py:148-150)
        net = SepConvGRU(self.hidden, name="gru")(
            net, jnp.concatenate([inp, m], -1))
        f = nn.relu(_conv(256, 3, name="flow_head_conv1")(net))
        delta = _conv(2, 3, name="flow_head_conv2")(f)
        mk = nn.relu(_conv(256, 3, name="mask_conv1")(net))
        mask = nn.Conv(64 * 9, (1, 1), name="mask_conv2")(mk) * 0.25
        return net, mask, delta


def bilinear_lookup(corr, coords):
    """corr [B*HW, H2, W2, 1]; coords [B*HW, 9, 9, 2] pixel coords ->
    sampled [B*HW, 9, 9] with zero padding (RAFT bilinear_sampler)."""
    from das3r_tpu.predictor.warping import bilinear_sample
    img = corr.transpose(0, 3, 1, 2)                    # [N, 1, H2, W2]
    out = bilinear_sample(img, coords)                  # [N, 1, 9, 9]
    return out[:, 0]


class CorrPyramid:
    """All-pairs correlation + 4-level pyramid with radius-4 lookup."""

    def __init__(self, fmap1, fmap2, num_levels=4, radius=4):
        B, H, W, D = fmap1.shape
        self.shape = (B, H, W)
        self.num_levels = num_levels
        self.radius = radius
        corr = jnp.einsum("bxyd,buvd->bxyuv", fmap1, fmap2,
                          preferred_element_type=jnp.float32)
        corr = corr / jnp.sqrt(jnp.asarray(D, corr.dtype))
        corr = corr.reshape(B * H * W, H, W, 1)
        self.pyramid = [corr]
        for _ in range(num_levels - 1):
            corr = nn.avg_pool(corr, (2, 2), strides=(2, 2))
            self.pyramid.append(corr)

    def __call__(self, coords):
        """coords [B, H, W, 2] -> correlation features [B, H, W, L*(2r+1)^2]."""
        B, H, W = self.shape
        r = self.radius
        d = 2 * r + 1
        # torch RAFT quirk (corr.py): the offset grid is meshgrid(dy, dx)
        # stacked as-is and ADDED to (x, y) coords — so the x-offset varies
        # along the FIRST grid axis. Channel order must match the
        # pretrained weights, so we reproduce it exactly.
        d1, d2 = jnp.meshgrid(jnp.arange(-r, r + 1.0),
                              jnp.arange(-r, r + 1.0), indexing="ij")
        delta = jnp.stack([d1, d2], -1)                  # [d, d, 2]
        out = []
        flat = coords.reshape(B * H * W, 1, 1, 2)
        for lvl, corr in enumerate(self.pyramid):
            centroid = flat / (2 ** lvl)
            grid = centroid + delta[None]
            out.append(bilinear_lookup(corr, grid).reshape(B, H, W, d * d))
        return jnp.concatenate(out, -1)


@dataclasses.dataclass(frozen=True)
class RaftConfig:
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4


class RAFT(nn.Module):
    cfg: RaftConfig = RaftConfig()

    def setup(self):
        self.fnet = BasicEncoder(256, "instance", name="fnet")
        self.cnet = BasicEncoder(
            self.cfg.hidden_dim + self.cfg.context_dim, "batch",
            name="cnet")
        self.update_block = BasicUpdateBlock(self.cfg.hidden_dim,
                                             name="update_block")

    def upsample_flow(self, flow, mask):
        """Convex 8x upsampling (raft.py upsample_flow): each fine pixel is
        a softmax-weighted combination of its coarse 3x3 neighborhood."""
        B, H, W, _ = flow.shape
        # channel order matches torch's view(N, 1, 9, 8, 8, H, W)
        mask = jax.nn.softmax(mask.reshape(B, H, W, 9, 8, 8), axis=3)
        f = 8.0 * flow
        pad = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
        neigh = jnp.stack([
            pad[:, di:di + H, dj:dj + W] for di in range(3)
            for dj in range(3)], axis=3)                 # [B, H, W, 9, 2]
        up = jnp.einsum("bhwkpq,bhwkc->bhwpqc", mask, neigh,
                        precision="highest")             # [B, H, W, 8, 8, 2]
        return up.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * 8, W * 8, 2)

    def __call__(self, image1, image2, iters: int = 20):
        """images [B, 3, H, W] in [0, 255]. Returns final flow [B, 2, H, W]
        (the reference's test_mode=True second output)."""
        B, _, H, W = image1.shape
        x1 = (2.0 * (image1 / 255.0) - 1.0).transpose(0, 2, 3, 1)
        x2 = (2.0 * (image2 / 255.0) - 1.0).transpose(0, 2, 3, 1)

        fmap1 = self.fnet(x1)
        fmap2 = self.fnet(x2)
        corr_fn = CorrPyramid(fmap1, fmap2, self.cfg.corr_levels,
                              self.cfg.corr_radius)

        c = self.cnet(x1)
        net = jnp.tanh(c[..., : self.cfg.hidden_dim])
        inp = nn.relu(c[..., self.cfg.hidden_dim:])

        h8, w8 = H // 8, W // 8
        xx, yy = jnp.meshgrid(jnp.arange(w8, dtype=jnp.float32),
                              jnp.arange(h8, dtype=jnp.float32),
                              indexing="xy")
        coords0 = jnp.broadcast_to(jnp.stack([xx, yy], -1),
                                   (B, h8, w8, 2))
        coords1 = coords0

        up_mask = None
        for _ in range(iters):
            coords1 = jax.lax.stop_gradient(coords1)
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            net, up_mask, delta = self.update_block(net, inp, corr, flow)
            coords1 = coords1 + delta

        flow_up = self.upsample_flow(coords1 - coords0, up_mask)
        return flow_up.transpose(0, 3, 1, 2)             # [B, 2, H, W]


# ---------------------------------------------------------------------------
# torch checkpoint conversion


def _c(out, key, sd, prefix):
    out[key] = {"kernel": sd[prefix + ".weight"].transpose(2, 3, 1, 0),
                "bias": sd[prefix + ".bias"]}


def _bn(out, key, sd, prefix):
    out[key] = {"scale": sd[prefix + ".weight"],
                "bias": sd[prefix + ".bias"],
                "mean": sd[prefix + ".running_mean"],
                "var": sd[prefix + ".running_var"]}


def _encoder(sd, prefix, norm_fn):
    enc: dict = {}
    _c(enc, "conv1", sd, f"{prefix}.conv1")
    if norm_fn == "batch":
        _bn(enc, "norm1", sd, f"{prefix}.norm1")
    layer_map = [("layer1.0", 0), ("layer1.1", 1), ("layer2.0", 2),
                 ("layer2.1", 3), ("layer3.0", 4), ("layer3.1", 5)]
    for tname, i in layer_map:
        blk: dict = {}
        _c(blk, "conv1", sd, f"{prefix}.{tname}.conv1")
        _c(blk, "conv2", sd, f"{prefix}.{tname}.conv2")
        if norm_fn == "batch":
            _bn(blk, "norm1", sd, f"{prefix}.{tname}.norm1")
            _bn(blk, "norm2", sd, f"{prefix}.{tname}.norm2")
        if f"{prefix}.{tname}.downsample.0.weight" in sd:
            _c(blk, "downsample_conv", sd, f"{prefix}.{tname}.downsample.0")
            if norm_fn == "batch":
                _bn(blk, "downsample_norm", sd,
                    f"{prefix}.{tname}.downsample.1")
        enc[f"res_{i}"] = blk
    _c(enc, "conv2", sd, f"{prefix}.conv2")
    return enc


def convert_raft_state_dict(sd: dict) -> dict:
    """torch RAFT state dict (numpy values) -> flax params."""
    sd = {k.replace("module.", ""): np.asarray(v) for k, v in sd.items()}
    out: dict = {}
    out["fnet"] = _encoder(sd, "fnet", "instance")
    out["cnet"] = _encoder(sd, "cnet", "batch")

    ub: dict = {"encoder": {}, "gru": {}}
    for nm in ("convc1", "convc2", "convf1", "convf2", "conv"):
        _c(ub["encoder"], nm, sd, f"update_block.encoder.{nm}")
    for nm in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2"):
        _c(ub["gru"], nm, sd, f"update_block.gru.{nm}")
    _c(ub, "flow_head_conv1", sd, "update_block.flow_head.conv1")
    _c(ub, "flow_head_conv2", sd, "update_block.flow_head.conv2")
    _c(ub, "mask_conv1", sd, "update_block.mask.0")
    _c(ub, "mask_conv2", sd, "update_block.mask.2")
    out["update_block"] = ub
    return out
