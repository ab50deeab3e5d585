"""SEA-RAFT ("M" configuration) in flax — the reference's DEFAULT optical
flow network for the alignment flow loss (third_party/RAFT/core/raft.py
RAFT2 + extractor.ResNetFPN + update.BasicUpdateBlock2 + corr.CorrBlock2,
loaded from Tartan-C-T-TSKH-spring540x960-M.pth; cloud_opt/optimizer.py:123).

Architecture (configs/congif_spring_M.json): ResNet34-style 1/8 encoders
(initial 64, dims [64, 128, 256]), dim=128, correlation pyramid built by
re-correlating fmap1 against bilinearly downsampled fmap2 (radius 4,
4 levels), iterative refinement with 2 ConvNeXt blocks per step, a 6-channel
flow head (flow + uncertainty info) and convex 8x upsampling.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from das3r_tpu.predictor.raft import FrozenBatchNorm, _conv
from das3r_tpu.predictor.warping import bilinear_sample


@dataclasses.dataclass(frozen=True)
class SeaRaftConfig:
    dim: int = 128
    initial_dim: int = 64
    block_dims: tuple = (64, 128, 256)
    n_blocks: tuple = (3, 4, 6)          # resnet34
    radius: int = 4
    corr_levels: int = 4
    num_refine: int = 2                   # ConvNeXt blocks per iteration
    iters: int = 4


class BasicBlockBN(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        y = _conv(self.planes, 3, self.stride, name="conv1")(x)
        y = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(y))
        y = _conv(self.planes, 3, 1, name="conv2")(y)
        y = nn.relu(FrozenBatchNorm(self.planes, name="bn2")(y))
        if self.has_downsample:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        name="down_conv")(x)
            x = FrozenBatchNorm(self.planes, name="bn3")(x)
        return nn.relu(x + y)


class ResNetFPN(nn.Module):
    cfg: SeaRaftConfig
    output_dim: int

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = _conv(c.initial_dim, 7, 2, name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(c.initial_dim, name="bn1")(x))
        in_planes = c.initial_dim
        for li, (dim, stride, num) in enumerate(zip(
                c.block_dims, (1, 2, 2), c.n_blocks)):
            for bi in range(num):
                s = stride if bi == 0 else 1
                ds = bi == 0 and (s != 1 or in_planes != dim)
                x = BasicBlockBN(dim, s, ds,
                                 name=f"layer{li + 1}_{bi}")(x)
                in_planes = dim
        return nn.Conv(self.output_dim, (1, 1), name="final_conv")(x)


class ConvNextBlock(nn.Module):
    dim: int
    output_dim: int

    @nn.compact
    def __call__(self, x):
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=((3, 3), (3, 3)),
                    feature_group_count=self.dim, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.output_dim, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        gamma = self.param("gamma", nn.initializers.constant(1e-6),
                           (self.dim,))
        x = gamma * x
        return nn.Conv(self.output_dim, (1, 1), name="final")(inp + x)


class MotionEncoder2(nn.Module):
    dim: int = 128
    corr_channels: int = 4 * 81

    @nn.compact
    def __call__(self, flow, corr):
        d = self.dim
        c = nn.relu(nn.Conv(2 * d, (1, 1), name="convc1")(corr))
        c = nn.relu(_conv(d + d // 2, 3, name="convc2")(c))
        f = nn.relu(_conv(d, 7, name="convf1")(flow))
        f = nn.relu(_conv(d // 2, 3, name="convf2")(f))
        out = nn.relu(_conv(d - 2, 3, name="conv")(
            jnp.concatenate([c, f], -1)))
        return jnp.concatenate([out, flow], -1)


class SeaRaftCorr:
    """CorrBlock2: level i correlates full-res fmap1 against fmap2
    downsampled i times (bilinear, align_corners=False)."""

    def __init__(self, fmap1, fmap2, cfg: SeaRaftConfig):
        self.cfg = cfg
        B, H1, W1, D = fmap1.shape
        self.shape = (B, H1, W1)
        self.pyramid = []
        f2 = fmap2
        for i in range(cfg.corr_levels):
            corr = jnp.einsum("bxyd,buvd->bxyuv", fmap1, f2,
                              preferred_element_type=jnp.float32)
            corr = corr / jnp.sqrt(jnp.asarray(D, corr.dtype))
            h2, w2 = f2.shape[1:3]
            self.pyramid.append(corr.reshape(B * H1 * W1, h2, w2, 1))
            f2 = jax.image.resize(
                f2, (B, h2 // 2, w2 // 2, D), method="bilinear")
        # NOTE: jax.image.resize bilinear == align_corners=False for
        # factor-2 downsampling (half-pixel centers), matching
        # F.interpolate(scale_factor=0.5, align_corners=False)

    def __call__(self, coords):
        from das3r_tpu.predictor.raft import bilinear_lookup
        cfg = self.cfg
        B, H, W = self.shape
        r = cfg.radius
        d = 2 * r + 1
        # same transposed-offset quirk as classic RAFT (corr.py:38-44)
        d1, d2 = jnp.meshgrid(jnp.arange(-r, r + 1.0),
                              jnp.arange(-r, r + 1.0), indexing="ij")
        delta = jnp.stack([d1, d2], -1)
        flat = coords.reshape(B * H * W, 1, 1, 2)
        out = []
        for lvl, corr in enumerate(self.pyramid):
            grid = flat / (2 ** lvl) + delta[None]
            out.append(bilinear_lookup(corr, grid).reshape(B, H, W, d * d))
        return jnp.concatenate(out, -1)


class SeaRaft(nn.Module):
    cfg: SeaRaftConfig = SeaRaftConfig()

    def setup(self):
        c = self.cfg
        self.cnet = ResNetFPN(c, 2 * c.dim, name="cnet")
        self.fnet = ResNetFPN(c, 2 * c.dim, name="fnet")
        self.init_conv = _conv(2 * c.dim, 3, name="init_conv")
        self.refine = [ConvNextBlock(2 * c.dim + c.dim, c.dim,
                                     name=f"refine_{i}")
                       for i in range(c.num_refine)]
        self.encoder = MotionEncoder2(c.dim, name="encoder")

    @nn.compact
    def _heads(self, net):
        f = nn.relu(_conv(2 * self.cfg.dim, 3, name="flow_head_conv1")(net))
        flow_info = _conv(6, 3, name="flow_head_conv2")(f)
        u = nn.relu(_conv(2 * self.cfg.dim, 3, name="up_weight_conv1")(net))
        mask = nn.Conv(64 * 9, (1, 1), name="up_weight_conv2")(u) * 0.25
        return flow_info, mask

    def upsample_flow(self, flow, mask):
        B, H, W, _ = flow.shape
        mask = jax.nn.softmax(mask.reshape(B, H, W, 9, 8, 8), axis=3)
        f = 8.0 * flow
        pad = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
        neigh = jnp.stack([pad[:, di:di + H, dj:dj + W]
                           for di in range(3) for dj in range(3)], axis=3)
        up = jnp.einsum("bhwkpq,bhwkc->bhwpqc", mask, neigh,
                        precision="highest")
        return up.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * 8, W * 8, 2)

    def __call__(self, image1, image2, iters: int | None = None):
        """images [B, 3, H, W] in [0, 255] -> final flow [B, 2, H, W]."""
        c = self.cfg
        iters = c.iters if iters is None else iters
        B, _, H, W = image1.shape
        x1 = (2.0 * (image1 / 255.0) - 1.0).transpose(0, 2, 3, 1)
        x2 = (2.0 * (image2 / 255.0) - 1.0).transpose(0, 2, 3, 1)

        cfeat = self.init_conv(self.cnet(
            jnp.concatenate([x1, x2], -1)))
        net = cfeat[..., : c.dim]
        context = cfeat[..., c.dim:]

        flow_info, mask = self._heads(net)
        flow = flow_info[..., :2]                       # [B, H/8, W/8, 2]

        f1 = self.fnet(x1)
        f2 = self.fnet(x2)
        corr_fn = SeaRaftCorr(f1, f2, c)

        h8, w8 = H // 8, W // 8
        xx, yy = jnp.meshgrid(jnp.arange(w8, dtype=jnp.float32),
                              jnp.arange(h8, dtype=jnp.float32),
                              indexing="xy")
        grid = jnp.broadcast_to(jnp.stack([xx, yy], -1), (B, h8, w8, 2))

        for _ in range(iters):
            flow = jax.lax.stop_gradient(flow)
            corr = corr_fn(grid + flow)
            m = self.encoder(flow, corr)
            inp = jnp.concatenate([context, m], -1)
            for blk in self.refine:
                net = blk(jnp.concatenate([net, inp], -1))
            flow_info, mask = self._heads(net)
            flow = flow + flow_info[..., :2]

        return self.upsample_flow(flow, mask).transpose(0, 3, 1, 2)


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


def _resnet(sd, prefix, cfg: SeaRaftConfig):
    enc: dict = {}
    _c(enc, "conv1", sd, f"{prefix}.conv1")
    _bn(enc, "bn1", sd, f"{prefix}.bn1")
    for li, num in enumerate(cfg.n_blocks):
        for bi in range(num):
            blk: dict = {}
            tp = f"{prefix}.layer{li + 1}.{bi}"
            _c(blk, "conv1", sd, f"{tp}.conv1")
            _c(blk, "conv2", sd, f"{tp}.conv2")
            _bn(blk, "bn1", sd, f"{tp}.bn1")
            _bn(blk, "bn2", sd, f"{tp}.bn2")
            if f"{tp}.downsample.0.weight" in sd:
                _c(blk, "down_conv", sd, f"{tp}.downsample.0")
                _bn(blk, "bn3", sd, f"{tp}.downsample.1")
            enc[f"layer{li + 1}_{bi}"] = blk
    _c(enc, "final_conv", sd, f"{prefix}.final_conv")
    return enc


def convert_searaft_state_dict(sd: dict,
                               cfg: SeaRaftConfig = SeaRaftConfig()):
    sd = {k.replace("module.", ""): np.asarray(v) for k, v in sd.items()}
    out: dict = {}
    out["cnet"] = _resnet(sd, "cnet", cfg)
    out["fnet"] = _resnet(sd, "fnet", cfg)
    _c(out, "init_conv", sd, "init_conv")
    _c(out, "flow_head_conv1", sd, "flow_head.0")
    _c(out, "flow_head_conv2", sd, "flow_head.2")
    _c(out, "up_weight_conv1", sd, "upsample_weight.0")
    _c(out, "up_weight_conv2", sd, "upsample_weight.2")
    enc: dict = {}
    for nm in ("convc1", "convc2", "convf1", "convf2", "conv"):
        _c(enc, nm, sd, f"update_block.encoder.{nm}")
    out["encoder"] = enc
    for i in range(cfg.num_refine):
        blk: dict = {}
        tp = f"update_block.refine.{i}"
        w = sd[f"{tp}.dwconv.weight"]          # [dim, 1, 7, 7]
        blk["dwconv"] = {"kernel": w.transpose(2, 3, 1, 0),
                         "bias": sd[f"{tp}.dwconv.bias"]}
        blk["norm"] = {"scale": sd[f"{tp}.norm.weight"],
                       "bias": sd[f"{tp}.norm.bias"]}
        blk["pwconv1"] = {"kernel": sd[f"{tp}.pwconv1.weight"].T,
                          "bias": sd[f"{tp}.pwconv1.bias"]}
        blk["pwconv2"] = {"kernel": sd[f"{tp}.pwconv2.weight"].T,
                          "bias": sd[f"{tp}.pwconv2.bias"]}
        blk["gamma"] = sd[f"{tp}.gamma"]
        _c(blk, "final", sd, f"{tp}.final")
        out[f"refine_{i}"] = blk
    return out
