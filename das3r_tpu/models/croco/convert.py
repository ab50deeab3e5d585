"""Torch-checkpoint -> flax-params conversion for the DAS3R predictor.

Maps the reference's state-dict naming (dust3r/model.py + croco modules;
checkpoint ``Kai422kx/das3r`` per reference README.md:91) onto the flax
module tree in ``dust3r.py``. Pure numpy — torch is only needed to unpickle
a .pth (``load_torch_checkpoint``).

Layout rules:
  * Linear:           kernel = W.T
  * Conv2d:           kernel = W.transpose(2, 3, 1, 0)   (HWIO)
  * patchify Conv2d(k=s=16) -> Dense: kernel = W.reshape(out, -1).T
  * ConvTranspose2d(k=s) -> PixelShuffleUp Dense:
        kernel = W.reshape(in, out*k*k); bias = repeat(bias, k*k)
"""
from __future__ import annotations

import re

import numpy as np

from das3r_tpu.models.croco.dust3r import Dust3rConfig, DUST3R_LARGE_CONFIG


def _linear(params, out, path, prefix):
    out[path] = {"kernel": params[prefix + ".weight"].T.copy(),
                 "bias": params[prefix + ".bias"].copy()}


def _layernorm(params, out, path, prefix):
    out[path] = {"scale": params[prefix + ".weight"].copy(),
                 "bias": params[prefix + ".bias"].copy()}


def _conv(params, out, path, prefix, bias=True):
    d = {"kernel": params[prefix + ".weight"].transpose(2, 3, 1, 0).copy()}
    if bias:
        d["bias"] = params[prefix + ".bias"].copy()
    out[path] = d


def _convtranspose_as_dense(params, out, path, prefix, k):
    w = params[prefix + ".weight"]             # [in, out, k, k]
    cin = w.shape[0]
    out[path] = {"proj": {
        "kernel": w.reshape(cin, -1).copy(),
        "bias": np.repeat(params[prefix + ".bias"], k * k).copy()}}


def _block(params, out, name, prefix):
    b = {}
    tmp = {}
    _layernorm(params, tmp, "norm1", prefix + ".norm1")
    _layernorm(params, tmp, "norm2", prefix + ".norm2")
    attn = {}
    _linear(params, attn, "qkv", prefix + ".attn.qkv")
    _linear(params, attn, "proj", prefix + ".attn.proj")
    mlp = {}
    _linear(params, mlp, "fc1", prefix + ".mlp.fc1")
    _linear(params, mlp, "fc2", prefix + ".mlp.fc2")
    b.update(tmp)
    b["attn"] = attn
    b["mlp"] = mlp
    out[name] = b


def _decoder_block(params, out, name, prefix):
    b = {}
    for ln in ("norm1", "norm2", "norm3", "norm_y"):
        _layernorm(params, b, ln, f"{prefix}.{ln}")
    attn = {}
    _linear(params, attn, "qkv", prefix + ".attn.qkv")
    _linear(params, attn, "proj", prefix + ".attn.proj")
    b["attn"] = attn
    ca = {}
    for nm in ("projq", "projk", "projv", "proj"):
        _linear(params, ca, nm, f"{prefix}.cross_attn.{nm}")
    b["cross_attn"] = ca
    mlp = {}
    _linear(params, mlp, "fc1", prefix + ".mlp.fc1")
    _linear(params, mlp, "fc2", prefix + ".mlp.fc2")
    b["mlp"] = mlp
    out[name] = b


def _dpt_head(params, out, name, prefix, head_type):
    h = {}
    # act_postprocess: ModuleList of Sequentials
    _conv(params, h, "act_0_proj", prefix + ".dpt.act_postprocess.0.0")
    _convtranspose_as_dense(params, h, "act_0_up",
                            prefix + ".dpt.act_postprocess.0.1", 4)
    _conv(params, h, "act_1_proj", prefix + ".dpt.act_postprocess.1.0")
    _convtranspose_as_dense(params, h, "act_1_up",
                            prefix + ".dpt.act_postprocess.1.1", 2)
    _conv(params, h, "act_2_proj", prefix + ".dpt.act_postprocess.2.0")
    _conv(params, h, "act_3_proj", prefix + ".dpt.act_postprocess.3.0")
    _conv(params, h, "act_3_down", prefix + ".dpt.act_postprocess.3.1")
    for i in range(4):
        key = f"{prefix}.dpt.scratch.layer_rn.{i}"
        if key + ".weight" not in params:       # croco aliases layerN_rn
            key = f"{prefix}.dpt.scratch.layer{i + 1}_rn"
        _conv(params, h, f"layer_rn_{i}", key, bias=False)
    for j in range(1, 5):
        rp = f"{prefix}.dpt.scratch.refinenet{j}"
        rf = {}
        # refinenet4 takes no skip input, so its resConfUnit1 exists in the
        # torch checkpoint but is dead weight — drop it
        units = ("resConfUnit2",) if j == 4 else ("resConfUnit1",
                                                  "resConfUnit2")
        for unit in units:
            u = {}
            _conv(params, u, "conv1", f"{rp}.{unit}.conv1")
            _conv(params, u, "conv2", f"{rp}.{unit}.conv2")
            rf[unit] = u
        _conv(params, rf, "out_conv", f"{rp}.out_conv")
        h[f"refinenet{j}"] = rf
    if head_type == "regression":
        _conv(params, h, "head_conv1", prefix + ".dpt.head.0")
        _conv(params, h, "head_conv2", prefix + ".dpt.head.2")
        _conv(params, h, "head_conv3", prefix + ".dpt.head.4")
    else:  # semseg: Sequential(conv no-bias, Identity, ReLU, Dropout,
           #                    conv1x1, Interpolate)
        _conv(params, h, "head_conv1", prefix + ".dpt.head.0", bias=False)
        _conv(params, h, "head_conv2", prefix + ".dpt.head.4")
    out[name] = h


def convert_torch_state_dict(state: dict, cfg: Dust3rConfig = DUST3R_LARGE_CONFIG):
    """numpy state dict (torch names) -> flax ``params`` dict."""
    p = {k: np.asarray(v) for k, v in state.items()}
    out: dict = {}

    w = p["patch_embed.proj.weight"]            # [D, 3, 16, 16]
    out["patch_embed"] = {"proj": {
        "kernel": w.reshape(w.shape[0], -1).T.copy(),
        "bias": p["patch_embed.proj.bias"].copy()}}

    for i in range(cfg.enc_depth):
        _block(p, out, f"enc_blocks_{i}", f"enc_blocks.{i}")
    _layernorm(p, out, "enc_norm", "enc_norm")
    _linear(p, out, "decoder_embed", "decoder_embed")
    for i in range(cfg.dec_depth):
        _decoder_block(p, out, f"dec_blocks_{i}", f"dec_blocks.{i}")
        src = (f"dec_blocks2.{i}"
               if f"dec_blocks2.{i}.norm1.weight" in p else f"dec_blocks.{i}")
        _decoder_block(p, out, f"dec_blocks2_{i}", src)
    _layernorm(p, out, "dec_norm", "dec_norm")

    _dpt_head(p, out, "downstream_head1", "downstream_head1", "regression")
    _dpt_head(p, out, "downstream_head2", "downstream_head2", "regression")
    _dpt_head(p, out, "downstream_head_dynamic_mask1",
              "downstream_head_dynamic_mask1", "semseg")
    _dpt_head(p, out, "downstream_head_dynamic_mask2",
              "downstream_head_dynamic_mask2", "semseg")
    return out


def load_torch_checkpoint(path: str):
    """Load a reference .pth (or HF pytorch_model.bin) into a numpy dict."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() for k, v in state.items()
            if hasattr(v, "numpy")}
