"""The DAS3R dynamic predictor in flax — a DUSt3R/MonST3R-style asymmetric
two-view transformer with dynamic-mask DPT heads (reference
dynamic_predictor/dust3r/model.py:45-228).

Architecture (DAS3R recipe, DAS3R_b32_g4.sh:5-9):
  * siamese ViT-L encoder: patch 16, dim 1024, depth 24, heads 16, RoPE100;
  * two cross-attending decoders (dim 768, depth 12, heads 12) — dec_blocks
    for view 1, an independent copy dec_blocks2 for view 2;
  * four DPT heads: pts3d+conf per view (regression, 3+1 channels, exp depth
    mode / exp conf mode) and dynamic-mask per view (semseg, 1 channel,
    sigmoid) — reference heads/dpt_head.py:300-336, postprocess.py.

TPU-first decomposition: instead of the reference's per-pair symmetrized
encoder trick (model.py:163-181), the pipeline encodes every unique frame
exactly once (``encode``) and runs the decoder+heads per pair (``decode``),
which both jit cleanly with static shapes and batch across pairs.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from das3r_tpu.models.croco.blocks import (Block, DecoderBlock, PatchEmbed)
from das3r_tpu.models.croco.dpt import DPTHead


@dataclasses.dataclass(frozen=True)
class Dust3rConfig:
    patch_size: int = 16
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    dec_embed_dim: int = 768
    dec_depth: int = 12
    dec_num_heads: int = 12
    mlp_ratio: float = 4.0
    rope_base: float = 100.0
    conf_vmin: float = 1.0
    head_type: str = "dpt"         # 'dpt' (DAS3R/MonST3R checkpoints) or
                                   # 'linear' (dust3r 224-linear family,
                                   # reference heads/__init__.py:13-22)
    dtype: Any = jnp.float32       # encoder/decoder compute dtype; set to
                                   # jnp.bfloat16 for fast TPU inference
                                   # (params stay fp32)
    head_dtype: Any = jnp.float32  # DPT heads stay fp32 like the
                                   # reference's AMP-off head pass
                                   # (model.py:217-222)


DUST3R_LARGE_CONFIG = Dust3rConfig()


def reg_dense_depth_exp(xyz: jax.Array) -> jax.Array:
    """'exp' pointmap activation: direction * expm1(|xyz|)
    (reference heads/postprocess.py:31-55)."""
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    return xyz / jnp.maximum(d, 1e-8) * jnp.expm1(d)


def reg_dense_conf_exp(x: jax.Array, vmin: float = 1.0) -> jax.Array:
    """'exp' confidence: vmin + exp(x) (postprocess.py:58-67)."""
    return vmin + jnp.exp(x)


def transposed_result(res: dict) -> dict:
    """Swap the two spatial axes of every output map — the reference's
    ``transposed`` applied to a head result dict (misc.py:59-67), used to
    store portrait-orientation predictions back into landscape buffers."""
    return {k: v.swapaxes(1, 2) for k, v in res.items()}


class AsymmetricCroCo3D(nn.Module):
    cfg: Dust3rConfig = DUST3R_LARGE_CONFIG

    def setup(self):
        c = self.cfg
        self.patch_embed = PatchEmbed(c.patch_size, c.enc_embed_dim,
                                      c.dtype, name="patch_embed")
        self.enc_blocks = [
            Block(c.enc_embed_dim, c.enc_num_heads, c.mlp_ratio, c.rope_base,
                  c.dtype, name=f"enc_blocks_{i}")
            for i in range(c.enc_depth)]
        self.enc_norm = nn.LayerNorm(epsilon=1e-6, name="enc_norm")
        self.decoder_embed = nn.Dense(c.dec_embed_dim, name="decoder_embed")
        self.dec_blocks = [
            DecoderBlock(c.dec_embed_dim, c.dec_num_heads, c.mlp_ratio,
                         c.rope_base, c.dtype, name=f"dec_blocks_{i}")
            for i in range(c.dec_depth)]
        self.dec_blocks2 = [
            DecoderBlock(c.dec_embed_dim, c.dec_num_heads, c.mlp_ratio,
                         c.rope_base, c.dtype, name=f"dec_blocks2_{i}")
            for i in range(c.dec_depth)]
        self.dec_norm = nn.LayerNorm(epsilon=1e-6, name="dec_norm")
        hooks = (0, c.dec_depth * 2 // 4, c.dec_depth * 3 // 4, c.dec_depth)
        if c.head_type == "linear":
            from das3r_tpu.models.croco.dpt import LinearHead
            mk = lambda ch, mode, name: LinearHead(
                ch, c.patch_size, dtype=c.head_dtype, name=name)
        elif c.head_type == "dpt":
            mk = lambda ch, mode, name: DPTHead(
                ch, mode, hooks, dtype=c.head_dtype, name=name)
        else:
            raise ValueError(f"unknown head_type {c.head_type!r}; "
                             "expected 'dpt' or 'linear'")
        self.head1 = mk(4, "regression", "downstream_head1")
        self.head2 = mk(4, "regression", "downstream_head2")
        self.head_mask1 = mk(1, "semseg", "downstream_head_dynamic_mask1")
        self.head_mask2 = mk(1, "semseg", "downstream_head_dynamic_mask2")

    def encode(self, img: jax.Array, portrait: bool = False):
        """[B, 3, H, W] (ImgNorm'ed) -> (tokens [B, N, D_enc], pos).

        ``portrait`` is the static, jit-friendly form of the reference's
        ManyAR_PatchEmbed ``true_shape`` handling (patch_embed.py:33-70):
        a portrait image arrives stored TRANSPOSED inside a landscape
        [B, 3, H, W] buffer (W >= H); the patch projection and the RoPE
        position grid must see the true portrait orientation, so the buffer
        is transposed back before patchifying. Mixed-orientation batches are
        split by the host (``inference.apply_manyar``) exactly like the
        reference's boolean-index split — per-batch the flag is static.
        """
        if portrait:
            img = img.swapaxes(-1, -2)
        x, pos = self.patch_embed(img)
        for blk in self.enc_blocks:
            x = blk(x, pos)
        return self.enc_norm(x), pos

    def _decode(self, f1, pos1, f2, pos2):
        """Returns two 13-entry lists: [enc_out, dec1..dec12] per view
        (model.py:183-203 — entry 0 is the pre-projection encoder token)."""
        out1 = [f1]
        out2 = [f2]
        f1 = self.decoder_embed(f1)
        f2 = self.decoder_embed(f2)
        for blk1, blk2 in zip(self.dec_blocks, self.dec_blocks2):
            f1n, _ = blk1(f1, f2, pos1, pos2)
            f2n, _ = blk2(f2, f1, pos2, pos1)
            f1, f2 = f1n, f2n
            out1.append(f1)
            out2.append(f2)
        out1[-1] = self.dec_norm(out1[-1])
        out2[-1] = self.dec_norm(out2[-1])
        return out1, out2

    def decode(self, f1, pos1, f2, pos2, img_h: int, img_w: int,
               stop_trunk_grad: bool = True, deterministic: bool = True,
               img_h2: int | None = None, img_w2: int | None = None):
        """Pairwise prediction from precomputed encoder tokens.

        Returns (res1, res2): res1 = {pts3d, conf, dynamic_mask},
        res2 = {pts3d_in_other_view, conf, dynamic_mask} — both pointmaps in
        view 1's frame (model.py:211-228). Maps are [B, H, W(, 3)].

        ``img_h/img_w`` are view 1's TRUE spatial shape (portrait views pass
        h > w); ``img_h2/img_w2`` default to view 1's — pass them when the
        two views have different orientations (the per-view heads are the
        functional form of the reference's ``transpose_to_landscape``
        wrappers, misc.py:76-118).
        """
        if img_h2 is None:
            img_h2, img_w2 = img_h, img_w
        dec1, dec2 = self._decode(f1, pos1, f2, pos2)
        # heads consume fp32 tokens ([tok.float() for tok in dec],
        # reference model.py:217-222)
        dec1 = [t.astype(self.cfg.head_dtype) for t in dec1]
        dec2 = [t.astype(self.cfg.head_dtype) for t in dec2]
        if stop_trunk_grad:
            dec1 = [jax.lax.stop_gradient(t) for t in dec1]
            dec2 = [jax.lax.stop_gradient(t) for t in dec2]

        c = self.cfg
        out1 = self.head1(dec1, img_h, img_w).astype(jnp.float32)
        out2 = self.head2(dec2, img_h2, img_w2).astype(jnp.float32)
        m1 = self.head_mask1(dec1, img_h, img_w,
                             deterministic=deterministic).astype(jnp.float32)
        m2 = self.head_mask2(dec2, img_h2, img_w2,
                             deterministic=deterministic).astype(jnp.float32)

        res1 = dict(
            pts3d=reg_dense_depth_exp(out1[..., :3]),
            conf=reg_dense_conf_exp(out1[..., 3], c.conf_vmin),
            dynamic_mask=jax.nn.sigmoid(m1[..., 0]))
        res2 = dict(
            pts3d_in_other_view=reg_dense_depth_exp(out2[..., :3]),
            conf=reg_dense_conf_exp(out2[..., 3], c.conf_vmin),
            dynamic_mask=jax.nn.sigmoid(m2[..., 0]))
        return res1, res2

    def __call__(self, img1, img2, stop_trunk_grad: bool = True,
                 deterministic: bool = True,
                 portrait1: bool = False, portrait2: bool = False,
                 landscape_out: bool = True):
        """Full two-view forward (the reference ``forward``, for tests and
        single-pair use; the pipeline uses encode()+decode()).

        ``portrait1/2``: the view's landscape buffer holds a transposed
        portrait image (ManyAR). Predictions are computed in the TRUE
        orientation; with ``landscape_out`` they are transposed back into
        the landscape buffer layout, matching the reference's
        transpose_to_landscape head wrappers (misc.py:76-118).
        """
        B, _, H, W = img1.shape
        f1, pos1 = self.encode(img1, portrait=portrait1)
        f2, pos2 = self.encode(img2, portrait=portrait2)
        h1, w1 = (W, H) if portrait1 else (H, W)
        H2, W2 = img2.shape[-2:]
        h2, w2 = (W2, H2) if portrait2 else (H2, W2)
        res1, res2 = self.decode(f1, pos1, f2, pos2, h1, w1,
                                 stop_trunk_grad=stop_trunk_grad,
                                 deterministic=deterministic,
                                 img_h2=h2, img_w2=w2)
        if landscape_out and portrait1:
            res1 = transposed_result(res1)
        if landscape_out and portrait2:
            res2 = transposed_result(res2)
        return res1, res2
