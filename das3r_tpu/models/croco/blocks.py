"""CroCo ViT building blocks in flax.linen — weight-compatible with the
reference's (absent) croco submodule whose API is recovered from call sites
(SURVEY.md §2.11; dust3r/model.py:136-203 uses Block(x, pos) and
DecoderBlock(x, y, xpos, ypos)).

TPU notes: attention runs as plain batched matmuls (B x heads x N x N fits
easily for N<=1536 tokens at 512px) with fp32 accumulation via
``preferred_element_type``; RoPE is fused elementwise work. bf16 activations
are supported by passing ``dtype=jnp.bfloat16``.
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from das3r_tpu.models.croco.rope import rope_2d


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return x


def _attend(q, k, v, scale):
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


class Attention(nn.Module):
    """Self-attention with 2D RoPE on q and k (croco blocks.Attention)."""
    dim: int
    num_heads: int
    rope_base: float = 100.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos):
        B, N, C = x.shape
        H = self.num_heads
        d = C // H
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]                  # [B, H, N, d]
        q = rope_2d(q, pos, self.rope_base).astype(v.dtype)
        k = rope_2d(k, pos, self.rope_base).astype(v.dtype)
        out = _attend(q, k, v, d ** -0.5)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class CrossAttention(nn.Module):
    """Cross-attention: queries from x (xpos), keys/values from y (ypos)."""
    dim: int
    num_heads: int
    rope_base: float = 100.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key, value, xpos, ypos):
        B, Nq, C = x.shape
        Nk = key.shape[1]
        H = self.num_heads
        d = C // H

        def split(t, n):
            return t.reshape(B, n, H, d).transpose(0, 2, 1, 3)

        q = split(nn.Dense(C, dtype=self.dtype, name="projq")(x), Nq)
        k = split(nn.Dense(C, dtype=self.dtype, name="projk")(key), Nk)
        v = split(nn.Dense(C, dtype=self.dtype, name="projv")(value), Nk)
        q = rope_2d(q, xpos, self.rope_base).astype(v.dtype)
        k = rope_2d(k, ypos, self.rope_base).astype(v.dtype)
        out = _attend(q, k, v, d ** -0.5)
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    """Pre-norm encoder block (croco blocks.Block; mlp_ratio 4)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    rope_base: float = 100.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos):
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                       name=name)
        x = x + Attention(self.dim, self.num_heads, self.rope_base,
                          self.dtype, name="attn")(ln("norm1")(x), pos)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, self.dtype,
                    name="mlp")(ln("norm2")(x))
        return x


class DecoderBlock(nn.Module):
    """Decoder block with self-attn, cross-attn to the other view, and MLP
    (croco blocks.DecoderBlock with norm_mem=True: the memory y is
    LayerNorm-ed by ``norm_y`` before attending)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    rope_base: float = 100.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, xpos, ypos):
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                       name=name)
        x = x + Attention(self.dim, self.num_heads, self.rope_base,
                          self.dtype, name="attn")(ln("norm1")(x), xpos)
        y_ = ln("norm_y")(y)
        x = x + CrossAttention(self.dim, self.num_heads, self.rope_base,
                               self.dtype, name="cross_attn")(
            ln("norm2")(x), y_, y_, xpos, ypos)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, self.dtype,
                    name="mlp")(ln("norm3")(x))
        return x, y


class PatchEmbed(nn.Module):
    """16x16 patchify as one MXU matmul (exactly equals the torch
    Conv2d(3, D, 16, stride=16); reference dust3r/patch_embed.py:19-29).

    Input [B, 3, H, W] (torch channel order kept at the API boundary);
    returns tokens [B, N, D] and integer (y, x) positions [B, N, 2].
    """
    patch_size: int = 16
    embed_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img):
        B, C, H, W = img.shape
        p = self.patch_size
        assert H % p == 0 and W % p == 0, (H, W, p)
        nh, nw = H // p, W // p
        # [B, C, nh, p, nw, p] -> [B, nh, nw, C*p*p] with torch conv's
        # (c, dy, dx) flattening order
        x = img.reshape(B, C, nh, p, nw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, nh * nw, C * p * p)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="proj")(
            x.astype(self.dtype))
        yy, xx = jnp.meshgrid(jnp.arange(nh), jnp.arange(nw), indexing="ij")
        pos = jnp.stack([yy, xx], -1).reshape(1, nh * nw, 2)
        pos = jnp.broadcast_to(pos, (B, nh * nw, 2))
        return x, pos
