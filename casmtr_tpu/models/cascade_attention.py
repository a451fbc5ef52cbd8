"""Self-attention block zoo for the cascade stages, in flax/NHWC.

Re-designs reference src/model/modules/cascade_attention.py:95-327:
windowed MSA (GroupAttention), global MSA with spatial-reduction kv
(Attention), the Twins-style local/global block pair, and the LKA
(large-kernel-attention) conv alternative.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

_TRUNC = nn.initializers.truncated_normal(stddev=0.02)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, ws*ws, C] (Swin-style)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(wins: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    """Inverse of window_partition: [B*nW, ws*ws, C] -> [B, H, W, C]."""
    C = wins.shape[-1]
    B = wins.shape[0] // ((H // ws) * (W // ws))
    x = wins.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def pad_to_multiple(x: jnp.ndarray, ws: int):
    """Zero-pad [B, H, W, C] bottom/right to multiples of ws."""
    B, H, W, C = x.shape
    pad_b = (ws - H % ws) % ws
    pad_r = (ws - W % ws) % ws
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    return x, pad_b, pad_r


class GroupAttention(nn.Module):
    """Non-overlapping window MSA with pad-group masking (queries in the
    padded region only attend to padded keys and vice versa; reference
    cascade_attention.py:129-160)."""
    dim: int
    num_heads: int
    ws: int
    qkv_bias: bool = False
    dtype: Optional[object] = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x, h: int, w: int):
        B, N, C = x.shape
        hd = C // self.num_heads
        xi = x.reshape(B, h, w, C)
        xi, pad_b, pad_r = pad_to_multiple(xi, self.ws)
        Hp, Wp = xi.shape[1:3]

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, kernel_init=_TRUNC,
                       name="qkv", dtype=self.dtype)(xi)
        qkv = window_partition(qkv, self.ws)          # [B*nW, ws*ws, 3C]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        BW, WW, _ = q.shape
        q = q.reshape(BW, WW, self.num_heads, hd)
        k = k.reshape(BW, WW, self.num_heads, hd)
        v = v.reshape(BW, WW, self.num_heads, hd)

        # head-first layout: the softmax axis stays LAST (lane dim) — the
        # repo's measured TPU layout rule (CLAUDE.md)
        attn = jnp.einsum("wlhd,wshd->whls", q, k,
                          preferred_element_type=jnp.float32) * (hd ** -0.5)
        if pad_b or pad_r:
            # per-dimension pad masking. NOTE deviation: the reference's
            # forward_mask executes mask[:, -pad_b:].fill_(1) UNCONDITIONALLY
            # (cascade_attention.py), so pad_b==0 marks the whole mask and
            # degenerates; we mask each dimension only when it is padded.
            is_pad = jnp.zeros((1, Hp, Wp, 1), jnp.float32)
            if pad_b:
                is_pad = is_pad.at[:, Hp - pad_b:].set(1.0)
            if pad_r:
                is_pad = is_pad.at[:, :, Wp - pad_r:].set(1.0)
            pm = window_partition(is_pad, self.ws)[..., 0]  # [nW, ws*ws]
            diff = pm[:, :, None] - pm[:, None, :]          # [nW, WW, WW]
            bias = jnp.where(diff != 0, -1000.0, 0.0)
            nW = pm.shape[0]
            attn = attn.reshape(B, nW, self.num_heads, WW, WW)
            attn = attn + bias[:, None]
            attn = attn.reshape(BW, self.num_heads, WW, WW)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("whls,wshd->wlhd", attn.astype(v.dtype), v)
        out = out.reshape(BW, WW, C)
        out = window_reverse(out, self.ws, Hp, Wp)
        out = out[:, :h, :w].reshape(B, N, C)
        return nn.Dense(C, kernel_init=_TRUNC, name="proj",
                        dtype=self.dtype)(out)


class Attention(nn.Module):
    """Global MSA with optional spatial-reduction kv
    (reference cascade_attention.py:188-230)."""
    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = False
    ln_eps: float = 1e-5
    dtype: Optional[object] = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x, h: int, w: int):
        B, N, C = x.shape
        hd = C // self.num_heads
        q = nn.Dense(C, use_bias=self.qkv_bias, kernel_init=_TRUNC,
                     name="q", dtype=self.dtype)(
                         x).reshape(B, N, self.num_heads, hd)
        if self.sr_ratio > 1:
            xi = x.reshape(B, h, w, C)
            # VALID: torch Conv2d(k=sr, stride=sr, padding=0) floors the grid
            # (flax default SAME would ceil and zero-pad the tail)
            xi = nn.Conv(C, (self.sr_ratio, self.sr_ratio),
                         strides=(self.sr_ratio, self.sr_ratio),
                         padding="VALID", name="sr", dtype=self.dtype)(xi)
            xi = xi.reshape(B, -1, C)
            xi = nn.LayerNorm(epsilon=self.ln_eps, name="norm",
                              dtype=self.dtype)(xi)
        else:
            xi = x
        kv = nn.Dense(2 * C, use_bias=self.qkv_bias, kernel_init=_TRUNC,
                      name="kv", dtype=self.dtype)(xi)
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(B, -1, self.num_heads, hd)
        v = v.reshape(B, -1, self.num_heads, hd)
        # head-first: softmax on the LAST (lane) axis (CLAUDE.md layout rule)
        attn = jnp.einsum("blhd,bshd->bhls", q, k,
                          preferred_element_type=jnp.float32) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhls,bshd->blhd", attn.astype(v.dtype), v)
        out = out.reshape(B, N, C)
        return nn.Dense(C, kernel_init=_TRUNC, name="proj",
                        dtype=self.dtype)(out)


class VITMlp(nn.Module):
    """Plain 2-layer MLP (reference cascade_attention.py:10-26)."""
    hidden: int
    out: int
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=_TRUNC, name="fc1",
                     dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, kernel_init=_TRUNC, name="fc2",
                        dtype=self.dtype)(x)


class GroupBlock(nn.Module):
    """PreNorm (window or global) MSA + MLP (reference :233-247)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    sr_ratio: int = 1
    ws: int = 1
    qkv_bias: bool = False
    ln_eps: float = 1e-5
    dtype: Optional[object] = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x, h: int, w: int):
        if self.ws == 1:
            attn = Attention(self.dim, self.num_heads, self.sr_ratio,
                             qkv_bias=self.qkv_bias, name="attn",
                             dtype=self.dtype)
        else:
            attn = GroupAttention(self.dim, self.num_heads, self.ws,
                                  qkv_bias=self.qkv_bias, name="attn",
                                  dtype=self.dtype)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = x + attn(nn.LayerNorm(epsilon=self.ln_eps, name="norm1",
                                  dtype=self.dtype)(x), h, w)
        x = x + VITMlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp",
                       dtype=self.dtype)(
            nn.LayerNorm(epsilon=self.ln_eps, name="norm2",
                         dtype=self.dtype)(x))
        return x


class DoubleGroupBlock(nn.Module):
    """Local window block then global sr block (Twins-style; reference :250-259)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    sr_ratio: int = 1
    ws: int = 1
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, h: int, w: int):
        x = GroupBlock(self.dim, self.num_heads, self.mlp_ratio, 1, self.ws,
                       name="block_local", dtype=self.dtype)(x, h, w)
        x = GroupBlock(self.dim, self.num_heads, self.mlp_ratio,
                       self.sr_ratio, 1, name="block_global",
                       dtype=self.dtype)(x, h, w)
        return x


class LocalBlock(nn.Module):
    """Window block only (reference :262-269)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    ws: int = 1
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, h: int, w: int):
        return GroupBlock(self.dim, self.num_heads, self.mlp_ratio, 1,
                          self.ws, name="block_local",
                          dtype=self.dtype)(x, h, w)


class LKA(nn.Module):
    """Large-kernel attention: DW 5x5 + DW-dilated 7x7(d3) + 1x1, gating
    (reference :272-287)."""
    dim: int
    kernel_size: int = 21
    dilation: int = 3

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        attn = nn.Conv(self.dim, (2 * d - 1, 2 * d - 1), padding=d - 1,
                       feature_group_count=self.dim, name="conv0")(x)
        ks = math.ceil(self.kernel_size / d)
        pad = math.ceil((self.kernel_size - d - 1) / 2)
        attn = nn.Conv(self.dim, (ks, ks), padding=pad, kernel_dilation=(d, d),
                       feature_group_count=self.dim, name="conv_spatial")(attn)
        attn = nn.Conv(self.dim, (1, 1), name="conv1")(attn)
        return x * attn


class VAN(nn.Module):
    """proj -> GELU -> LKA -> proj with residual (reference :290-306)."""
    dim: int

    @nn.compact
    def __call__(self, x):
        sc = x
        x = nn.Conv(self.dim, (1, 1), name="proj_1")(x)
        x = nn.gelu(x, approximate=False)
        x = LKA(self.dim, name="spatial_gating_unit")(x)
        x = nn.Conv(self.dim, (1, 1), name="proj_2")(x)
        return x + sc


class LKABlock(nn.Module):
    """BN + VAN + conv-MLP with layer-scale (reference :309-327)."""
    dim: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, h: int, w: int, train: bool = False):
        B, N, C = x.shape
        xi = x.reshape(B, h, w, C)
        ls1 = self.param("layer_scale_1",
                         nn.initializers.constant(1e-2), (C,))
        ls2 = self.param("layer_scale_2",
                         nn.initializers.constant(1e-2), (C,))
        bn1 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, name="norm1")
        bn2 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, name="norm2")
        xi = xi + ls1 * VAN(C, name="attn")(bn1(xi))
        hidden = int(C * self.mlp_ratio)
        y = bn2(xi)
        y = nn.Conv(hidden, (1, 1), name="mlp_fc1")(y)
        y = nn.Conv(hidden, (3, 3), padding=1, feature_group_count=hidden,
                    name="mlp_dwconv_dwconv")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(C, (1, 1), name="mlp_fc2")(y)
        xi = xi + ls2 * y
        return xi.reshape(B, N, C)
