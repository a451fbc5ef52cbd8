"""POLA (Patch-based OverLapping Attention) blocks in flax/NHWC.

Re-designs reference src/model/modules/POLAttention.py:69-453: each ws x ws
query window attends to its 3ws x 3ws overlapping neighborhood with a learned
relative-position-bias table. The bias index table reproduces the reference
computation bit-exactly (POLAttention.py:100-116) so converted checkpoints
see identical biases.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from casmtr_tpu.models.cascade_attention import (
    window_partition, window_reverse, pad_to_multiple)

_TRUNC = nn.initializers.truncated_normal(stddev=0.02)


def pola_relative_position_index(ws: int, n_win: int = 3) -> np.ndarray:
    """Bias-table index [ws*ws, (n_win*ws)^2] (reference POLAttention.py:100-116)."""
    qy, qx = np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
    ny, nx = np.meshgrid(np.arange(n_win * ws), np.arange(n_win * ws),
                         indexing="ij")
    q = np.stack([qy.ravel(), qx.ravel()])           # [2, ws*ws]
    n = np.stack([ny.ravel(), nx.ravel()])           # [2, (n_win*ws)^2]
    rel = q[:, :, None] - n[:, None, :]              # [2, Q, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += n_win * ws - 1
    rel[:, :, 1] += n_win * ws - 1
    rel[:, :, 0] *= (n_win + 1) * ws - 1
    return rel.sum(-1)


def neighborhood_patches(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """Extract overlapping 3ws x 3ws patches centred on each ws x ws window.

    x: [B, Hp, Wp, C] with Hp, Wp multiples of ws. Returns
    [B*nW, (3ws)*(3ws), C] in row-major patch order (the order torch
    ``F.unfold`` produces; reference POLAttention.py:311-314)."""
    B, Hp, Wp, C = x.shape
    nh, nw = Hp // ws, Wp // ws
    xp = jnp.pad(x, ((0, 0), (ws, ws), (ws, ws), (0, 0)))
    blocks = xp.reshape(B, nh + 2, ws, nw + 2, ws, C)
    rows = jnp.stack([blocks[:, i:i + nh] for i in range(3)], axis=2)
    # rows: [B, nh, 3, ws, nw+2, ws, C]
    full = jnp.stack([rows[:, :, :, :, j:j + nw] for j in range(3)], axis=5)
    # full: [B, nh, 3, ws, nw, 3, ws, C] -> [B, nh, nw, 3, ws, 3, ws, C]
    full = full.transpose(0, 1, 4, 2, 3, 5, 6, 7)
    return full.reshape(B * nh * nw, 3 * ws * 3 * ws, C)


class NeighborWindowAttention(nn.Module):
    """Windowed MHA with POLA relative position bias
    (reference POLAttention.py:69-171)."""
    dim: int
    window_size: int
    num_heads: int
    neig_win_num: int = 1
    qkv_bias: bool = True
    use_proj: bool = True

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        """q: [B', Nq, C]; k/v: [B', Nk, C]."""
        Bq, Nq, C = q.shape
        Nk = k.shape[1]
        hd = C // self.num_heads
        ws = self.window_size
        n_win = 2 * self.neig_win_num + 1

        table_len = (((n_win + 1) * ws - 1) * ((n_win + 1) * ws - 1))
        bias_table = self.param("relative_position_bias_table", _TRUNC,
                                (table_len, self.num_heads))
        idx = pola_relative_position_index(ws, n_win)
        bias = bias_table[jnp.asarray(idx.reshape(-1))]
        bias = bias.reshape(ws * ws, n_win * ws * n_win * ws, self.num_heads)

        qh = nn.Dense(C, use_bias=self.qkv_bias, name="Wq")(q)
        kh = nn.Dense(C, use_bias=self.qkv_bias, name="Wk")(k)
        vh = nn.Dense(C, use_bias=self.qkv_bias, name="Wv")(v)
        qh = qh.reshape(Bq, Nq, self.num_heads, hd) * (hd ** -0.5)
        kh = kh.reshape(Bq, Nk, self.num_heads, hd)
        vh = vh.reshape(Bq, Nk, self.num_heads, hd)
        # head-first: softmax on the LAST (lane) axis (CLAUDE.md layout rule)
        attn = jnp.einsum("blhd,bshd->bhls", qh, kh,
                          preferred_element_type=jnp.float32)
        attn = attn + jnp.moveaxis(bias, -1, 0)[None]
        if mask is not None:
            attn = attn + mask[:, None]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhls,bshd->blhd", attn.astype(vh.dtype), vh)
        out = out.reshape(Bq, Nq, C)
        if self.use_proj:
            out = nn.Dense(C, name="proj")(out)
        return out


class MultiHeadAttention(nn.Module):
    """Plain MHA (reference POLAttention.py:174-241)."""
    dim: int
    num_heads: int
    qkv_bias: bool = True
    use_proj: bool = True

    @nn.compact
    def __call__(self, q, k, v):
        B, Nq, C = q.shape
        Nk = k.shape[1]
        hd = C // self.num_heads
        qh = nn.Dense(C, use_bias=self.qkv_bias, name="Wq")(q)
        kh = nn.Dense(C, use_bias=self.qkv_bias, name="Wk")(k)
        vh = nn.Dense(C, use_bias=self.qkv_bias, name="Wv")(v)
        qh = qh.reshape(B, Nq, self.num_heads, hd) * (hd ** -0.5)
        kh = kh.reshape(B, Nk, self.num_heads, hd)
        vh = vh.reshape(B, Nk, self.num_heads, hd)
        attn = jax.nn.softmax(jnp.einsum(
            "blhd,bshd->bhls", qh, kh,
            preferred_element_type=jnp.float32), axis=-1)
        out = jnp.einsum("bhls,bshd->blhd", attn.astype(vh.dtype), vh)
        out = out.reshape(B, Nq, C)
        if self.use_proj:
            out = nn.Dense(C, name="proj")(out)
        return out


class POLAMlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="fc2")(x)


class POLATransBlock(nn.Module):
    """POLA transformer block (reference POLAttention.py:244-332)."""
    dim: int
    num_heads: int
    window_size: int = 7
    neig_win_num: int = 1
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, h: int, w: int):
        B, L, C = x.shape
        ws = self.window_size
        shortcut = x
        xn = nn.LayerNorm(epsilon=1e-5, name="norm1")(x).reshape(B, h, w, C)
        xn, pad_b, pad_r = pad_to_multiple(xn, ws)
        Hp, Wp = xn.shape[1:3]

        x_win = window_partition(xn, ws)              # [B*nW, ws*ws, C]
        key_val = neighborhood_patches(xn, ws)        # [B*nW, (3ws)^2, C]
        attn = NeighborWindowAttention(
            self.dim, ws, self.num_heads, self.neig_win_num,
            name="attn")(x_win, key_val, key_val)
        y = window_reverse(attn, ws, Hp, Wp)[:, :h, :w].reshape(B, L, C)
        x = shortcut + y
        x = x + POLAMlp(int(C * self.mlp_ratio), C, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x))
        return x


class MixAxialPOLABlock(nn.Module):
    """POLA on most heads + horizontal/vertical axial attention on the rest
    (reference POLAttention.py:335-453)."""
    dim: int
    num_heads: int = 8
    window_size: int = 7
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, h: int, w: int):
        B, L, C = x.shape
        hd = C // self.num_heads
        axis_head = 2
        local_head = self.num_heads - 2 * axis_head
        local_chl = local_head * hd
        axis_chl = axis_head * hd
        ws = self.window_size

        shortcut = x
        xn = nn.LayerNorm(epsilon=1e-5, name="norm1")(x).reshape(B, h, w, C)
        x_local = xn[..., :local_chl]
        x_horiz = xn[..., local_chl:local_chl + axis_chl]
        x_verti = xn[..., local_chl + axis_chl:]

        xl, pad_b, pad_r = pad_to_multiple(x_local, ws)
        Hp, Wp = xl.shape[1:3]
        x_win = window_partition(xl, ws)
        key_val = neighborhood_patches(xl, ws)
        attn = NeighborWindowAttention(local_chl, ws, local_head,
                                       name="localAttn")(x_win, key_val, key_val)
        x_local = window_reverse(attn, ws, Hp, Wp)[:, :h, :w]

        xh = x_horiz.reshape(B * h, w, axis_chl)
        xh = MultiHeadAttention(axis_chl, axis_head, use_proj=False,
                                name="horizAttn")(xh, xh, xh)
        x_horiz = xh.reshape(B, h, w, axis_chl)

        xv = x_verti.transpose(0, 2, 1, 3).reshape(B * w, h, axis_chl)
        xv = MultiHeadAttention(axis_chl, axis_head, use_proj=False,
                                name="vertiAttn")(xv, xv, xv)
        x_verti = xv.reshape(B, w, h, axis_chl).transpose(0, 2, 1, 3)

        y = jnp.concatenate([x_local, x_horiz, x_verti], axis=-1)
        y = y.reshape(B, L, C)
        y = nn.Dense(C, name="proj")(y)
        x = shortcut + y
        x = x + POLAMlp(int(C * self.mlp_ratio), C, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x))
        return x
