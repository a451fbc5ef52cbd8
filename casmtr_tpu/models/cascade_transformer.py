"""Cascade-stage transformer (window-restricted cross attention around the
previous stage's matches), in flax.

Re-designs reference src/model/modules/transformer.py:310-560
(CascadeQuadtreeBlock, CascadeFeatureTransformer): window warp index
generation with boundary clamping, the self-attention zoo dispatch, 2x index
upsampling, windowed relative PE (indoor), and the optional learnable
keypoint detector head.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from casmtr_tpu.config import CascadeStageConfig
from casmtr_tpu.models.cascade_attention import (
    DoubleGroupBlock, LKABlock, LocalBlock)
from casmtr_tpu.models.pola import POLATransBlock
from casmtr_tpu.models.transformer import (
    LoFTREncoderLayer, Mlp, QuadtreeBlock, transformer_dtype)
from casmtr_tpu.ops.propagation import get_propagations
from casmtr_tpu.ops.quadtree import cascade_qtatt_b

_TRUNC = nn.initializers.truncated_normal(stddev=0.02)


def window_warp_idx(idx: jnp.ndarray, window: np.ndarray, h: int, w: int,
                    full_window: Optional[np.ndarray] = None):
    """Previous-stage match indices -> boundary-clamped window positions.

    reference: transformer.py:416-440 (get_window_warp_idx).
    idx: [B, HW] flat indices on the (h, w) grid. Returns ([B, HW, ww, 2],
    optional full variant) of (y, x) positions; the whole window is shifted
    inward when it crosses a border."""
    pos = jnp.stack([idx // w, idx % w], axis=-1)           # [B, HW, 2]
    win = jnp.asarray(window, jnp.int32)                    # [ww, 2]
    idx_yx = pos[:, :, None, :] + win[None, None]           # [B, HW, ww, 2]
    if full_window is not None:
        idx_full = pos[:, :, None, :] + jnp.asarray(full_window, jnp.int32)
    else:
        idx_full = None

    under = jnp.min(idx_yx, axis=2, keepdims=True)
    under = under * (under < 0)
    over = jnp.max(idx_yx, axis=2, keepdims=True)
    over_y = (over[..., 0] - (h - 1)) * (over[..., 0] >= h)
    over_x = (over[..., 1] - (w - 1)) * (over[..., 1] >= w)
    over = jnp.stack([over_y, over_x], axis=-1)
    idx_yx = idx_yx - under - over
    if idx_full is not None:
        idx_full = idx_full - under - over
    return idx_yx, idx_full


def upsample_idx(topk_pos: jnp.ndarray, h0: int, h1: int, w1: int
                 ) -> jnp.ndarray:
    """2x index dilation of a window position set
    (reference transformer.py:442-457). topk_pos: [B, P, K, 2] (y, x) on the
    (h1, w1) half-res grid of image1; h0 = half-res rows of image0.
    Returns [B, 4*P, K*4] int32 flat indices on the (2*h1, 2*w1) grid."""
    B, P, K, _ = topk_pos.shape
    pos = topk_pos * 2
    cands = []
    for dr in (0, 1):
        for dc in (0, 1):
            cands.append((pos[..., 0] + dr) * (w1 * 2) + pos[..., 1] + dc)
    idx = jnp.stack(cands, axis=3)                          # [B, P, K, 4]
    idx = jnp.clip(idx.reshape(B, P, K * 4), 0, (h1 * 2) * (w1 * 2) - 1)
    idx = jnp.broadcast_to(idx[:, :, None, :], (B, P, 4, K * 4))
    # un-block children to the full-res grid of image0
    w0 = P // h0
    idx = idx.reshape(B, h0, w0, 2, 2, K * 4)
    idx = jnp.moveaxis(idx, 3, 2)
    return idx.reshape(B, 4 * P, K * 4)


class CascadeQuadtreeAttention(nn.Module):
    """q/k/v projections around cascade_qtatt_b
    (reference src/model/modules/quadtree_attention.py:102-171).
    window_structured: the idx set is a contiguous boundary-shifted window
    (window propagation) -> enables the patch-granular gather path."""
    dim: int
    num_heads: int
    dilated: int = 1
    window_structured: bool = False
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, target, hw_x, hw_t, idx, rel_pos=None):
        B, L, C = x.shape
        D = self.dim // self.num_heads
        q = nn.Dense(self.dim, use_bias=False, name="q_proj",
                     dtype=self.dtype)(x)
        k = nn.Dense(self.dim, use_bias=False, name="k_proj",
                     dtype=self.dtype)(target)
        v = nn.Dense(self.dim, use_bias=False, name="v_proj",
                     dtype=self.dtype)(target)
        # bf16 gather tables on TPU (f32-accumulated contractions; the
        # reference runs under fp16 autocast)
        cdt = (jnp.bfloat16 if jax.devices()[0].platform == "tpu"
               else jnp.float32)
        q = q.astype(cdt).reshape(B, L, self.num_heads, D)
        k = k.astype(cdt).reshape(B, -1, self.num_heads, D)
        v = v.astype(cdt).reshape(B, -1, self.num_heads, D)
        msg, up_idx = cascade_qtatt_b(
            q, k, v, idx, hw_x, hw_t, dilated=self.dilated, rel_pos=rel_pos,
            window_structured=self.window_structured)
        msg = msg.reshape(B, L, self.dim).astype(x.dtype)
        return nn.Dense(self.dim, kernel_init=_TRUNC, name="proj",
                        dtype=self.dtype)(msg), up_idx


class CascadeQuadtreeBlock(nn.Module):
    """PreNorm cascade cross-attention + DWConv-MLP
    (reference transformer.py:310-350). norm1 shared between x and target."""
    dim: int
    num_heads: int
    dilated: int = 1
    mlp_ratio: float = 4.0
    window_structured: bool = False
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, target, hw_x, hw_t, idx, rel_pos=None):
        if self.dtype is not None:
            x = x.astype(self.dtype)
            target = target.astype(self.dtype)
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=self.dtype)
        y, up_idx = CascadeQuadtreeAttention(
            self.dim, self.num_heads, self.dilated,
            window_structured=self.window_structured, name="attn",
            dtype=self.dtype)(
                norm1(x), norm1(target), hw_x, hw_t, idx, rel_pos)
        x = x + y
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp",
                    dtype=self.dtype)(
            nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=self.dtype)(x),
            hw_x[0], hw_x[1])
        return x, up_idx


class CascadeFeatureTransformer(nn.Module):
    """Cascade-level transformer (reference transformer.py:353-560)."""
    config: CascadeStageConfig
    train_size: int
    remat: bool = True
    # static mode flag for the dtype policy (see transformer_dtype)
    train_mode: bool = False

    def setup(self):
        cfg = self.config
        self.window, self.full_window = get_propagations(
            cfg.propagation, cfg.window_size, cfg.dilated)
        aws = cfg.attn_window_size or cfg.window_size
        # compute dtype for the stack (bf16 on TPU in eval, f32 in train —
        # see transformer_dtype; reference fp16 autocast); POLA/LKA blocks
        # keep their own f32 internals (indoor zoo, small)
        tdt = transformer_dtype(self.train_mode)
        # remat each block (static_argnums count `self` as 0; the spatial-dim
        # arguments are python ints/tuples)
        if self.remat:
            dgb = nn.remat(DoubleGroupBlock, static_argnums=(2, 3))
            lb = nn.remat(LocalBlock, static_argnums=(2, 3))
            pola = nn.remat(POLATransBlock, static_argnums=(2, 3))
            enc = nn.remat(LoFTREncoderLayer)
            qtb = nn.remat(QuadtreeBlock, static_argnums=(3, 4))
            cqb = nn.remat(CascadeQuadtreeBlock, static_argnums=(3, 4))
        else:
            dgb, lb, pola, enc, qtb, cqb = (
                DoubleGroupBlock, LocalBlock, POLATransBlock,
                LoFTREncoderLayer, QuadtreeBlock, CascadeQuadtreeBlock)
        layers = []
        for li, name in enumerate(cfg.layer_names):
            if name == "self":
                t = cfg.self_attn_type
                if t == "local_global":
                    layers.append(dgb(
                        cfg.d_model, cfg.nhead, 4.0, cfg.sr_ratio, aws,
                        dtype=tdt, name=f"layers_{li}"))
                elif t == "local":
                    layers.append(lb(cfg.d_model, cfg.nhead, 4.0, aws,
                                     dtype=tdt, name=f"layers_{li}"))
                elif t == "LKA":
                    layers.append(LKABlock(cfg.d_model, 4.0,
                                           name=f"layers_{li}"))
                elif t == "topk":
                    layers.append(qtb(
                        cfg.d_model, cfg.nhead, tuple(cfg.topks),
                        scale=len(cfg.topks), attn_type="Guided",
                        dtype=tdt, name=f"layers_{li}"))
                elif t == "POLA":
                    layers.append(pola(
                        cfg.d_model, cfg.nhead, window_size=aws,
                        name=f"layers_{li}"))
                elif t == "linear":
                    layers.append(enc(
                        cfg.d_model, cfg.nhead, "linear",
                        dtype=tdt, name=f"layers_{li}"))
                else:
                    raise NotImplementedError(t)
            elif name == "cross":
                layers.append(cqb(
                    cfg.d_model, cfg.nhead, dilated=cfg.dilated,
                    window_structured=(cfg.propagation == "window"
                                       and cfg.dilated == 1),
                    dtype=tdt, name=f"layers_{li}"))
            else:
                raise NotImplementedError(name)
        self.layers = layers

        if cfg.relative_pe:
            if cfg.sr_ratio == 2:
                self.LB = cfg.window_size * 2
            else:
                self.LB = cfg.window_size * 6
            self.h_pos_bias = nn.Embed(self.LB * 2 + cfg.sr_ratio, cfg.nhead,
                                       name="h_pos_bias")
            self.w_pos_bias = nn.Embed(self.LB * 2 + cfg.sr_ratio, cfg.nhead,
                                       name="w_pos_bias")
        if cfg.detector == "learnable":
            self.detector_layers = [
                nn.Conv(cfg.d_model, (3, 3), padding=1, name="detector_0"),
                nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="detector_1"),
                nn.Conv(1, (1, 1), name="detector_3"),
            ]

    def _relative_pe(self, hw_8c_q, hw_8c_t, next_idx_8c, window_idx,
                     H: int, W: int):
        """Windowed relative PE (reference transformer.py:473-509).

        hw_8c_q/t: 1/8 grids of the query/target image; next_idx_8c: [B, hw]
        coarse matches of the query image; window_idx: [B, (H//2)*(W//2), ww, 2]
        (y, x) warp window. Returns [B, nhead, H*W, 4*ww]."""
        cfg = self.config
        h, w = hw_8c_q
        w1 = hw_8c_t[1]
        s = H // h
        W1 = w1 * s
        B = next_idx_8c.shape[0]
        LB = self.LB

        # (x, y) sub-position of each full-res cell within its 1/8 cell
        sy, sx = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
        sub = jnp.asarray(np.stack([sx, sy], -1).astype(np.int32))  # [s,s,2]
        src = jnp.tile(sub[None, None], (1, h * w, 1, 1, 1))
        src = src.reshape(1, h, w, s, s, 2).transpose(0, 1, 3, 2, 4, 5)
        src = src.reshape(1, H * W, 1, 2)

        # matched 1/8 cell centre at current-level coords (x, y)
        tgt = jnp.stack([next_idx_8c % w1, next_idx_8c // w1], -1)  # [B,hw,2]
        tgt = jnp.tile(tgt[:, :, None], (1, 1, s * s, 1))
        tgt = tgt.reshape(B, h, w, s, s, 2).transpose(0, 1, 3, 2, 4, 5)
        tgt = tgt.reshape(B, H * W, 2) * s + (s // 2 - 1)           # [B,HW,2]

        # expand the warp window to the full-res grid (reference :487-497)
        wi = window_idx * 2
        cands = []
        for dr in (0, 1):
            for dc in (0, 1):
                cands.append((wi[..., 0] + dr) * W1 + wi[..., 1] + dc)
        wi = jnp.stack(cands, axis=3)                    # [B, HW/4, ww, 4]
        ww = wi.shape[2]
        wi = wi.reshape(B, -1, ww * 4)                   # [B, HW/4, 4ww]
        wi = jnp.tile(wi[:, None], (1, 4, 1, 1))         # [B, 4, HW/4, 4ww]
        wi = wi.reshape(B, 2, 2, H // 2, W // 2, ww * 4)
        wi = wi.transpose(0, 3, 1, 4, 2, 5).reshape(B, H * W, ww * 4)
        wi = jnp.stack([wi % W1, wi // W1], axis=-1)     # [B, HW, 4ww, 2] (x,y)

        tgt_rel = tgt[:, :, None] - wi + LB
        rel = src - tgt_rel + 2 * LB
        rel = jnp.clip(rel, 0, self.w_pos_bias.num_embeddings - 1)
        bias = (self.w_pos_bias(rel[..., 0]) + self.h_pos_bias(rel[..., 1]))
        return jnp.moveaxis(bias, -1, 1)                 # [B, nhead, HW, 4ww]

    def __call__(self, feat0, feat1, idx_c01, idx_c10,
                 hw0: Tuple[int, int], hw1: Tuple[int, int],
                 hw0_8c=None, hw1_8c=None, next_idx_8c01=None,
                 next_idx_8c10=None, conf_matrix_8c=None, train: bool = False):
        """feat0/feat1: [B, L, C] at this level; idx_c01/idx_c10: [B, L/4]
        previous-stage best-match indices (on the 2x-coarser grid). Returns
        (feat0, feat1, idx_c01_full [B, L0, 4ww], idx_c10_full, heatmap0)."""
        if train != self.train_mode:
            # the compute dtype is chosen at construction (setup) from
            # train_mode; a mismatched call-time flag would run train-mode
            # block semantics on the eval bf16 stack (or vice versa)
            raise ValueError(
                "CascadeFeatureTransformer: call-time train flag "
                f"({train}) must match the train_mode constructor flag "
                f"({self.train_mode}) — pass train_mode=train when "
                "constructing")
        cfg = self.config
        H0, W0 = hw0
        H1, W1 = hw1
        B = feat0.shape[0]

        # idx_c01 holds matches of image0 cells ON IMAGE1's half grid (and
        # vice versa) — decode/clamp with the TARGET image's dims (the
        # upsample_idx calls below already do; decoding with the source dims
        # silently corrupts windows whenever the two images differ in shape)
        idx_c01_w, idx_c01_full = window_warp_idx(
            idx_c01, self.window, H1 // 2, W1 // 2, self.full_window)
        idx_c10_w, idx_c10_full = window_warp_idx(
            idx_c10, self.window, H0 // 2, W0 // 2, self.full_window)
        # structured candidate corners (top-left of the shifted window on the
        # half grid) for the Pallas patch kernels; only the plain window
        # propagation is patch-contiguous
        if cfg.propagation == "window" and cfg.dilated == 1:
            corners01 = idx_c01_w[:, :, 0, :]
            corners10 = idx_c10_w[:, :, 0, :]
        else:
            corners01 = corners10 = None

        if cfg.relative_pe:
            rel_pe_c01 = self._relative_pe(hw0_8c, hw1_8c, next_idx_8c01,
                                           idx_c01_w, H0, W0)
            rel_pe_c10 = self._relative_pe(hw1_8c, hw0_8c, next_idx_8c10,
                                           idx_c10_w, H1, W1)
        else:
            rel_pe_c01 = rel_pe_c10 = None

        idx_c01_x2 = idx_c10_x2 = None
        cycle = None  # loop-invariant: compute once for all 'self' layers
        for layer, name in zip(self.layers, cfg.layer_names):
            if name == "self":
                if cfg.self_attn_type == "topk":
                    if cycle is None:
                        cycle = self._cycle_topk(conf_matrix_8c, hw0_8c,
                                                 hw1_8c)
                    c0, c1 = cycle
                    feat0 = layer(feat0, feat0, (H0, W0), (H0, W0), topk_pos=c0)
                    feat1 = layer(feat1, feat1, (H1, W1), (H1, W1), topk_pos=c1)
                elif cfg.self_attn_type == "linear":
                    feat0 = layer(feat0, feat0)
                    feat1 = layer(feat1, feat1)
                elif cfg.self_attn_type == "LKA":
                    feat0 = layer(feat0, H0, W0, train=train)
                    feat1 = layer(feat1, H1, W1, train=train)
                else:
                    feat0 = layer(feat0, H0, W0)
                    feat1 = layer(feat1, H1, W1)
            else:
                (feat0, idx_c01_x2), (feat1, idx_c10_x2) = (
                    layer(feat0, feat1, (H0, W0), (H1, W1), idx_c01_w,
                          rel_pe_c01),
                    layer(feat1, feat0, (H1, W1), (H0, W0), idx_c10_w,
                          rel_pe_c10))

        # matching heads / detector are f32 (CLAUDE.md precision invariant);
        # the stack may have computed in bf16 (transformer_dtype)
        feat0 = feat0.astype(jnp.float32)
        feat1 = feat1.astype(jnp.float32)

        if idx_c01_full is None:
            idx_c01_out = idx_c01_x2
            idx_c10_out = idx_c10_x2
        else:
            idx_c01_out = upsample_idx(idx_c01_full, H0 // 2, H1 // 2, W1 // 2)
            idx_c10_out = upsample_idx(idx_c10_full, H1 // 2, H0 // 2, W0 // 2)

        heatmap0 = None
        if cfg.detector == "learnable":
            x = feat0.reshape(B, H0, W0, -1)
            x = self.detector_layers[0](x)
            x = self.detector_layers[1](x, use_running_average=not train)
            x = nn.silu(x)
            heatmap0 = self.detector_layers[2](x)[..., 0]   # [B, H0, W0]

        return (feat0, feat1, idx_c01_out, idx_c10_out, heatmap0,
                corners01, corners10)

    def _cycle_topk(self, conf_matrix, hw0_8c, hw1_8c):
        """Cycle-consistent top-k from the 1/8 conf matrix
        (reference transformer.py:459-471; experimental 'topk' self-attention,
        not used in any released recipe). Returns flat index sets
        [B, L, k, nhead] for QTAttGuided."""
        cfg = self.config
        k = cfg.topks[0]
        from casmtr_tpu.ops.quadtree import exact_topk
        B, L0, L1 = conf_matrix.shape
        # 2-D operands: >2-D top_k hits the TPU layout pathology (CLAUDE.md)
        topk_idx_c01 = exact_topk(
            conf_matrix.reshape(B * L0, L1), k)[1].reshape(B, L0, k)
        topk_idx_c10 = exact_topk(
            jnp.swapaxes(conf_matrix, 1, 2).reshape(B * L1, L0),
            k)[1].reshape(B, L1, k)
        best01 = topk_idx_c01[:, :, 0]                            # [B, L0]
        best10 = topk_idx_c10[:, :, 0]                            # [B, L1]
        # rows of the reverse top-k table at each position's best match
        cyc0 = jnp.take_along_axis(
            topk_idx_c10, jnp.broadcast_to(best01[:, :, None],
                                           best01.shape + (k,)), axis=1)
        cyc1 = jnp.take_along_axis(
            topk_idx_c01, jnp.broadcast_to(best10[:, :, None],
                                           best10.shape + (k,)), axis=1)
        nh = cfg.nhead
        c0 = jnp.broadcast_to(cyc0[..., None], cyc0.shape + (nh,)).astype(jnp.int32)
        c1 = jnp.broadcast_to(cyc1[..., None], cyc1.shape + (nh,)).astype(jnp.int32)
        return c0, c1
