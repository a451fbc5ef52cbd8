"""Coarse-level transformer stacks in flax.

Re-designs reference src/model/modules/transformer.py:39-307
(Mlp-with-DWConv, LoFTREncoderLayer, QuadtreeBlock, LocalFeatureTransformer)
on NHWC/token layouts. Attention math lives in casmtr_tpu.ops; these modules
hold the parameters and wiring. Param names mirror the torch module names for
checkpoint conversion.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from casmtr_tpu.config import CoarseConfig
from casmtr_tpu.ops.attention import full_attention, linear_attention
from casmtr_tpu.ops.image_ops import avg_pool_2x2
from casmtr_tpu.ops.quadtree import qtatt_a, qtatt_b, qtatt_guided

_TRUNC = nn.initializers.truncated_normal(stddev=0.02)


def transformer_dtype(train: bool = False):
    """COMPUTE dtype for the coarse/cascade transformer stacks, chosen by
    MODE: bf16 on TPU in eval, f32 in train.  The reference runs these
    modules under fp16 autocast in training and eval (test.py:74); on TPU
    the measured A/B (r5, docs/evidence_r5/r5lm_ab.md) splits — eval fwd is
    3.5% faster in bf16 (no backward; 5.873 vs 5.672 pairs/s b1 at 832²),
    while the TRAIN step is ~1% faster with the stack in f32 (0.3385 vs
    0.3423 s: the bf16 backward's dtype-convert glue around the f32
    matching-head/LayerNorm boundaries outweighs the matmul saving at these
    shapes).  Params and normalization statistics stay f32 (flax), attention
    scores/softmaxes stay f32 (preferred_element_type / explicit upcasts in
    casmtr_tpu.ops), and the stack outputs are cast back to f32 before any
    matching head (CLAUDE.md precision invariant).
    ``CASMTR_TRANSFORMER_BF16=0/1`` forces either dtype in BOTH modes
    (0 reproduces the r1-r5 f32-glue behavior)."""
    import os
    v = os.environ.get("CASMTR_TRANSFORMER_BF16")
    if v is not None:
        return jnp.bfloat16 if v == "1" else jnp.float32
    if train:
        return jnp.float32
    return (jnp.bfloat16 if jax.devices()[0].platform == "tpu"
            else jnp.float32)


class Mlp(nn.Module):
    """fc1 -> ReLU -> 3x3 depthwise conv -> GELU -> fc2
    (reference transformer.py:53-92)."""
    hidden: int
    out: int
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, h: int, w: int):
        B, L, _ = x.shape
        x = nn.Dense(self.hidden, kernel_init=_TRUNC, name="fc1",
                     dtype=self.dtype)(x)
        x = nn.relu(x)
        xi = x.reshape(B, h, w, self.hidden)
        xi = nn.Conv(self.hidden, (3, 3), padding=1,
                     feature_group_count=self.hidden,
                     name="dwconv_dwconv", dtype=self.dtype)(xi)
        x = xi.reshape(B, L, self.hidden)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, kernel_init=_TRUNC, name="fc2",
                        dtype=self.dtype)(x)


class LoFTREncoderLayer(nn.Module):
    """Linear/full-attention encoder layer with cat-MLP residual
    (reference transformer.py:95-148)."""
    d_model: int
    nhead: int
    attention: str = "linear"
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, source, x_mask=None, source_mask=None):
        B = x.shape[0]
        D = self.d_model // self.nhead
        if self.dtype is not None:
            x = x.astype(self.dtype)
            source = source.astype(self.dtype)
        q = nn.Dense(self.d_model, use_bias=False, name="q_proj",
                     dtype=self.dtype)(x)
        k = nn.Dense(self.d_model, use_bias=False, name="k_proj",
                     dtype=self.dtype)(source)
        v = nn.Dense(self.d_model, use_bias=False, name="v_proj",
                     dtype=self.dtype)(source)
        q = q.reshape(B, -1, self.nhead, D)
        k = k.reshape(B, -1, self.nhead, D)
        v = v.reshape(B, -1, self.nhead, D)
        attn = linear_attention if self.attention == "linear" else full_attention
        msg = attn(q, k, v, q_mask=x_mask, kv_mask=source_mask)
        msg = msg.reshape(B, -1, self.d_model).astype(x.dtype)
        msg = nn.Dense(self.d_model, use_bias=False, name="merge",
                       dtype=self.dtype)(msg)
        msg = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=self.dtype)(msg)
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(2 * self.d_model, use_bias=False, name="mlp_0",
                     dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, use_bias=False, name="mlp_2",
                     dtype=self.dtype)(y)
        y = nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=self.dtype)(y)
        return x + y


class QuadtreeAttention(nn.Module):
    """q/k/v projections + avg-pool pyramid + QTAtt{A,B,Guided} + out proj
    (reference src/model/modules/quadtree_attention.py:9-99).

    The per-level merge logits live here as param 'py_att_weight' (torch:
    ``py_att.weight``)."""
    dim: int
    num_heads: int
    topks: Tuple[int, ...]
    scale: int = 3
    attn_type: str = "B"
    lepe: bool = False
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, target, hw_x: Tuple[int, int],
                 hw_t: Tuple[int, int], topk_pos=None, rel_pos=None):
        B, L, C = x.shape
        h, w = hw_x
        h1, w1 = hw_t
        D = self.dim // self.num_heads

        xi = x.reshape(B, h, w, C)
        ti = target.reshape(B, h1, w1, C)
        # 1x1 convs == position-wise dense (reference uses Conv2d k=1)
        q = nn.Dense(self.dim, use_bias=False, name="q_proj",
                     dtype=self.dtype)(xi)
        k = nn.Dense(self.dim, use_bias=False, name="k_proj",
                     dtype=self.dtype)(ti)
        v = nn.Dense(self.dim, use_bias=False, name="v_proj",
                     dtype=self.dtype)(ti)

        # bf16 pyramid on TPU: the gather tables/einsum inputs halve in size
        # and feed the MXU natively; all contractions accumulate in f32
        # (preferred_element_type) and softmaxes run on f32 scores. The
        # reference runs this module under fp16 autocast (fp32 only because
        # its CUDA kernel K2 is fp32-only; quadtree_attention.py:82-84).
        cdt = (jnp.bfloat16 if jax.devices()[0].platform == "tpu"
               else jnp.float32)
        qs, ks, vs, sizes = [], [], [], []
        qq, kk, vv = q, k, v
        hh, ww = h, w
        for i in range(self.scale):
            qs.append(qq.astype(cdt).reshape(B, hh * ww, self.num_heads, D))
            ks.append(kk.astype(cdt).reshape(B, hh * ww, self.num_heads, D))
            vs.append(vv.astype(cdt).reshape(B, hh * ww, self.num_heads, D))
            sizes.append((hh, ww))
            if i != self.scale - 1:
                qq = avg_pool_2x2(qq)
                kk = avg_pool_2x2(kk)
                vv = avg_pool_2x2(vv)
                hh, ww = hh // 2, ww // 2

        if self.attn_type in ("B", "Guided"):
            weight = self.param("py_att_weight", nn.initializers.normal(1.0),
                                (self.scale,))
        lepe_msgs = None
        if self.lepe:
            lepe_msgs = []
            for i in range(self.scale):
                hh, ww = sizes[self.scale - 1 - i]
                vi = vs[self.scale - 1 - i].reshape(B, hh, ww, self.dim)
                le = nn.Conv(self.dim, (3, 3), padding=1,
                             feature_group_count=self.dim,
                             name=f"get_vs_{i}", dtype=self.dtype)(vi)
                lepe_msgs.append(le.reshape(B, hh * ww, self.num_heads, D))
            lepe_msgs = list(reversed(lepe_msgs))  # finest-first

        if self.attn_type == "A":
            msg = qtatt_a(qs, ks, vs, sizes, list(self.topks))
        elif self.attn_type == "Guided":
            msg = qtatt_guided(qs, ks, vs, sizes, list(self.topks), weight,
                               topk_pos)
        else:
            msg = qtatt_b(qs, ks, vs, sizes, list(self.topks), weight,
                          lepe=lepe_msgs, rel_pos=rel_pos)
        msg = msg.reshape(B, L, self.dim).astype(x.dtype)
        return nn.Dense(self.dim, kernel_init=_TRUNC, name="proj",
                        dtype=self.dtype)(msg)


class QuadtreeBlock(nn.Module):
    """PreNorm quadtree attention + DWConv-MLP block
    (reference transformer.py:151-195). norm1 is shared between x and target."""
    dim: int
    num_heads: int
    topks: Tuple[int, ...]
    scale: int = 3
    attn_type: str = "B"
    mlp_ratio: float = 4.0
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, target, hw_x, hw_t, topk_pos=None, rel_pos=None):
        if self.dtype is not None:
            x = x.astype(self.dtype)
            target = target.astype(self.dtype)
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=self.dtype)
        attn = QuadtreeAttention(self.dim, self.num_heads, self.topks,
                                 scale=self.scale, attn_type=self.attn_type,
                                 name="attn", dtype=self.dtype)
        x = x + attn(norm1(x), norm1(target), hw_x, hw_t, topk_pos=topk_pos,
                     rel_pos=rel_pos)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp",
                    dtype=self.dtype)(
            nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=self.dtype)(x),
            hw_x[0], hw_x[1])
        return x


def relative_position_bucket(rel, num_buckets=32, max_distance=128):
    """T5-style log-bucketed relative positions
    (reference transformer.py:15-36, bidirectional)."""
    import math as _math

    nb = num_buckets // 2
    ret = (rel > 0).astype(jnp.int32) * nb
    n = jnp.abs(rel)
    max_exact = max(nb // 2, 1)
    max_distance = max(max_distance, max_exact + 1)
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / _math.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, nb - 1)
    return ret + jnp.where(n < max_exact, n, val_if_large)


class LocalFeatureTransformer(nn.Module):
    """Interleaved self/cross stack at the 1/8 level
    (reference transformer.py:198-307).

    For block_type='quadtree' the cross update is symmetric: both directions
    are computed from the pre-update features then assigned (reference :300).
    For block_type='loftr' the updates are sequential (reference :284-290).
    """
    config: CoarseConfig
    train_size: int
    remat: bool = True
    # static mode flag for the dtype policy (train graphs are already traced
    # separately from eval graphs — BatchNorm/supervision differ)
    train_mode: bool = False

    def _rel_pos_2d(self, h: int, w: int, scale_i: int, nhead: int):
        """Per-pyramid-level 2D relative PE [1, nhead, hw, hw]
        (reference transformer.py:231-257 _cal_2d_pos_emb): bucketed x/y
        offsets through per-level linear bias tables."""
        s = 2 ** scale_i
        hh, ww = h // s, w // s
        nb = self.train_size // s
        ys, xs = jnp.meshgrid(jnp.arange(hh), jnp.arange(ww), indexing="ij")
        px = xs.reshape(-1)
        py = ys.reshape(-1)
        rel_x = relative_position_bucket(px[None, :] - px[:, None],
                                         num_buckets=nb, max_distance=ww)
        rel_y = relative_position_bucket(py[None, :] - py[:, None],
                                         num_buckets=nb, max_distance=hh)
        w_bias = nn.Dense(nhead, use_bias=False,
                          name=f"w_pos_bias_{scale_i}")
        h_bias = nn.Dense(nhead, use_bias=False,
                          name=f"h_pos_bias_{scale_i}")
        bx = w_bias(jax.nn.one_hot(rel_x, nb))           # [hw, hw, nhead]
        by = h_bias(jax.nn.one_hot(rel_y, nb))
        return jnp.moveaxis(bx + by, -1, 0)[None]        # [1, nhead, hw, hw]

    @nn.compact
    def __call__(self, feat0, feat1, hw0: Tuple[int, int], hw1: Tuple[int, int],
                 mask0=None, mask1=None):
        cfg = self.config
        tdt = transformer_dtype(self.train_mode)
        # rematerialize each layer in the backward pass: the quadtree gather
        # tensors ([B, P, 4K, H, D] per level) would otherwise be stored as
        # autodiff residuals and dominate HBM (measured: OOM at 704^2 train)
        enc_cls = (nn.remat(LoFTREncoderLayer) if self.remat
                   else LoFTREncoderLayer)
        qt_cls = (nn.remat(QuadtreeBlock, static_argnums=(3, 4))
                  if self.remat else QuadtreeBlock)
        layers = []
        for li, name in enumerate(cfg.layer_names):
            if cfg.block_type == "loftr":
                layers.append(enc_cls(
                    cfg.d_model, cfg.nhead, cfg.attention,
                    name=f"layers_{li}", dtype=tdt))
            elif cfg.block_type == "quadtree":
                layers.append(qt_cls(
                    cfg.d_model, cfg.nhead, tuple(cfg.topks),
                    scale=3, attn_type=cfg.attn_type, name=f"layers_{li}",
                    dtype=tdt))
            else:
                raise ValueError(cfg.block_type)

        # optional per-level relative PE for the quadtree blocks (coarsest
        # first, matching the pyramid traversal; reference :271-276)
        rel_pos = None
        if getattr(cfg, "relative_pe", False) and cfg.block_type == "quadtree":
            rel_pos = [self._rel_pos_2d(hw0[0], hw0[1], i, cfg.nhead)
                       for i in (2, 1, 0)]

        for layer, name in zip(layers, cfg.layer_names):
            if cfg.block_type == "loftr":
                if name == "self":
                    feat0 = layer(feat0, feat0, mask0, mask0)
                    feat1 = layer(feat1, feat1, mask1, mask1)
                else:
                    feat0 = layer(feat0, feat1, mask0, mask1)
                    feat1 = layer(feat1, feat0, mask1, mask0)
            else:
                if name == "self":
                    feat0 = layer(feat0, feat0, hw0, hw0, None, rel_pos)
                    feat1 = layer(feat1, feat1, hw1, hw1, None, rel_pos)
                else:  # symmetric simultaneous cross (reference :300)
                    feat0, feat1 = (layer(feat0, feat1, hw0, hw1, None,
                                          rel_pos),
                                    layer(feat1, feat0, hw1, hw0, None,
                                          rel_pos))
        # matching heads are f32 (CLAUDE.md precision invariant); the stack
        # may have computed in bf16 (transformer_dtype)
        return feat0.astype(jnp.float32), feat1.astype(jnp.float32)
