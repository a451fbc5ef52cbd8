"""Twins-SVT (ALTGVT) backbone + FPN in flax/NHWC.

Re-designs reference src/model/backbone/gvt.py (PatchEmbed :256-281, PosCNN
conditional position encoding :397-416, ALTGVT alternating window/global
blocks :500-569, truncated ``first2_layers`` variants :580-640, size presets
:782-827) and twins_fpn.py:81-167 (conv stem for 1/2 + ViT stages for 1/4 and
1/8 + FPN fusion with ImageNet normalization).

The window/global attention blocks are shared with the cascade zoo
(casmtr_tpu.models.cascade_attention.GroupBlock) — the reference duplicates
them between gvt.py and cascade_attention.py; here one implementation serves
both (gvt blocks use qkv_bias=True and LayerNorm eps 1e-6).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from casmtr_tpu.models.backbone.resnet_fpn import (
    backbone_dtype, batch_norm, conv1x1, conv3x3, _KAIMING)
from casmtr_tpu.models.cascade_attention import GroupBlock
from casmtr_tpu.ops.image_ops import resize_bilinear_align_corners

# size presets (reference gvt.py:782-827); [embed_dims, num_heads, depths, wss,
# sr_ratios] — the first2_layers variants use the first two stages.
TWINS_PRESETS = {
    "small": dict(embed_dims=(64, 128, 256, 512), num_heads=(2, 4, 8, 16),
                  depths=(2, 2, 10, 4), wss=(7, 7, 7, 7), sr_ratios=(8, 4, 2, 1)),
    "base": dict(embed_dims=(96, 192, 384, 768), num_heads=(3, 6, 12, 24),
                 depths=(2, 2, 18, 2), wss=(7, 7, 7, 7), sr_ratios=(8, 4, 2, 1)),
    "large": dict(embed_dims=(128, 256, 512, 1024), num_heads=(4, 8, 16, 32),
                  depths=(2, 2, 18, 2), wss=(7, 7, 7, 7), sr_ratios=(8, 4, 2, 1)),
}

_LN_EPS = 1e-6  # gvt.py block norms use partial(LayerNorm, eps=1e-6)


class PatchEmbed(nn.Module):
    """Strided-conv patch embedding + LayerNorm (reference gvt.py:256-281)."""
    embed_dim: int
    patch_size: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    name="proj", dtype=self.dtype)(x)
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        # torch nn.LayerNorm default eps (gvt.py:272 doesn't override it)
        x = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=self.dtype)(x)
        return x, (H, W)


class PosCNN(nn.Module):
    """Conditional position encoding: depthwise 3x3 conv + residual
    (reference gvt.py:397-416)."""
    embed_dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, h: int, w: int):
        B, N, C = x.shape
        xi = x.reshape(B, h, w, C)
        y = nn.Conv(self.embed_dim, (3, 3), padding=1,
                    feature_group_count=self.embed_dim, name="proj_0",
                    dtype=self.dtype)(xi)
        return (y + xi).reshape(B, N, C)


class TwinsSVT(nn.Module):
    """ALTGVT truncated to the first ``n_stages`` stages
    (reference gvt.py:580-640 ALTGVT_first2_layers). Blocks alternate
    window attention (even index, ws) and global sr attention (odd, ws=1);
    PosCNN is applied after the FIRST block of each stage; extra_norm applies
    a stage-final LayerNorm.  With 3 stages the third is truncated to
    ``stage3_depth`` blocks (reference gvt.py:667-668 first3_layers;
    every preset passes stage3_depth=2, gvt.py:829-849)."""
    model_type: str = "large"
    n_stages: int = 2
    stage3_depth: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        preset = TWINS_PRESETS[self.model_type]
        cdt = backbone_dtype()
        outputs = []
        for i in range(self.n_stages):
            dim = preset["embed_dims"][i]
            patch = 4 if i == 0 else 2
            x, (H, W) = PatchEmbed(dim, patch, name=f"patch_embeds_{i}",
                                   dtype=cdt)(x)
            depth = self.stage3_depth if i == 2 else preset["depths"][i]
            for j in range(depth):
                ws = 1 if j % 2 == 1 else preset["wss"][i]
                x = GroupBlock(dim, preset["num_heads"][i], mlp_ratio=4.0,
                               sr_ratio=preset["sr_ratios"][i], ws=ws,
                               qkv_bias=True, ln_eps=_LN_EPS,
                               name=f"blocks_{i}_{j}", dtype=cdt)(x, H, W)
                if j == 0:
                    x = PosCNN(dim, name=f"pos_block_{i}", dtype=cdt)(x, H, W)
            x = nn.LayerNorm(epsilon=_LN_EPS, name=f"norm_list_{i}",
                             dtype=cdt)(x)
            x = x.reshape(x.shape[0], H, W, dim)
            outputs.append(x)
        return outputs


class FPNBasicBlock(nn.Module):
    """BasicBlock with optional input-projection shortcut
    (reference twins_fpn.py:46-78)."""
    planes: int
    in_planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        cdt = backbone_dtype()
        x = x.astype(cdt)
        y = nn.relu(batch_norm(train, "bn1", cdt)(
            conv3x3(self.planes, self.stride, "conv1", cdt)(x)))
        y = batch_norm(train, "bn2", cdt)(
            conv3x3(self.planes, 1, "conv2", cdt)(y))
        if self.stride != 1:
            x = batch_norm(train, "downsample_1", cdt)(
                conv1x1(self.planes, self.stride, "downsample_0", cdt)(x))
        if self.in_planes != self.planes:
            x = batch_norm(train, "shortcut_1", cdt)(
                conv1x1(self.planes, 1, "shortcut_0", cdt)(x))
        return nn.relu(x + y)


# numpy on purpose: module-level jnp constants become TRACERS when the
# module is first imported inside a jit trace (init_train_state jits the
# whole init; lazy model imports then execute under the trace) and leak
# into later traces (UnexpectedTracerError)
_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class TwinsFPN_8_4_2(nn.Module):
    """Conv stem (1/2) + Twins ViT (1/4, 1/8) + FPN fusion
    (reference twins_fpn.py:81-167). Input is RGB in [0, 1]; ImageNet
    normalization happens inline (:144-146)."""
    initial_dim: int = 64
    block_dims: Tuple[int, ...] = (64, 128, 256)
    model_type: str = "large"

    @nn.compact
    def __call__(self, x, train: bool = False):
        bd = self.block_dims
        cdt = backbone_dtype()
        x = (x - _IMAGENET_MEAN.astype(x.dtype)) / _IMAGENET_STD.astype(x.dtype)

        # 1/2 conv stem
        s = nn.Conv(bd[0] // 2, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, kernel_init=_KAIMING, name="conv1_0",
                    dtype=cdt)(x)
        s = nn.relu(batch_norm(train, "conv1_1", cdt)(s))
        s = FPNBasicBlock(bd[0], bd[0] // 2, 1, name="layer1_0")(s, train)
        x1 = FPNBasicBlock(bd[0], bd[0], 1, name="layer1_1")(s, train)

        # ViT stages: 1/4, 1/8
        x2, x3 = TwinsSVT(self.model_type, 2, name="vit")(x, train=train)

        # FPN fusion
        x3_out = batch_norm(train, "layer3_outconv_1", cdt)(
            conv1x1(bd[2], 1, "layer3_outconv_0", cdt)(x3))
        x3_2x = resize_bilinear_align_corners(x3_out, x2.shape[1], x2.shape[2])
        x2_out = batch_norm(train, "layer2_outconv_1", cdt)(
            conv1x1(bd[2], 1, "layer2_outconv_0", cdt)(x2))
        y = conv3x3(bd[2], 1, "layer2_outconv2_0", cdt)(x2_out + x3_2x)
        y = nn.leaky_relu(batch_norm(train, "layer2_outconv2_1", cdt)(y),
                          negative_slope=0.01)
        x2_out = batch_norm(train, "layer2_outconv2_4", cdt)(
            conv3x3(bd[1], 1, "layer2_outconv2_3", cdt)(y))

        x2_2x = resize_bilinear_align_corners(x2_out, x1.shape[1], x1.shape[2])
        x1_out = batch_norm(train, "layer1_outconv_1", cdt)(
            conv1x1(bd[1], 1, "layer1_outconv_0", cdt)(x1))
        y = conv3x3(bd[1], 1, "layer1_outconv2_0", cdt)(x1_out + x2_2x)
        y = nn.leaky_relu(batch_norm(train, "layer1_outconv2_1", cdt)(y),
                          negative_slope=0.01)
        x1_out = batch_norm(train, "layer1_outconv2_4", cdt)(
            conv3x3(bd[0], 1, "layer1_outconv2_3", cdt)(y))

        return [x3_out.astype(jnp.float32), x2_out.astype(jnp.float32),
                x1_out.astype(jnp.float32)]


class TwinsFPN_16_8_4_2(nn.Module):
    """Conv stem (1/2) + 3-stage Twins ViT (1/4, 1/8, 1/16) + FPN fusion
    (reference twins_fpn.py:170-263). Outputs [1/16, 1/8, 1/4, 1/2]."""
    initial_dim: int = 64
    block_dims: Tuple[int, ...] = (64, 128, 196, 256)
    model_type: str = "large"

    @nn.compact
    def __call__(self, x, train: bool = False):
        bd = self.block_dims
        cdt = backbone_dtype()
        x = (x - _IMAGENET_MEAN.astype(x.dtype)) / _IMAGENET_STD.astype(x.dtype)

        s = nn.Conv(bd[0] // 2, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, kernel_init=_KAIMING, name="conv1_0",
                    dtype=cdt)(x)
        s = nn.relu(batch_norm(train, "conv1_1", cdt)(s))
        s = FPNBasicBlock(bd[0], bd[0] // 2, 1, name="layer1_0")(s, train)
        x1 = FPNBasicBlock(bd[0], bd[0], 1, name="layer1_1")(s, train)

        x2, x3, x4 = TwinsSVT(self.model_type, 3, name="vit")(x, train=train)

        x4_out = batch_norm(train, "layer4_outconv_1", cdt)(
            conv1x1(bd[3], 1, "layer4_outconv_0", cdt)(x4))
        x4_2x = resize_bilinear_align_corners(x4_out, x3.shape[1], x3.shape[2])
        x3_out = batch_norm(train, "layer3_outconv_1", cdt)(
            conv1x1(bd[3], 1, "layer3_outconv_0", cdt)(x3))
        y = conv3x3(bd[3], 1, "layer3_outconv2_0", cdt)(x3_out + x4_2x)
        y = nn.leaky_relu(batch_norm(train, "layer3_outconv2_1", cdt)(y),
                          negative_slope=0.01)
        x3_out = batch_norm(train, "layer3_outconv2_4", cdt)(
            conv3x3(bd[2], 1, "layer3_outconv2_3", cdt)(y))

        x3_2x = resize_bilinear_align_corners(x3_out, x2.shape[1], x2.shape[2])
        x2_out = batch_norm(train, "layer2_outconv_1", cdt)(
            conv1x1(bd[2], 1, "layer2_outconv_0", cdt)(x2))
        y = conv3x3(bd[2], 1, "layer2_outconv2_0", cdt)(x2_out + x3_2x)
        y = nn.leaky_relu(batch_norm(train, "layer2_outconv2_1", cdt)(y),
                          negative_slope=0.01)
        x2_out = batch_norm(train, "layer2_outconv2_4", cdt)(
            conv3x3(bd[1], 1, "layer2_outconv2_3", cdt)(y))

        x2_2x = resize_bilinear_align_corners(x2_out, x1.shape[1], x1.shape[2])
        x1_out = batch_norm(train, "layer1_outconv_1", cdt)(
            conv1x1(bd[1], 1, "layer1_outconv_0", cdt)(x1))
        y = conv3x3(bd[1], 1, "layer1_outconv2_0", cdt)(x1_out + x2_2x)
        y = nn.leaky_relu(batch_norm(train, "layer1_outconv2_1", cdt)(y),
                          negative_slope=0.01)
        x1_out = batch_norm(train, "layer1_outconv2_4", cdt)(
            conv3x3(bd[0], 1, "layer1_outconv2_3", cdt)(y))

        return [x4_out.astype(jnp.float32), x3_out.astype(jnp.float32),
                x2_out.astype(jnp.float32), x1_out.astype(jnp.float32)]
