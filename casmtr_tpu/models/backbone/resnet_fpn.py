"""ResNet-FPN backbone family in flax/NHWC.

Re-designs reference src/model/backbone/resnet_fpn.py:16-277 (BasicBlock
two-layer residual units, FPN top-down fusion with align-corners bilinear
upsampling, optional RGB->luma conversion, and the PMT "ladder" side network).
Module/param names mirror the torch names so the checkpoint converter is a
mechanical rename (conv1/bn1/layer{1,2,3}_{0,1}/layerN_outconv...).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from casmtr_tpu.ops.image_ops import resize_bilinear_align_corners

_KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def backbone_dtype():
    """Backbone COMPUTE dtype: bf16 on TPU, f32 elsewhere.

    The reference runs its whole forward (backbone included) under fp16
    autocast in both training (lightning AMP) and eval (test.py:74); bf16 is
    the TPU equivalent (CLAUDE.md precision invariant: matching heads f32,
    backbone/transformer activations may be bf16).  Params/BN stats stay f32
    (flax param_dtype default; normalization statistics are computed in f32
    by flax regardless of ``dtype``), and the FPN outputs are cast back to
    f32 so every downstream consumer sees exactly the old interface.
    ``CASMTR_BACKBONE_BF16=0/1`` forces the choice (0 reproduces the r1-r5
    all-f32 backbone; 1 lets CPU tests exercise the bf16 graph)."""
    v = os.environ.get("CASMTR_BACKBONE_BF16")
    if v is not None:
        return jnp.bfloat16 if v == "1" else jnp.float32
    return (jnp.bfloat16 if jax.devices()[0].platform == "tpu"
            else jnp.float32)


def conv1x1(out, stride=1, name=None, dtype=None):
    return nn.Conv(out, (1, 1), strides=(stride, stride), use_bias=False,
                   kernel_init=_KAIMING, name=name, dtype=dtype)


def conv3x3(out, stride=1, name=None, dtype=None):
    return nn.Conv(out, (3, 3), strides=(stride, stride), padding=1,
                   use_bias=False, kernel_init=_KAIMING, name=name,
                   dtype=dtype)


def batch_norm(train: bool, name=None, dtype=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, axis_name=None, name=name, dtype=dtype)


class BasicBlock(nn.Module):
    """Two-conv residual unit (reference resnet_fpn.py:16-41)."""
    planes: int
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
        return nn.relu(x + y)


class _OutConv2(nn.Module):
    """conv3x3 -> BN -> LeakyReLU -> conv3x3 (reference resnet_fpn.py:75-80)."""
    mid: int
    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        cdt = backbone_dtype()
        x = conv3x3(self.mid, 1, "0", cdt)(x)
        x = batch_norm(train, "1", cdt)(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        return conv3x3(self.out, 1, "3", cdt)(x)


def _to_gray(x):
    """RGB->luma (reference resnet_fpn.py:188-189)."""
    return (0.299 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3])


class ResNetFPN_8_4_2(nn.Module):
    """Outputs [1/8, 1/4, 1/2] features (reference resnet_fpn.py:125-206)."""
    initial_dim: int = 128
    block_dims: Tuple[int, ...] = (128, 196, 256)
    is_rgb: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not self.is_rgb and x.shape[-1] == 3:
            x = _to_gray(x)
        cdt = backbone_dtype()
        d = self.block_dims
        x0 = nn.relu(batch_norm(train, "bn1", cdt)(nn.Conv(
            self.initial_dim, (7, 7), strides=(2, 2), padding=3,
            use_bias=False, kernel_init=_KAIMING, name="conv1",
            dtype=cdt)(x)))
        x1 = BasicBlock(d[0], 1, name="layer1_0")(x0, train)
        x1 = BasicBlock(d[0], 1, name="layer1_1")(x1, train)     # 1/2
        x2 = BasicBlock(d[1], 2, name="layer2_0")(x1, train)
        x2 = BasicBlock(d[1], 1, name="layer2_1")(x2, train)     # 1/4
        x3 = BasicBlock(d[2], 2, name="layer3_0")(x2, train)
        x3 = BasicBlock(d[2], 1, name="layer3_1")(x3, train)     # 1/8

        x3_out = conv1x1(d[2], 1, "layer3_outconv", cdt)(x3)
        x3_2x = resize_bilinear_align_corners(
            x3_out, x2.shape[1], x2.shape[2])
        x2_out = conv1x1(d[2], 1, "layer2_outconv", cdt)(x2)
        x2_out = _OutConv2(d[2], d[1], name="layer2_outconv2")(
            x2_out + x3_2x, train)

        x2_2x = resize_bilinear_align_corners(x2_out, x1.shape[1], x1.shape[2])
        x1_out = conv1x1(d[1], 1, "layer1_outconv", cdt)(x1)
        x1_out = _OutConv2(d[1], d[0], name="layer1_outconv2")(
            x1_out + x2_2x, train)

        return [x3_out.astype(jnp.float32), x2_out.astype(jnp.float32),
                x1_out.astype(jnp.float32)]


class ResNetFPN_8_2(nn.Module):
    """Outputs [1/8, 1/2] features (reference resnet_fpn.py:44-122)."""
    initial_dim: int = 128
    block_dims: Tuple[int, ...] = (128, 196, 256)
    is_rgb: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not self.is_rgb and x.shape[-1] == 3:
            x = _to_gray(x)
        cdt = backbone_dtype()
        d = self.block_dims
        x0 = nn.relu(batch_norm(train, "bn1", cdt)(nn.Conv(
            self.initial_dim, (7, 7), strides=(2, 2), padding=3,
            use_bias=False, kernel_init=_KAIMING, name="conv1",
            dtype=cdt)(x)))
        x1 = BasicBlock(d[0], 1, name="layer1_0")(x0, train)
        x1 = BasicBlock(d[0], 1, name="layer1_1")(x1, train)
        x2 = BasicBlock(d[1], 2, name="layer2_0")(x1, train)
        x2 = BasicBlock(d[1], 1, name="layer2_1")(x2, train)
        x3 = BasicBlock(d[2], 2, name="layer3_0")(x2, train)
        x3 = BasicBlock(d[2], 1, name="layer3_1")(x3, train)

        x3_out = conv1x1(d[2], 1, "layer3_outconv", cdt)(x3)
        x3_2x = resize_bilinear_align_corners(x3_out, x2.shape[1], x2.shape[2])
        x2_out = conv1x1(d[2], 1, "layer2_outconv", cdt)(x2)
        x2_out = _OutConv2(d[2], d[1], name="layer2_outconv2")(
            x2_out + x3_2x, train)
        x2_2x = resize_bilinear_align_corners(x2_out, x1.shape[1], x1.shape[2])
        x1_out = conv1x1(d[1], 1, "layer1_outconv", cdt)(x1)
        x1_out = _OutConv2(d[1], d[0], name="layer1_outconv2")(
            x1_out + x2_2x, train)
        return [x3_out.astype(jnp.float32), x1_out.astype(jnp.float32)]


class Ladder_4_2(nn.Module):
    """Trainable side network for PMT indoor refinement: concatenates frozen
    trunk features (reference resnet_fpn.py:209-277)."""
    block_dims: Tuple[int, ...] = (128, 196, 256)
    refine_dims: Tuple[int, ...] = (64, 128, 256)
    is_rgb: bool = False
    bn_fix: bool = False

    @nn.compact
    def __call__(self, x, add_feats, train: bool = False):
        rd, bd = self.refine_dims, self.block_dims
        # the reference ladder's conv1 is 1-channel unless is_rgb
        # (resnet_fpn.py:223-226); lazily inferring 3 channels here would
        # produce a kernel shape no converted checkpoint can fill
        if not self.is_rgb and x.shape[-1] == 3:
            x = _to_gray(x)
        cdt = backbone_dtype()
        x0 = nn.relu(batch_norm(train, "bn1", cdt)(nn.Conv(
            rd[0], (7, 7), strides=(2, 2), padding=3, use_bias=False,
            kernel_init=_KAIMING, name="conv1", dtype=cdt)(x)))
        x1 = BasicBlock(rd[0], 1, name="layer1_0")(x0, train)
        x1 = BasicBlock(rd[0], 1, name="layer1_1")(x1, train)   # 1/2
        x2 = BasicBlock(rd[1], 2, name="layer2_0")(x1, train)
        x2 = BasicBlock(rd[1], 1, name="layer2_1")(x2, train)   # 1/4

        # frozen trunk features are detached (reference resnet_fpn.py:271-274)
        f4 = jax.lax.stop_gradient(add_feats[0]).astype(cdt)
        f2 = jax.lax.stop_gradient(add_feats[1]).astype(cdt)
        x2_out = batch_norm(train, "layer2_outconv_1", cdt)(conv1x1(
            rd[1], 1, "layer2_outconv_0", cdt)(
                jnp.concatenate([x2, f4], axis=-1)))
        x2_2x = resize_bilinear_align_corners(x2_out, x1.shape[1], x1.shape[2])
        cat1 = jnp.concatenate([x1, f2], axis=-1)
        if self.bn_fix:
            x1_out = batch_norm(train, "layer1_outconv_1", cdt)(
                conv1x1(rd[1], 1, "layer1_outconv_0", cdt)(cat1))
        else:
            x1_out = conv1x1(rd[1], 1, "layer1_outconv", cdt)(cat1)
        x1_out = conv3x3(rd[1], 1, "layer1_outconv2_0", cdt)(x1_out + x2_2x)
        x1_out = batch_norm(train, "layer1_outconv2_1", cdt)(x1_out)
        x1_out = nn.leaky_relu(x1_out, negative_slope=0.01)
        x1_out = conv3x3(rd[0], 1, "layer1_outconv2_3", cdt)(x1_out)
        x1_out = batch_norm(train, "layer1_outconv2_4", cdt)(x1_out)
        return [x2_out.astype(jnp.float32), x1_out.astype(jnp.float32)]


class ResNetFPN_16_4(nn.Module):
    """Outputs [1/16, 1/4] features (reference resnet_fpn.py:280-361)."""
    initial_dim: int = 128
    block_dims: Tuple[int, ...] = (128, 196, 256, 512)
    is_rgb: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not self.is_rgb and x.shape[-1] == 3:
            x = _to_gray(x)
        cdt = backbone_dtype()
        d = self.block_dims
        x0 = nn.relu(batch_norm(train, "bn1", cdt)(nn.Conv(
            self.initial_dim, (7, 7), strides=(2, 2), padding=3,
            use_bias=False, kernel_init=_KAIMING, name="conv1",
            dtype=cdt)(x)))
        x1 = BasicBlock(d[0], 1, name="layer1_0")(x0, train)
        x1 = BasicBlock(d[0], 1, name="layer1_1")(x1, train)     # 1/2
        x2 = BasicBlock(d[1], 2, name="layer2_0")(x1, train)
        x2 = BasicBlock(d[1], 1, name="layer2_1")(x2, train)     # 1/4
        x3 = BasicBlock(d[2], 2, name="layer3_0")(x2, train)
        x3 = BasicBlock(d[2], 1, name="layer3_1")(x3, train)     # 1/8
        x4 = BasicBlock(d[3], 2, name="layer4_0")(x3, train)
        x4 = BasicBlock(d[3], 1, name="layer4_1")(x4, train)     # 1/16

        x4_out = conv1x1(d[3], 1, "layer4_outconv", cdt)(x4)
        x4_2x = resize_bilinear_align_corners(x4_out, x3.shape[1], x3.shape[2])
        x3_out = conv1x1(d[3], 1, "layer3_outconv", cdt)(x3)
        x3_out = _OutConv2(d[3], d[2], name="layer3_outconv2")(
            x3_out + x4_2x, train)
        x3_2x = resize_bilinear_align_corners(x3_out, x2.shape[1], x2.shape[2])
        x2_out = conv1x1(d[2], 1, "layer2_outconv", cdt)(x2)
        x2_out = _OutConv2(d[2], d[1], name="layer2_outconv2")(
            x2_out + x3_2x, train)
        return [x4_out.astype(jnp.float32), x2_out.astype(jnp.float32)]
