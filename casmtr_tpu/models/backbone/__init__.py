"""Backbone registry (reference: src/model/backbone/__init__.py:5-19)."""

from casmtr_tpu.models.backbone.resnet_fpn import (
    ResNetFPN_8_2, ResNetFPN_8_4_2, ResNetFPN_16_4, Ladder_4_2)


def build_backbone(config):
    """config: LoftrConfig. Returns a flax module producing the pyramid
    [1/8, (1/4,), 1/2] features, finest last.

    The module is named "backbone" so flax param paths line up with the
    reference's ``backbone.*`` state-dict keys (cascade_model_stage3.py:87)."""
    bb = config.backbone
    btype = bb.backbone_type
    res = tuple(config.resolution)
    if btype == "ResNetFPN":
        if res == (8, 2):
            return ResNetFPN_8_2(initial_dim=bb.initial_dim,
                                 block_dims=tuple(bb.block_dims),
                                 is_rgb=config.is_rgb, name="backbone")
        if res == (8, 4, 2):
            return ResNetFPN_8_4_2(initial_dim=bb.initial_dim,
                                   block_dims=tuple(bb.block_dims),
                                   is_rgb=config.is_rgb, name="backbone")
        if res == (16, 4):
            return ResNetFPN_16_4(initial_dim=bb.initial_dim,
                                  block_dims=tuple(bb.block_dims),
                                  is_rgb=config.is_rgb, name="backbone")
        raise ValueError(f"unsupported resolution {res} for ResNetFPN")
    if btype == "Twins":
        from casmtr_tpu.models.backbone.twins import (TwinsFPN_8_4_2,
                                                      TwinsFPN_16_8_4_2)
        if res == (16, 8, 4, 2):
            return TwinsFPN_16_8_4_2(initial_dim=bb.initial_dim,
                                     block_dims=tuple(bb.block_dims),
                                     model_type=bb.model_type or "large",
                                     name="backbone")
        return TwinsFPN_8_4_2(initial_dim=bb.initial_dim,
                              block_dims=tuple(bb.block_dims),
                              model_type=bb.model_type or "large",
                              name="backbone")
    raise ValueError(f"unknown backbone {btype}")
