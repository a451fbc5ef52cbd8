"""Checkpoint-conversion tests: numerical equivalence between torch modules
(built with reference naming conventions) and the flax modules after weight
conversion. torch runs on CPU; this is the module-level parity oracle in lieu
of the released checkpoints (unavailable offline)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from casmtr_tpu.utils.convert import (convert_state_dict,
                                      flax_path_to_torch_key)


def test_key_mapping():
    assert flax_path_to_torch_key(("backbone", "layer1_0", "conv1"),
                                  "kernel") == "backbone.layer1.0.conv1.weight"
    assert flax_path_to_torch_key(("loftr_coarse_8c", "layers_0", "attn"),
                                  "py_att_weight") == \
        "loftr_coarse_8c.layers.0.attn.py_att.weight"
    assert flax_path_to_torch_key(("vit", "blocks_0_1", "attn", "norm"),
                                  "scale") == "vit.blocks.0.1.attn.norm.weight"
    assert flax_path_to_torch_key(("up_block1", "inner_1"), "mean") == \
        "up_block1.inner.1.running_mean"
    assert flax_path_to_torch_key(("loftr_coarse_8c", "layers_0", "mlp",
                                   "dwconv_dwconv"), "bias") == \
        "loftr_coarse_8c.layers.0.mlp.dwconv.dwconv.bias"
    # trailing digit inside a word is not an index
    assert flax_path_to_torch_key(("backbone", "layer1_outconv2", "1"),
                                  "bias") == "backbone.layer1_outconv2.1.bias"


def test_resnet_basicblock_equivalence(rng):
    """torch BasicBlock (reference resnet_fpn.py:16-41 semantics) == flax
    BasicBlock after conversion, in eval mode."""
    from casmtr_tpu.models.backbone.resnet_fpn import BasicBlock

    class TorchBasicBlock(tnn.Module):
        def __init__(self, inp, planes, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, planes, 3, stride, 1, bias=False)
            self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.bn2 = tnn.BatchNorm2d(planes)
            if stride != 1:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inp, planes, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes))
            else:
                self.downsample = None

        def forward(self, x):
            y = tF.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            if self.downsample is not None:
                x = self.downsample(x)
            return tF.relu(x + y)

    tm = TorchBasicBlock(8, 12, 2).eval()
    # randomize BN stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for bn in [tm.bn1, tm.bn2, tm.downsample[1]]:
            bn.running_mean.uniform_(-0.5, 0.5)
            bn.running_var.uniform_(0.5, 1.5)
            bn.weight.uniform_(0.5, 1.5)
            bn.bias.uniform_(-0.5, 0.5)

    x = rng.standard_normal((1, 8, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    fm = BasicBlock(12, 2)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = fm.init(jax.random.PRNGKey(0), xj, train=False)
    new_vars, report = convert_state_dict(
        {k: v for k, v in tm.state_dict().items()}, dict(variables))
    assert not report["missing"]
    got = fm.apply(new_vars, xj, train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)


def test_loftr_encoder_layer_equivalence(rng):
    """torch LoFTR encoder layer (reference transformer.py:95-148 semantics)
    == flax LoFTREncoderLayer after conversion (full attention)."""
    from casmtr_tpu.models.transformer import LoFTREncoderLayer

    d, h = 16, 2

    class TorchLayer(tnn.Module):
        def __init__(self):
            super().__init__()
            self.q_proj = tnn.Linear(d, d, bias=False)
            self.k_proj = tnn.Linear(d, d, bias=False)
            self.v_proj = tnn.Linear(d, d, bias=False)
            self.merge = tnn.Linear(d, d, bias=False)
            self.mlp = tnn.Sequential(tnn.Linear(2 * d, 2 * d, bias=False),
                                      tnn.ReLU(True),
                                      tnn.Linear(2 * d, d, bias=False))
            self.norm1 = tnn.LayerNorm(d)
            self.norm2 = tnn.LayerNorm(d)

        def forward(self, x, src):
            B = x.shape[0]
            q = self.q_proj(x).view(B, -1, h, d // h)
            k = self.k_proj(src).view(B, -1, h, d // h)
            v = self.v_proj(src).view(B, -1, h, d // h)
            qk = torch.einsum("nlhd,nshd->nlsh", q, k)
            a = torch.softmax(qk / (d // h) ** 0.5, dim=2)
            msg = torch.einsum("nlsh,nshd->nlhd", a, v).reshape(B, -1, d)
            msg = self.norm1(self.merge(msg))
            msg = self.norm2(self.mlp(torch.cat([x, msg], dim=2)))
            return x + msg

    tm = TorchLayer().eval()
    x = rng.standard_normal((2, 10, d)).astype(np.float32)
    s = rng.standard_normal((2, 12, d)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(s)).numpy()

    fl = LoFTREncoderLayer(d, h, attention="full")
    variables = fl.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s))
    new_vars, report = convert_state_dict(tm.state_dict(), dict(variables))
    assert not report["missing"]
    got = fl.apply(new_vars, jnp.asarray(x), jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_depthwise_conv_equivalence(rng):
    """Depthwise 3x3 conv (DWConv/PosCNN/LePE pattern) converts correctly."""
    import flax.linen as nn

    C = 6
    tm = tnn.Conv2d(C, C, 3, 1, 1, bias=True, groups=C).eval()
    x = rng.standard_normal((1, C, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    class F(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(C, (3, 3), padding=1, feature_group_count=C,
                           name="m")(x)

    fm = F()
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = fm.init(jax.random.PRNGKey(0), xj)
    sd = {f"m.{k}": v for k, v in tm.state_dict().items()}
    new_vars, report = convert_state_dict(sd, dict(variables))
    assert not report["missing"]
    got = fm.apply(new_vars, xj)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)


def test_conv1x1_as_dense_equivalence(rng):
    """1x1 Conv2d (torch) -> Dense (flax) conversion (QuadtreeAttention
    q/k/v projections)."""
    import flax.linen as nn

    tm = tnn.Conv2d(8, 12, 1, bias=False).eval()
    x = rng.standard_normal((1, 8, 4, 4)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    class F(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(12, use_bias=False, name="m")(x)

    fm = F()
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = fm.init(jax.random.PRNGKey(0), xj)
    new_vars, report = convert_state_dict(
        {f"m.{k}": v for k, v in tm.state_dict().items()}, dict(variables))
    got = fm.apply(new_vars, xj)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-5, atol=1e-5)


def test_full_casmtr_name_coverage(rng):
    """Every flax param/batch-stat in a full CasMTR tree maps to a torch key
    and converts back with the right shape (synthetic state dict built from
    the derived names — catches naming drift across the whole model)."""
    import jax
    import jax.numpy as jnp
    from casmtr_tpu.utils.convert import (_transform, convert_state_dict,
                                          flax_path_to_torch_key)
    from tests.test_casmtr_model import tiny_casmtr_cfg
    from casmtr_tpu.models.casmtr import CasMTR

    cfg = tiny_casmtr_cfg((4, 2))
    model = CasMTR(cfg)
    img = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0),
                           {"image0": img, "image1": img}, train=False)

    # build a synthetic torch state dict with torch-layout shapes
    def walk(tree, path=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                yield from walk(v, path + (k,))
        else:
            yield path, tree

    sd = {}
    for col in ("params", "batch_stats"):
        for path, leaf in walk(variables.get(col, {})):
            key = flax_path_to_torch_key(path[:-1], path[-1])
            shape = tuple(leaf.shape)
            if path[-1] == "kernel":
                if len(shape) == 4:   # HWIO -> OIHW
                    tshape = (shape[3], shape[2], shape[0], shape[1])
                elif len(shape) == 2:  # IO -> OI
                    tshape = (shape[1], shape[0])
                else:
                    tshape = shape
            else:
                tshape = shape
            vals = np.random.default_rng(7).standard_normal(
                tshape).astype(np.float32)
            if path[-1] == "var":  # BN variances must be positive
                vals = np.abs(vals) + 0.5
            sd[key] = vals

    new_vars, report = convert_state_dict(sd, dict(variables))
    assert not report["missing"], report["missing"][:5]
    assert not report["unused"], report["unused"][:5]
    # converted model still runs
    out = model.apply(new_vars, {"image0": img, "image1": img}, train=False)
    assert np.isfinite(np.asarray(out.coarse.conf_matrix)).all()
