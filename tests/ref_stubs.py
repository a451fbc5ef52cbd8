"""Import loader for /root/reference's pure-Python torch modules.

The reference's model code imports four things unavailable in this image:
``timm`` (three layer helpers), ``kornia`` (meshgrid + soft-argmax helpers),
``yacs`` (config tree), and its own CUDA extensions (``fast_score_computation``
/ ``score_computation_cuda`` / ``value_aggregation_cuda``).  This module
installs faithful pure-torch stand-ins into ``sys.modules`` so the ACTUAL
reference modules — not re-typed replicas — can be built and executed on CPU
as conversion/parity oracles (VERDICT round-1 item 2).

The CUDA stand-ins implement the kernels' documented semantics:
  * fast_score_computation.score_forward — score_cuda/src/
    score_computation_kernel.cu:23-40 (per-query K-candidate dot products);
  * score_computation_cuda.score_forward — QuadTreeAttention/.../src/
    score_computation_kernal.cu:21-62 ([B,N1,4,H,D] x gathered keys);
  * value_aggregation_cuda.value_aggregation_forward — .../src/
    value_aggregation_kernel.cu:21-42 (index-gathered weighted value sum).

This is test scaffolding only; nothing in casmtr_tpu imports it.
"""

import copy
import sys
import types

import torch
import torch.nn as nn

REFERENCE_ROOT = "/root/reference"


def _mod(name):
    m = types.ModuleType(name)
    sys.modules[name] = m
    return m


# ---------------------------------------------------------------------------
# kornia helpers (kornia.utils.grid.create_meshgrid semantics, v0.6)
# ---------------------------------------------------------------------------

def create_meshgrid(height, width, normalized_coordinates=True, device=None,
                    dtype=None):
    xs = torch.linspace(0, width - 1, width, device=device,
                        dtype=torch.float32)
    ys = torch.linspace(0, height - 1, height, device=device,
                        dtype=torch.float32)
    if normalized_coordinates:
        xs = (xs / (width - 1) - 0.5) * 2
        ys = (ys / (height - 1) - 0.5) * 2
    base = torch.stack(
        torch.meshgrid([xs, ys], indexing="ij"), dim=-1)  # W, H, 2
    grid = base.permute(1, 0, 2).unsqueeze(0)             # 1, H, W, 2 (x, y)
    if dtype is not None:
        grid = grid.to(dtype)
    return grid


def spatial_expectation2d(input, normalized_coordinates=True):
    b, c, h, w = input.shape
    grid = create_meshgrid(h, w, normalized_coordinates, input.device,
                           input.dtype)
    flat = input.view(b, c, -1)
    ex = torch.sum(grid[..., 0].reshape(-1) * flat, -1, keepdim=True)
    ey = torch.sum(grid[..., 1].reshape(-1) * flat, -1, keepdim=True)
    return torch.cat([ex, ey], -1)


def convert_points_to_homogeneous(points):
    """kornia.geometry.conversions semantics: pad a trailing 1."""
    return torch.nn.functional.pad(points, [0, 1], "constant", 1.0)


def cross_product_matrix(x):
    """kornia.geometry.epipolar.numeric semantics: [..., 3] -> skew [..., 3, 3]."""
    zeros = torch.zeros_like(x[..., 0])
    m = torch.stack([zeros, -x[..., 2], x[..., 1],
                     x[..., 2], zeros, -x[..., 0],
                     -x[..., 1], x[..., 0], zeros], dim=-1)
    return m.view(*x.shape[:-1], 3, 3)


# ---------------------------------------------------------------------------
# timm layer helpers (timm.models.layers semantics)
# ---------------------------------------------------------------------------

class DropPath(nn.Module):
    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = float(drop_prob or 0.0)

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
        return x.div(keep) * mask.floor_()


def to_2tuple(x):
    if isinstance(x, (tuple, list)):
        return tuple(x)
    return (x, x)


def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    return torch.nn.init.trunc_normal_(tensor, mean, std, a, b)


# ---------------------------------------------------------------------------
# loguru.logger (supervision.py:5, cascade_loss.py:3; einops is real)
# ---------------------------------------------------------------------------

class _NoopLogger:
    def __getattr__(self, name):
        return lambda *a, **k: None


# ---------------------------------------------------------------------------
# yacs CfgNode (attribute-style nested dict; enough for configs/default.py)
# ---------------------------------------------------------------------------

class CfgNode(dict):
    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError:
            raise AttributeError(key)

    def __setattr__(self, key, value):
        self[key] = value

    def clone(self):
        return copy.deepcopy(self)


# ---------------------------------------------------------------------------
# CUDA extension stand-ins (pure torch, CPU)
# ---------------------------------------------------------------------------

def _fast_score_forward(query, key, index):
    # query [B,N1,D], key [B,N2,D], index [B,N1,K] -> [out [B,N1,K]]
    D = query.shape[-1]
    k_g = torch.gather(
        key.unsqueeze(1).expand(-1, index.shape[1], -1, -1), 2,
        index.unsqueeze(-1).expand(-1, -1, -1, D))
    return [(query.unsqueeze(2) * k_g).sum(-1)]


def _fast_score_backward(grad, query, key, index):
    D = query.shape[-1]
    k_g = torch.gather(
        key.unsqueeze(1).expand(-1, index.shape[1], -1, -1), 2,
        index.unsqueeze(-1).expand(-1, -1, -1, D))
    dq = (grad.unsqueeze(-1) * k_g).sum(2)
    dk = torch.zeros_like(key)
    src = grad.unsqueeze(-1) * query.unsqueeze(2)              # B,N1,K,D
    dk.scatter_add_(1, index.reshape(index.shape[0], -1, 1).expand(-1, -1, D),
                    src.reshape(src.shape[0], -1, D))
    return [dq, dk]


def _qt_score_forward(query, key, index):
    # query [B,N1,4,H,D], key [B,N2,H,D], index [B,N1,K,H] -> [B,N1,4,K,H]
    B, N1, K, H = index.shape
    D = key.shape[-1]
    idx = index.permute(0, 1, 3, 2)                            # B,N1,H,K
    k_bnh = key.permute(0, 2, 1, 3)                            # B,H,N2,D
    k_g = torch.gather(
        k_bnh.unsqueeze(1).expand(-1, N1, -1, -1, -1), 3,
        idx.unsqueeze(-1).expand(-1, -1, -1, -1, D))           # B,N1,H,K,D
    out = torch.einsum("bnfhd,bnhkd->bnfkh", query, k_g)
    return [out.contiguous()]


def _qt_score_backward(grad, query, key, index):
    # backward of _qt_score_forward (score_computation_kernal.cu:94-143):
    # grad [B,N1,4,K,H] -> [grad_query [B,N1,4,H,D], grad_key [B,N2,H,D]]
    B, N1, K, H = index.shape
    D = key.shape[-1]
    idx = index.permute(0, 1, 3, 2)                            # B,N1,H,K
    k_bnh = key.permute(0, 2, 1, 3)                            # B,H,N2,D
    k_g = torch.gather(
        k_bnh.unsqueeze(1).expand(-1, N1, -1, -1, -1), 3,
        idx.unsqueeze(-1).expand(-1, -1, -1, -1, D))           # B,N1,H,K,D
    dq = torch.einsum("bnfkh,bnhkd->bnfhd", grad, k_g)
    # atomicAdd scatter -> scatter_add over a (key-row, head)-linearized axis
    src = torch.einsum("bnfkh,bnfhd->bnkhd", grad, query)      # B,N1,K,H,D
    h_idx = torch.arange(H).view(1, 1, 1, H).expand(B, N1, K, H)
    lin = (index * H + h_idx).reshape(B, -1, 1).expand(-1, -1, D)
    dk2 = torch.zeros(B, key.shape[1] * H, D, dtype=key.dtype)
    dk2.scatter_add_(1, lin, src.reshape(B, -1, D))
    return [dq.contiguous(), dk2.view(B, key.shape[1], H, D)]


def _qt_value_aggregation_backward(grad_output, score, value, index,
                                   grad_score, grad_value):
    # backward of _qt_value_aggregation_forward
    # (value_aggregation_kernel.cu:55-76); fills the output buffers in place
    # like the CUDA op. Shapes pre-flattened by the wrapper:
    # grad_output [b,4N,H,D], score/index [b,4N,K,H], value [b,M,H,D].
    B, N, K, H = index.shape
    D = value.shape[-1]
    # the wrapper flattens score/index but passes grad_output still as
    # [b,n,4,h,d]; the CUDA kernel reads it as flat [b,4n,h,d] memory
    # (functions/quadtree_attention.py:41-52)
    grad_output = grad_output.reshape(B, N, H, D)
    idx = index.permute(0, 1, 3, 2)                            # B,N,H,K
    v_bnh = value.permute(0, 2, 1, 3)                          # B,H,M,D
    v_g = torch.gather(
        v_bnh.unsqueeze(1).expand(-1, N, -1, -1, -1), 3,
        idx.unsqueeze(-1).expand(-1, -1, -1, -1, D))           # B,N,H,K,D
    grad_score.copy_(torch.einsum("bnhd,bnhkd->bnkh", grad_output, v_g))
    src = torch.einsum("bnkh,bnhd->bnkhd", score, grad_output)
    h_idx = torch.arange(H).view(1, 1, 1, H).expand(B, N, K, H)
    lin = (index * H + h_idx).reshape(B, -1, 1).expand(-1, -1, D)
    gv2 = torch.zeros(B, value.shape[1] * H, D, dtype=value.dtype)
    gv2.scatter_add_(1, lin, src.reshape(B, -1, D))
    grad_value.copy_(gv2.view(B, value.shape[1], H, D))


def _qt_value_aggregation_forward(score, value, index, output):
    # score [b,N,K,H], value [b,M,H,D], index [b,N,K,H]; output [b,N,H,D]
    D = value.shape[-1]
    N = score.shape[1]
    idx = index.permute(0, 1, 3, 2)                            # b,N,H,K
    v_bnh = value.permute(0, 2, 1, 3)                          # b,H,M,D
    v_g = torch.gather(
        v_bnh.unsqueeze(1).expand(-1, N, -1, -1, -1), 3,
        idx.unsqueeze(-1).expand(-1, -1, -1, -1, D))           # b,N,H,K,D
    output.copy_(torch.einsum("bnkh,bnhkd->bnhd", score, v_g))


def install():
    """Install the stub modules (idempotent) and put the reference on path."""
    if "timm.models.layers" in sys.modules:
        if REFERENCE_ROOT not in sys.path:
            sys.path.insert(0, REFERENCE_ROOT)
        return

    timm = _mod("timm")
    timm_models = _mod("timm.models")
    layers = _mod("timm.models.layers")
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    timm.models = timm_models
    timm_models.layers = layers

    kornia = _mod("kornia")
    k_utils = _mod("kornia.utils")
    k_grid = _mod("kornia.utils.grid")
    k_geometry = _mod("kornia.geometry")
    k_subpix = _mod("kornia.geometry.subpix")
    k_dsnt = _mod("kornia.geometry.subpix.dsnt")
    k_feature = _mod("kornia.feature")
    k_color = _mod("kornia.color")
    k_grid.create_meshgrid = create_meshgrid
    k_utils.grid = k_grid
    k_utils.create_meshgrid = create_meshgrid
    k_dsnt.spatial_expectation2d = spatial_expectation2d
    k_subpix.dsnt = k_dsnt
    k_geometry.subpix = k_subpix
    k_feature.__all__ = []
    k_conversions = _mod("kornia.geometry.conversions")
    k_conversions.convert_points_to_homogeneous = \
        convert_points_to_homogeneous
    k_epipolar = _mod("kornia.geometry.epipolar")
    k_numeric = _mod("kornia.geometry.epipolar.numeric")
    k_numeric.cross_product_matrix = cross_product_matrix
    k_epipolar.numeric = k_numeric
    k_geometry.conversions = k_conversions
    k_geometry.epipolar = k_epipolar
    kornia.utils = k_utils
    kornia.geometry = k_geometry
    kornia.feature = k_feature
    kornia.color = k_color

    yacs = _mod("yacs")
    yacs_config = _mod("yacs.config")
    yacs_config.CfgNode = CfgNode
    yacs.config = yacs_config

    loguru = _mod("loguru")
    loguru.logger = _NoopLogger()

    fsc = _mod("fast_score_computation")
    fsc.score_forward = _fast_score_forward
    fsc.score_backward = _fast_score_backward

    scc = _mod("score_computation_cuda")
    scc.score_forward = _qt_score_forward
    scc.score_backward = _qt_score_backward

    vac = _mod("value_aggregation_cuda")
    vac.value_aggregation_forward = _qt_value_aggregation_forward
    vac.value_aggregation_backward = _qt_value_aggregation_backward

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def reference_config(model_config_path=None):
    """The reference's lowered config dict (train.py get_cfg_defaults path).

    Executes configs/default.py (and optionally a model_configs/*.py overlay)
    against the CfgNode stub and lowercases it like src/utils/misc.py
    lower_config — the exact dict CasMTR's constructor receives.
    """
    install()
    import importlib
    import configs.default as dflt
    importlib.reload(dflt)          # fresh tree: overlays mutate it in place
    cfg = dflt._CN
    if model_config_path is not None:
        import runpy
        runpy.run_path(model_config_path)   # mutates configs.default._CN

    def lower(node):
        if not isinstance(node, dict):
            return node
        return {k.lower(): lower(v) for k, v in node.items()}

    return lower(cfg)
