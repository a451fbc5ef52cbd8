"""Gathered-attention primitives: the TPU-native kernel boundary.

These three ops are the functional equivalents of the reference's three CUDA
kernels (see SURVEY.md §2.1):

* ``gather_scores``     <-> K1 ``score_computation_cuda``
  (reference: cuda_imp/QuadTreeAttention/QuadtreeAttention/src/
   score_computation_kernal.cu:21-62)
* ``gather_aggregate``  <-> K2 ``value_aggregation_cuda``
  (reference: cuda_imp/QuadTreeAttention/QuadtreeAttention/src/
   value_aggregation_kernel.cu:21-42)
* ``window_score``      <-> K3 ``fast_score_computation``
  (reference: cuda_imp/score_cuda/src/score_computation_kernel.cu:22-40)

Each has a pure-jnp implementation here (the numerical oracle — mirroring the
reference's quadtree_attention_smart.py CUDA/python duality) and an optional
Pallas TPU kernel in ``casmtr_tpu.ops.pallas`` selected via ``set_backend`` /
the ``CASMTR_KERNEL_BACKEND`` env var.  Autodiff: the jnp versions are natively
differentiable (XLA derives the scatter-add backward that the CUDA kernels
implement with atomicAdd); the Pallas versions carry a custom_vjp.

Index dtype is int32 throughout (TPU-friendly; the reference uses int64).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_BACKEND = os.environ.get("CASMTR_KERNEL_BACKEND", "auto")  # auto|jnp|pallas


def set_backend(name: str):
    """Select kernel backend: 'jnp' (oracle), 'pallas', or 'auto'."""
    global _BACKEND
    assert name in ("auto", "jnp", "pallas"), name
    _BACKEND = name


def get_backend() -> str:
    if _BACKEND != "auto":
        return _BACKEND
    # auto: pallas on TPU once available, jnp elsewhere
    try:
        if jax.devices()[0].platform == "tpu":
            from casmtr_tpu.ops.pallas import HAVE_PALLAS_KERNELS
            if HAVE_PALLAS_KERNELS:
                return "pallas"
    except Exception:
        pass
    return "jnp"


def use_pallas_window_cross() -> bool:
    """True when the fused cascade window cross-attention kernel should be
    used (structured window candidates; see window_kernels.py)."""
    if get_backend() != "pallas":
        return False
    # Default ON: on-device parity 2026-08-19 (scripts/tpu_kernel_parity.py
    # wca section: msg err 4.8e-7, grads <= 2.9e-6; kernel 2.66/7.09 ms vs
    # gather 14.35/16.54 ms fwd / fwd+bwd at the 176^2 level).
    if os.environ.get("CASMTR_PALLAS_WINDOW_CROSS", "1") != "1":
        return False
    try:
        from casmtr_tpu.ops.pallas import HAVE_WINDOW_KERNEL
        return HAVE_WINDOW_KERNEL
    except Exception:
        return False


def use_pallas_fine() -> bool:
    """True when the fused masked-flash fine-level kernel should be used.

    The TPU-native equivalent of K1+K2 lives at the fused attention boundary
    (ops/pallas/quadtree_kernels.py) rather than behind the candidate-format
    gather_scores/gather_aggregate signatures: extracting candidate-format
    tensors is inherently gather-shaped, which is exactly the thing the TPU
    formulation eliminates.  Backend 'pallas' therefore means "use the Pallas
    kernels at their natural fusion boundaries"; the candidate-format ops
    below intentionally keep their jnp implementations (they remain the
    oracles and serve QTAttA, which is not used by any released recipe).
    """
    if get_backend() != "pallas":
        return False
    try:
        from casmtr_tpu.ops.pallas import HAVE_PALLAS_KERNELS
        return HAVE_PALLAS_KERNELS
    except Exception:
        return False


# ---------------------------------------------------------------------------
# jnp oracle implementations
# ---------------------------------------------------------------------------

def gather_keys(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-head row gather.

    Args:
      table: [B, Lk, H, D] keys or values.
      idx:   [B, P, C, H] int32 indices into Lk (per batch, per head).
    Returns:
      [B, P, C, H, D] with out[b,p,c,h] = table[b, idx[b,p,c,h], h].
    """
    return jnp.take_along_axis(table[:, None], idx[..., None], axis=2,
                               mode="clip")


def _gather_scores_jnp(query, key, idx):
    """Sparse gathered QK^T (K1 semantics).

    Args:
      query: [B, P, 4, H, D] 2x2-child-blocked queries.
      key:   [B, Lk, H, D].
      idx:   [B, P, C, H] int32 candidate key indices (shared by the 4 children).
    Returns:
      scores [B, P, 4, C, H] (float32).
    """
    k_g = gather_keys(key, idx)  # [B, P, C, H, D]
    return jnp.einsum("bpfhd,bpchd->bpfch", query, k_g,
                      preferred_element_type=jnp.float32)


def _gather_aggregate_jnp(attn, value, idx):
    """Sparse attention x V (K2 semantics).

    Args:
      attn:  [B, P, 4, C, H] attention weights.
      value: [B, Lk, H, D].
      idx:   [B, P, C, H] int32 candidate indices (shared by the 4 children).
    Returns:
      message [B, P, 4, H, D].
    """
    v_g = gather_keys(value, idx)  # [B, P, C, H, D]
    return jnp.einsum("bpfch,bpchd->bpfhd", attn, v_g,
                      preferred_element_type=jnp.float32)


def _window_score_jnp(feat0, feat1, idx):
    """Head-free gathered dot product (K3 semantics).

    Args:
      feat0: [B, L0, D].
      feat1: [B, L1, D].
      idx:   [B, L0, K] int32 indices into L1.
    Returns:
      scores [B, L0, K] with s[b,l,k] = <feat0[b,l], feat1[b, idx[b,l,k]]>.
    """
    f1_g = jnp.take_along_axis(feat1[:, None], idx[..., None], axis=2,
                               mode="clip")  # [B,L0,K,D]
    return jnp.einsum("bld,blkd->blk", feat0, f1_g,
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def gather_scores(query, key, idx):
    # candidate-format extraction is gather-shaped on any backend; the Pallas
    # path replaces this op's call sites wholesale (see use_pallas_fine).
    return _gather_scores_jnp(query, key, idx)


def gather_aggregate(attn, value, idx):
    return _gather_aggregate_jnp(attn, value, idx)


def window_score(feat0, feat1, idx):
    return _window_score_jnp(feat0, feat1, idx)


# Expose the oracles for parity tests.
gather_scores_oracle = _gather_scores_jnp
gather_aggregate_oracle = _gather_aggregate_jnp
window_score_oracle = _window_score_jnp
