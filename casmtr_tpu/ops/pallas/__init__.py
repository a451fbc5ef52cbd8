"""Pallas TPU kernels for the gather-attention hot path.

Kernel inventory (SURVEY.md §2.1 mapping):
* masked_fine_level — the TPU-native form of K1+K2 (``score_computation_cuda``
  + ``value_aggregation_cuda``): one fused kernel computing dense per-head QK
  against child-major keys, a candidate-membership bias in place of the
  gather, full-row softmax, in-kernel top-k by iterative max extraction, and
  the value aggregation — with a dense flash-style backward replacing the
  CUDA atomicAdd scatters (quadtree_kernels.py).
* window_patch_score — the TPU-native form of K3 (``fast_score_computation``):
  exploits the cascade candidate structure (each query's candidates are a
  contiguous 2w x 2w patch of image1 anchored at its parent's predicted
  match) to replace the gather with per-parent patch DMA. No [B, L0, K, C]
  gather tensor ever hits HBM (window_kernels.py).

The candidate-format ops gather_scores/gather_aggregate keep their jnp
implementations in gather_ops.py by design: candidate-format extraction is
inherently gather-shaped, so the Pallas path replaces their call sites at the
fused attention boundary instead (gather_ops.use_pallas_fine).
"""

try:
    from casmtr_tpu.ops.pallas.quadtree_kernels import masked_fine_level
    HAVE_QUADTREE_KERNEL = True
except Exception:  # pragma: no cover - import-time TPU/pallas issues
    masked_fine_level = None
    HAVE_QUADTREE_KERNEL = False

try:
    from casmtr_tpu.ops.pallas.window_kernels import (
        window_patch_score_pallas, window_patch_score_jnp)
    HAVE_WINDOW_KERNEL = True
except Exception:  # pragma: no cover - import-time TPU/pallas issues
    window_patch_score_pallas = None
    window_patch_score_jnp = None
    HAVE_WINDOW_KERNEL = False

# True when the quadtree fine-level fused kernel is importable (the
# gather_ops 'auto' backend keys off this).
HAVE_PALLAS_KERNELS = HAVE_QUADTREE_KERNEL
