"""Pallas TPU kernels for the gather-attention hot path.

Kernel inventory (SURVEY.md §2.1 mapping):
* window_patch_score — the TPU-native form of K3 (``fast_score_computation``):
  exploits the cascade candidate structure (each query's candidates are a
  contiguous 2w x 2w patch of image1 anchored at its parent's predicted
  match) to replace the gather with per-parent patch DMA. No [B, L0, K, C]
  gather tensor ever hits HBM.
* K1/K2 (quadtree score / value aggregation) keep the jnp path this round:
  their per-head scattered top-k indices make DMA-granularity gathers
  hostile on TPU; the planned masked-flash formulation lands next round.
"""

# True only when ALL three gather_ops have Pallas implementations (the
# gather_ops 'auto' backend keys off this); the structured window kernel has
# its own flag below.
HAVE_PALLAS_KERNELS = False

try:
    from casmtr_tpu.ops.pallas.window_kernels import (
        window_patch_score_pallas, window_patch_score_jnp)
    HAVE_WINDOW_KERNEL = True
except Exception:  # pragma: no cover - import-time TPU/pallas issues
    window_patch_score_pallas = None
    window_patch_score_jnp = None
    HAVE_WINDOW_KERNEL = False
