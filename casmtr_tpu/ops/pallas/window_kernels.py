"""Pallas TPU kernel: cascade window-correlation scores (K3, structured form).

The reference K3 CUDA kernel (cuda_imp/score_cuda/src/
score_computation_kernel.cu:22-40) computes gathered dot products
``s[b,l,k] = <feat0[b,l], feat1[b, idx[b,l,k]]>`` for arbitrary indices. On
TPU, arbitrary per-element gathers are DMA-hostile; but the cascade candidate
sets are STRUCTURED (reference transformer.py:416-457): the candidates of the
4 child queries of parent p are exactly a contiguous (2w x 2w) pixel patch of
image1 anchored at the parent's boundary-clamped predicted match. This kernel
therefore takes per-parent patch corners and DMAs each patch HBM->VMEM,
computing the scores on the MXU without ever materializing the
[B, L0, K, C] gather in HBM (the tensor that dominated training memory).

Candidate order matches the reference enumeration
``c = (wy*w + wx)*4 + (dr*2 + dc)`` via a static permutation applied outside
the kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pixel_to_candidate_perm(w: int) -> np.ndarray:
    """Permutation p such that scores_pixel[..., p] == scores_candidate.

    Pixel order: row-major over the (2w x 2w) patch, pixel (2wy+dr, 2wx+dc).
    Candidate order: (wy*w + wx)*4 + (dr*2 + dc)."""
    perm = np.empty(4 * w * w, dtype=np.int32)
    for wy in range(w):
        for wx in range(w):
            for dr in range(2):
                for dc in range(2):
                    c = (wy * w + wx) * 4 + dr * 2 + dc
                    pix = (2 * wy + dr) * (2 * w) + (2 * wx + dc)
                    perm[c] = pix
    return perm


def _window_patch_score_fwd_impl(q_blk, feat1, corners, w: int,
                                 interpret: bool = False):
    B, P, four, D = q_blk.shape
    assert four == 4
    _, H1, W1, D1 = feat1.shape
    assert D1 == D
    size = 2 * w
    TP = 8
    # pad P to a multiple of TP (extra parents read patch (0, 0))
    P_pad = -(-P // TP) * TP
    if P_pad != P:
        q_blk = jnp.pad(q_blk, ((0, 0), (0, P_pad - P), (0, 0), (0, 0)))
        corners = jnp.pad(corners, ((0, 0), (0, P_pad - P), (0, 0)))

    # corners ride per-tile in SMEM (a full-array scalar-prefetch operand
    # would overflow the ~1MB SMEM at production sizes)
    grid = (B, P_pad // TP)
    in_specs = [
        pl.BlockSpec((1, TP, 2), lambda b, p: (b, p, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, TP, 4, D), lambda b, p: (b, p, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # feat1 stays whole in HBM
    ]
    out_specs = pl.BlockSpec((1, TP, 4, size * size),
                             lambda b, p: (b, p, 0, 0),
                             memory_space=pltpu.VMEM)

    def kernel(corners_ref, q_ref, f1_ref, out_ref, patch_ref, sem_ref):
        b = pl.program_id(0)

        def dma(i):
            ty = corners_ref[0, i, 0] * 2
            tx = corners_ref[0, i, 1] * 2
            return pltpu.make_async_copy(
                f1_ref.at[b, pl.ds(ty, size), pl.ds(tx, size), :],
                patch_ref.at[i], sem_ref.at[i])

        for i in range(TP):
            dma(i).start()
        for i in range(TP):
            dma(i).wait()
            patch = patch_ref[i].reshape(size * size, D)
            out_ref[0, i] = jax.lax.dot_general(
                q_ref[0, i], patch,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, P_pad, 4, size * size),
                                       jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((TP, size, size, D), jnp.float32),
            pltpu.SemaphoreType.DMA((TP,)),
        ],
        interpret=interpret,
    )(corners.astype(jnp.int32), q_blk.astype(jnp.float32),
      feat1.astype(jnp.float32))
    out = out[:, :P]
    perm = jnp.asarray(_pixel_to_candidate_perm(w))
    return out[..., perm]                                    # candidate order


def _candidate_offsets(w: int) -> np.ndarray:
    """(dy, dx) pixel offsets from the patch corner, candidate-ordered."""
    off = []
    for wy in range(w):
        for wx in range(w):
            for dr in range(2):
                for dc in range(2):
                    off.append((2 * wy + dr, 2 * wx + dc))
    return np.asarray(off, np.int32)                          # [4w^2, 2]


def _expand_corner_indices(corners, w: int, W1: int):
    """Global flat candidate indices [B, P, 4w^2] from patch corners
    (matches reference expand order; used by the backward scatter)."""
    off = jnp.asarray(_candidate_offsets(w))
    rows = corners[..., 0:1] * 2 + off[None, None, :, 0]
    cols = corners[..., 1:2] * 2 + off[None, None, :, 1]
    return rows * W1 + cols


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def window_patch_score_pallas(q_blk, feat1, corners, w: int,
                              interpret: bool = False):
    """Scores [B, P, 4, 4w^2] of 2x2-blocked queries against the (2w x 2w)
    image1 patches at ``corners`` (half-grid coords), candidate-ordered.

    q_blk: [B, P, 4, D]; feat1: [B, H1, W1, D]; corners: [B, P, 2] int32.
    """
    return _window_patch_score_fwd_impl(q_blk, feat1, corners, w,
                                        interpret=interpret)


def _fwd(q_blk, feat1, corners, w, interpret):
    out = _window_patch_score_fwd_impl(q_blk, feat1, corners, w,
                                       interpret=interpret)
    return out, (q_blk, feat1, corners)


def _bwd(w, interpret, res, g):
    """Backward in plain XLA: the gathered tensors exist only transiently
    inside this computation (the CUDA kernel's atomicAdd scatter becomes an
    XLA scatter-add)."""
    q_blk, feat1, corners = res
    B, P, _, D = q_blk.shape
    H1, W1 = feat1.shape[1:3]
    idx = _expand_corner_indices(corners, w, W1)              # [B, P, K]
    f1_flat = feat1.reshape(B, H1 * W1, D)
    f1_g = jnp.take_along_axis(f1_flat[:, None], idx[..., None], axis=2)
    # g: [B, P, 4, K]; f1_g: [B, P, K, D]
    dq = jnp.einsum("bpfk,bpkd->bpfd", g, f1_g)
    # d feat1: scatter sum over queries
    contrib = jnp.einsum("bpfk,bpfd->bpkd", g, q_blk)         # [B, P, K, D]
    df1 = jnp.zeros_like(f1_flat)
    df1 = df1.at[jnp.arange(B)[:, None, None], idx].add(contrib)
    return dq, df1.reshape(feat1.shape), None


window_patch_score_pallas.defvjp(_fwd, _bwd)


def window_patch_score_jnp(q_blk, feat1, corners, w: int):
    """Pure-jnp oracle with identical semantics (for parity tests and CPU)."""
    B, P, _, D = q_blk.shape
    H1, W1 = feat1.shape[1:3]
    idx = _expand_corner_indices(corners, w, W1)
    f1_flat = feat1.reshape(B, H1 * W1, D)
    f1_g = jnp.take_along_axis(f1_flat[:, None], idx[..., None], axis=2)
    return jnp.einsum("bpfd,bpkd->bpfk", q_blk.astype(jnp.float32),
                      f1_g.astype(jnp.float32))
