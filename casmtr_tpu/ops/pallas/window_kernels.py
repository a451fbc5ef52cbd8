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


# ===========================================================================
# Fused cascade window cross-attention (CascadeQTAttB structured form)
# ===========================================================================
#
# The cascade cross-attention (reference cuda_imp/.../modules/
# quadtree_attention.py:392-452 CascadeQTAttB, driven by K3-style gathers)
# attends each 2x2 query block to the 4*w^2 = (2w x 2w) contiguous image1
# patch anchored at its parent's boundary-shifted predicted-match window
# (transformer.py:416-440).  The XLA gather formulation pays a
# descriptor-bound gather forward and — far worse — a scatter-add transpose
# backward (~46 ms/layer at 176^2 on v5e, the train step's top op).  This
# kernel fuses gather + QK + softmax + PV into one Pallas call:
#
# * one strided DMA per parent fetches its (2w x 2w) K||V patch (the
#   candidate structure the reference builds by enumeration);
# * heads are packed BLOCK-DIAGONALLY: parent rows (child f, head h) hold
#   q[f, h] in columns [h*D, (h+1)*D) of a [4H, HD] tile, so the per-head
#   contraction becomes ONE full-width matmul; G = 128 // 4H parents are
#   stacked to fill the 128-row MXU tile against their side-by-side patches
#   (off-diagonal products are computed and discarded — 12.5% utilization
#   beats 4-row matmuls by 8x and gathers by more);
# * softmax runs on the compact [rows, 4w^2] scores (flash style, LSE saved);
# * the backward recomputes scores from re-DMA'd patches and accumulates
#   dK||dV into a VMEM-RESIDENT [Lk, 2HD] accumulator across the whole grid
#   (output-block revisiting), replacing the serialized XLA scatter-add: the
#   CUDA atomicAdd becomes sequential in-VMEM read-modify-write.
_WTP = 64  # parents per grid step (multiple of the matmul group G)


def _wca_group_sizes(H: int):
    R = 4 * H                       # query rows per parent (child, head)
    G = max(1, 128 // R)            # parents per 128-row matmul
    return R, G


def _embed_heads(x, H: int, D: int):
    """[N, H, D] -> [N*H, H*D]: row (n, h) holds x[n, h] at cols h*D..,
    zeros elsewhere.  Built as lane-tile + iota mask: Mosaic has no
    value-level dynamic_update_slice lowering (KernelType.TC), and all
    offsets are static anyway."""
    N = x.shape[0]
    colh = jax.lax.broadcasted_iota(jnp.int32, (H, H * D), 1) // D
    rowh = jax.lax.broadcasted_iota(jnp.int32, (H, H * D), 0)
    mask = (colh == rowh).astype(x.dtype)            # [H, H*D] block eye
    z = jnp.concatenate([x] * H, axis=-1) * mask[None]   # [N, H, H*D]
    return z.reshape(N * H, H * D)


def _extract_heads_xla(x):
    """[..., H, H*D] -> [..., H, D]: row h takes cols h*D:(h+1)*D.  Runs
    OUTSIDE the kernel: Mosaic's concatenate requires matching lane offsets
    on non-concat dims, and the h*D offsets differ per head — the kernels
    therefore emit the head-packed ("big") layout and XLA unpacks it."""
    H = x.shape[-2]
    D = x.shape[-1] // H
    return jnp.stack([x[..., h, h * D:(h + 1) * D] for h in range(H)],
                     axis=-2)


def _pad_lanes(C: int) -> int:
    """Candidate-block stride rounded up to the 128-lane tile: diagonal-block
    extraction slices at multiples of this stride, and Mosaic only
    concatenates vectors whose lane offsets match on non-concat dims
    (offsets i*C mod 128 differ for C=100 -> 'result/input offset mismatch
    on non-concat dimension')."""
    return -(-C // 128) * 128


def _block_diag_extract(big, R: int, C: int, G: int):
    """[G*R, G*C] -> [G*R, C] taking the G diagonal blocks (static slices;
    C must be a multiple of 128 — see _pad_lanes)."""
    return jnp.concatenate(
        [big[i * R:(i + 1) * R, i * C:(i + 1) * C] for i in range(G)], axis=0)


def _block_diag_embed(cmp, R: int, C: int, G: int):
    """[G*R, C] -> [G*R, G*C] placing block i at (i*R, i*C), zeros elsewhere
    (lane-tile + iota mask, same Mosaic constraint as _embed_heads)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (G * R, G * C), 0) // R
    cols = jax.lax.broadcasted_iota(jnp.int32, (G * R, G * C), 1) // C
    mask = (rows == cols).astype(cmp.dtype)
    return jnp.concatenate([cmp] * G, axis=1) * mask


def _wca_fwd_kernel(corners_ref, q_ref, kv_ref, msg_ref, lse_ref,
                    patch_scr, sem_ref, *, S: int, H: int, D: int,
                    scale: float):
    """One tile of _WTP parents: DMA patches, block-diag QK, softmax, PV."""
    b = pl.program_id(0)
    HD = H * D
    C = S * S
    Cp = _pad_lanes(C)
    R, G = _wca_group_sizes(H)

    def dma(i):
        ty = corners_ref[0, i, 0] * 2
        tx = corners_ref[0, i, 1] * 2
        return pltpu.make_async_copy(
            kv_ref.at[b, pl.ds(ty, S), pl.ds(tx, S), :],
            patch_scr.at[i], sem_ref.at[i])

    for i in range(_WTP):
        dma(i).start()

    q_all = q_ref[0]                                 # [_WTP, 4, H, D]
    for g in range(_WTP // G):
        for i in range(G):
            dma(g * G + i).wait()
        qg = q_all[g * G:(g + 1) * G].reshape(G * 4, H, D)
        qp = _embed_heads(qg, H, D)                  # [G*R, HD]
        kv_g = patch_scr[g * G:(g + 1) * G].reshape(G, C, 2 * HD)
        if Cp != C:   # zero-pad rows so diag blocks are lane-tile aligned
            kv_g = jnp.pad(kv_g, ((0, 0), (0, Cp - C), (0, 0)))
        kv_g = kv_g.reshape(G * Cp, 2 * HD)
        k_g = kv_g[:, :HD]
        v_g = kv_g[:, HD:]
        s_big = jax.lax.dot_general(
            qp, k_g, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # [G*R, G*Cp]
        s_cmp = _block_diag_extract(s_big, R, Cp, G) * scale
        if Cp != C:   # pad keys are zero vectors, not -inf: mask them out
            lane = jax.lax.broadcasted_iota(jnp.int32, (G * R, Cp), 1)
            s_cmp = jnp.where(lane < C, s_cmp, -1e30)
        m = jnp.max(s_cmp, axis=1, keepdims=True)
        p = jnp.exp(s_cmp - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        a_big = _block_diag_embed(p.astype(v_g.dtype), R, Cp, G)
        o_big = jax.lax.dot_general(
            a_big, v_g, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [G*R, HD]
        # head-packed output; per-head lanes unpacked OUTSIDE the kernel
        msg_ref[0, g * G:(g + 1) * G] = (o_big / l).reshape(G, R, HD)
        lse_ref[0, g * G:(g + 1) * G] = (m + jnp.log(l)).reshape(G, R)


def _wca_bwd_kernel(corners_ref, q_ref, g_ref, o_ref, lse_ref, kv_ref,
                    dq_ref, dkv_ref, patch_scr, sem_ref, *, S: int, H: int,
                    D: int, scale: float, w1: int):
    """Backward tile: recompute scores from re-DMA'd patches (flash, LSE
    residual), then dQ via block-diag matmuls and dK||dV accumulated into the
    VMEM-resident [Lk, 2HD] accumulator (dkv_ref is revisited across all
    parent steps — the XLA scatter-add / CUDA atomicAdd equivalent)."""
    b = pl.program_id(0)
    HD = H * D
    C = S * S
    Cp = _pad_lanes(C)
    R, G = _wca_group_sizes(H)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dkv_ref[0] = jnp.zeros(dkv_ref.shape[1:], jnp.float32)

    def dma(i):
        ty = corners_ref[0, i, 0] * 2
        tx = corners_ref[0, i, 1] * 2
        return pltpu.make_async_copy(
            kv_ref.at[b, pl.ds(ty, S), pl.ds(tx, S), :],
            patch_scr.at[i], sem_ref.at[i])

    for i in range(_WTP):
        dma(i).start()

    q_all = q_ref[0]                                 # [_WTP, 4, H, D]
    g_all = g_ref[0]
    o_all = o_ref[0]
    kdt = patch_scr.dtype
    for g in range(_WTP // G):
        for i in range(G):
            dma(g * G + i).wait()
        qg = q_all[g * G:(g + 1) * G].reshape(G * 4, H, D)
        gg = g_all[g * G:(g + 1) * G].reshape(G * 4, H, D).astype(jnp.float32)
        og = o_all[g * G:(g + 1) * G].reshape(G * 4, H, D)
        lse = lse_ref[0, g * G:(g + 1) * G].reshape(G * R, 1)
        qp = _embed_heads(qg, H, D)                  # [G*R, HD]
        gp = _embed_heads(gg.astype(kdt), H, D)
        kv_g = patch_scr[g * G:(g + 1) * G].reshape(G, C, 2 * HD)
        if Cp != C:   # lane-tile-align the diag blocks (see fwd kernel)
            kv_g = jnp.pad(kv_g, ((0, 0), (0, Cp - C), (0, 0)))
        kv_g = kv_g.reshape(G * Cp, 2 * HD)
        k_g = kv_g[:, :HD]
        v_g = kv_g[:, HD:]
        s_big = jax.lax.dot_general(
            qp, k_g, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s_cmp = _block_diag_extract(s_big, R, Cp, G) * scale
        if Cp != C:
            lane = jax.lax.broadcasted_iota(jnp.int32, (G * R, Cp), 1)
            s_cmp = jnp.where(lane < C, s_cmp, -1e30)
        a = jnp.exp(s_cmp - lse)                     # [G*R, Cp] normalized
        # delta = rowsum(dO * O) (saved forward output)
        delta = jnp.sum(gg * og, axis=-1).reshape(G * R, 1)
        dp_big = jax.lax.dot_general(
            gp, v_g, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = _block_diag_extract(dp_big, R, Cp, G)
        ds = (a * (dp - delta) * scale)              # [G*R, Cp] f32
        ds_big = _block_diag_embed(ds.astype(kdt), R, Cp, G)
        a_big = _block_diag_embed(a.astype(kdt), R, Cp, G)
        dq_big = jax.lax.dot_general(
            ds_big, k_g, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [G*R, HD]
        # head-packed dq; per-head lanes unpacked OUTSIDE the kernel
        dq_ref[0, g * G:(g + 1) * G] = dq_big.reshape(G, R, HD)
        dk_g = jax.lax.dot_general(
            ds_big, qp, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [G*Cp, HD]
        dv_g = jax.lax.dot_general(
            a_big, gp, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [G*Cp, HD]
        dkv_g = jnp.concatenate([dk_g, dv_g], axis=-1)  # [G*Cp, 2HD]
        for i in range(G):
            pi = g * G + i
            ty = corners_ref[0, pi, 0] * 2
            tx = corners_ref[0, pi, 1] * 2
            dkv_i = dkv_g[i * Cp:i * Cp + C].reshape(S, S, 2 * HD)
            for r in range(S):
                row0 = (ty + r) * w1 + tx
                acc = dkv_ref[0, pl.ds(row0, S), :]
                dkv_ref[0, pl.ds(row0, S), :] = acc + dkv_i[r]


_WCA_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("arbitrary", "arbitrary"),
    vmem_limit_bytes=100 * 1024 * 1024,
)


def _wca_prepare(q, k, v, corners, hw_q, hw_k):
    from casmtr_tpu.ops.quadtree import block_children
    h0, w0 = hw_q
    B, Lq, H, D = q.shape
    # the kernel's matmul grouping covers G*( _WTP // G ) parents per tile;
    # a head count whose R=4H doesn't divide into _WTP would silently leave
    # the tail parents uninitialized
    G = max(1, 128 // (4 * H))
    if _WTP % G != 0:
        raise ValueError(
            f"window_cross_attention: {H} heads give matmul group {G}, "
            f"which must divide the {_WTP}-parent tile (use a power-of-two "
            f"head count or the gather path)")
    P = Lq // 4
    P_pad = -(-P // _WTP) * _WTP
    q_blk = block_children(q, h0, w0)                 # [B, P, 4, H, D]
    if P_pad != P:
        q_blk = jnp.pad(q_blk, ((0, 0), (0, P_pad - P)) + ((0, 0),) * 3)
        corners = jnp.pad(corners, ((0, 0), (0, P_pad - P), (0, 0)))
    h1, w1 = hw_k
    HD = H * D
    kv2d = jnp.concatenate([k.reshape(B, -1, HD), v.reshape(B, -1, HD)],
                           axis=-1).reshape(B, h1, w1, 2 * HD)
    return q_blk, kv2d, corners.astype(jnp.int32), P, P_pad


def _wca_fwd_call(q_blk, kv2d, corners, S, interpret):
    """Returns the HEAD-PACKED message [B, P_pad, R, H*D] (row (f, h) holds
    head h's message in lanes h*D:(h+1)*D) + LSE; unpack with
    _extract_heads_xla outside the kernel."""
    B, P_pad, _, H, D = q_blk.shape
    R, _ = _wca_group_sizes(H)
    HD = H * D
    scale = D ** -0.5
    grid = (B, P_pad // _WTP)
    kern = functools.partial(_wca_fwd_kernel, S=S, H=H, D=D, scale=scale)
    msg, lse = pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((1, _WTP, 2), lambda b, p: (b, p, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _WTP, 4, H, D), lambda b, p: (b, p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # kv2d whole in HBM
        ],
        out_specs=(
            pl.BlockSpec((1, _WTP, R, HD), lambda b, p: (b, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _WTP, R), lambda b, p: (b, p, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, P_pad, R, HD), jnp.float32),
            jax.ShapeDtypeStruct((B, P_pad, R), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((_WTP, S, S, kv2d.shape[-1]), kv2d.dtype),
            pltpu.SemaphoreType.DMA((_WTP,)),
        ],
        interpret=interpret, compiler_params=_WCA_COMPILER_PARAMS,
    )(corners, q_blk, kv2d)
    return msg, lse


def _wca_unpack(big, P):
    """[B, P_pad, R, H*D] head-packed -> [B, P, 4, H, D]."""
    B, _, R, HD = big.shape
    H = R // 4
    return _extract_heads_xla(big[:, :P].reshape(B, P, 4, H, HD))


def _wca_bwd_call(q_blk, kv2d, corners, msg, lse, g_blk, S, w1, interpret):
    B, P_pad, _, H, D = q_blk.shape
    Lk = kv2d.shape[1] * kv2d.shape[2]
    F = kv2d.shape[-1]
    R, _ = _wca_group_sizes(H)
    scale = D ** -0.5
    grid = (B, P_pad // _WTP)
    kern = functools.partial(_wca_bwd_kernel, S=S, H=H, D=D, scale=scale,
                             w1=w1)
    HD = H * D
    blk5 = pl.BlockSpec((1, _WTP, 4, H, D), lambda b, p: (b, p, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    dq, dkv = pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((1, _WTP, 2), lambda b, p: (b, p, 0),
                         memory_space=pltpu.SMEM),
            blk5,                                     # q
            blk5,                                     # g (cotangent)
            blk5,                                     # msg (saved output)
            pl.BlockSpec((1, _WTP, R), lambda b, p: (b, p, 0),
                         memory_space=pltpu.VMEM),    # lse
            pl.BlockSpec(memory_space=pl.ANY),        # kv2d whole in HBM
        ],
        out_specs=(
            pl.BlockSpec((1, _WTP, R, HD), lambda b, p: (b, p, 0, 0),
                         memory_space=pltpu.VMEM),    # dq (head-packed)
            pl.BlockSpec((1, Lk, F), lambda b, p: (b, 0, 0),
                         memory_space=pltpu.VMEM),    # dkv (revisited)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, P_pad, R, HD), jnp.float32),
            jax.ShapeDtypeStruct((B, Lk, F), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((_WTP, S, S, F), kv2d.dtype),
            pltpu.SemaphoreType.DMA((_WTP,)),
        ],
        interpret=interpret, compiler_params=_WCA_COMPILER_PARAMS,
    )(corners, q_blk, g_blk, msg, lse, kv2d)
    return dq, dkv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def window_cross_attention(q, k, v, corners, hw_q, hw_k, w: int,
                           interpret: bool = False):
    """Fused cascade window cross-attention (structured CascadeQTAttB).

    Each 2x2 query block of ``q`` attends (per head, softmax over 4*w^2
    candidates) to the (2w x 2w) image1 patch anchored at ``corners * 2``.
    Candidate order differs from the reference enumeration but the softmax
    message is order-invariant.

    q: [B, Lq, H, D]; k/v: [B, Lk, H, D] on the (h1, w1) grid;
    corners: [B, Lq//4, 2] int32 (y, x) on the HALF grid of image1 —
    the boundary-shifted window top-left (window_warp_idx[:, :, 0]).
    Returns msg [B, Lq//4, 4, H, D] float32.
    """
    q_blk, kv2d, corners, P, _ = _wca_prepare(q, k, v, corners, hw_q, hw_k)
    msg, _ = _wca_fwd_call(q_blk, kv2d, corners, 2 * w, interpret)
    return _wca_unpack(msg, P)


def _wca_fwd(q, k, v, corners, hw_q, hw_k, w, interpret):
    q_blk, kv2d, corners_p, P, P_pad = _wca_prepare(q, k, v, corners,
                                                    hw_q, hw_k)
    msg_big, lse = _wca_fwd_call(q_blk, kv2d, corners_p, 2 * w, interpret)
    msg = _wca_unpack(msg_big, P)
    return msg, (q, k, v, corners, msg, lse)


def _wca_bwd(hw_q, hw_k, w, interpret, res, g):
    q, k, v, corners, msg, lse = res
    B, Lq, H, D = q.shape
    HD = H * D
    h1, w1 = hw_k
    q_blk, kv2d, corners_p, P, P_pad = _wca_prepare(q, k, v, corners,
                                                    hw_q, hw_k)
    g_blk = g.astype(q.dtype)
    msg_blk = msg                       # f32, as the kernel emitted it
    if P_pad != P:
        g_blk = jnp.pad(g_blk, ((0, 0), (0, P_pad - P)) + ((0, 0),) * 3)
        msg_blk = jnp.pad(msg_blk, ((0, 0), (0, P_pad - P)) + ((0, 0),) * 3)
    dq_big, dkv = _wca_bwd_call(q_blk, kv2d, corners_p, msg_blk, lse, g_blk,
                                2 * w, w1, interpret)
    from casmtr_tpu.ops.quadtree import unblock_children
    h0, w0 = hw_q
    dq = unblock_children(_wca_unpack(dq_big, P),
                          h0 // 2, w0 // 2).astype(q.dtype)
    dk = dkv[..., :HD].reshape(B, h1 * w1, H, D).astype(k.dtype)
    dv = dkv[..., HD:].reshape(B, h1 * w1, H, D).astype(v.dtype)
    return dq, dk, dv, None


window_cross_attention.defvjp(_wca_fwd, _wca_bwd)


def window_cross_attention_oracle(q, k, v, corners, hw_q, hw_k, w: int):
    """Pure-jnp oracle with identical semantics (candidate set = the
    (2w x 2w) patch at corners*2; per-head softmax over candidates)."""
    from casmtr_tpu.ops.quadtree import block_children
    h0, w0 = hw_q
    h1, w1 = hw_k
    B, Lq, H, D = q.shape
    idx = _expand_corner_indices(corners, w, w1)      # [B, P, 4w^2]
    qb = block_children(q, h0, w0)                    # [B, P, 4, H, D]
    k_g = jnp.take_along_axis(k[:, None], idx[..., None, None], axis=2)
    v_g = jnp.take_along_axis(v[:, None], idx[..., None, None], axis=2)
    qk = jnp.einsum("bpfhd,bpchd->bpfhc", qb, k_g,
                    preferred_element_type=jnp.float32) * (D ** -0.5)
    a = jax.nn.softmax(qk, axis=-1)
    return jnp.einsum("bpfhc,bpchd->bpfhd", a, v_g,
                      preferred_element_type=jnp.float32)
