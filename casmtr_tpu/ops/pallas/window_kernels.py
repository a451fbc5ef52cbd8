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
    f1_g = jnp.take_along_axis(f1_flat[:, None], idx[..., None], axis=2,
                               mode="clip")
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
    f1_g = jnp.take_along_axis(f1_flat[:, None], idx[..., None], axis=2,
                               mode="clip")
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
# * one strided DMA per parent per 128-lane PLANE fetches its (2w x 2w)
#   patch (the candidate structure the reference builds by enumeration).
#   Mosaic only lowers an HBM slice with a non-8-aligned second-minor extent
#   (the 2w = 10 patch width) when the minor dim is EXACTLY one f32 lane
#   tile — probed on device 2026-08-19: [10,10,128] f32 compiles; 64, 192,
#   256, bf16, lane-sliced-256 and 8-aligned-extent-at-runtime-offset all
#   fail ("Slice shape along dimension 2 must be aligned to tiling (8)").
#   K/V therefore ride in 128-lane f32 planes: ONE packed K||V plane when
#   2HD <= 128 (k at lanes [0, HD), v at [HD, 2HD)), else one zero-padded
#   plane each for K and V;
# * heads are packed BLOCK-DIAGONALLY: parent rows (child f, head h) hold
#   q[f, h] in lanes [h*D, (h+1)*D) of a [4H, 128] tile, so the per-head
#   contraction becomes ONE full-width matmul; G = 128 // 4H parents are
#   stacked to fill the 128-row MXU tile against their side-by-side patches
#   (off-diagonal products are computed and discarded — 12.5% utilization
#   beats 4-row matmuls by 8x and gathers by more).  In the packed-plane
#   case the score matmul hits only the K lanes because the embedded query
#   is zero on the V lanes, and the PV matmul's message lands on the V lanes
#   (per-head lane windows unpacked outside the kernel);
# * softmax runs on the compact [rows, 4w^2] scores (flash style, LSE saved);
# * the backward recomputes scores from re-DMA'd patches and accumulates
#   dK/dV into VMEM-RESIDENT [Lk, 128] per-plane accumulators across the
#   whole grid (output-block revisiting), replacing the serialized XLA
#   scatter-add: the CUDA atomicAdd becomes sequential in-VMEM
#   read-modify-write (one fused accumulator in the packed case).
_WTP = 64  # parents per grid step (multiple of the matmul group G)


def _wca_group_sizes(H: int):
    R = 4 * H                       # query rows per parent (child, head)
    G = max(1, 128 // R)            # parents per 128-row matmul
    return R, G


_LANES = 128  # the one f32 plane width Mosaic DMAs with unaligned extents


def _embed_heads(x, H: int, D: int, off: int = 0):
    """[N, H, D] -> [N*H, 128]: row (n, h) holds x[n, h] at lanes
    off+h*D .. off+(h+1)*D, zeros elsewhere.  Built as lane-tile + iota
    mask: Mosaic has no value-level dynamic_update_slice lowering
    (KernelType.TC), and all offsets are static anyway.  Requires D | 128
    and off % D == 0."""
    N = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (H, _LANES), 1)
    rowh = jax.lax.broadcasted_iota(jnp.int32, (H, _LANES), 0)
    blk = (lane - off) // D
    mask = ((lane >= off) & (blk == rowh)).astype(x.dtype)
    z = jnp.concatenate([x] * (_LANES // D), axis=-1)    # [N, H, 128]
    return (z * mask[None]).reshape(N * H, _LANES)


def _extract_heads_xla(x, D: int, off: int = 0):
    """[..., H, 128] -> [..., H, D]: row h takes lanes off+h*D:off+(h+1)*D.
    Runs OUTSIDE the kernel: Mosaic's concatenate requires matching lane
    offsets on non-concat dims, and the per-head offsets differ — the
    kernels therefore emit the head-packed ("big") layout and XLA unpacks
    it."""
    H = x.shape[-2]
    return jnp.stack(
        [x[..., h, off + h * D:off + (h + 1) * D] for h in range(H)],
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


def _wca_fwd_kernel(*args, S: int, H: int, D: int, scale: float,
                    n_planes: int):
    """One tile of _WTP parents: DMA patches, block-diag QK, softmax, PV.

    args: corners_ref, q_ref, *plane_refs (n_planes HBM srcs), msg_ref,
    lse_ref, *plane_scrs, sem_ref.  n_planes == 1: packed K||V plane
    (k at lanes [0, HD), v at [HD, 2HD)); == 2: K plane then V plane."""
    corners_ref, q_ref = args[0], args[1]
    planes = args[2:2 + n_planes]
    msg_ref, lse_ref = args[2 + n_planes], args[3 + n_planes]
    scrs = args[4 + n_planes:4 + 2 * n_planes]
    sem_ref = args[4 + 2 * n_planes]
    b = pl.program_id(0)
    HD = H * D
    v_off = HD if n_planes == 1 else 0
    C = S * S
    Cp = _pad_lanes(C)
    R, G = _wca_group_sizes(H)

    def dma(p, i):
        ty = corners_ref[0, i, 0] * 2
        tx = corners_ref[0, i, 1] * 2
        return pltpu.make_async_copy(
            planes[p].at[b, pl.ds(ty, S), pl.ds(tx, S), :],
            scrs[p].at[i], sem_ref.at[p, i])

    for i in range(_WTP):
        for p in range(n_planes):
            dma(p, i).start()

    q_all = q_ref[0]                                 # [_WTP, 4, H, D]
    for g in range(_WTP // G):
        for i in range(G):
            for p in range(n_planes):
                dma(p, g * G + i).wait()
        qg = q_all[g * G:(g + 1) * G].reshape(G * 4, H, D)
        qp = _embed_heads(qg, H, D)                  # [G*R, 128]

        def grab(p):
            t = scrs[p][g * G:(g + 1) * G].reshape(G, C, _LANES)
            if Cp != C:  # zero-pad rows so diag blocks are lane-tile aligned
                t = jnp.pad(t, ((0, 0), (0, Cp - C), (0, 0)))
            return t.reshape(G * Cp, _LANES)

        k_g = grab(0)
        v_g = k_g if n_planes == 1 else grab(1)
        # packed plane: qp is zero on the V lanes, so the contraction sees
        # only K; split planes: zero lane padding above HD contributes 0
        s_big = jax.lax.dot_general(
            qp, k_g, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # [G*R, G*Cp]
        s_cmp = _block_diag_extract(s_big, R, Cp, G) * scale
        if Cp != C:   # pad keys are zero vectors, not -inf: mask them out
            lane = jax.lax.broadcasted_iota(jnp.int32, (G * R, Cp), 1)
            s_cmp = jnp.where(lane < C, s_cmp, -1e30)
        m = jnp.max(s_cmp, axis=1, keepdims=True)
        p_ = jnp.exp(s_cmp - m)
        l = jnp.sum(p_, axis=1, keepdims=True)
        a_big = _block_diag_embed(p_.astype(v_g.dtype), R, Cp, G)
        o_big = jax.lax.dot_general(
            a_big, v_g, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [G*R, 128]
        # head-packed output at lane offset v_off; unpacked OUTSIDE
        msg_ref[0, g * G:(g + 1) * G] = (o_big / l).reshape(G, R, _LANES)
        lse_ref[0, g * G:(g + 1) * G] = (m + jnp.log(l)).reshape(G, R)


def _wca_bwd_kernel(*args, S: int, H: int, D: int, scale: float, w1: int,
                    n_planes: int):
    """Backward tile: recompute scores from re-DMA'd patches (flash;
    softmax stats recomputed in-register rather than read from the saved
    LSE — see the reshape note at the stats below),
    then dQ via block-diag matmuls and dK/dV accumulated into the
    VMEM-resident per-plane [Lk, 128] accumulators (revisited across all
    parent steps — the XLA scatter-add / CUDA atomicAdd equivalent; ONE
    fused accumulator in the packed n_planes == 1 case)."""
    corners_ref, q_ref, g_ref, o_ref = args[:4]
    planes = args[4:4 + n_planes]
    dq_ref = args[4 + n_planes]
    dacc = args[5 + n_planes:5 + 2 * n_planes]
    scrs = args[5 + 2 * n_planes:5 + 3 * n_planes]
    sem_ref = args[5 + 3 * n_planes]
    b = pl.program_id(0)
    HD = H * D
    v_off = HD if n_planes == 1 else 0
    C = S * S
    Cp = _pad_lanes(C)
    R, G = _wca_group_sizes(H)

    @pl.when(pl.program_id(1) == 0)
    def _():
        for p in range(n_planes):
            dacc[p][0] = jnp.zeros(dacc[p].shape[1:], jnp.float32)

    def dma(p, i):
        ty = corners_ref[0, i, 0] * 2
        tx = corners_ref[0, i, 1] * 2
        return pltpu.make_async_copy(
            planes[p].at[b, pl.ds(ty, S), pl.ds(tx, S), :],
            scrs[p].at[i], sem_ref.at[p, i])

    for i in range(_WTP):
        for p in range(n_planes):
            dma(p, i).start()

    q_all = q_ref[0]                                 # [_WTP, 4, H, D]
    g_all = g_ref[0]
    o_all = o_ref[0]
    kdt = scrs[0].dtype
    for g in range(_WTP // G):
        for i in range(G):
            for p in range(n_planes):
                dma(p, g * G + i).wait()
        qg = q_all[g * G:(g + 1) * G].reshape(G * 4, H, D)
        gg = g_all[g * G:(g + 1) * G].reshape(G * 4, H, D).astype(jnp.float32)
        og = o_all[g * G:(g + 1) * G].reshape(G * 4, H, D)
        qp = _embed_heads(qg, H, D)                  # [G*R, 128]
        # cotangent embedded at the V lane offset: its contractions with the
        # (packed) plane then hit only V lanes, and dV lands on them
        gp = _embed_heads(gg.astype(kdt), H, D, off=v_off)
        op = _embed_heads(og, H, D, off=v_off)

        def grab(p):
            t = scrs[p][g * G:(g + 1) * G].reshape(G, C, _LANES)
            if Cp != C:   # lane-tile-align the diag blocks (see fwd kernel)
                t = jnp.pad(t, ((0, 0), (0, Cp - C), (0, 0)))
            return t.reshape(G * Cp, _LANES)

        k_g = grab(0)
        v_g = k_g if n_planes == 1 else grab(1)
        s_big = jax.lax.dot_general(
            qp, k_g, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s_cmp = _block_diag_extract(s_big, R, Cp, G) * scale
        if Cp != C:
            lane = jax.lax.broadcasted_iota(jnp.int32, (G * R, Cp), 1)
            s_cmp = jnp.where(lane < C, s_cmp, -1e30)
        # recompute the softmax stats in-register instead of reading the
        # saved LSE: Mosaic can't lower the [G, R] -> [G*R, 1] lane->sublane
        # reshape the LSE read would need (probed on device 2026-08-19:
        # "infer-vector-layout: unsupported shape cast"), and s_cmp is
        # recomputed here anyway so max/sum are two cheap VPU reductions
        m = jnp.max(s_cmp, axis=1, keepdims=True)
        p_ = jnp.exp(s_cmp - m)
        a = p_ / jnp.sum(p_, axis=1, keepdims=True)  # [G*R, Cp] normalized
        # delta = rowsum(dO * O) via the lane-embedded products (gp/op hold
        # head h at lanes v_off+h*D..; their product sums to the per-(f, h)
        # dot) — same reshape constraint as above
        delta = jnp.sum(gp.astype(jnp.float32) * op, axis=-1, keepdims=True)
        dp_big = jax.lax.dot_general(
            gp, v_g, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = _block_diag_extract(dp_big, R, Cp, G)
        ds = (a * (dp - delta) * scale)              # [G*R, Cp] f32
        ds_big = _block_diag_embed(ds.astype(kdt), R, Cp, G)
        a_big = _block_diag_embed(a.astype(kdt), R, Cp, G)
        dq_big = jax.lax.dot_general(
            ds_big, k_g, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [G*R, 128]
        # head-packed dq on the K lanes; unpacked OUTSIDE the kernel (packed
        # case: the V-lane garbage of ds_big @ kv is dropped by the unpack)
        dq_ref[0, g * G:(g + 1) * G] = dq_big.reshape(G, R, _LANES)
        dk_g = jax.lax.dot_general(
            ds_big, qp, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [G*Cp, 128] K lanes
        dv_g = jax.lax.dot_general(
            a_big, gp, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [G*Cp, 128] V lanes
        if n_planes == 1:
            dps = (dk_g + dv_g,)     # disjoint lane windows -> one plane
        else:
            dps = (dk_g, dv_g)
        for i in range(G):
            pi = g * G + i
            ty = corners_ref[0, pi, 0] * 2
            tx = corners_ref[0, pi, 1] * 2
            for p in range(n_planes):
                # row-slice [S, 128] strips directly off the [Cp, 128]
                # tile — a [C, 128] -> [S, S, 128] reshape would be another
                # unaligned (S=10 second-minor) shape cast Mosaic rejects
                d_i = dps[p][i * Cp:i * Cp + C]
                for r in range(S):
                    row0 = (ty + r) * w1 + tx
                    acc = dacc[p][0, pl.ds(row0, S), :]
                    dacc[p][0, pl.ds(row0, S), :] = acc + d_i[r * S:(r + 1) * S]


_WCA_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("arbitrary", "arbitrary"),
    vmem_limit_bytes=100 * 1024 * 1024,
)


def _wca_n_planes(H: int, D: int) -> int:
    """1 = packed K||V plane (2HD <= 128), 2 = split planes (HD <= 128)."""
    HD = H * D
    if 2 * HD <= _LANES:
        return 1
    if HD <= _LANES:
        return 2
    raise ValueError(
        f"window_cross_attention: H*D = {HD} > {_LANES} lanes — the "
        "unaligned patch DMA only lowers for one f32 lane tile (use the "
        "gather path)")


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
    if _LANES % D != 0:
        raise ValueError(
            f"window_cross_attention: head dim {D} must divide {_LANES} "
            "(use the gather path)")
    P = Lq // 4
    P_pad = -(-P // _WTP) * _WTP
    q_blk = block_children(q, h0, w0)                 # [B, P, 4, H, D]
    if P_pad != P:
        q_blk = jnp.pad(q_blk, ((0, 0), (0, P_pad - P)) + ((0, 0),) * 3)
        corners = jnp.pad(corners, ((0, 0), (0, P_pad - P), (0, 0)))
    h1, w1 = hw_k
    HD = H * D
    n_planes = _wca_n_planes(H, D)
    k2 = k.reshape(B, h1, w1, HD).astype(jnp.float32)
    v2 = v.reshape(B, h1, w1, HD).astype(jnp.float32)
    if n_planes == 1:
        planes = (jnp.concatenate(
            [k2, v2, jnp.zeros((B, h1, w1, _LANES - 2 * HD), jnp.float32)]
            if 2 * HD < _LANES else [k2, v2], axis=-1),)
    else:
        pad = ((0, 0),) * 3 + ((0, _LANES - HD),)
        planes = (jnp.pad(k2, pad) if HD < _LANES else k2,
                  jnp.pad(v2, pad) if HD < _LANES else v2)
    return q_blk, planes, corners.astype(jnp.int32), P, P_pad


def _wca_fwd_call(q_blk, planes, corners, S, interpret):
    """Returns the HEAD-PACKED message [B, P_pad, R, 128] (row (f, h) holds
    head h's message in lanes v_off+h*D:v_off+(h+1)*D) + LSE; unpack with
    _extract_heads_xla outside the kernel."""
    B, P_pad, _, H, D = q_blk.shape
    R, _ = _wca_group_sizes(H)
    n_planes = len(planes)
    scale = D ** -0.5
    grid = (B, P_pad // _WTP)
    kern = functools.partial(_wca_fwd_kernel, S=S, H=H, D=D, scale=scale,
                             n_planes=n_planes)
    msg, lse = pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((1, _WTP, 2), lambda b, p: (b, p, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _WTP, 4, H, D), lambda b, p: (b, p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * n_planes,  # HBM planes
        out_specs=(
            pl.BlockSpec((1, _WTP, R, _LANES), lambda b, p: (b, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _WTP, R), lambda b, p: (b, p, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, P_pad, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, P_pad, R), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((_WTP, S, S, _LANES), jnp.float32)
            for _ in range(n_planes)
        ] + [pltpu.SemaphoreType.DMA((n_planes, _WTP))],
        interpret=interpret, compiler_params=_WCA_COMPILER_PARAMS,
    )(corners, q_blk, *planes)
    return msg, lse


def _wca_unpack(big, P, D, off=0):
    """[B, P_pad, R, 128] head-packed -> [B, P, 4, H, D]."""
    B, _, R, _ = big.shape
    H = R // 4
    return _extract_heads_xla(big[:, :P].reshape(B, P, 4, H, _LANES), D, off)


def _wca_bwd_call(q_blk, planes, corners, msg, g_blk, S, w1, interpret):
    B, P_pad, _, H, D = q_blk.shape
    Lk = planes[0].shape[1] * planes[0].shape[2]
    n_planes = len(planes)
    R, _ = _wca_group_sizes(H)
    scale = D ** -0.5
    grid = (B, P_pad // _WTP)
    kern = functools.partial(_wca_bwd_kernel, S=S, H=H, D=D, scale=scale,
                             w1=w1, n_planes=n_planes)
    blk5 = pl.BlockSpec((1, _WTP, 4, H, D), lambda b, p: (b, p, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((1, Lk, _LANES), lambda b, p: (b, 0, 0),
                            memory_space=pltpu.VMEM)   # revisited
    out = pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((1, _WTP, 2), lambda b, p: (b, p, 0),
                         memory_space=pltpu.SMEM),
            blk5,                                     # q
            blk5,                                     # g (cotangent)
            blk5,                                     # msg (saved output)
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * n_planes,  # HBM planes
        out_specs=(
            pl.BlockSpec((1, _WTP, R, _LANES), lambda b, p: (b, p, 0, 0),
                         memory_space=pltpu.VMEM),    # dq (head-packed)
        ) + (acc_spec,) * n_planes,
        out_shape=(
            jax.ShapeDtypeStruct((B, P_pad, R, _LANES), jnp.float32),
        ) + tuple(jax.ShapeDtypeStruct((B, Lk, _LANES), jnp.float32)
                  for _ in range(n_planes)),
        scratch_shapes=[
            pltpu.VMEM((_WTP, S, S, _LANES), jnp.float32)
            for _ in range(n_planes)
        ] + [pltpu.SemaphoreType.DMA((n_planes, _WTP))],
        interpret=interpret, compiler_params=_WCA_COMPILER_PARAMS,
    )(corners, q_blk, g_blk, msg, *planes)
    dq, daccs = out[0], out[1:]
    return dq, daccs


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
    H, D = q.shape[2:]
    v_off = H * D if _wca_n_planes(H, D) == 1 else 0
    q_blk, planes, corners, P, _ = _wca_prepare(q, k, v, corners, hw_q, hw_k)
    msg, _ = _wca_fwd_call(q_blk, planes, corners, 2 * w, interpret)
    return _wca_unpack(msg, P, D, v_off)


def _wca_fwd(q, k, v, corners, hw_q, hw_k, w, interpret):
    H, D = q.shape[2:]
    v_off = H * D if _wca_n_planes(H, D) == 1 else 0
    q_blk, planes, corners_p, P, P_pad = _wca_prepare(q, k, v, corners,
                                                      hw_q, hw_k)
    msg_big, _ = _wca_fwd_call(q_blk, planes, corners_p, 2 * w, interpret)
    msg = _wca_unpack(msg_big, P, D, v_off)
    return msg, (q, k, v, corners, msg)


def _wca_bwd(hw_q, hw_k, w, interpret, res, g):
    q, k, v, corners, msg = res
    B, Lq, H, D = q.shape
    HD = H * D
    n_planes = _wca_n_planes(H, D)
    v_off = HD if n_planes == 1 else 0
    h1, w1 = hw_k
    q_blk, planes, corners_p, P, P_pad = _wca_prepare(q, k, v, corners,
                                                      hw_q, hw_k)
    g_blk = g.astype(q.dtype)
    msg_blk = msg                       # f32, as the kernel emitted it
    if P_pad != P:
        g_blk = jnp.pad(g_blk, ((0, 0), (0, P_pad - P)) + ((0, 0),) * 3)
        msg_blk = jnp.pad(msg_blk, ((0, 0), (0, P_pad - P)) + ((0, 0),) * 3)
    dq_big, daccs = _wca_bwd_call(q_blk, planes, corners_p, msg_blk,
                                  g_blk, 2 * w, w1, interpret)
    from casmtr_tpu.ops.quadtree import unblock_children
    h0, w0 = hw_q
    dq = unblock_children(_wca_unpack(dq_big, P, D, 0),
                          h0 // 2, w0 // 2).astype(q.dtype)
    if n_planes == 1:
        dk_flat = daccs[0][..., :HD]
        dv_flat = daccs[0][..., HD:2 * HD]
    else:
        dk_flat = daccs[0][..., :HD]
        dv_flat = daccs[1][..., :HD]
    dk = dk_flat.reshape(B, h1 * w1, H, D).astype(k.dtype)
    dv = dv_flat.reshape(B, h1 * w1, H, D).astype(v.dtype)
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
    k_g = jnp.take_along_axis(k[:, None], idx[..., None, None], axis=2,
                              mode="clip")
    v_g = jnp.take_along_axis(v[:, None], idx[..., None, None], axis=2,
                              mode="clip")
    qk = jnp.einsum("bpfhd,bpchd->bpfhc", qb, k_g,
                    preferred_element_type=jnp.float32) * (D ** -0.5)
    a = jax.nn.softmax(qk, axis=-1)
    return jnp.einsum("bpfhc,bpchd->bpfhd", a, v_g,
                      preferred_element_type=jnp.float32)
