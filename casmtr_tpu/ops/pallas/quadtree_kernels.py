"""Masked-flash Pallas TPU kernels for the quadtree fine levels (K1+K2).

The reference implements the fine levels of quadtree attention with two CUDA
kernels: K1 gathered score computation (cuda_imp/QuadTreeAttention/
QuadtreeAttention/src/score_computation_kernal.cu:21-62, backward :94-143) and
K2 sparse value aggregation (.../src/value_aggregation_kernel.cu:21-42,
backward :55-76), glued by a softmax + top-k in Python
(.../modules/quadtree_attention.py:180-229).

Per-head scattered gathers are descriptor-bound on TPU (measured ~65M
descriptors/s => ~3.8 ms for one 88x88 level), and the backward scatter-add is
worse.  The TPU-native formulation chosen here fuses K1 + softmax + K2 into
one kernel that never gathers:

* keys/values are laid out CHILD-MAJOR, one [Lb, D] segment per 2x2-child
  (Lb = number of 2x2 blocks of the key grid), so each candidate block id
  addresses the same row in all four segments;
* dense per-head QK is computed segment-by-segment on the MXU against ALL
  keys;
* a membership BIAS (0 for candidate blocks, -1e30 otherwise) is built on the
  VPU from the previous level's top-k block ids by K compares against a block
  iota — this replaces the gather;
* full-row softmax + value aggregation run in VMEM; with the bias, the
  result is numerically the softmax over exactly the 4K gathered candidates
  (exp(-1e30 + s) == 0, and candidate scores always dominate the row max),
  so parity with the gather oracle is exact up to fp association;
* the intermediate levels' top-k over candidates is computed in-kernel by
  iterative max-extraction on the masked scores (selection identical to
  top-k over the gathered candidate softmax, since softmax is monotonic in
  the score within a row);
* the backward pass recomputes the masked scores and produces dQ/dK/dV as
  dense flash-style matmuls — the CUDA atomicAdd scatter becomes plain
  accumulation over query tiles.

Correctness requires the per-(query-block, head) candidate ids to be
DISTINCT, which top-k guarantees; a duplicated id would be double-counted by
the gather formulation but single-counted by the mask.

Top-k tie-breaking: lowest child-major column (= child-then-block order),
whereas the reference breaks ties by candidate enumeration order.  Ties
between distinct keys with bit-equal scores are measure-zero; the final
message is tie-order invariant regardless.

VPU cost note (r4): scores are computed in BASE-2 units — the softmax scale
and log2(e) are folded into q BEFORE the kernel (one [rows, D] multiply
instead of a full-row [rows, Lb] multiply per segment), and exp2 replaces
exp (TPU's exp lowers to exp2(x * log2e); pre-scaling makes the extra
multiply per element disappear).  Softmax is invariant to the base change:
2^(s*log2e - m2) == e^(s - m), so the message is identical up to fp
rounding.  The saved LSE residual is stored in base-2 units (m2 + log2 l).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_TP = 128  # query parents per grid step (=> 4*_TP query rows)
_LOG2E = math.log2(math.e)
# Fold the whole score scale into q before the kernel: removes the per-score
# [rows, Lb] multiply from BOTH the forward and the backward recompute.  For
# bf16 models this rounds q*c once to bf16 (vs rounding q), so kernel-vs-
# gather-oracle parity moves from ~1e-6 to the bf16 rounding level (~1e-3)
# while accuracy vs the f32 math is unchanged; gated until device-measured.
_PRESCALE = os.environ.get("CASMTR_QK_PRESCALE", "0") == "1"

# The backward's per-child live set (several [_TP, Lb] f32 tiles) exceeds the
# default 16 MiB scoped-vmem budget at Lb ~ (88/2)^2; v5e has 128 MiB VMEM.
_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
    vmem_limit_bytes=100 * 1024 * 1024,
)


def _membership_bias_xla(ids_bh, Lb: int):
    """[B, H, P, K] candidate block ids -> additive bias [B, H, P, Lb]
    (0 / -1e30), bf16.

    Built ONCE per kernel call in XLA and fed to the kernels as an input —
    r1-r4 rebuilt it inside BOTH the forward and the backward kernel (K
    iota-compares + ors over every [rows, Lb] tile, the kernels' dominant
    VPU cost per PERF.md); the bf16 HBM round-trip (~0.5 MB per grid step,
    DMA-overlapped) is far cheaper than 2K VPU ops/element twice.  bf16
    holds -1e30 exactly enough (-1.0038e30): anything <= -1e29 underflows
    identically in exp2(s - m).

    Built as a K-step fused elementwise chain over [B, H, P, Lb] (like the
    old in-kernel loop) — the (ids[..., None] == iota).any(k) form makes XLA
    materialize the 5D broadcast through HBM (~0.4 ms at the 88^2 level)."""
    K = ids_bh.shape[3]
    blk = jax.lax.broadcasted_iota(jnp.int32, ids_bh.shape[:3] + (Lb,), 3)
    hit = ids_bh[..., 0:1] == blk
    for t in range(1, K):
        hit = jnp.logical_or(hit, ids_bh[..., t:t + 1] == blk)
    return jnp.where(hit, 0.0, _NEG).astype(jnp.bfloat16)


def _build_scores(q_c, k_ref, bias, s_scr, scale: float):
    """Fill s_scr[j] = q_c @ k_j^T * scale + bias for the 4 child segments
    (base-2 score units; scale == 1.0 when q was pre-scaled — the multiply
    then disappears from the hot [rows, Lb] path)."""
    for j in range(4):
        s = jax.lax.dot_general(
            q_c, k_ref[0, 0, j],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s_scr[j] = (s + bias) if scale == 1.0 else (s * scale + bias)


def _fwd_kernel(bias_ref, q_ref, k_ref, v_ref, msg_ref, lse_ref, s_scr, *,
                scale: float, Lb: int, n_topk: int, ts_ref=None, ti_ref=None):
    """One [_TP parents x all keys] tile: scores -> softmax -> (top-k) -> PV.

    VMEM/MXU discipline: exactly ONE exp2 pass (p overwrites the score
    scratch; scores are in base-2 units so no log2e multiply), and the
    P @ V matmul runs with p cast to the value dtype so a bf16 model pays a
    single MXU pass instead of an emulated-f32 multi-pass.  The per-row
    BASE-2 logsumexp is written out so the backward skips the max and
    normalizer passes entirely (flash-style LSE residual).  The membership
    bias arrives precomputed (bf16, _membership_bias_xla) instead of being
    rebuilt from ids here — one upcast instead of 2K compare/or passes.
    """
    bias = bias_ref[0, 0].astype(jnp.float32)
    vdt = v_ref.dtype
    if n_topk:
        hit = bias == 0.0
        col = jax.lax.broadcasted_iota(jnp.int32, (_TP, Lb), 1)
    for c in range(4):
        q_c = q_ref[0, 0, c]
        _build_scores(q_c, k_ref, bias, s_scr, scale)
        m = jnp.max(s_scr[0], axis=1, keepdims=True)
        for j in range(1, 4):
            m = jnp.maximum(m, jnp.max(s_scr[j], axis=1, keepdims=True))
        l = jnp.zeros_like(m)
        acc = jnp.zeros((_TP, q_ref.shape[-1]), jnp.float32)
        for j in range(4):
            p = jnp.exp2(s_scr[j] - m)  # masked cols: exp2(-1e30 - m) == 0
            l = l + jnp.sum(p, axis=1, keepdims=True)
            acc = acc + jax.lax.dot_general(
                p.astype(vdt), v_ref[0, 0, j],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if n_topk:
                # keep p for extraction; non-candidates pinned to -1 so a
                # candidate whose exp underflowed to 0 still wins the max.
                s_scr[j] = jnp.where(hit, p, jnp.float32(-1.0))
        msg_ref[0, 0, c] = acc / l
        lse_ref[0, 0, c] = jnp.broadcast_to(m + jnp.log2(l), (_TP, 8))
        # iterative top-k extraction on the candidate p values (softmax is
        # monotonic in the score, so selection order matches the oracle).
        big = jnp.int32(2 ** 30)
        for t in range(n_topk):
            m_t = jnp.max(s_scr[0], axis=1, keepdims=True)
            for j in range(1, 4):
                m_t = jnp.maximum(m_t, jnp.max(s_scr[j], axis=1,
                                               keepdims=True))
            c_best = jnp.full((_TP, 1), big, jnp.int32)
            for j in range(4):
                cj = jnp.min(jnp.where(s_scr[j] == m_t, col, big),
                             axis=1, keepdims=True)
                c_best = jnp.minimum(
                    c_best, jnp.where(cj < Lb, cj + j * Lb, big))
            ts_ref[0, 0, c, :, t:t+1] = m_t / l
            ti_ref[0, 0, c, :, t:t+1] = c_best
            for j in range(4):
                s_scr[j] = jnp.where(col + j * Lb == c_best,
                                     jnp.float32(-2.0), s_scr[j])


def _bwd_kernel(bias_ref, q_ref, k_ref, v_ref, g_ref, o_ref, lse_ref,
                dq_ref, dk_ref, dv_ref, s_scr, *, score_scale: float,
                q_unscale: float, Lb: int):
    """Flash-style backward: one score pass into the [4, _TP, Lb] scratch
    (re-used as the A scratch — ~4 MiB at Lb = (88/2)^2, well inside the
    raised vmem budget); the saved BASE-2 LSE residual normalizes directly
    (A = exp2(s2 - lse2)) so there is no max or normalizer pass, and
    delta = rowsum(dO * O) from the saved forward output replaces the dP
    pass.  Each child costs 4 score + 4 dP + 12 gradient matmuls and a
    single exp2 sweep.  The membership bias arrives precomputed (the
    forward's residual) — no rebuild.  The MATH softmax scale (D^-1/2) of
    dS = A * (dP - delta) * grad_scale is folded into the INCOMING g by the
    caller (dP and delta both scale linearly in g), which makes dQ and dK
    come out right and dV come out scaled by grad_scale — the caller
    unscales dV once outside ([Lk, D], ~free) instead of this kernel
    multiplying every [_TP, Lb] dS tile.

    ``score_scale`` is the base-2 score scale fed to _build_scores (1.0 when
    q was pre-scaled); ``q_unscale`` restores the original q for the dK
    matmul when q was pre-scaled (dK = dS^T q_orig)."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        for j in range(4):
            dk_ref[0, 0, j] = jnp.zeros(dk_ref.shape[-2:], jnp.float32)
            dv_ref[0, 0, j] = jnp.zeros(dv_ref.shape[-2:], jnp.float32)

    bias = bias_ref[0, 0].astype(jnp.float32)
    kdt = k_ref.dtype

    def dp(g_c, j):
        return jax.lax.dot_general(
            g_c, v_ref[0, 0, j],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    for c in range(4):
        q_c = q_ref[0, 0, c]
        qo_c = q_c if q_unscale == 1.0 else (
            q_c.astype(jnp.float32) * q_unscale).astype(kdt)
        g_c = g_ref[0, 0, c]
        lse_c = lse_ref[0, 0, c][:, 0:1]
        # single pass: A = exp2(s2 - lse2) directly (masked cols underflow
        # to 0)
        _build_scores(q_c, k_ref, bias, s_scr, score_scale)
        for j in range(4):
            s_scr[j] = jnp.exp2(s_scr[j] - lse_c)
        # delta = rowsum(dO * O): O = A @ V (saved forward output), so
        # sum_c A_c (g . V_c) == g . O — no dP pass needed for delta.
        delta = jnp.sum(g_c.astype(jnp.float32) * o_ref[0, 0, c],
                        axis=1, keepdims=True)
        # dS = A * (dP - delta); accumulate dQ / dK / dV.  The
        # [_TP, Lb]-operand matmuls run in the model dtype (bf16 => one MXU
        # pass); accumulation stays f32 via preferred_element_type.
        dq_acc = jnp.zeros((_TP, q_ref.shape[-1]), jnp.float32)
        for j in range(4):
            a_j = s_scr[j]
            ds_j = (a_j * (dp(g_c, j) - delta)).astype(kdt)
            a_j = a_j.astype(kdt)
            dq_acc = dq_acc + jax.lax.dot_general(
                ds_j, k_ref[0, 0, j],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk_ref[0, 0, j] += jax.lax.dot_general(
                ds_j, qo_c, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dv_ref[0, 0, j] += jax.lax.dot_general(
                a_j, g_c, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dq_ref[0, 0, c] = dq_acc


# ---------------------------------------------------------------------------
# layout transforms (host-side jnp)
# ---------------------------------------------------------------------------

def _to_child_major(x, h: int, w: int):
    """Tokens [B, h*w, H, D] -> child-major segments [B, H, 4, Lb, D]
    (child j = dr*2+dc; block b = row-major over the (h/2, w/2) grid)."""
    B, L, H, D = x.shape
    xb = x.reshape(B, h // 2, 2, w // 2, 2, H, D)
    xb = xb.transpose(0, 5, 2, 4, 1, 3, 6)       # B H 2 2 h/2 w/2 D
    return xb.reshape(B, H, 4, (h // 2) * (w // 2), D)


def _pad_parents(x, axis: int, p_pad: int):
    P = x.shape[axis]
    if P == p_pad:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, p_pad - P)
    return jnp.pad(x, pads)


def _specs(B, H, P_pad, D, Lb):
    in_specs = [
        pl.BlockSpec((1, 1, _TP, Lb), lambda b, h, p: (b, h, p, 0),
                     memory_space=pltpu.VMEM),            # bias (bf16)
        pl.BlockSpec((1, 1, 4, _TP, D), lambda b, h, p: (b, h, 0, p, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 4, Lb, D), lambda b, h, p: (b, h, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 4, Lb, D), lambda b, h, p: (b, h, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    msg_spec = pl.BlockSpec((1, 1, 4, _TP, D), lambda b, h, p: (b, h, 0, p, 0),
                            memory_space=pltpu.VMEM)
    return in_specs, msg_spec


def _fwd_call(q_cm, k_cm, v_cm, bias_bh, n_topk: int, interpret: bool):
    B, H, _, P_pad, D = q_cm.shape
    Lb = k_cm.shape[3]
    # base-2 score scale; 1.0 when q was pre-scaled in _prepare
    scale = 1.0 if _PRESCALE else D ** -0.5 * _LOG2E
    grid = (B, H, P_pad // _TP)
    in_specs, msg_spec = _specs(B, H, P_pad, D, Lb)
    lse_spec = pl.BlockSpec((1, 1, 4, _TP, 8), lambda b, h, p: (b, h, 0, p, 0),
                            memory_space=pltpu.VMEM)
    lse_shape = jax.ShapeDtypeStruct((B, H, 4, P_pad, 8), jnp.float32)
    scratch = [pltpu.VMEM((4, _TP, Lb), jnp.float32)]
    if n_topk == 0:
        kern = functools.partial(_fwd_kernel, scale=scale, Lb=Lb, n_topk=0)
        msg, lse = pl.pallas_call(
            kern, grid=grid, in_specs=in_specs,
            out_specs=(msg_spec, lse_spec),
            out_shape=(
                jax.ShapeDtypeStruct((B, H, 4, P_pad, D), jnp.float32),
                lse_shape,
            ),
            scratch_shapes=scratch, interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
        )(bias_bh, q_cm, k_cm, v_cm)
        return msg, lse, None, None

    def kern(bias_ref, q_ref, k_ref, v_ref, msg_ref, lse_ref, ts_ref, ti_ref,
             s_scr):
        _fwd_kernel(bias_ref, q_ref, k_ref, v_ref, msg_ref, lse_ref, s_scr,
                    scale=scale, Lb=Lb, n_topk=n_topk, ts_ref=ts_ref,
                    ti_ref=ti_ref)

    tk_spec = pl.BlockSpec((1, 1, 4, _TP, n_topk),
                           lambda b, h, p: (b, h, 0, p, 0),
                           memory_space=pltpu.VMEM)
    msg, lse, ts, ti = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=(msg_spec, lse_spec, tk_spec, tk_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, 4, P_pad, D), jnp.float32),
            lse_shape,
            jax.ShapeDtypeStruct((B, H, 4, P_pad, n_topk), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 4, P_pad, n_topk), jnp.int32),
        ),
        scratch_shapes=scratch, interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(bias_bh, q_cm, k_cm, v_cm)
    return msg, lse, ts, ti


def _bwd_call(q_cm, k_cm, v_cm, bias_bh, g_cm, o_cm, lse, interpret: bool):
    """g_cm must arrive PRE-SCALED by the math softmax scale D^-1/2; the
    returned dv is scaled by it too (caller unscales once — see
    _bwd_kernel docstring)."""
    B, H, _, P_pad, D = q_cm.shape
    Lb = k_cm.shape[3]
    score_scale = 1.0 if _PRESCALE else D ** -0.5 * _LOG2E
    q_unscale = 1.0 / (D ** -0.5 * _LOG2E) if _PRESCALE else 1.0
    grid = (B, H, P_pad // _TP)
    in_specs, msg_spec = _specs(B, H, P_pad, D, Lb)
    lse_spec = pl.BlockSpec((1, 1, 4, _TP, 8), lambda b, h, p: (b, h, 0, p, 0),
                            memory_space=pltpu.VMEM)
    in_specs = in_specs + [msg_spec, msg_spec, lse_spec]  # g, o, lse
    kv_spec = pl.BlockSpec((1, 1, 4, Lb, D), lambda b, h, p: (b, h, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    kern = functools.partial(_bwd_kernel, score_scale=score_scale,
                             q_unscale=q_unscale, Lb=Lb)
    dq, dk, dv = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=(msg_spec, kv_spec, kv_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, 4, P_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 4, Lb, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 4, Lb, D), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((4, _TP, Lb), jnp.float32)],
        interpret=interpret, compiler_params=_COMPILER_PARAMS,
    )(bias_bh, q_cm, k_cm, v_cm, g_cm, o_cm, lse)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

def _layouts(q, k, v, hw_q, hw_k):
    """Kernel-layout transforms only (no bias): q child-blocked + padded,
    k/v child-major."""
    from casmtr_tpu.ops.quadtree import block_children
    h0, w0 = hw_q
    h1, w1 = hw_k
    B, Lq, H, D = q.shape
    P = Lq // 4
    P_pad = -(-P // _TP) * _TP
    q_cm = block_children(q, h0, w0).transpose(0, 3, 2, 1, 4)  # [B,H,4,P,D]
    if _PRESCALE:
        # fold the base-2 softmax scale into q (f32 multiply, model dtype
        # storage) — see module docstring; the kernel then adds bias only.
        c = jnp.float32(D ** -0.5 * _LOG2E)
        q_cm = (q_cm.astype(jnp.float32) * c).astype(q.dtype)
    q_cm = _pad_parents(q_cm, 3, P_pad)
    k_cm = _to_child_major(k, h1, w1)
    v_cm = _to_child_major(v, h1, w1)
    return q_cm, k_cm, v_cm, P


def _prepare(q, k, v, topk_idx_prev, hw_q, hw_k):
    q_cm, k_cm, v_cm, P = _layouts(q, k, v, hw_q, hw_k)
    P_pad = q_cm.shape[3]
    Lb = k_cm.shape[3]
    ids_bh = _pad_parents(topk_idx_prev.transpose(0, 3, 1, 2), 2, P_pad)
    bias_bh = _membership_bias_xla(ids_bh.astype(jnp.int32), Lb)
    return q_cm, k_cm, v_cm, bias_bh, P


def _msg_out(msg, P):
    return msg[:, :, :, :P].transpose(0, 3, 2, 1, 4)  # [B, P, 4, H, D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _message(q, k, v, topk_idx_prev, hw_q, hw_k, interpret=False):
    q_cm, k_cm, v_cm, bias_bh, P = _prepare(q, k, v, topk_idx_prev,
                                            hw_q, hw_k)
    msg, _, _, _ = _fwd_call(q_cm, k_cm, v_cm, bias_bh, 0, interpret)
    return _msg_out(msg, P)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _message_topk(q, k, v, topk_idx_prev, hw_q, hw_k, topk, interpret=False):
    q_cm, k_cm, v_cm, bias_bh, P = _prepare(q, k, v, topk_idx_prev,
                                            hw_q, hw_k)
    msg, _, ts, ti = _fwd_call(q_cm, k_cm, v_cm, bias_bh, topk, interpret)
    return _msg_out(msg, P), ts[:, :, :, :P], ti[:, :, :, :P]


def _shared_bwd(q, k, v, bias_bh, msg, lse, hw_q, hw_k, interpret, g_msg):
    """bias_bh rides in as the FORWARD's residual — the backward never
    rebuilds the membership (r1-r4 re-ran the K compare/or passes here)."""
    q_cm, k_cm, v_cm, P = _layouts(q, k, v, hw_q, hw_k)
    B, Lq, H, D = q.shape
    # cotangent back to kernel layout, zero-padded parents, PRE-SCALED by
    # the math softmax scale (see _bwd_kernel docstring); model dtype so the
    # dP / dV matmuls stay single-pass on the MXU (f32 acc regardless).
    g_cm = _pad_parents(
        (g_msg * jnp.float32(D ** -0.5)).transpose(0, 3, 2, 1, 4)
        .astype(q.dtype), 3, q_cm.shape[3])
    # forward output (residual) in kernel layout: delta = rowsum(dO * O)
    o_cm = _pad_parents(msg.transpose(0, 3, 2, 1, 4), 3, q_cm.shape[3])
    dq_cm, dk_cm, dv_cm = _bwd_call(q_cm, k_cm, v_cm, bias_bh, g_cm, o_cm,
                                    lse, interpret)
    h0, w0 = hw_q
    h1, w1 = hw_k
    from casmtr_tpu.ops.quadtree import unblock_children
    dq = unblock_children(dq_cm[:, :, :, :P].transpose(0, 3, 2, 1, 4),
                          h0 // 2, w0 // 2).astype(q.dtype)

    def from_cm(x):  # [B, H, 4, Lb, D] -> [B, Lk, H, D]
        xb = x.reshape(B, H, 2, 2, h1 // 2, w1 // 2, D)
        xb = xb.transpose(0, 4, 2, 5, 3, 1, 6)   # B h/2 2 w/2 2 H D
        return xb.reshape(B, h1 * w1, H, D)

    dk = from_cm(dk_cm).astype(k.dtype)
    # dv came out scaled by D^-0.5 (g was pre-scaled); unscale once here
    dv = from_cm(dv_cm * jnp.float32(D ** 0.5)).astype(v.dtype)
    return dq, dk, dv, None


def _message_fwd(q, k, v, topk_idx_prev, hw_q, hw_k, interpret):
    q_cm, k_cm, v_cm, bias_bh, P = _prepare(q, k, v, topk_idx_prev,
                                            hw_q, hw_k)
    msg, lse, _, _ = _fwd_call(q_cm, k_cm, v_cm, bias_bh, 0, interpret)
    out = _msg_out(msg, P)
    return out, (q, k, v, bias_bh, out, lse)


def _message_bwd(hw_q, hw_k, interpret, res, g):
    return _shared_bwd(*res, hw_q, hw_k, interpret, g)


_message.defvjp(_message_fwd, _message_bwd)


def _message_topk_fwd(q, k, v, topk_idx_prev, hw_q, hw_k, topk, interpret):
    q_cm, k_cm, v_cm, bias_bh, P = _prepare(q, k, v, topk_idx_prev,
                                            hw_q, hw_k)
    msg, lse, ts, ti = _fwd_call(q_cm, k_cm, v_cm, bias_bh, topk, interpret)
    out = (_msg_out(msg, P), ts[:, :, :, :P], ti[:, :, :, :P])
    return out, (q, k, v, bias_bh, out[0], lse)


def _message_topk_bwd(hw_q, hw_k, topk, interpret, res, g):
    # top-k outputs are selection results: no gradient (callers discard them)
    return _shared_bwd(*res, hw_q, hw_k, interpret, g[0])


_message_topk.defvjp(_message_topk_fwd, _message_topk_bwd)


def masked_fine_level(q, k, v, topk_idx_prev, hw_q: Tuple[int, int],
                      hw_k: Tuple[int, int], topk: int = 0,
                      interpret: Optional[bool] = None):
    """Fused quadtree fine-level attention (K1 + softmax + top-k + K2).

    Drop-in for the gather path of ``_fine_level_b`` when rel_pos is None.

    Args:
      q: [B, Lq, H, D] current-level queries; k/v: [B, Lk, H, D].
      topk_idx_prev: [B, P, K, H] int32 flat block ids into the previous
        (2x coarser) key grid, P == Lq//4; per (p, h) ids must be distinct.
      hw_q / hw_k: (h, w) of the query / key grids.
      topk: if > 0, also return the top-k over the 4K candidates per query.
    Returns:
      (message [B, P, 4, H, D] f32,
       topk_score [B, Lq, topk, H] f32 or None,
       topk_idx [B, Lq, topk, H] int32 flat key-grid indices or None).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    h0, w0 = hw_q
    h1, w1 = hw_k
    if topk == 0:
        return _message(q, k, v, topk_idx_prev, (h0, w0), (h1, w1),
                        interpret), None, None
    assert topk <= 4 * topk_idx_prev.shape[2], (topk, topk_idx_prev.shape)
    msg, ts, ti = _message_topk(q, k, v, topk_idx_prev, (h0, w0), (h1, w1),
                                topk, interpret)
    # child-major column -> flat key-grid index
    Lb = (h1 // 2) * (w1 // 2)
    w2 = w1 // 2
    child, blk = ti // Lb, ti % Lb
    flat = (((blk // w2) * 2 + child // 2) * w1
            + (blk % w2) * 2 + child % 2).astype(jnp.int32)
    # [B, H, 4, P, k] -> [B, P, 4, k, H] -> unblock -> [B, Lq, k, H]
    from casmtr_tpu.ops.quadtree import unblock_children
    perm = (0, 3, 2, 4, 1)
    ts = unblock_children(ts.transpose(perm), h0 // 2, w0 // 2)
    flat = unblock_children(flat.transpose(perm), h0 // 2, w0 // 2)
    return msg, ts, flat
