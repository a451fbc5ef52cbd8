"""Quadtree attention (QTAttA / QTAttB / QTAttGuided / CascadeQTAttB) in JAX.

Functional re-implementation of the reference algorithms
(reference: cuda_imp/QuadTreeAttention/QuadtreeAttention/modules/
quadtree_attention.py:8-452) on top of the ``gather_ops`` kernel boundary.

Semantics preserved exactly:
* pyramid processed coarsest -> finest (reference :245 ``reversed``);
* full attention + top-k at the coarsest level (:161-178);
* at finer levels each query 2x2-child block attends to the 4 children of the
  previous level's top-k keys (:180-229); candidate order is
  ``c = k*4 + (dr*2+dc)`` for offsets (dr,dc) in row-major order (:195-199);
* per-level messages merged with softmax(level_weight), progressively
  un-blocked 2x upward (:262-286).

Layouts are TPU-native: tokens [B, L, H, D] with heads/features last.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from casmtr_tpu.ops.gather_ops import gather_scores, gather_aggregate


def block_children(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[B, h*w, ...] -> [B, (h//2)*(w//2), 4, ...] grouping 2x2 blocks.

    Child order is row-major within the block: (0,0),(0,1),(1,0),(1,1) —
    matches reference rearrange 'b c h t1 w t2 -> b (h w) (t1 t2) c'.
    """
    B = x.shape[0]
    rest = x.shape[2:]
    x = x.reshape(B, h // 2, 2, w // 2, 2, *rest)
    x = jnp.moveaxis(x, 2, 3)  # [B, h/2, w/2, 2, 2, ...]
    return x.reshape(B, (h // 2) * (w // 2), 4, *rest)


def unblock_children(x: jnp.ndarray, h2: int, w2: int) -> jnp.ndarray:
    """Inverse of ``block_children``: [B, h2*w2, 4, ...] -> [B, (2h2)*(2w2), ...]."""
    B = x.shape[0]
    rest = x.shape[3:]
    x = x.reshape(B, h2, w2, 2, 2, *rest)
    x = jnp.moveaxis(x, 3, 2)  # [B, h2, 2, w2, 2, ...]
    return x.reshape(B, h2 * 2 * w2 * 2, *rest)


def exact_topk(x: jnp.ndarray, k: int):
    """Exact top-k over the last axis.

    TPU notes (measured on v5e): (1) the input must be flattened to 2D —
    XLA picks pathological layouts for >2D sort/partial-reduce operands
    (20-100x slower); (2) lax.approx_max_k with recall_target=1.0 (the
    PartialReduce path, exact) beats the full sort that lax.top_k lowers to.

    Guarantee (pinned by scripts/tpu_eval_semantics.py on device): the
    returned VALUES are the exact top-k on every backend; selection among
    bit-equal scores is unspecified on TPU (CPU lax.top_k picks lowest
    index first, TPU PartialReduce may not).  Continuous softmax scores
    never tie, so model eval behavior is device-independent in practice.
    """
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if jax.devices()[0].platform == "tpu":
        v, i = jax.lax.approx_max_k(x2, k, recall_target=1.0)
    else:
        v, i = jax.lax.top_k(x2, k)
    return v.reshape(*lead, k), i.reshape(*lead, k)


def chunked_exact_topk(x: jnp.ndarray, k: int, chunk: int):
    """Exact top-k over the last axis via a two-stage chunked reduction.

    Stage 1 splits the W-wide rows into ceil(W/chunk) chunks and top-k's each
    NARROW chunk; stage 2 top-k's the surviving nc*min(k,chunk) values.  This
    is EXACT: every global top-k element is, within its own chunk, among that
    chunk's top-min(k,chunk) (at most k-1 other global winners can outrank it
    anywhere, a fortiori inside the chunk), so stage 1 never drops a winner.
    Tie-breaking among bit-equal values may differ from the single-pass
    top-k; per exact_topk's contract membership among ties is unspecified on
    TPU anyway.

    Why: lax.approx_max_k's PartialReduce collapses on WIDE rows (measured
    46.5 ms at [21.6k, 2704] k=32 on v5e, ~5 GB/s effective — PERF.md gather
    facts) while narrow rows run at full rate.  The two-stage form keeps
    every top-k operand at most `chunk` wide at the cost of one extra narrow
    top-k + one narrow index gather.
    """
    lead = x.shape[:-1]
    W = x.shape[-1]
    if W <= chunk:
        return exact_topk(x, k)
    x2 = x.reshape(-1, W)
    nc = -(-W // chunk)
    pad = nc * chunk - W
    if pad:
        x2 = jnp.pad(x2, ((0, 0), (0, pad)),
                     constant_values=-jnp.inf if
                     jnp.issubdtype(x2.dtype, jnp.floating) else 0)
    R = x2.shape[0]
    kc = min(k, chunk)
    v1, i1 = exact_topk(x2.reshape(R * nc, chunk), kc)     # [R*nc, kc]
    cols = (i1.reshape(R, nc, kc)
            + (jnp.arange(nc, dtype=i1.dtype) * chunk)[None, :, None])
    v2, i2 = exact_topk(v1.reshape(R, nc * kc), k)         # [R, k]
    idx = jnp.take_along_axis(cols.reshape(R, nc * kc), i2, axis=1)
    return v2.reshape(*lead, k), idx.reshape(*lead, k)


def topk_lastaxis_at(x: jnp.ndarray, k: int, axis: int):
    """top_k along ``axis`` (descending), returning (values, indices) with the
    k-axis placed where ``axis`` was."""
    xm = jnp.moveaxis(x, axis, -1)
    v, i = exact_topk(xm, k)
    return jnp.moveaxis(v, -1, axis), jnp.moveaxis(i, -1, axis)


def expand_child_indices(topk_idx: jnp.ndarray, w_prev: int, w_cur: int,
                         dilated: int = 1, clamp_max: Optional[int] = None
                         ) -> jnp.ndarray:
    """Previous-level top-k indices -> flattened 4-children candidate indices.

    Args:
      topk_idx: [B, P, K, H] int32 flat indices into the previous (coarser) grid.
      w_prev: width of the previous grid.
      w_cur: width of the current (2x finer) grid.
      dilated: child offset stride (reference CascadeQTAttB ``dilated``; :424-427).
      clamp_max: if given, clamp flat indices to [0, clamp_max].
    Returns:
      idx [B, P, K*4, H] with candidate order c = k*4 + (dr*2+dc).
    """
    rows = (topk_idx // w_prev) * 2
    cols = (topk_idx % w_prev) * 2
    cands = []
    for dr in (0, dilated):
        for dc in (0, dilated):
            cands.append((rows + dr) * w_cur + (cols + dc))
    idx = jnp.stack(cands, axis=3)  # [B, P, K, 4, H]
    B, P, K = idx.shape[:3]
    idx = idx.reshape(B, P, K * 4, idx.shape[-1])
    if clamp_max is not None:
        idx = jnp.clip(idx, 0, clamp_max)
    return idx


def _coarse_level(q, k, v, topk: int, rel_pos=None):
    """Full attention + top-k at the coarsest pyramid level.

    reference: quadtree_attention.py:161-178 (QTAttB.process_coarse_level).
    q/k/v: [B, L, H, D]. Returns (A, message, topk_score, topk_idx) with
    top-k outputs [B, L, K, H]. Internally keys sit on the LAST (lane) axis
    — TPU layout; head-last tensors waste 16x of each vector lane."""
    D = q.shape[-1]
    qk = jnp.einsum("blhd,bshd->blhs", q, k,
                    preferred_element_type=jnp.float32) * (D ** -0.5)
    if rel_pos is not None:
        # rel_pos convention: [B_or_1, H, L, S] (the reference's own coarse
        # rel-pos path is shape-inconsistent and unexercised; we define the
        # head-first convention used by _rel_pos_2d)
        qk = qk + jnp.moveaxis(rel_pos, 1, 2)
    A = jax.nn.softmax(qk, axis=-1)  # over keys
    ts, ti = exact_topk(A, topk)                      # [B, L, H, K]
    message = jnp.einsum("blhs,bshd->blhd", A, v,
                         preferred_element_type=jnp.float32)
    return (A, message, jnp.swapaxes(ts, 2, 3),
            jnp.swapaxes(ti, 2, 3).astype(jnp.int32))


def block_gather(table: jnp.ndarray, parent_idx: jnp.ndarray,
                 n_children: int = 4) -> jnp.ndarray:
    """Gather 2x2 key/value blocks by per-head parent indices.

    TPU note: XLA row gathers are scalar-unit bound, so we gather at BLOCK
    granularity — 4x fewer gathers of 4x wider (contiguous) rows than the
    naive per-child gather, with identical results. With a fused K||V table
    (n_children=8) one gather serves both operands.

    table: [B, Lb, H, n_children*D] block-major keys (children of each 2x2
      block flattened into the last dim, child-major);
    parent_idx: [B, P, K, H] int32 indices into Lb.
    Returns [B, P, K, H, n_children, D]."""
    B, Lb, H, FD = table.shape
    D = FD // n_children
    arr = table[:, None, None]                           # [B, 1, 1, Lb, H, FD]
    idx = parent_idx[..., None, None]                    # [B, P, K, H, 1, 1]
    idx = jnp.swapaxes(idx, 3, 4)                        # [B, P, K, 1, H, 1]
    out = jnp.take_along_axis(arr, idx, axis=3,
                              mode="clip")          # [B, P, K, 1, H, FD]
    return out[:, :, :, 0].reshape(*out.shape[:3], H, n_children, D)


def to_block_major(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[B, L, H, D] tokens -> [B, L/4, H, 4*D] block-major table."""
    B, L, H, D = x.shape
    xb = block_children(x, h, w)                         # [B, L/4, 4, H, D]
    return jnp.swapaxes(xb, 2, 3).reshape(B, L // 4, H, 4 * D)


def _dense_masked_select(q, k, topk_idx_prev, topk: int,
                         hw_q: Tuple[int, int], hw_k: Tuple[int, int],
                         chunk: Optional[int] = None):
    """Candidate top-k via masked DENSE scores (the split-top-k selection).

    Computes q @ k^T against ALL child-major keys on the MXU and masks
    non-candidates to -1e30 with a membership bias built from the previous
    level's top-k block ids — the same trick as the masked-flash kernel
    (ops/pallas/quadtree_kernels.py), applied to the forward-only selection.
    Replaces the descriptor-bound candidate gather (TPU row gathers run at
    ~45-90M descriptors/s; the dense QK is ~0.2 ms of MXU work at the 704^2
    geometries). Selection matches the gathered-candidate softmax exactly:
    masked columns can never win, softmax is monotonic in the score, and
    the returned scores ARE the candidate softmax values.

    ``chunk``: if set, the top-k runs as the two-stage chunked reduction
    (``chunked_exact_topk``) over the RAW masked scores — the wide-row
    approx_max_k collapse is what killed the r4 wide variant — and the
    softmax values of the k winners are reconstructed from the row
    logsumexp (one pass over the wide row instead of exp+div+topk over it;
    exp(-1e30 - max) underflows to exactly 0 so the denominator equals the
    gathered-candidate softmax's up to fp roundoff).

    Returns (topk_score, topk_idx) unblocked to [B, Lq, topk, H], with
    topk_idx flat indices into the (h1, w1) key grid."""
    h0, w0 = hw_q
    h1, w1 = hw_k
    B, Lq, H, D = q.shape
    P = Lq // 4
    Lb = (h1 // 2) * (w1 // 2)
    w2 = w1 // 2
    qb = block_children(q, h0, w0)                        # [B,P,4,H,D]
    kb = block_children(k, h1, w1)                        # [B,Lb,4,H,D]
    s = jnp.einsum("bpfhd,bljhd->bpfhjl", qb, kb,
                   preferred_element_type=jnp.float32) * (D ** -0.5)
    blk = jnp.arange(Lb, dtype=topk_idx_prev.dtype)
    hit = (topk_idx_prev[..., None] == blk).any(axis=2)   # [B,P,H,Lb]
    s = jnp.where(hit[:, :, None, :, None, :], s, jnp.float32(-1e30))
    s = s.reshape(B, P, 4, H, 4 * Lb)        # child-major col c = j*Lb + l
    if chunk is None:
        A = jax.nn.softmax(s, axis=-1)
        ts, tl = exact_topk(A, topk)                      # [B,P,4,H,topk]
    else:
        sv, tl = chunked_exact_topk(s, topk, chunk)
        m = sv[..., :1]                                   # row max (=top-1)
        lse = m + jnp.log(jnp.sum(jnp.exp(s - m), axis=-1, keepdims=True))
        ts = jnp.exp(sv - lse)
    child, b = tl // Lb, tl % Lb
    flat = (((b // w2) * 2 + child // 2) * w1
            + (b % w2) * 2 + child % 2).astype(jnp.int32)
    ts = unblock_children(jnp.swapaxes(ts, 3, 4), h0 // 2, w0 // 2)
    flat = unblock_children(jnp.swapaxes(flat, 3, 4), h0 // 2, w0 // 2)
    return ts, flat


def onehot_block_gather(table: jnp.ndarray, parent_idx: jnp.ndarray,
                        n_children: int = 4) -> jnp.ndarray:
    """`block_gather` as a one-hot MXU matmul (identical result).

    TPU row gathers are descriptor-bound (~23 M desc/s, collapsing further
    with batch — PERF.md); for the SMALL tables of the quadtree selection
    (Lb <= ~2k) the same lookup runs ~10x faster as
    ``onehot(idx) @ table`` per (batch, head): the one-hot has exactly one
    1.0 per row, so the f32-accumulated product is the table row BIT-EXACTLY
    (all other terms are 0 * x == 0), and the [P*K, Lb] @ [Lb, n*D] matmul
    shape tiles cleanly onto the MXU.  Cost is the one-hot materialization
    (B*P*K*H*Lb bf16 through HBM) — callers gate on that size.

    Measured (scripts/tpu_select_bench.py, v5e): 44^2-level selection
    5.44 -> ~0.6 ms/layer in the 704^2 train step.

    table: [B, Lb, H, n_children*D]; parent_idx: [B, P, K, H] int32.
    Returns [B, P, K, H, n_children, D] like block_gather."""
    B, Lb, H, FD = table.shape
    P, K = parent_idx.shape[1], parent_idx.shape[2]
    D = FD // n_children
    blk = jnp.arange(Lb, dtype=parent_idx.dtype)
    oh = (parent_idx[..., None] == blk).astype(table.dtype)  # [B,P,K,H,Lb]
    out = jnp.einsum("bpkhl,blhf->bpkhf", oh, table,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, P, K, H, n_children, D).astype(table.dtype)


def _gather_masked_select(q, k, topk_idx_prev, topk: int,
                          hw_q: Tuple[int, int], hw_k: Tuple[int, int]):
    """Candidate top-k via the gathered-candidate path (forward-only).

    The original split-top-k selection: fetch the K candidate key blocks
    per (parent, head), einsum against the query block, softmax over the
    4K candidates, exact top-k.  The fetch runs as a one-hot MXU matmul
    (onehot_block_gather) when the one-hot fits a memory gate — the
    take_along_axis realization is descriptor-bound on TPU (23 M desc/s
    b1, collapsing to 14 M/s at eval b4: 5.44 ms/layer in the 704^2 train
    step, 48 ms/layer at eval b4 — PERF.md); CASMTR_SELECT_ONEHOT=0
    forces the gather.

    Returns (topk_score, topk_idx) unblocked to [B, Lq, topk, H]."""
    import os
    h0, w0 = hw_q
    h1, w1 = hw_k
    B, Lq, H, D = q.shape
    K_prev = topk_idx_prev.shape[2]
    qb = block_children(q, h0, w0)                       # [B, P, 4, H, D]
    table = to_block_major(k, h1, w1)                    # [B, Lb, H, 4D]
    Lb = table.shape[1]
    onehot_bytes = B * (Lq // 4) * K_prev * H * Lb * 2
    use_onehot = (onehot_bytes <= int(2e9)
                  and os.environ.get("CASMTR_SELECT_ONEHOT", "1") == "1")
    if use_onehot:
        k_g = onehot_block_gather(table, topk_idx_prev, n_children=4)
    else:
        k_g = block_gather(table, topk_idx_prev,
                           n_children=4)                 # [B,P,K,H,4,D]
    qk = jnp.einsum("bpfhd,bpkhjd->bpfhkj", qb, k_g,
                    preferred_element_type=jnp.float32)
    P = qk.shape[1]
    qk = qk.reshape(B, P, 4, H, 4 * K_prev) * (D ** -0.5)
    A = jax.nn.softmax(qk, axis=-1)
    topk_score, topk_local = exact_topk(A, topk)         # [B, P, 4, H, k]
    if use_onehot:
        # winner -> parent-block-id lookup over the TINY K axis as a fused
        # one-hot select+sum (int32-exact): the take_along realization is
        # B*P*4*H*topk single-int gather descriptors — measured 3.9 ms/layer
        # in the 704^2 train step (the dominant selection cost after the
        # key fetch went one-hot).
        sel = ((topk_local // 4)[..., None]
               == jnp.arange(K_prev, dtype=topk_local.dtype))
        ids_bh = jnp.swapaxes(topk_idx_prev, 2, 3)       # [B, P, H, K]
        blk = jnp.sum(jnp.where(sel, ids_bh[:, :, None, :, None, :], 0),
                      axis=-1)                           # [B, P, 4, H, k]
    else:
        blk = jnp.take_along_axis(
            jnp.swapaxes(topk_idx_prev, 2, 3)[:, :, None],  # [B, P, 1, H, K]
            topk_local // 4, axis=4)                     # [B, P, 4, H, k]
    child = topk_local % 4
    rows = (blk // (w1 // 2)) * 2 + child // 2
    cols = (blk % (w1 // 2)) * 2 + child % 2
    topk_idx = rows * w1 + cols
    topk_score = unblock_children(jnp.swapaxes(topk_score, 3, 4),
                                  h0 // 2, w0 // 2)
    topk_idx = unblock_children(jnp.swapaxes(topk_idx, 3, 4),
                                h0 // 2, w0 // 2)
    return topk_score, topk_idx


def _fine_level_b(q, k, v, topk_idx_prev, topk: int, hw_q: Tuple[int, int],
                  hw_k: Tuple[int, int], w_prev: int, rel_pos=None,
                  need_topk: bool = True):
    """One fine level of QTAttB (reference: quadtree_attention.py:180-229).

    q: [B, Lq, H, D] current level queries; k/v: [B, Lk, H, D];
    topk_idx_prev: [B, P, K, H] flat indices into the previous coarser grid
    (P == Lq//4). Returns (message[B,P,4,H,D], topk_score, topk_idx) where the
    top-k outputs are un-blocked to [B, Lq, k_new, H]; with need_topk=False
    (the finest level — qtatt_b never consumes its top-k) the top-k outputs
    are None and the work is skipped.

    On TPU (backend 'pallas'/'auto') the rel_pos-free levels run the fused
    masked-flash kernel (K1 + softmax + K2 in one Pallas call — see
    ops/pallas/quadtree_kernels.py) instead of the descriptor-bound gathers.
    Levels that need the top-k over candidates SPLIT the work: the kernel
    computes the message (dense flash fwd+bwd — no gather, no scatter-add
    transpose), while the selection runs forward-only under stop_gradient
    (the callers consume only the int top-k *indices*; qtatt_b/:308 and
    qtatt_guided/:412 discard the scores, so selection carries no gradient).
    CASMTR_SELECT picks the selection realization: "gather"
    (descriptor-bound candidate gather, `_gather_masked_select`), "dense"
    (masked dense scores + wide top-k — r4, regressed on device), "dense2"
    (masked dense scores + two-stage chunked exact top-k,
    CASMTR_SELECT_CHUNK wide).  The kernel's own in-VMEM iterative top-k
    extraction is slower than the small-level gathers (v5e, 704^2: 6.5 vs
    0.25 ms fwd at the 44^2 level) — force it with CASMTR_PALLAS_FINE_TOPK=1;
    CASMTR_PALLAS_SPLIT_TOPK=0 reverts top-k levels to the pure gather path.
    """
    h0, w0 = hw_q
    h1, w1 = hw_k
    B, _, H, D = q.shape
    K_prev = topk_idx_prev.shape[2]

    if rel_pos is None:
        import os
        from casmtr_tpu.ops.gather_ops import use_pallas_fine
        force_topk = os.environ.get("CASMTR_PALLAS_FINE_TOPK", "0") == "1"
        split_topk = os.environ.get("CASMTR_PALLAS_SPLIT_TOPK", "1") == "1"
        if use_pallas_fine() and (not need_topk or force_topk):
            from casmtr_tpu.ops.pallas.quadtree_kernels import masked_fine_level
            msg, ts, ti = masked_fine_level(
                q, k, v, topk_idx_prev, (h0, w0), (h1, w1),
                topk=topk if need_topk else 0)
            return None, msg, ts, ti
        if use_pallas_fine() and need_topk and split_topk:
            from casmtr_tpu.ops.pallas.quadtree_kernels import masked_fine_level
            msg, _, _ = masked_fine_level(
                q, k, v, topk_idx_prev, (h0, w0), (h1, w1), topk=0)
            # masked-DENSE selection: candidate top-k from dense scores
            # against ALL child-major keys + a membership bias instead of
            # the candidate gather.  Selection order is identical
            # (CPU-parity-tested).  The r4 variant (CASMTR_SELECT=dense)
            # top-k'd the WIDE masked softmax row and REGRESSED on device
            # (train 0.4008 -> 0.5548 s; approx_top_k collapses on wide
            # rows: 46.5 ms/layer at [21.6k, 2704] k=32).  The r5 variant
            # (CASMTR_SELECT=dense2) fixes exactly that: a two-stage
            # chunked EXACT top-k over the raw masked scores keeps every
            # top-k operand narrow, and the winners' softmax values come
            # from the row logsumexp.  CASMTR_SELECT=gather reverts to the
            # descriptor-bound candidate gather (23 M desc/s b1, 14 M/s b4
            # — the r4 eval-batching culprit at 48 ms/layer).
            sel_mode = os.environ.get("CASMTR_SELECT", "")
            if not sel_mode:
                sel_mode = ("dense" if os.environ.get(
                    "CASMTR_DENSE_SELECT", "0") == "1" else "gather")
            qs = jax.lax.stop_gradient(q)
            ks = jax.lax.stop_gradient(k)
            if sel_mode in ("dense", "dense2"):
                chunk = (int(os.environ.get("CASMTR_SELECT_CHUNK", "512"))
                         if sel_mode == "dense2" else None)
                ts, ti = _dense_masked_select(
                    qs, ks, topk_idx_prev, topk, (h0, w0), (h1, w1),
                    chunk=chunk)
            else:
                ts, ti = _gather_masked_select(
                    qs, ks, topk_idx_prev, topk, (h0, w0), (h1, w1))
            return None, msg, ts, ti

    qb = block_children(q, h0, w0)                       # [B, P, 4, H, D]

    # block-granular gather: candidate (k, j) is child j of selected block k.
    # K and V are gathered as ONE fused table (half the gather descriptors —
    # TPU gathers are descriptor-bound) and the internal layout keeps
    # candidates on the LAST (lane) axis.
    kv = jnp.concatenate([to_block_major(k, h1, w1),
                          to_block_major(v, h1, w1)], axis=-1)
    kv_g = block_gather(kv, topk_idx_prev, n_children=8)  # [B,P,K,H,8,D]
    k_g = kv_g[..., :4, :]
    v_g = kv_g[..., 4:, :]
    qk = jnp.einsum("bpfhd,bpkhjd->bpfhkj", qb, k_g,
                    preferred_element_type=jnp.float32)
    P = qk.shape[1]
    qk = qk.reshape(B, P, 4, H, 4 * K_prev) * (D ** -0.5)  # [B, P, 4, H, 4K]
    if rel_pos is not None:
        # rel_pos: [B_or_1, H, Lq, Lk] full bias, gathered at the candidates
        # (reference :211-215).
        idx = expand_child_indices(topk_idx_prev, w_prev, w1)  # [B, P, 4K, H]
        rp = jnp.broadcast_to(rel_pos, (q.shape[0],) + rel_pos.shape[1:])
        rp = jnp.moveaxis(rp, 1, -1)                      # [B, Lq, Lk, H]
        rp = block_children(rp, h0, w0)                   # [B, P, 4, Lk, H]
        rp = jnp.take_along_axis(rp, idx[:, :, None], axis=3, mode="clip")
        qk = qk + jnp.moveaxis(rp, 3, 4)                  # -> [B, P, 4, H, 4K]

    A = jax.nn.softmax(qk, axis=-1)                       # over 4K candidates
    A6 = A.reshape(B, P, 4, H, K_prev, 4)
    msg = jnp.einsum("bpfhkj,bpkhjd->bpfhd", A6, v_g,
                     preferred_element_type=jnp.float32)
    if not need_topk:
        return A, msg, None, None

    topk_score, topk_local = exact_topk(A, topk)          # [B, P, 4, H, k]
    # map window-local candidate ids to global child indices (child j of
    # block topk_idx_prev[..., c // 4, :]):
    blk = jnp.take_along_axis(
        jnp.swapaxes(topk_idx_prev, 2, 3)[:, :, None],    # [B, P, 1, H, K]
        topk_local // 4, axis=4)                          # [B, P, 4, H, k]
    child = topk_local % 4
    rows = (blk // (w1 // 2)) * 2 + child // 2
    cols = (blk % (w1 // 2)) * 2 + child % 2
    topk_idx = rows * w1 + cols

    topk_score = unblock_children(jnp.swapaxes(topk_score, 3, 4),
                                  h0 // 2, w0 // 2)       # [B, Lq, k, H]
    topk_idx = unblock_children(jnp.swapaxes(topk_idx, 3, 4),
                                h0 // 2, w0 // 2)
    return A, msg, topk_score, topk_idx


def _merge_messages(messages: List[jnp.ndarray], parent_hw: List[Tuple[int, int]],
                    weight: jnp.ndarray, lepe: Optional[List[jnp.ndarray]] = None):
    """Merge per-level messages with softmax(weight), un-blocking 2x per level.

    reference: quadtree_attention.py:262-286.  messages[0]: [B, L0, H, D]
    (coarsest); messages[i>0]: [B, P_i, 4, H, D].  parent_hw[i] is the (h, w)
    of the *parent* grid of level i (i.e. the previous level's dims)."""
    w = jax.nn.softmax(weight)
    final = messages[0] * w[0]
    if lepe is not None:
        final = (messages[0] + lepe[0]) * w[0]
    for i in range(1, len(messages)):
        m = messages[i]
        if lepe is not None:
            # lepe[i] is the unblocked [B, L_i, H, D] grid; the message is
            # 2x2-blocked — block it the same way (reference
            # quadtree_attention.py:280 rearrange to 'b (H W) (t1 t2) hd d')
            hp, wp = parent_hw[i]
            m = m + block_children(lepe[i], 2 * hp, 2 * wp)
        final = final[:, :, None] + m * w[i]
        hp, wp = parent_hw[i]
        final = unblock_children(final, hp, wp)
    return final


def qtatt_b(queries: Sequence[jnp.ndarray], keys: Sequence[jnp.ndarray],
            values: Sequence[jnp.ndarray], sizes: Sequence[Tuple[int, int]],
            topks: Sequence[int], merge_weight: jnp.ndarray,
            lepe: Optional[Sequence[jnp.ndarray]] = None,
            rel_pos: Optional[Sequence[jnp.ndarray]] = None) -> jnp.ndarray:
    """QTAttB forward (reference: quadtree_attention.py:231-286).

    Args:
      queries/keys/values: pyramid lists, FINEST level first (reference input
        order), each [B, L_i, H, D].
      sizes: (h_i, w_i) per level, finest first.
      topks: per-level top-k, applied coarsest-first (reference ``topks[i]``
        over the reversed pyramid).
      merge_weight: [num_levels] learned level-merge logits.
      lepe: optional per-level (finest-first) locally-enhanced PE tensors
        [B, L_i, H, D] added to each message before weighting.
      rel_pos: optional per-level (coarsest-first) [1_or_B, H, Lq_i, Lk_i] biases.
    Returns:
      merged message [B, L_finest, H, D] (float32).
    """
    n_levels = len(queries)
    messages, parent_hw = [], []
    topk_idx = None
    topk = topks[0]
    lepe_rev = list(reversed(lepe)) if lepe is not None else None

    for i in range(n_levels):
        li = n_levels - 1 - i  # index into finest-first lists, coarsest first
        q, k, v = queries[li], keys[li], values[li]
        h, w = sizes[li]
        rp = rel_pos[i] if rel_pos is not None else None
        if i == 0:
            _, msg, _, topk_idx = _coarse_level(q, k, v, topk, rel_pos=rp)
            parent_hw.append((h, w))
        else:
            w_prev = sizes[li + 1][1]
            topk = topks[i]
            _, msg, _, topk_idx = _fine_level_b(
                q, k, v, topk_idx, topk, (h, w), (h, w), w_prev, rel_pos=rp,
                need_topk=(i < n_levels - 1))
            parent_hw.append(sizes[li + 1])
        messages.append(msg)

    return _merge_messages(messages, parent_hw, merge_weight, lepe=lepe_rev)


def qtatt_a(queries, keys, values, sizes, topks) -> jnp.ndarray:
    """QTAttA forward (reference: quadtree_attention.py:8-140).

    Differences from B: (1) messages exclude the top-k keys at non-final levels
    (they are refined at the next level instead, :36-42); (2) fine-level scores
    are redistributed by the parent's top-k score via a per-candidate-block
    softmax over the 4 children (:73-77); (3) messages are merged by plain
    summation during upward un-blocking (:130-139)."""
    n_levels = len(queries)
    messages, parent_hw = [], []
    topk = topks[0]
    topk_idx = None
    topk_score = None

    for i in range(n_levels):
        li = n_levels - 1 - i
        q, k, v = queries[li], keys[li], values[li]
        h, w = sizes[li]
        final = i == n_levels - 1
        D = q.shape[-1]
        if i == 0:
            qk = jnp.einsum("blhd,bshd->blsh", q, k,
                            preferred_element_type=jnp.float32) * (D ** -0.5)
            A = jax.nn.softmax(qk, axis=2)
            topk_score, topk_idx = topk_lastaxis_at(A, topk, axis=2)
            topk_idx = topk_idx.astype(jnp.int32)
            # zero out top-k entries for the message (reference :37-42)
            mask = jnp.ones_like(A)
            oneh = jax.nn.one_hot(jnp.moveaxis(topk_idx, 2, -1), A.shape[2],
                                  dtype=A.dtype)  # [B,L,H,K,S]
            mask = mask * (1.0 - jnp.clip(oneh.sum(axis=-2), 0, 1)
                           .transpose(0, 1, 3, 2))
            msg = jnp.einsum("blsh,bshd->blhd", A * mask, v,
                             preferred_element_type=jnp.float32)
            parent_hw.append((h, w))
        else:
            w_prev = sizes[li + 1][1]
            topk_prev = topk
            topk = topks[i]
            qb = block_children(q, h, w)
            idx = expand_child_indices(topk_idx, w_prev, w)  # [B,P,4K,H]
            qk = gather_scores(qb, k, idx) * (D ** -0.5)     # [B,P,4,4K,H]
            B, P = qk.shape[:2]
            H = qk.shape[-1]
            qk5 = qk.reshape(B, P, 4, topk_prev, 4, H)
            A = jax.nn.softmax(qk5, axis=4)  # over each parent's 4 children
            # redistribute by parent score (reference :76-77)
            ts = topk_score[:, :, None, :, None, :]  # [B,P,1,K,1,H]
            A = (A * ts).reshape(B, P, 4, topk_prev * 4, H)
            topk_score, topk_local = topk_lastaxis_at(A, topk, axis=3)
            idx_rep = jnp.broadcast_to(idx[:, :, None], A.shape)
            topk_idx = jnp.take_along_axis(idx_rep, topk_local, axis=3)
            if not final:
                oneh = jax.nn.one_hot(jnp.moveaxis(topk_local, 3, -1),
                                      A.shape[3], dtype=A.dtype)  # [B,P,4,H,k,4K]
                mask = 1.0 - jnp.clip(oneh.sum(axis=-2), 0, 1)
                mask = jnp.moveaxis(mask, 3, -1)  # [B,P,4,4K,H]
                msg = gather_aggregate(A * mask, v, idx)
                topk_score = unblock_children(topk_score, h // 2, w // 2)
                topk_idx = unblock_children(topk_idx, h // 2, w // 2)
            else:
                msg = gather_aggregate(A, v, idx)
            parent_hw.append(sizes[li + 1])
        messages.append(msg)

    # plain-sum merge (reference :130-139)
    final_msg = messages[0]
    for i in range(1, len(messages)):
        final_msg = final_msg[:, :, None] + messages[i]
        hp, wp = parent_hw[i]
        final_msg = unblock_children(final_msg, hp, wp)
    return final_msg


def qtatt_guided(queries, keys, values, sizes, topks, merge_weight,
                 topk_pos_idx: jnp.ndarray) -> jnp.ndarray:
    """QTAttGuided forward (reference: quadtree_attention.py:289-389).

    Like QTAttB but the initial top-k positions are injected externally
    (``topk_pos_idx`` [B, L_coarsest, K, H] flat indices at the coarsest-level
    *parent* grid) and every level runs the fine-level path. The merge
    un-blocks at every level including the first (:380-387)."""
    n_levels = len(queries)
    messages, parent_hw = [], []
    topk = topks[0]
    topk_idx = topk_pos_idx

    for i in range(n_levels):
        li = n_levels - 1 - i
        q, k, v = queries[li], keys[li], values[li]
        h, w = sizes[li]
        topk_prev = topk
        topk = topks[i]
        # Parent grid of the coarsest level is the (2x coarser) virtual grid.
        w_prev = sizes[li + 1][1] if li + 1 < n_levels else w // 2
        _, msg, _, topk_idx = _fine_level_b(
            q, k, v, topk_idx, topk, (h, w), (h, w), w_prev,
            need_topk=(i < n_levels - 1))
        parent_hw.append((h // 2, w // 2))
        messages.append(msg)

    w_merge = jax.nn.softmax(merge_weight)
    final = None
    for i, m in enumerate(messages):
        if i == 0:
            final = m * w_merge[i]
        else:
            final = final[:, :, None] + m * w_merge[i]
        hp, wp = parent_hw[i]
        final = unblock_children(final, hp, wp) if final.ndim == 5 else final
    return final


def cascade_qtatt_b(q, k, v, topk_pos: jnp.ndarray, hw_q: Tuple[int, int],
                    hw_k: Tuple[int, int], dilated: int = 1,
                    rel_pos: Optional[jnp.ndarray] = None,
                    window_structured: bool = False):
    """CascadeQTAttB: single-level window cross-attention over 2x-upsampled
    positions (reference: quadtree_attention.py:392-452).

    Args:
      q: [B, Lq, H, D] (current level); k/v: [B, Lk, H, D].
      topk_pos: [B, P, Kw, 2] int32 (row, col) coords on the PREVIOUS (2x
        coarser) grid, P == Lq//4.
      hw_q/hw_k: current grids.
      dilated: child expansion stride (reference :424-427).
      rel_pos: optional [B, H, Lq, Kw*4] windowed relative PE (reference :438-441).
    Returns:
      (message [B, Lq, H, D], upsampled_idx [B, Lq, Kw*4] int32).
    """
    h0, w0 = hw_q
    h1, w1 = hw_k
    B, Lq, H, D = q.shape
    Kw = topk_pos.shape[2]

    flat_prev = topk_pos[..., 0] * (w1 // 2) + topk_pos[..., 1]  # [B, P, Kw]
    idx_sh = expand_child_indices(flat_prev[..., None], w1 // 2, w1,
                                  dilated=dilated,
                                  clamp_max=h1 * w1 - 1)[..., 0]  # [B, P, 4Kw]

    if window_structured and rel_pos is None and dilated == 1:
        from casmtr_tpu.ops.gather_ops import use_pallas_window_cross
        # the kernel rides K/V in 128-lane f32 planes (the only layout whose
        # unaligned patch DMA Mosaic lowers — see window_kernels.py): one
        # packed K||V plane when 2HD <= 128, else one each; VMEM-resident
        # dK/dV accumulator bound from that plane count. Parent grouping
        # needs power-of-two heads; plane packing needs D | 128, HD <= 128.
        n_planes = 1 if 2 * H * D <= 128 else 2
        acc_mb = h1 * w1 * n_planes * 128 * 4 / 2 ** 20
        eligible = (H & (H - 1)) == 0 and 128 % D == 0 and H * D <= 128
        if use_pallas_window_cross() and acc_mb <= 72 and eligible:
            from casmtr_tpu.ops.pallas.window_kernels import (
                window_cross_attention)
            w_prop = int(round(Kw ** 0.5))
            corners = topk_pos[:, :, 0, :]              # shifted window TL
            interp = jax.devices()[0].platform != "tpu"
            msg = window_cross_attention(q, k, v, corners, (h0, w0),
                                         (h1, w1), w_prop, interp)
            msg = unblock_children(msg, h0 // 2, w0 // 2)
            up_idx = jnp.broadcast_to(idx_sh[:, :, None],
                                      (B, Lq // 4, 4, 4 * Kw))
            up_idx = unblock_children(up_idx, h0 // 2, w0 // 2)
            return msg, up_idx

    qb = block_children(q, h0, w0)                      # [B, P, 4, H, D]
    # head-shared candidates, K||V FUSED: gather full [2*H*D] feature rows
    # ONCE (TPU gathers are per-row scalar-bound — the fused table halves
    # the descriptor count of this gather AND of its scatter-add transpose
    # in the backward, the train step's top hot spot at 176^2).
    kv_flat = jnp.concatenate([k.reshape(B, -1, H * D),
                               v.reshape(B, -1, H * D)], axis=-1)
    # NOTE on a rejected alternative: with window_structured each parent's
    # candidates are one contiguous (2w x 2w) patch of image1, so a windowed
    # lax.gather (one patch descriptor per parent) looks attractive and wins
    # an isolated microbench 2.5x — but in the full train graph its
    # OVERLAPPING-window scatter-add transpose lowers to a serialized
    # while-loop (~142 ms at 176^2, v5e) and regresses the step 0.51 -> 0.57
    # s. The structured layout is exploited in the Pallas window kernels
    # instead (ops/pallas/window_kernels.py).
    kv_g = jnp.take_along_axis(kv_flat[:, None], idx_sh[..., None], mode="clip",
                               axis=2)
    kv_g = kv_g.reshape(B, Lq // 4, 4 * Kw, 2, H, D)
    k_g = kv_g[:, :, :, 0]
    v_g = kv_g[:, :, :, 1]
    qk = jnp.einsum("bpfhd,bpchd->bpfhc", qb, k_g,
                    preferred_element_type=jnp.float32) * (D ** -0.5)
    if rel_pos is not None:
        rp = jnp.moveaxis(rel_pos, 1, -1)               # [B, Lq, 4Kw, H]
        rp = block_children(rp, h0, w0)                 # [B, P, 4, 4Kw, H]
        qk = qk + jnp.moveaxis(rp, 3, 4)                # -> [B, P, 4, H, 4Kw]
    A = jax.nn.softmax(qk, axis=-1)
    message = jnp.einsum("bpfhc,bpchd->bpfhd", A, v_g,
                         preferred_element_type=jnp.float32)
    message = unblock_children(message, h0 // 2, w0 // 2)  # [B, Lq, H, D]

    # per-query candidate set at full res (identical across heads)
    up_idx = jnp.broadcast_to(idx_sh[:, :, None], (B, Lq // 4, 4, 4 * Kw))
    up_idx = unblock_children(up_idx, h0 // 2, w0 // 2)  # [B, Lq, 4Kw]
    return message, up_idx
