"""Tests of the quadtree attention algorithms: structural invariants +
an explicit numpy re-derivation of the 2-level QTAttB pipeline."""

import numpy as np
import jax
import jax.numpy as jnp

from casmtr_tpu.ops import quadtree as qt


def test_block_unblock_roundtrip(rng):
    h, w = 6, 8
    x = jnp.asarray(rng.standard_normal((2, h * w, 3)).astype(np.float32))
    b = qt.block_children(x, h, w)
    assert b.shape == (2, (h // 2) * (w // 2), 4, 3)
    y = qt.unblock_children(b, h // 2, w // 2)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_block_children_order():
    """Child order must be row-major within each 2x2 block."""
    h, w = 4, 4
    x = jnp.arange(h * w).reshape(1, h * w, 1)
    b = np.asarray(qt.block_children(x, h, w))[0, :, :, 0]
    # parent (0,0) covers grid cells (0,0),(0,1),(1,0),(1,1) -> flat 0,1,4,5
    np.testing.assert_array_equal(b[0], [0, 1, 4, 5])
    # parent (0,1) covers cells (0,2),(0,3),(1,2),(1,3) -> flat 2,3,6,7
    np.testing.assert_array_equal(b[1], [2, 3, 6, 7])


def test_expand_child_indices():
    # coarse grid 2x2, fine grid 4x4; parent index 3 = (row1,col1) -> children
    # rows/cols (2,2),(2,3),(3,2),(3,3) -> flat 10,11,14,15
    idx = jnp.asarray([[[[3]]]], dtype=jnp.int32)  # [1,1,1,1]
    out = np.asarray(qt.expand_child_indices(idx, w_prev=2, w_cur=4))
    np.testing.assert_array_equal(out[0, 0, :, 0], [10, 11, 14, 15])


def _np_qtatt_b_two_level(q_list, k_list, v_list, sizes, topks, weight):
    """Independent numpy re-derivation of QTAttB for a 2-level pyramid,
    following the published algorithm (full attn + topk at coarse; gathered
    4-children attention at fine; softmax-weighted merge)."""
    (hf, wf), (hc, wc) = sizes  # finest first
    qf, qc = q_list
    kf, kc = k_list
    vf, vc = v_list
    B, Lc, H, D = qc.shape
    scale = D ** -0.5

    # coarse level: full attention
    qk = np.einsum("blhd,bshd->blsh", qc, kc) * scale
    A = np.exp(qk - qk.max(axis=2, keepdims=True))
    A = A / A.sum(axis=2, keepdims=True)
    m0 = np.einsum("blsh,bshd->blhd", A, vc)
    K = topks[0]
    topk_idx = np.argsort(-A, axis=2, kind="stable")[:, :, :K]  # [B,L,K,H]

    # fine level
    P = Lc
    m1 = np.zeros((B, P, 4, H, D), np.float32)
    for b in range(B):
        for p in range(P):
            for h in range(H):
                cands = []
                for k_i in range(K):
                    pi = topk_idx[b, p, k_i, h]
                    r, c = (pi // wc) * 2, (pi % wc) * 2
                    for dr in (0, 1):
                        for dc in (0, 1):
                            cands.append((r + dr) * wf + (c + dc))
                pr, pc = p // (wf // 2), p % (wf // 2)
                for f in range(4):
                    fr, fc = pr * 2 + f // 2, pc * 2 + f % 2
                    qv = qf[b, fr * wf + fc, h]
                    s = np.array([qv @ kf[b, ci, h] for ci in cands]) * scale
                    a = np.exp(s - s.max())
                    a = a / a.sum()
                    m1[b, p, f, h] = sum(a[j] * vf[b, cands[j], h]
                                         for j in range(len(cands)))

    w = np.exp(weight - weight.max())
    w = w / w.sum()
    final = m0 * w[0]
    final = final[:, :, None] + m1 * w[1]
    # unblock [B,P,4,H,D] -> [B,Lf,H,D]
    final = final.reshape(B, hc, wc, 2, 2, H, D).transpose(0, 1, 3, 2, 4, 5, 6)
    return final.reshape(B, hf * wf, H, D)


def test_qtatt_b_matches_numpy_two_level(rng):
    B, H, D = 1, 2, 8
    hf, wf = 8, 8
    hc, wc = 4, 4
    topks = [3, 2]
    q_f = rng.standard_normal((B, hf * wf, H, D)).astype(np.float32)
    k_f = rng.standard_normal((B, hf * wf, H, D)).astype(np.float32)
    v_f = rng.standard_normal((B, hf * wf, H, D)).astype(np.float32)
    q_c = rng.standard_normal((B, hc * wc, H, D)).astype(np.float32)
    k_c = rng.standard_normal((B, hc * wc, H, D)).astype(np.float32)
    v_c = rng.standard_normal((B, hc * wc, H, D)).astype(np.float32)
    weight = rng.standard_normal(2).astype(np.float32)

    got = qt.qtatt_b(
        [jnp.asarray(q_f), jnp.asarray(q_c)],
        [jnp.asarray(k_f), jnp.asarray(k_c)],
        [jnp.asarray(v_f), jnp.asarray(v_c)],
        sizes=[(hf, wf), (hc, wc)], topks=topks,
        merge_weight=jnp.asarray(weight))
    want = _np_qtatt_b_two_level([q_f, q_c], [k_f, k_c], [v_f, v_c],
                                 [(hf, wf), (hc, wc)], topks, weight)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_qtatt_b_three_level_shapes(rng):
    B, H, D = 2, 4, 8
    sizes = [(16, 16), (8, 8), (4, 4)]
    mk = lambda h, w: jnp.asarray(
        rng.standard_normal((B, h * w, H, D)).astype(np.float32))
    qs = [mk(h, w) for h, w in sizes]
    ks = [mk(h, w) for h, w in sizes]
    vs = [mk(h, w) for h, w in sizes]
    out = qt.qtatt_b(qs, ks, vs, sizes, topks=[4, 3, 2],
                     merge_weight=jnp.zeros(3))
    assert out.shape == (B, 256, H, D)
    assert np.isfinite(np.asarray(out)).all()


def test_qtatt_a_three_level_shapes(rng):
    B, H, D = 1, 2, 8
    sizes = [(8, 8), (4, 4), (2, 2)]
    mk = lambda h, w: jnp.asarray(
        rng.standard_normal((B, h * w, H, D)).astype(np.float32))
    out = qt.qtatt_a([mk(*s) for s in sizes], [mk(*s) for s in sizes],
                     [mk(*s) for s in sizes], sizes, topks=[2, 2, 2])
    assert out.shape == (B, 64, H, D)
    assert np.isfinite(np.asarray(out)).all()


def test_cascade_qtatt_b(rng):
    B, H, D = 1, 2, 8
    h0 = w0 = 8   # current grid (both images same size)
    Kw = 9        # propagation window size (3x3)
    q = jnp.asarray(rng.standard_normal((B, h0 * w0, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, h0 * w0, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, h0 * w0, H, D)).astype(np.float32))
    pos = rng.integers(0, 4, size=(B, (h0 // 2) * (w0 // 2), Kw, 2)).astype(np.int32)
    msg, up_idx = qt.cascade_qtatt_b(q, k, v, jnp.asarray(pos),
                                     (h0, w0), (h0, w0))
    assert msg.shape == (B, h0 * w0, H, D)
    assert up_idx.shape == (B, h0 * w0, 4 * Kw)
    assert np.asarray(up_idx).max() < h0 * w0
    assert np.asarray(up_idx).min() >= 0

    # message rows must be convex combinations -> bounded by value range
    vmax = np.abs(np.asarray(v)).max() * 1.001
    assert np.abs(np.asarray(msg)).max() <= vmax


def test_qtatt_b_lepe_merge(rng):
    """lepe is added to each level's message BEFORE weighting; fine-level
    messages are 2x2-blocked so the lepe grid must be blocked the same way
    (reference quadtree_attention.py:280). Zero lepe == no lepe; nonzero
    lepe shifts the output by exactly sum_i w_i * lepe_i at the right
    positions (lepe enters linearly after the softmax weights)."""
    B, H, D = 1, 2, 4
    sizes = [(8, 8), (4, 4), (2, 2)]
    mk = lambda h, w: jnp.asarray(
        rng.standard_normal((B, h * w, H, D)).astype(np.float32))
    qs = [mk(*s) for s in sizes]
    ks = [mk(*s) for s in sizes]
    vs = [mk(*s) for s in sizes]
    weight = jnp.asarray(rng.standard_normal(3).astype(np.float32))
    zero_lepe = [jnp.zeros_like(q) for q in qs]
    base = qt.qtatt_b(qs, ks, vs, sizes, topks=[2, 2, 2],
                      merge_weight=weight)
    with_zero = qt.qtatt_b(qs, ks, vs, sizes, topks=[2, 2, 2],
                           merge_weight=weight, lepe=zero_lepe)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_zero),
                               rtol=1e-5, atol=1e-6)

    lepe = [mk(*s) for s in sizes]
    out = qt.qtatt_b(qs, ks, vs, sizes, topks=[2, 2, 2],
                     merge_weight=weight, lepe=lepe)
    # linearity: out - base == sum_i softmax(w)_i * upsampled(lepe_i)
    w = np.asarray(jax.nn.softmax(weight))
    expect = np.zeros_like(np.asarray(base))
    for i, (h, wd) in enumerate(sizes):
        le = np.asarray(lepe[i]).reshape(B, h, wd, H, D)
        rep = 8 // h
        le_up = le.repeat(rep, axis=1).repeat(rep, axis=2)
        # level i (finest-first) has weight index (n_levels-1-i)
        expect += w[2 - i] * le_up.reshape(B, 64, H, D)
    np.testing.assert_allclose(np.asarray(out) - np.asarray(base), expect,
                               rtol=1e-4, atol=1e-4)


def test_dense_masked_select_matches_gather_selection(rng):
    """The masked-DENSE split-top-k selection (_dense_masked_select, the
    opt-in CASMTR_DENSE_SELECT=1 path — device-measured regression, default
    OFF) returns the same indices and softmax scores as the
    gathered-candidate selection path."""
    B, H, D = 2, 4, 16
    h0 = w0 = h1 = w1 = 8
    K, topk = 3, 5
    Lq = h0 * w0
    P = Lq // 4
    Lb = (h1 // 2) * (w1 // 2)
    q = jnp.asarray(rng.standard_normal((B, Lq, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Lq, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Lq, H, D)), jnp.float32)
    # distinct per-(parent, head) candidate block ids, like real top-k output
    ids = np.stack([rng.choice(Lb, K, replace=False)
                    for _ in range(B * P * H)])
    ids = jnp.asarray(ids.reshape(B, P, H, K).transpose(0, 1, 3, 2),
                      jnp.int32)                       # [B, P, K, H]

    # gather-path selection (the CPU default inside _fine_level_b)
    _, _, ts_g, ti_g = qt._fine_level_b(q, k, v, ids, topk, (h0, w0),
                                        (h1, w1), w1 // 2, need_topk=True)
    ts_d, ti_d = qt._dense_masked_select(q, k, ids, topk, (h0, w0), (h1, w1))
    np.testing.assert_array_equal(np.asarray(ti_d), np.asarray(ti_g))
    np.testing.assert_allclose(np.asarray(ts_d), np.asarray(ts_g),
                               rtol=2e-5, atol=2e-6)
    # dense2: two-stage chunked top-k over raw scores + lse-reconstructed
    # softmax values — same indices and scores (chunk chosen to NOT divide
    # the 4*Lb=64 width, exercising the -inf pad)
    ts_c, ti_c = qt._dense_masked_select(q, k, ids, topk, (h0, w0), (h1, w1),
                                         chunk=24)
    np.testing.assert_array_equal(np.asarray(ti_c), np.asarray(ti_g))
    np.testing.assert_allclose(np.asarray(ts_c), np.asarray(ts_g),
                               rtol=2e-5, atol=2e-6)


def test_gather_masked_select_modes_match_full_path(rng, monkeypatch):
    """_gather_masked_select (the TPU split-top-k selection), in BOTH its
    one-hot and take_along realizations, returns the same indices and
    softmax scores as the full gather path of _fine_level_b."""
    B, H, D = 2, 4, 16
    h0 = w0 = h1 = w1 = 8
    K, topk = 3, 5
    Lq = h0 * w0
    P = Lq // 4
    Lb = (h1 // 2) * (w1 // 2)
    q = jnp.asarray(rng.standard_normal((B, Lq, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Lq, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Lq, H, D)), jnp.float32)
    ids = np.stack([rng.choice(Lb, K, replace=False)
                    for _ in range(B * P * H)])
    ids = jnp.asarray(ids.reshape(B, P, H, K).transpose(0, 1, 3, 2),
                      jnp.int32)
    _, _, ts_g, ti_g = qt._fine_level_b(q, k, v, ids, topk, (h0, w0),
                                        (h1, w1), w1 // 2, need_topk=True)
    for flag in ("1", "0"):
        monkeypatch.setenv("CASMTR_SELECT_ONEHOT", flag)
        ts, ti = qt._gather_masked_select(q, k, ids, topk, (h0, w0),
                                          (h1, w1))
        np.testing.assert_array_equal(np.asarray(ti), np.asarray(ti_g))
        np.testing.assert_allclose(np.asarray(ts), np.asarray(ts_g),
                                   rtol=2e-5, atol=2e-6)


def test_onehot_block_gather_bitexact(rng):
    """onehot_block_gather == block_gather BIT-exactly (the one-hot matmul
    accumulates exactly one nonzero per row; 0 * x == 0 for finite x)."""
    B, Lb, H, D = 2, 37, 4, 8
    P, K = 10, 5
    table = jnp.asarray(
        rng.standard_normal((B, Lb, H, 4 * D)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, Lb, (B, P, K, H)), jnp.int32)
    want = qt.block_gather(table, idx, n_children=4)
    got = qt.onehot_block_gather(table, idx, n_children=4)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32))


def test_chunked_exact_topk_matches_topk(rng):
    """chunked_exact_topk == lax.top_k values/indices on distinct values,
    across chunk sizes that do and do not divide the width, and with rows
    whose winners all land in one chunk."""
    import jax
    R, W, k = 37, 157, 9
    x = rng.standard_normal((R, W)).astype(np.float32)
    # make row 3's global top-k live entirely inside one chunk
    x[3] = -1.0
    x[3, 40:40 + k] = np.arange(k)[::-1] + 5.0
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(x), k)
    for chunk in (16, 32, 50, 157, 200):
        v, i = qt.chunked_exact_topk(jnp.asarray(x), k, chunk)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    # leading dims preserved
    x3 = rng.standard_normal((3, 5, W)).astype(np.float32)
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(x3), k)
    v, i = qt.chunked_exact_topk(jnp.asarray(x3), k, 64)
    assert v.shape == (3, 5, k) and i.shape == (3, 5, k)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
