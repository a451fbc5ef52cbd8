"""Parity tests: masked-flash fine-level Pallas kernel (K1+K2 fused) vs the
jnp gather oracle, in interpreter mode on CPU (the same kernel code runs
compiled on TPU; see scripts/tpu_kernel_parity.py for the on-device check)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from casmtr_tpu.ops import gather_ops
from casmtr_tpu.ops import quadtree as qt
from casmtr_tpu.ops.pallas.quadtree_kernels import masked_fine_level


def _rand_case(rng, B=2, H=3, D=8, h1=8, w1=8, h0=8, w0=8, K=3):
    """Queries/keys plus valid distinct per-(parent, head) block ids."""
    Lq, Lk = h0 * w0, h1 * w1
    P, Lb = Lq // 4, (h1 // 2) * (w1 // 2)
    q = rng.standard_normal((B, Lq, H, D)).astype(np.float32)
    k = rng.standard_normal((B, Lk, H, D)).astype(np.float32)
    v = rng.standard_normal((B, Lk, H, D)).astype(np.float32)
    ids = np.stack([
        np.stack([
            np.stack([rng.choice(Lb, size=K, replace=False)
                      for _ in range(H)], axis=-1)
            for _ in range(P)])
        for _ in range(B)]).astype(np.int32)          # [B, P, K, H]
    return (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(ids), (h0, w0), (h1, w1))


def _oracle(q, k, v, ids, hw_q, hw_k, topk):
    """The gather path of _fine_level_b (rel_pos-free), returning the same
    (message, topk_score, topk_idx) tuple."""
    h0, w0 = hw_q
    h1, w1 = hw_k
    B, _, H, D = q.shape
    K_prev = ids.shape[2]
    qb = qt.block_children(q, h0, w0)
    kv = jnp.concatenate([qt.to_block_major(k, h1, w1),
                          qt.to_block_major(v, h1, w1)], axis=-1)
    kv_g = qt.block_gather(kv, ids, n_children=8)
    k_g, v_g = kv_g[..., :4, :], kv_g[..., 4:, :]
    qk = jnp.einsum("bpfhd,bpkhjd->bpfhkj", qb, k_g,
                    preferred_element_type=jnp.float32)
    P = qk.shape[1]
    qk = qk.reshape(B, P, 4, H, 4 * K_prev) * (D ** -0.5)
    A = jax.nn.softmax(qk, axis=-1)
    A6 = A.reshape(B, P, 4, H, K_prev, 4)
    msg = jnp.einsum("bpfhkj,bpkhjd->bpfhd", A6, v_g,
                     preferred_element_type=jnp.float32)
    if topk == 0:
        return msg, None, None
    ts, tl = qt.exact_topk(A, topk)
    blk = jnp.take_along_axis(jnp.swapaxes(ids, 2, 3)[:, :, None],
                              tl // 4, axis=4)
    child = tl % 4
    rows = (blk // (w1 // 2)) * 2 + child // 2
    cols = (blk % (w1 // 2)) * 2 + child % 2
    ti = rows * w1 + cols
    ts = qt.unblock_children(jnp.swapaxes(ts, 3, 4), h0 // 2, w0 // 2)
    ti = qt.unblock_children(jnp.swapaxes(ti, 3, 4), h0 // 2, w0 // 2)
    return msg, ts, ti


def test_message_parity(rng):
    case = _rand_case(rng)
    got, ts, ti = masked_fine_level(*case, topk=0, interpret=True)
    want, _, _ = _oracle(*case, topk=0)
    assert ts is None and ti is None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_message_parity_nonsquare_and_padding(rng):
    # P=80 parents -> exercises the pad-to-128 path; non-square grids
    case = _rand_case(rng, B=1, H=2, D=16, h0=16, w0=20, h1=16, w1=20, K=4)
    got, _, _ = masked_fine_level(*case, topk=0, interpret=True)
    want, _, _ = _oracle(*case, topk=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_topk_parity(rng):
    case = _rand_case(rng, B=1, H=2, D=8, K=4)
    got_m, got_s, got_i = masked_fine_level(*case, topk=3, interpret=True)
    want_m, want_s, want_i = _oracle(*case, topk=3)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=2e-5, atol=2e-5)
    # indices: identical selections (random scores -> no ties)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_grad_parity(rng):
    case = _rand_case(rng, B=1, H=2, D=8, K=3)
    q, k, v, ids, hw_q, hw_k = case
    cot = jnp.asarray(rng.standard_normal(
        (1, q.shape[1] // 4, 4, 2, 8)).astype(np.float32))

    def loss_kernel(q_, k_, v_):
        m, _, _ = masked_fine_level(q_, k_, v_, ids, hw_q, hw_k, topk=0,
                                    interpret=True)
        return jnp.sum(m * cot)

    def loss_oracle(q_, k_, v_):
        m, _, _ = _oracle(q_, k_, v_, ids, hw_q, hw_k, topk=0)
        return jnp.sum(m * cot)

    g_got = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_want = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_got, g_want, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5, err_msg=f"d{name}")


def test_grad_parity_through_topk_variant(rng):
    """The topk variant's message must carry the same gradient (top-k outputs
    are non-differentiable selections)."""
    case = _rand_case(rng, B=1, H=2, D=8, K=3)
    q, k, v, ids, hw_q, hw_k = case

    def loss(q_):
        m, ts, ti = masked_fine_level(q_, k, v, ids, hw_q, hw_k, topk=2,
                                      interpret=True)
        return jnp.sum(m ** 2)

    def loss_ref(q_):
        m, _, _ = _oracle(q_, k, v, ids, hw_q, hw_k, topk=0)
        return jnp.sum(m ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(loss)(q)),
                               np.asarray(jax.grad(loss_ref)(q)),
                               rtol=5e-5, atol=5e-5)


def _qtatt_b_case(rng, B=1, H=2, D=8):
    sizes = [(16, 16), (8, 8), (4, 4)]
    mk = lambda h, w: jnp.asarray(
        rng.standard_normal((B, h * w, H, D)).astype(np.float32))
    qs = [mk(*s) for s in sizes]
    ks = [mk(*s) for s in sizes]
    vs = [mk(*s) for s in sizes]
    wt = jnp.asarray(rng.standard_normal(3).astype(np.float32))
    return qs, ks, vs, sizes, wt


def test_qtatt_b_backend_pallas_matches_jnp(rng):
    """Full QTAttB through the pallas backend (interpret mode) vs jnp.

    With the split-top-k dispatch this covers BOTH kernel modes: the finest
    level (message only) and the intermediate level (kernel message +
    stop-gradient gather selection)."""
    qs, ks, vs, sizes, wt = _qtatt_b_case(rng)
    want = qt.qtatt_b(qs, ks, vs, sizes, topks=[4, 3, 2], merge_weight=wt)
    gather_ops.set_backend("pallas")
    try:
        got = qt.qtatt_b(qs, ks, vs, sizes, topks=[4, 3, 2], merge_weight=wt)
    finally:
        gather_ops.set_backend("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_qtatt_b_backend_pallas_grad_matches_jnp(rng):
    """Gradient parity for the full QTAttB pallas path — pins that the
    split-top-k level's selection (stop_gradient gather) + kernel message
    carries exactly the oracle gradient (the selection has none: callers use
    only the int top-k indices)."""
    qs, ks, vs, sizes, wt = _qtatt_b_case(rng)

    def loss(qs_, ks_, vs_):
        out = qt.qtatt_b(qs_, ks_, vs_, sizes, topks=[4, 3, 2],
                         merge_weight=wt)
        return jnp.sum(out ** 2)

    g_want = jax.grad(loss, argnums=(0, 1, 2))(qs, ks, vs)
    gather_ops.set_backend("pallas")
    try:
        g_got = jax.grad(loss, argnums=(0, 1, 2))(qs, ks, vs)
    finally:
        gather_ops.set_backend("auto")
    for a_l, b_l, name in zip(g_got, g_want, "qkv"):
        for lvl, (a, b) in enumerate(zip(a_l, b_l)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5,
                err_msg=f"d{name} level {lvl}")


def test_split_topk_env_revert(rng, monkeypatch):
    """CASMTR_PALLAS_SPLIT_TOPK=0 must revert top-k levels to the gather
    path (still numerically identical end-to-end)."""
    monkeypatch.setenv("CASMTR_PALLAS_SPLIT_TOPK", "0")
    qs, ks, vs, sizes, wt = _qtatt_b_case(rng)
    want = qt.qtatt_b(qs, ks, vs, sizes, topks=[4, 3, 2], merge_weight=wt)
    gather_ops.set_backend("pallas")
    try:
        got = qt.qtatt_b(qs, ks, vs, sizes, topks=[4, 3, 2], merge_weight=wt)
    finally:
        gather_ops.set_backend("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
