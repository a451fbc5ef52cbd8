"""Parity tests for the Pallas window-correlation kernel (interpret mode on
CPU) against its jnp oracle and the unstructured window_score."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from casmtr_tpu.ops.gather_ops import window_score_oracle
from casmtr_tpu.ops.pallas.window_kernels import (
    _candidate_offsets, _expand_corner_indices, window_patch_score_jnp,
    window_patch_score_pallas)


def make_problem(rng, B=1, H1=16, W1=16, D=8, w=3):
    P = (H1 // 2) * (W1 // 2)
    q = jnp.asarray(rng.standard_normal((B, P, 4, D)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((B, H1, W1, D)).astype(np.float32))
    corners = jnp.asarray(
        rng.integers(0, H1 // 2 - w + 1, (B, P, 2)).astype(np.int32))
    return q, f1, corners, P


def test_candidate_offsets_order():
    off = _candidate_offsets(2)
    # c = (wy*w+wx)*4 + dr*2+dc for w=2: first candidates are the 2x2
    # children of window cell (0, 0)
    np.testing.assert_array_equal(off[:4], [[0, 0], [0, 1], [1, 0], [1, 1]])
    np.testing.assert_array_equal(off[4:8], [[0, 2], [0, 3], [1, 2], [1, 3]])


def test_oracle_matches_unstructured_window_score(rng):
    """window_patch_score == window_score with explicitly expanded indices."""
    q, f1, corners, P = make_problem(rng)
    w, D = 3, 8
    got = np.asarray(window_patch_score_jnp(q, f1, corners, w))
    idx = _expand_corner_indices(corners, w, 16)      # [B, P, 4w^2]
    f1_flat = f1.reshape(1, -1, D)
    # build per-query layout: queries are the blocked [P*4] children
    want = np.asarray(window_score_oracle(
        q.reshape(1, P * 4, D), f1_flat,
        jnp.repeat(idx, 4, axis=1))).reshape(1, P, 4, -1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_kernel_interpret_matches_oracle(rng):
    q, f1, corners, P = make_problem(rng, H1=20, W1=20, D=8, w=3)
    want = np.asarray(window_patch_score_jnp(q, f1, corners, 3))
    got = np.asarray(window_patch_score_pallas(q, f1, corners, 3, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_kernel_gradients(rng):
    from jax.test_util import check_grads

    q, f1, corners, P = make_problem(rng, H1=12, W1=12, D=8, w=2)
    check_grads(
        lambda q_, f_: window_patch_score_pallas(q_, f_, corners, 2, True),
        (q, f1), order=1, modes=["rev"], atol=5e-2, rtol=5e-2)


def test_structured_matches_unstructured_in_matcher(rng):
    """window_softmax_matching with corners == plain idx path."""
    import jax.numpy as jnp
    from casmtr_tpu.models.cascade_transformer import window_warp_idx
    from casmtr_tpu.ops import cascade_matching as cm
    from casmtr_tpu.ops.quadtree import expand_child_indices

    B, C, w = 1, 16, 3
    H0 = W0 = H1 = W1 = 12     # current level grid; half grid 6x6
    L0 = H0 * W0
    f0 = jnp.asarray(rng.standard_normal((B, L0, C)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((B, L0, C)).astype(np.float32))
    prev_idx = jnp.asarray(rng.integers(0, 36, (B, 36)), dtype=jnp.int32)
    offsets, _ = __import__("casmtr_tpu.ops.propagation",
                            fromlist=["get_propagations"]).get_propagations(
        "window", w)
    win_pos, _ = window_warp_idx(prev_idx, offsets, 6, 6)
    corners = win_pos[:, :, 0, :]
    # unstructured candidate list: expand each window position's children
    flat = win_pos[..., 0] * 6 + win_pos[..., 1]          # [B, P, w*w]
    idx = expand_child_indices(flat[..., None], 6, W1,
                               clamp_max=L0 - 1)[..., 0]  # [B,P,ww -> 4]
    # rebuild in candidate order [B, P, ww*4] then unblock to queries
    idx = idx.reshape(B, 36, w * w, 4).reshape(B, 36, -1)
    from casmtr_tpu.ops.quadtree import unblock_children
    idx_full = unblock_children(
        jnp.broadcast_to(idx[:, :, None], (B, 36, 4, 4 * w * w)), 6, 6)

    a = cm.window_softmax_matching(f0, f1, idx_full, idx_full, 1.0)
    b = cm.window_softmax_matching(f0, f1, idx_full, idx_full, 1.0,
                                   corners0=corners, corners1=corners,
                                   hw0=(H0, W0), hw1=(H1, W1), prop_window=w)
    np.testing.assert_allclose(np.asarray(a.conf01), np.asarray(b.conf01),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.next_idx_c01),
                                  np.asarray(b.next_idx_c01))




def _wca_case(rng, B=1, H=2, D=8, w=2, grid=16, P_valid=None):
    import jax.numpy as jnp
    h0 = w0 = h1 = w1 = grid
    Lq = h0 * w0
    P = Lq // 4
    q = jnp.asarray(rng.standard_normal((B, Lq, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, h1 * w1, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, h1 * w1, H, D)).astype(np.float32))
    corners = jnp.asarray(
        rng.integers(0, grid // 2 - w + 1, (B, P, 2)), dtype=jnp.int32)
    return q, k, v, corners, (h0, w0), (h1, w1), w


def test_window_cross_attention_parity(rng):
    """Fused window cross-attention kernel (interpret mode) vs jnp oracle."""
    from casmtr_tpu.ops.pallas.window_kernels import (
        window_cross_attention, window_cross_attention_oracle)
    q, k, v, corners, hw_q, hw_k, w = _wca_case(rng)
    got = window_cross_attention(q, k, v, corners, hw_q, hw_k, w, True)
    want = window_cross_attention_oracle(q, k, v, corners, hw_q, hw_k, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_window_cross_attention_parity_padded(rng):
    """Non-multiple-of-tile parent count exercises the padding path."""
    from casmtr_tpu.ops.pallas.window_kernels import (
        window_cross_attention, window_cross_attention_oracle)
    # grid 20 -> P = 100, padded to 128
    q, k, v, corners, hw_q, hw_k, w = _wca_case(rng, H=4, D=4, grid=20, w=3)
    got = window_cross_attention(q, k, v, corners, hw_q, hw_k, w, True)
    want = window_cross_attention_oracle(q, k, v, corners, hw_q, hw_k, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_window_cross_attention_grad_parity(rng):
    """custom_vjp backward (VMEM-resident dK||dV accumulation) vs autodiff
    through the jnp oracle."""
    import jax
    import jax.numpy as jnp
    from casmtr_tpu.ops.pallas.window_kernels import (
        window_cross_attention, window_cross_attention_oracle)
    q, k, v, corners, hw_q, hw_k, w = _wca_case(rng)
    cot = jnp.asarray(rng.standard_normal(
        (1, q.shape[1] // 4, 4, q.shape[2], q.shape[3])).astype(np.float32))

    def loss_k(q_, k_, v_):
        m = window_cross_attention(q_, k_, v_, corners, hw_q, hw_k, w, True)
        return jnp.sum(m * cot)

    def loss_o(q_, k_, v_):
        m = window_cross_attention_oracle(q_, k_, v_, corners, hw_q, hw_k, w)
        return jnp.sum(m * cot)

    g_got = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    g_want = jax.grad(loss_o, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_got, g_want, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5, err_msg=f"d{name}")


def test_cascade_qtatt_b_pallas_backend_uses_kernel(rng, monkeypatch):
    """cascade_qtatt_b under backend 'pallas' + CASMTR_PALLAS_WINDOW_CROSS=1
    (window-structured corners from window_warp_idx) == the generic gather
    path: same message and up_idx. The env opt-in is required while the
    kernel awaits its on-device parity run (gather_ops.py default '0')."""
    monkeypatch.setenv("CASMTR_PALLAS_WINDOW_CROSS", "1")
    import jax.numpy as jnp
    from casmtr_tpu.models.cascade_transformer import window_warp_idx
    from casmtr_tpu.ops import gather_ops
    from casmtr_tpu.ops.propagation import get_propagations
    from casmtr_tpu.ops.quadtree import cascade_qtatt_b

    B, H, D, w = 1, 2, 8, 3
    H0 = W0 = 12
    Lq = H0 * W0
    q = jnp.asarray(rng.standard_normal((B, Lq, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Lq, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Lq, H, D)).astype(np.float32))
    prev_idx = jnp.asarray(rng.integers(0, 36, (B, 36)), dtype=jnp.int32)
    offsets, _ = get_propagations("window", w)
    win_pos, _ = window_warp_idx(prev_idx, offsets, 6, 6)

    want_m, want_u = cascade_qtatt_b(q, k, v, win_pos, (H0, W0), (H0, W0),
                                     window_structured=True)
    gather_ops.set_backend("pallas")
    try:
        assert gather_ops.use_pallas_window_cross()   # no silent fallback
        got_m, got_u = cascade_qtatt_b(q, k, v, win_pos, (H0, W0), (H0, W0),
                                       window_structured=True)
    finally:
        gather_ops.set_backend("auto")
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(got_u), np.asarray(want_u))


def test_cascade_qtatt_structured_flag_is_inert(rng):
    """window_structured only advertises candidate structure (for the Pallas
    window kernels); the jnp cascade_qtatt_b path must be identical with or
    without it.  (The patch-granular lax.gather alternative was removed: its
    overlapping-window scatter-add transpose serializes on TPU and regressed
    the train step — see the note in ops/quadtree.py.)"""
    import jax.numpy as jnp
    from casmtr_tpu.models.cascade_transformer import window_warp_idx
    from casmtr_tpu.ops.propagation import get_propagations
    from casmtr_tpu.ops.quadtree import cascade_qtatt_b

    B, H, D, w = 1, 2, 8, 3
    H0 = W0 = 12
    Lq = H0 * W0
    q = jnp.asarray(rng.standard_normal((B, Lq, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Lq, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Lq, H, D)).astype(np.float32))
    prev_idx = jnp.asarray(rng.integers(0, 36, (B, 36)), dtype=jnp.int32)
    offsets, _ = get_propagations("window", w)
    win_pos, _ = window_warp_idx(prev_idx, offsets, 6, 6)

    m1, u1 = cascade_qtatt_b(q, k, v, win_pos, (H0, W0), (H0, W0),
                             window_structured=False)
    m2, u2 = cascade_qtatt_b(q, k, v, win_pos, (H0, W0), (H0, W0),
                             window_structured=True)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))


def test_window_cross_attention_split_plane_parity(rng):
    """HD = 128 exercises the SPLIT-plane regime (separate 128-lane K and V
    DMAs — the flagship coarse2 geometry H=4, D=32); HD = 96 exercises the
    split regime WITH lane padding (HD in (64, 128])."""
    import jax
    import jax.numpy as jnp
    from casmtr_tpu.ops.pallas.window_kernels import (
        _wca_n_planes, window_cross_attention, window_cross_attention_oracle)
    for H, D in ((4, 32), (2, 64), (4, 16)):
        q, k, v, corners, hw_q, hw_k, w = _wca_case(rng, H=H, D=D, grid=8,
                                                    w=2)
        n_pl = _wca_n_planes(H, D)
        assert n_pl == (2 if H * D > 64 else 1)
        got = window_cross_attention(q, k, v, corners, hw_q, hw_k, w, True)
        want = window_cross_attention_oracle(q, k, v, corners, hw_q, hw_k, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"H={H} D={D}")

        cot = jnp.asarray(rng.standard_normal(
            (1, q.shape[1] // 4, 4, H, D)).astype(np.float32))

        def loss_k(q_, k_, v_):
            m = window_cross_attention(q_, k_, v_, corners, hw_q, hw_k, w,
                                       True)
            return jnp.sum(m * cot)

        def loss_o(q_, k_, v_):
            m = window_cross_attention_oracle(q_, k_, v_, corners, hw_q,
                                              hw_k, w)
            return jnp.sum(m * cot)

        g_got = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
        g_want = jax.grad(loss_o, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_got, g_want, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-5, atol=5e-5,
                                       err_msg=f"d{name} H={H} D={D}")
