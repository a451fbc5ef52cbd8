"""Parity tests of the gather-op kernel boundary against explicit numpy loops
(an oracle independent of both the jnp and Pallas implementations)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from casmtr_tpu.ops import gather_ops


def np_gather_scores(q, k, idx):
    B, P, F, H, D = q.shape
    C = idx.shape[2]
    out = np.zeros((B, P, F, C, H), np.float32)
    for b in range(B):
        for p in range(P):
            for f in range(F):
                for c in range(C):
                    for h in range(H):
                        out[b, p, f, c, h] = q[b, p, f, h] @ k[b, idx[b, p, c, h], h]
    return out


def np_gather_aggregate(a, v, idx):
    B, P, F, C, H = a.shape
    D = v.shape[-1]
    out = np.zeros((B, P, F, H, D), np.float32)
    for b in range(B):
        for p in range(P):
            for f in range(F):
                for c in range(C):
                    for h in range(H):
                        out[b, p, f, h] += a[b, p, f, c, h] * v[b, idx[b, p, c, h], h]
    return out


def np_window_score(f0, f1, idx):
    B, L, K = idx.shape
    out = np.zeros((B, L, K), np.float32)
    for b in range(B):
        for l in range(L):
            for k in range(K):
                out[b, l, k] = f0[b, l] @ f1[b, idx[b, l, k]]
    return out


@pytest.fixture
def small_problem(rng):
    B, P, H, D, Lk, C = 2, 6, 3, 8, 16, 5
    q = rng.standard_normal((B, P, 4, H, D)).astype(np.float32)
    k = rng.standard_normal((B, Lk, H, D)).astype(np.float32)
    v = rng.standard_normal((B, Lk, H, D)).astype(np.float32)
    idx = rng.integers(0, Lk, size=(B, P, C, H)).astype(np.int32)
    a = rng.random((B, P, 4, C, H)).astype(np.float32)
    return q, k, v, idx, a


def test_gather_scores_matches_loop(small_problem):
    q, k, v, idx, a = small_problem
    got = np.asarray(gather_ops.gather_scores(jnp.asarray(q), jnp.asarray(k),
                                              jnp.asarray(idx)))
    np.testing.assert_allclose(got, np_gather_scores(q, k, idx), rtol=1e-5)


def test_gather_aggregate_matches_loop(small_problem):
    q, k, v, idx, a = small_problem
    got = np.asarray(gather_ops.gather_aggregate(jnp.asarray(a), jnp.asarray(v),
                                                 jnp.asarray(idx)))
    np.testing.assert_allclose(got, np_gather_aggregate(a, v, idx),
                               rtol=1e-5, atol=1e-5)


def test_window_score_matches_loop(rng):
    B, L0, L1, K, D = 2, 7, 11, 4, 16
    f0 = rng.standard_normal((B, L0, D)).astype(np.float32)
    f1 = rng.standard_normal((B, L1, D)).astype(np.float32)
    idx = rng.integers(0, L1, size=(B, L0, K)).astype(np.int32)
    got = np.asarray(gather_ops.window_score(jnp.asarray(f0), jnp.asarray(f1),
                                             jnp.asarray(idx)))
    np.testing.assert_allclose(got, np_window_score(f0, f1, idx), rtol=1e-5)


def test_gather_ops_differentiable(small_problem):
    """Gradients exist and match numerical differentiation (the CUDA kernels'
    atomicAdd backward becomes XLA scatter-add)."""
    from jax.test_util import check_grads

    q, k, v, idx, a = small_problem
    q, k, v, a = map(jnp.asarray, (q, k, v, a))
    idx = jnp.asarray(idx)

    check_grads(lambda q_, k_: gather_ops.gather_scores(q_, k_, idx),
                (q, k), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
    check_grads(lambda a_, v_: gather_ops.gather_aggregate(a_, v_, idx),
                (a, v), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
    f0 = jnp.asarray(np.random.default_rng(1).standard_normal((2, 8, 16)),
                     dtype=jnp.float32)
    f1 = jnp.asarray(np.random.default_rng(2).standard_normal((2, 12, 16)),
                     dtype=jnp.float32)
    widx = jnp.asarray(np.random.default_rng(3).integers(0, 12, (2, 8, 3)),
                       dtype=jnp.int32)
    check_grads(lambda a_, b_: gather_ops.window_score(a_, b_, widx),
                (f0, f1), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
