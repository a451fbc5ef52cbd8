"""TPU validation of the masked-flash quadtree kernel: compiled-mode parity
vs the jnp gather oracle at production sizes, plus honest chained timings
(fwd and fwd+bwd) for both paths at the 704^2 level geometries."""

import functools
import os
import sys
import time

# NOTE: do NOT launch with PYTHONPATH=/root/repo — it breaks the axon TPU
# plugin registration in sitecustomize.  Insert the repo path here instead.
sys.path.insert(0, "/root/repo")

import jax

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

from casmtr_tpu.ops import quadtree as qt
from casmtr_tpu.ops.pallas.quadtree_kernels import masked_fine_level
from tests.test_pallas_quadtree import _oracle, _rand_case  # noqa: E402

N = 10
RELAY_S = 0.028


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    s = float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    out = f(*args)
    s = float(jax.tree_util.tree_leaves(out)[0].sum())
    dt = (time.perf_counter() - t0 - RELAY_S) / N
    print(f"{name}: {dt*1000:.2f} ms/op   (chk {s:.4g})", flush=True)
    return dt


def main():
    # `--only wca` skips the (long) masked-flash sections — used to re-run
    # just the window-cross-attention validation after a kernel change.
    only = sys.argv[sys.argv.index("--only") + 1] if "--only" in sys.argv \
        else None
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    if only == "wca":
        _wca_section(rng)
        print("ALL OK", flush=True)
        return

    # ---- compiled parity (f32, level-1-like geometry with topk) ----
    # HIGHEST matmul precision isolates math parity from the TPU default
    # bf16-pass rounding (which differs between the dense-kernel and gather
    # contraction shapes; at default precision msg err is ~4e-3 on both).
    case = _rand_case(rng, B=1, H=8, D=32, h0=44, w0=44, h1=44, w1=44, K=16)
    with jax.default_matmul_precision("highest"):
        got_m, got_s, got_i = jax.jit(
            functools.partial(masked_fine_level, topk=8, interpret=False),
            static_argnums=(4, 5))(*case)
        want_m, want_s, want_i = jax.jit(functools.partial(_oracle, topk=8),
                                         static_argnums=(4, 5))(*case)
    em = float(jnp.abs(got_m - want_m).max())
    es = float(jnp.abs(got_s - want_s).max())
    ei = int((got_i != want_i).sum())
    print(f"parity L1 f32: msg err {em:.3g}, score err {es:.3g}, "
          f"idx mismatches {ei}", flush=True)
    assert em < 1e-4 and es < 1e-4 and ei == 0

    # grad parity
    def loss_k(q, k, v, ids, hw_q, hw_k):
        m, _, _ = masked_fine_level(q, k, v, ids, hw_q, hw_k, topk=0,
                                    interpret=False)
        return jnp.sum(m ** 2)

    def loss_o(q, k, v, ids, hw_q, hw_k):
        m, _, _ = _oracle(q, k, v, ids, hw_q, hw_k, topk=0)
        return jnp.sum(m ** 2)

    with jax.default_matmul_precision("highest"):
        gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2)),
                     static_argnums=(4, 5))(*case)
        go = jax.jit(jax.grad(loss_o, argnums=(0, 1, 2)),
                     static_argnums=(4, 5))(*case)
    for a, b, nm in zip(gk, go, "qkv"):
        e = float(jnp.abs(a - b).max())
        r = float(jnp.abs(b).max())
        print(f"grad d{nm}: abs err {e:.3g} (ref max {r:.3g})", flush=True)
        assert e < 1e-3 * max(r, 1.0)

    # ---- timings at 704^2 geometries, bf16 tables (model dtype) ----
    for (hw, K_prev, topk, tag) in [((88, 88), 16, 0, "L2"),
                                    ((44, 44), 32, 16, "L1")]:
        h, w = hw
        case = _rand_case(rng, B=1, H=8, D=32, h0=h, w0=w, h1=h, w1=w,
                          K=K_prev)
        q, k, v, ids, hw_q, hw_k = case
        q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))

        def chain_fwd(impl, q0):
            def body(c, _):
                m, _, _2 = impl(c, k, v, ids, hw_q, hw_k)
                return c + 1e-12 * m.mean().astype(c.dtype), ()
            return jax.lax.scan(body, q0, None, length=N)[0]

        def chain_grad(impl, q0):
            def one(qq):
                m, _, _2 = impl(qq, k, v, ids, hw_q, hw_k)
                return jnp.sum(m ** 2)
            def body(c, _):
                g = jax.grad(one)(c)
                return c + 1e-12 * g, ()
            return jax.lax.scan(body, q0, None, length=N)[0]

        kern = functools.partial(masked_fine_level, topk=topk,
                                 interpret=False)
        orac = functools.partial(_oracle, topk=topk)
        bench(f"{tag} kernel fwd", functools.partial(chain_fwd, kern), q)
        bench(f"{tag} gather fwd", functools.partial(chain_fwd, orac), q)
        bench(f"{tag} kernel fwd+bwd", functools.partial(chain_grad, kern), q)
        bench(f"{tag} gather fwd+bwd", functools.partial(chain_grad, orac), q)

    # ---- split-top-k dispatch (_fine_level_b: kernel message + stop-grad
    # gather selection) vs the pure gather path at the L1 geometry ----
    from casmtr_tpu.ops import gather_ops

    case = _rand_case(rng, B=1, H=8, D=32, h0=44, w0=44, h1=44, w1=44, K=32)
    q, k, v, ids, hw_q, hw_k = case

    def fine_b(q_, k_, v_):
        _, m, ts, ti = qt._fine_level_b(q_, k_, v_, ids, 16, hw_q, hw_k,
                                        hw_k[1] // 2, need_topk=True)
        return m, ts, ti

    with jax.default_matmul_precision("highest"):
        gather_ops.set_backend("pallas")
        try:
            got = jax.jit(fine_b)(q, k, v)
        finally:
            gather_ops.set_backend("jnp")  # 'auto' resolves to pallas on TPU
        try:
            want = jax.jit(fine_b)(q, k, v)
        finally:
            gather_ops.set_backend("auto")
    em = float(jnp.abs(got[0] - want[0]).max())
    es = float(jnp.abs(got[1] - want[1]).max())
    ei = int((got[2] != want[2]).sum())
    print(f"split-topk L1 f32: msg err {em:.3g}, score err {es:.3g}, "
          f"idx mismatches {ei}", flush=True)
    assert em < 1e-4 and es < 1e-4 and ei == 0

    # timing: fwd+bwd through the split dispatch, bf16 (model dtype)
    qb16, kb16, vb16 = (x.astype(jnp.bfloat16) for x in (q, k, v))

    def chain_split(q0):
        def one(qq):
            m, _, _2 = fine_b(qq, kb16, vb16)
            return jnp.sum(m ** 2)
        def body(c, _):
            return c + 1e-12 * jax.grad(one)(c), ()
        return jax.lax.scan(body, q0, None, length=N)[0]

    gather_ops.set_backend("pallas")
    try:
        bench("L1 split-topk fwd+bwd", chain_split, qb16)
    finally:
        gather_ops.set_backend("jnp")  # 'auto' resolves to pallas on TPU
    try:
        bench("L1 gather-topk fwd+bwd", chain_split, qb16)
    finally:
        gather_ops.set_backend("auto")

    _wca_section(rng)

    print("ALL OK", flush=True)


def _wca_section(rng):
    # ---- fused window cross-attention (cascade) at production geometry ----
    from casmtr_tpu.ops.pallas.window_kernels import (
        window_cross_attention, window_cross_attention_oracle)

    B, H, D, wprop = 1, 4, 32, 5       # coarse2 of the outdoor 4c recipe
    grid_hw = 176                       # 704^2 input -> 1/4 level
    Lq = grid_hw * grid_hw
    P = Lq // 4
    q = jnp.asarray(rng.standard_normal((B, Lq, H, D)).astype(np.float32))
    kk = jnp.asarray(rng.standard_normal((B, Lq, H, D)).astype(np.float32))
    vv = jnp.asarray(rng.standard_normal((B, Lq, H, D)).astype(np.float32))
    cor = jnp.asarray(rng.integers(0, grid_hw // 2 - wprop + 1, (B, P, 2)),
                      dtype=jnp.int32)
    hwq = (grid_hw, grid_hw)

    with jax.default_matmul_precision("highest"):
        got = jax.jit(functools.partial(window_cross_attention, w=wprop,
                                        interpret=False),
                      static_argnums=(4, 5))(q, kk, vv, cor, hwq, hwq)
        want = jax.jit(functools.partial(window_cross_attention_oracle,
                                         w=wprop), static_argnums=(4, 5))(
            q, kk, vv, cor, hwq, hwq)
    em = float(jnp.abs(got - want).max())
    print(f"wca parity f32: msg err {em:.3g}", flush=True)
    assert em < 1e-4

    def loss_wca(q_, k_, v_):
        m = window_cross_attention(q_, k_, v_, cor, hwq, hwq, wprop, False)
        return jnp.sum(m ** 2)

    def loss_wca_o(q_, k_, v_):
        m = window_cross_attention_oracle(q_, k_, v_, cor, hwq, hwq, wprop)
        return jnp.sum(m ** 2)

    with jax.default_matmul_precision("highest"):
        gk = jax.jit(jax.grad(loss_wca, argnums=(0, 1, 2)))(q, kk, vv)
        go = jax.jit(jax.grad(loss_wca_o, argnums=(0, 1, 2)))(q, kk, vv)
    for a, b, nm in zip(gk, go, "qkv"):
        e = float(jnp.abs(a - b).max())
        r = float(jnp.abs(b).max())
        print(f"wca grad d{nm}: abs err {e:.3g} (ref max {r:.3g})", flush=True)
        assert e < 1e-3 * max(r, 1.0)

    # timings, bf16 (model dtype)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, kk, vv))

    def chain_wca(impl):
        def run(q0):
            def one(qq):
                return jnp.sum(impl(qq, kb, vb) ** 2)
            def body(c, _):
                return c + 1e-12 * jax.grad(one)(c), ()
            return jax.lax.scan(body, q0, None, length=N)[0]
        return run

    def chain_wca_fwd(impl):
        def run(q0):
            def body(c, _):
                m = impl(c, kb, vb)
                return c + 1e-12 * m.mean().astype(c.dtype), ()
            return jax.lax.scan(body, q0, None, length=N)[0]
        return run

    kern_wca = lambda q_, k_, v_: window_cross_attention(
        q_, k_, v_, cor, hwq, hwq, wprop, False)
    orac_wca = lambda q_, k_, v_: window_cross_attention_oracle(
        q_, k_, v_, cor, hwq, hwq, wprop)
    bench("wca kernel fwd", chain_wca_fwd(kern_wca), qb)
    bench("wca gather fwd", chain_wca_fwd(orac_wca), qb)
    bench("wca kernel fwd+bwd", chain_wca(kern_wca), qb)
    bench("wca gather fwd+bwd", chain_wca(orac_wca), qb)


if __name__ == "__main__":
    main()
