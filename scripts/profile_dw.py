import time, jax, jax.numpy as jnp, numpy as np
import flax.linen as nn

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((1, 88, 88, 1024)).astype(np.float32))
w = jnp.asarray(rng.standard_normal((3, 3, 1, 1024)).astype(np.float32) * 0.1)
b = jnp.zeros(1024)
N = 10

def bench(name, chained, *args):
    f = jax.jit(chained)
    o = f(*args); s = float(o.sum())
    t0 = time.perf_counter()
    o = f(*args); s = float(o.sum())
    print(f"{name}: {((time.perf_counter()-t0-0.029)/N)*1000:.2f}ms", flush=True)

def dw_conv(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=1024) + b

def chain1(x):
    def body(i, c):
        return c + 1e-12 * dw_conv(c, w, b).mean()
    return jax.lax.fori_loop(0, N, body, x)
bench("dwconv_xla", chain1, x)

def dw_shift(x, w, b):
    xp = jnp.pad(x, ((0,0),(1,1),(1,1),(0,0)))
    out = b
    Hh, Ww = x.shape[1], x.shape[2]
    acc = jnp.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            acc = acc + xp[:, dy:dy+Hh, dx:dx+Ww, :] * w[dy, dx, 0]
    return acc + b

def chain2(x):
    def body(i, c):
        return c + 1e-12 * dw_shift(c, w, b).mean()
    return jax.lax.fori_loop(0, N, body, x)
bench("dwconv_shift", chain2, x)

err = float(jnp.abs(dw_conv(x, w, b) - dw_shift(x, w, b)).max())
print("parity err:", err, flush=True)
