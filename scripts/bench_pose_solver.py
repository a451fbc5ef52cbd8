"""On-device timing of the batched essential-matrix RANSAC (sfm/pose.py).

The reference poses pairs one-by-one with host cv2 RANSAC (its eval
wall-clock hot spot, SURVEY.md 3.2); this measures how many pairs/s the
batched device solver sustains. Relay-honest timing: one scalar fetch per
measurement, relay round-trip subtracted (CLAUDE.md).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from casmtr_tpu.sfm.pose import estimate_pose_batch

B, M, N_HYP = 64, 2048, 512
RELAY_RT = 0.027   # measured per-fetch relay round trip (CLAUDE.md)


def scene(rng):
    f, c = 400.0, 320.0
    K = np.array([[f, 0, c], [0, f, c], [0, 0, 1.0]], np.float32)
    n_in = int(M * 0.6)
    X = np.stack([rng.uniform(-2, 2, n_in), rng.uniform(-2, 2, n_in),
                  rng.uniform(4, 10, n_in)], 1)
    R = np.eye(3)
    t = np.array([1.0, 0.2, 0.1])
    x0 = X / X[:, 2:3]
    X1 = X @ R.T + t
    x1 = X1 / X1[:, 2:3]
    k0 = (x0 @ K.T)[:, :2] + rng.normal(0, 0.3, (n_in, 2))
    k1 = (x1 @ K.T)[:, :2] + rng.normal(0, 0.3, (n_in, 2))
    k0 = np.concatenate([k0, rng.uniform(0, 640, (M - n_in, 2))])
    k1 = np.concatenate([k1, rng.uniform(0, 640, (M - n_in, 2))])
    return k0.astype(np.float32), k1.astype(np.float32), K


def main():
    rng = np.random.default_rng(0)
    k0s, k1s, Ks = zip(*[scene(rng) for _ in range(B)])
    k0 = jnp.asarray(np.stack(k0s))
    k1 = jnp.asarray(np.stack(k1s))
    K = jnp.asarray(np.stack(Ks))
    v = jnp.ones((B, M), bool)

    fn = jax.jit(lambda a, b, vv, kk, key: estimate_pose_batch(
        a, b, vv, kk, kk, n_hyp=N_HYP, key=key))
    r = fn(k0, k1, v, K, jax.random.PRNGKey(0))
    print("warmup ok, mean inliers", float(r.n_inliers.mean()))

    times = []
    for i in range(8):
        key = jax.random.PRNGKey(i)
        t0 = time.perf_counter()
        r = fn(k0, k1, v, K, key)
        _ = float(r.n_inliers.sum())        # forces completion via fetch
        times.append(time.perf_counter() - t0 - RELAY_RT)
    dt = float(np.median(times))
    print(f"pose_solver: B={B} M={M} S={N_HYP}: {dt*1e3:.1f} ms/call, "
          f"{B/dt:.0f} pairs/s")


if __name__ == "__main__":
    main()
