"""Generate GEOMETRICALLY CONSISTENT synthetic MegaDepth-layout scenes for
on-device training (VERDICT r5 #4): jpgs + h5 depths + scene npz +
train/val lists.

Unlike the r2-r4 generator (each frame got INDEPENDENT random texture, so
pixel content never followed the gt warp and the matcher could not learn —
the root cause of the r4 staged-training low valid-count), every frame here
is a homography render of ONE shared multi-octave world texture on the
plane z=Z0, with per-pixel analytic depth.  Corresponding pixels therefore
look alike, gt supervision is dense, and a few hundred steps of stage-1
training suffice to drive prediction-dependent cascade supervision
(valid_n_4c) into the hundreds.

  python scripts/make_fake_scenes.py /tmp/soak_scenes --scenes 3 \
      --images 8 --pairs 24 --hw 480 640
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Z0 = 3.0          # plane depth in world (= camera-0) frame
FOCAL = 300.0


def _rodrigues(rvec):
    th = np.linalg.norm(rvec)
    if th < 1e-12:
        return np.eye(3)
    k = rvec / th
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * (Kx @ Kx)


def _texture(rng, shape):
    """Aperiodic multi-octave value noise + contrast blobs (matchable at
    every scale, unlike the old sin/cos pattern whose periodicity aliased
    the coarse matcher)."""
    import cv2
    h, w = shape
    img = np.zeros((h, w), np.float64)
    for k, cell in enumerate((8, 16, 32, 64, 128)):
        g = rng.random((h // cell + 2, w // cell + 2))
        img += cv2.resize(g, (w, h), interpolation=cv2.INTER_CUBIC)
    # a sprinkle of high-contrast discs (distinct landmarks)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(60):
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        r = rng.uniform(3, 12)
        img += rng.choice([-1.5, 1.5]) * ((xx - cx) ** 2 + (yy - cy) ** 2
                                          < r * r)
    img -= img.min()
    img = img / max(float(np.ptp(img)), 1e-9) * 255.0
    return img.astype(np.uint8)


def make_scene(root, scene_id, n_images, n_pairs, hw, rng):
    import cv2
    import h5py
    h, w = hw
    img_dir = os.path.join(root, "imgs")
    dep_dir = os.path.join(root, "depths")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(dep_dir, exist_ok=True)
    K = np.array([[FOCAL, 0, w / 2], [0, FOCAL, h / 2], [0, 0, 1]])

    # world texture canvas covering ~2.2x the camera-0 footprint on z=Z0
    s = 140.0                                    # canvas px per meter
    ext_x = (w / 2) / FOCAL * Z0 * 2.2 + 0.6
    ext_y = (h / 2) / FOCAL * Z0 * 2.2 + 0.6
    cw, ch = int(2 * ext_x * s), int(2 * ext_y * s)
    canvas = _texture(rng, (ch, cw))
    S = np.array([[s, 0, ext_x * s], [0, s, ext_y * s], [0, 0, 1.0]])

    uu, vv = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    pix = np.stack([uu.ravel(), vv.ravel(), np.ones(h * w)])

    image_paths, depth_paths, intrinsics, poses = [], [], [], []
    for i in range(n_images):
        if i == 0:
            R, t = np.eye(3), np.zeros(3)
        else:
            R = _rodrigues(rng.normal(0, 0.02, 3))
            t = np.array([rng.normal(0, 0.12), rng.normal(0, 0.12),
                          rng.normal(0, 0.05)])
        # plane (x, y, Z0) -> image: u ~ K [r1, r2, Z0*r3 + t] (x, y, 1)^T
        Hc = K @ np.column_stack([R[:, 0], R[:, 1], R[:, 2] * Z0 + t])
        img = cv2.warpPerspective(canvas, Hc @ np.linalg.inv(S), (w, h),
                                  flags=cv2.INTER_LINEAR,
                                  borderMode=cv2.BORDER_REFLECT)
        img = np.stack([img] * 3, -1)
        p = f"imgs/{scene_id}_{i}.jpg"
        cv2.imwrite(os.path.join(root, p), img)
        image_paths.append(p)

        # analytic per-pixel depth: pixel -> plane coords -> z of R X + t
        pl = np.linalg.inv(Hc) @ pix
        pl = pl[:2] / pl[2]
        X = np.stack([pl[0], pl[1], np.full(h * w, Z0)])
        z = (R @ X + t[:, None])[2].reshape(h, w)
        dp = f"depths/{scene_id}_{i}.h5"
        with h5py.File(os.path.join(root, dp), "w") as f:
            f["depth"] = z.astype(np.float32)
        depth_paths.append(dp)

        intrinsics.append(K)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        poses.append(T)
    pair_infos = np.array(
        [((a, b), 0.5, None)
         for k in range(n_pairs)
         for a, b in [(k % n_images, (k + 1 + k // n_images) % n_images)]
         if a != b][:n_pairs], dtype=object)
    np.savez(os.path.join(root, f"{scene_id}.npz"),
             image_paths=np.array(image_paths),
             depth_paths=np.array(depth_paths),
             intrinsics=np.array(intrinsics), poses=np.array(poses),
             pair_infos=pair_infos)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--scenes", type=int, default=3)
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--pairs", type=int, default=24)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    a = ap.parse_args()
    rng = np.random.default_rng(0)
    os.makedirs(a.root, exist_ok=True)
    ids = [f"{s:04d}" for s in range(a.scenes)]
    for sid in ids:
        make_scene(a.root, sid, a.images, a.pairs, tuple(a.hw), rng)
    with open(os.path.join(a.root, "train_list.txt"), "w") as f:
        f.write("\n".join(ids[:-1] or ids) + "\n")
    with open(os.path.join(a.root, "val_list.txt"), "w") as f:
        f.write(ids[-1] + "\n")
    print("scenes at", a.root)


if __name__ == "__main__":
    main()