"""Generate synthetic MegaDepth-layout scenes for the on-device training
soak (VERDICT r2 #3): jpgs + h5 depths + scene npz + train/val lists.

  python scripts/make_fake_scenes.py /tmp/soak_scenes --scenes 3 \
      --images 8 --pairs 24 --hw 480 640
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_scene(root, scene_id, n_images, n_pairs, hw, rng):
    import cv2
    import h5py
    img_dir = os.path.join(root, "imgs")
    dep_dir = os.path.join(root, "depths")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(dep_dir, exist_ok=True)
    image_paths, depth_paths, intrinsics, poses = [], [], [], []
    for i in range(n_images):
        # structured texture (not pure noise) so matching has gradients
        yy, xx = np.mgrid[0:hw[0], 0:hw[1]]
        img = (127 + 60 * np.sin(xx / 9.0 + i) * np.cos(yy / 11.0)
               + 40 * rng.random(hw)).clip(0, 255).astype(np.uint8)
        img = np.stack([img] * 3, -1)
        p = f"imgs/{scene_id}_{i}.jpg"
        cv2.imwrite(os.path.join(root, p), img)
        image_paths.append(p)
        dp = f"depths/{scene_id}_{i}.h5"
        with h5py.File(os.path.join(root, dp), "w") as f:
            f["depth"] = np.full(hw, 3.0, np.float32)
        depth_paths.append(dp)
        K = np.array([[300.0, 0, hw[1] / 2], [0, 300.0, hw[0] / 2],
                      [0, 0, 1]])
        intrinsics.append(K)
        T = np.eye(4)
        T[0, 3] = 0.05 * i
        T[1, 3] = 0.02 * i
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
