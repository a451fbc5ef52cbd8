"""Data-layer tests over synthetic on-disk scenes (images + h5 depth + npz)."""

import os
import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
h5py = pytest.importorskip("h5py")

from casmtr_tpu.data.io import (get_divisible_wh, get_resized_wh,
                                pad_bottom_right, read_megadepth_image)
from casmtr_tpu.data.loader import (ConcatDataset, DataLoader,
                                    RandomConcatSampler, collate,
                                    get_local_split)
from casmtr_tpu.data.megadepth import MegaDepthDataset


def make_fake_scene(tmp_path, scene_id="0000", n_images=4, n_pairs=6,
                    hw=(120, 160)):
    """Write jpgs + h5 depths + a scene npz in MegaDepth layout."""
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    dep_dir = tmp_path / "depths"
    img_dir.mkdir(exist_ok=True)
    dep_dir.mkdir(exist_ok=True)
    image_paths, depth_paths, intrinsics, poses = [], [], [], []
    for i in range(n_images):
        img = (rng.random((hw[0], hw[1], 3)) * 255).astype(np.uint8)
        p = f"imgs/{scene_id}_{i}.jpg"
        cv2.imwrite(str(tmp_path / p), img)
        image_paths.append(p)
        dp = f"depths/{scene_id}_{i}.h5"
        with h5py.File(tmp_path / dp, "w") as f:
            f["depth"] = rng.random(hw).astype(np.float32) + 1.0
        depth_paths.append(dp)
        K = np.array([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]])
        intrinsics.append(K)
        T = np.eye(4)
        T[0, 3] = 0.1 * i
        poses.append(T)
    pair_infos = np.array(
        [((i % n_images, (i + 1) % n_images), 0.5, None)
         for i in range(n_pairs)], dtype=object)
    npz = tmp_path / f"{scene_id}.npz"
    np.savez(npz, image_paths=np.array(image_paths),
             depth_paths=np.array(depth_paths),
             intrinsics=np.array(intrinsics), poses=np.array(poses),
             pair_infos=pair_infos)
    return str(npz)


def test_resize_divisible_pad():
    assert get_resized_wh(800, 600, 400) == (400, 300)
    assert get_divisible_wh(401, 301, 64) == (384, 256)
    x = np.ones((3, 5), np.float32)
    p, m = pad_bottom_right(x, 8, ret_mask=True)
    assert p.shape == (8, 8) and m.sum() == 15
    assert p[:3, :5].sum() == 15 and p.sum() == 15


def test_megadepth_dataset(tmp_path):
    npz = make_fake_scene(tmp_path)
    ds = MegaDepthDataset(str(tmp_path), npz, mode="train",
                          min_overlap_score=0.0, img_resize=128, df=32,
                          img_padding=True, depth_padding=True, is_rgb=True)
    assert len(ds) == 6
    s = ds[0]
    assert s["image0"].shape[2] == 3
    assert s["image0"].shape[0] == s["image0"].shape[1]  # padded square
    assert s["image0"].shape[0] % 32 == 0
    assert s["depth0"].shape == (2000, 2000)
    assert s["mask0"].dtype == bool
    # relative pose composition: T1 @ inv(T0)
    want = np.array(s["T_0to1"])
    assert np.allclose(want[:3, :3], np.eye(3), atol=1e-6)
    assert np.isclose(want[0, 3], 0.1, atol=1e-5)  # 0.1*(i+1) - 0.1*i


def test_sampler_scene_balance(tmp_path):
    npz1 = make_fake_scene(tmp_path, "0001", n_pairs=10)
    npz2 = make_fake_scene(tmp_path, "0002", n_pairs=4)
    d1 = MegaDepthDataset(str(tmp_path), npz1, mode="test", is_rgb=True,
                          img_resize=64, df=32, img_padding=True)
    d2 = MegaDepthDataset(str(tmp_path), npz2, mode="test", is_rgb=True,
                          img_resize=64, df=32, img_padding=True)
    cds = ConcatDataset([d1, d2])
    sampler = RandomConcatSampler(cds, 5, subset_replacement=True,
                                  shuffle=True, repeat=1, seed=0)
    idx = list(iter(sampler))
    assert len(idx) == 10
    from_scene1 = sum(1 for i in idx if i < len(d1))
    assert from_scene1 == 5  # balanced regardless of scene sizes


def test_local_split_partitions_all():
    items = [f"s{i}" for i in range(10)]
    splits = [get_local_split(items, 4, r, seed=1) for r in range(4)]
    assert all(len(s) == 3 for s in splits)
    # every original item appears somewhere
    union = set(x for s in splits for x in s)
    assert union == set(items)


def test_dataloader_batches(tmp_path):
    npz = make_fake_scene(tmp_path, "0003", n_pairs=5)
    ds = MegaDepthDataset(str(tmp_path), npz, mode="test", is_rgb=True,
                          img_resize=64, df=32, img_padding=True)
    dl = DataLoader(ds, None, batch_size=2, num_workers=2, drop_last=False)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[0]["image0"].shape[0] == 2
    assert batches[0]["image0"].ndim == 4  # NHWC
    assert batches[-1]["image0"].shape[0] == 1
    assert isinstance(batches[0]["pair_names"], list)


def test_native_image_ops_parity():
    """Native C++ fused resize+pad+normalize matches the numpy/cv2 path."""
    from casmtr_tpu.native import HAVE_NATIVE, resize_pad_normalize
    if not HAVE_NATIVE:
        pytest.skip("native extension unavailable")
    rng = np.random.default_rng(0)
    img = (rng.random((60, 80, 3)) * 255).astype(np.uint8)
    canvas, mask = resize_pad_normalize(img, 30, 40, 64)
    ref = cv2.resize(img, (40, 30)).astype(np.float32) / 255.0
    assert np.abs(canvas[:30, :40] - ref).max() < 0.02
    assert canvas[30:].sum() == 0 and canvas[:, 40:].sum() == 0
    assert mask[:30, :40].all() and not mask[30:].any()
    # gray input broadcasts to 3 channels
    g = (rng.random((50, 50, 1)) * 255).astype(np.uint8)
    canvas, _ = resize_pad_normalize(g, 25, 25, 32)
    assert np.allclose(canvas[..., 0], canvas[..., 1])


def make_fake_scannet(tmp_path, scene="scene0000_00", n_images=4, n_pairs=4):
    """Write a ScanNet-layout scene: color jpgs, depth pngs (mm uint16),
    pose txts, a pair npz, and the shared intrinsics npz."""
    rng = np.random.default_rng(0)
    root = tmp_path / "scans"
    sdir = root / scene
    for sub in ("color", "depth", "pose"):
        (sdir / sub).mkdir(parents=True, exist_ok=True)
    for i in range(n_images):
        img = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(sdir / "color" / f"{i}.jpg"), img)
        depth_mm = (rng.random((480, 640)) * 3000 + 500).astype(np.uint16)
        cv2.imwrite(str(sdir / "depth" / f"{i}.png"), depth_mm)
        T = np.eye(4)
        T[0, 3] = 0.1 * i  # camera-to-world
        np.savetxt(sdir / "pose" / f"{i}.txt", T, delimiter=" ")
    names = np.array([(0, 0, i % n_images, (i + 1) % n_images)
                      for i in range(n_pairs)])
    scores = np.linspace(0.1, 0.9, n_pairs)
    npz = tmp_path / "scene0000_00.npz"
    np.savez(npz, name=names, score=scores)
    K = np.array([[578.0, 0, 319.5], [0, 578.0, 239.5], [0, 0, 1]])
    intr = tmp_path / "intrinsics.npz"
    np.savez(intr, **{scene: K})
    return str(root), str(npz), str(intr)


def test_scannet_dataset(tmp_path):
    from casmtr_tpu.data.scannet import ScanNetDataset

    root, npz, intr = make_fake_scannet(tmp_path, n_pairs=4)
    ds = ScanNetDataset(root, npz, intr, mode="train",
                        min_overlap_score=0.4)
    # train mode score-filters (scores 0.1, 0.37, 0.63, 0.9 -> keep 2)
    assert len(ds) == 2
    s = ds[0]
    assert s["image0"].shape == (480, 640, 3)
    assert s["image0"].dtype == np.float32 and s["image0"].max() <= 1.0
    assert s["depth0"].shape == (480, 640)
    # depth is metres (source pngs are 500-3500 mm)
    assert 0.4 < s["depth0"].min() and s["depth0"].max() < 3.6
    np.testing.assert_allclose(s["K0"], s["K1"])
    # poses: world2cam_1 @ cam2world_0; translations 0.1*i give -0.1 shift
    np.testing.assert_allclose(s["T_0to1"] @ s["T_1to0"], np.eye(4),
                               atol=1e-6)
    assert s["T_0to1"][0, 3] != 0.0
    assert s["dataset_name"] == "ScanNet"
    assert s["pair_names"][0].endswith(".jpg")

    # test mode: no score filter, empty depths
    ds_test = ScanNetDataset(root, npz, intr, mode="test")
    assert len(ds_test) == 4
    assert ds_test[0]["depth0"].size == 0
