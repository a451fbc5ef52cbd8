"""SfM pipeline tests: keyframe selection, partitioned pair matching,
union-find tracks, and the full synthetic-sequence reconstruction with
scale propagation + BA (casmtr_tpu/sfm/pipeline.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from casmtr_tpu.sfm import geometry as G
from casmtr_tpu.sfm import pipeline as pl
from casmtr_tpu.sfm import reconstruct as Rc


# ---------------------------------------------------------------------------
# synthetic sequence: textured wall of 3D points, translating camera
# ---------------------------------------------------------------------------

def synth_sequence(rng, n_frames=5, P=120, noise=0.0, baseline=0.35):
    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
    pts = np.stack([rng.uniform(-4, 4, P), rng.uniform(-3, 3, P),
                    rng.uniform(6, 10, P)], -1)
    rvecs = np.stack([[0.0, 0.035 * c, 0.0] for c in range(n_frames)])
    tvecs = np.stack([[-baseline * c, 0.01 * c, 0.0]
                      for c in range(n_frames)])
    uvs = []
    for c in range(n_frames):
        uv = np.asarray(G.project(jnp.asarray(rvecs[c]), jnp.asarray(tvecs[c]),
                                  jnp.asarray(pts), jnp.asarray(K)))
        if noise:
            uv = uv + rng.normal(0, noise, uv.shape)
        uvs.append(uv)
    vis = [((uv[:, 0] > 5) & (uv[:, 0] < 635) & (uv[:, 1] > 5)
            & (uv[:, 1] < 475)) for uv in uvs]

    def match_fn(i, j):
        m = vis[i] & vis[j]
        return (uvs[i][m].astype(np.float64), uvs[j][m].astype(np.float64),
                np.ones(int(m.sum())))

    centers = np.stack([-np.asarray(G.rodrigues(jnp.asarray(rv))).T @ tv
                        for rv, tv in zip(rvecs, tvecs)])
    return match_fn, K, centers


# ---------------------------------------------------------------------------


def test_pair_graph():
    assert pl.pair_graph([0, 2, 5], overlaps=(1,)) == [(0, 2), (2, 5)]
    assert pl.pair_graph([0, 1, 2, 3], overlaps=(1, 2)) == [
        (0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]


def test_select_keyframes_overlap_decay():
    """Keyframes are promoted at the LAST frame that still matched well, so
    every consecutive keyframe pair stays >= min_matches (an under-matched
    chain pair would give RANSAC garbage); first/last always kept."""
    def match_fn(i, j):
        n = max(0, 200 - 60 * (j - i))
        z = np.zeros((n, 2))
        return z, z, np.ones(n)

    kfs = pl.select_keyframes(10, match_fn, min_matches=100, max_gap=8)
    assert kfs[0] == 0 and kfs[-1] == 9
    # only d=1 clears 100 matches here -> every frame must be a keyframe
    assert kfs == list(range(10))
    for a, b in zip(kfs, kfs[1:]):
        assert len(match_fn(a, b)[0]) >= 100

    # sharp visibility cliff: d<=3 strong, beyond that nothing — the frame
    # BEFORE the cliff is promoted (the old walk promoted the cliff frame
    # itself, leaving a 10-match chain pair)
    def cliff_fn(i, j):
        n = 200 if j - i <= 3 else 10
        z = np.zeros((n, 2))
        return z, z, np.ones(n)

    kfs = pl.select_keyframes(12, cliff_fn, min_matches=100, max_gap=8)
    assert kfs == [0, 3, 6, 9, 11]
    for a, b in zip(kfs, kfs[1:]):
        assert len(cliff_fn(a, b)[0]) >= 100


def test_select_keyframes_cache_feeds_match_pairs():
    """Match results computed during keyframe selection are reused by
    match_pairs instead of re-running the model forward."""
    calls = []

    def match_fn(i, j):
        calls.append((i, j))
        n = 200 if j - i <= 2 else 10
        z = np.linspace(0, 1, 2 * n).reshape(n, 2)
        return z, z + 1, np.ones(n)

    cache = {}
    kfs = pl.select_keyframes(9, match_fn, min_matches=100, max_gap=8,
                              cache=cache)
    assert kfs == [0, 2, 4, 6, 8]
    n_select_calls = len(calls)
    pairs = pl.pair_graph(kfs, overlaps=(1,))
    merged = pl.match_pairs(match_fn, pairs, world=1, rank=0,
                            gather=lambda x: [x], precomputed=cache)
    assert set(merged) == set(pairs)
    # every consecutive-keyframe pair was already matched during selection
    assert calls[n_select_calls:] == []


def test_match_pairs_partitioned_merge(rng):
    """Two simulated hosts matching disjoint slices, merged via an injected
    gather, equal the single-host result (pair coverage + arrays)."""
    match_fn, K, _ = synth_sequence(rng, n_frames=5)
    pairs = pl.pair_graph(list(range(5)), overlaps=(1, 2))
    single = pl.match_pairs(match_fn, pairs, world=1, rank=0,
                            gather=lambda obj: [obj])
    parts = [pl.match_pairs(match_fn, pairs, world=2, rank=r,
                            gather=lambda obj: [obj]) for r in (0, 1)]
    merged = {}
    for part in parts:
        for k, v in part.items():
            merged.setdefault(k, v)
    assert set(merged) == set(single) == set(pairs)
    for k in single:
        np.testing.assert_array_equal(merged[k][0], single[k][0])
        np.testing.assert_array_equal(merged[k][1], single[k][1])


def test_build_tracks_links_across_pairs():
    """A correspondence chain 0->1->2 through the same frame-1 cell becomes
    ONE track with 3 observations; an unlinked match stays length-2."""
    uv_a0 = np.array([[8.0, 8.0]])
    uv_a1 = np.array([[16.0, 16.0]])
    uv_b1 = np.array([[17.0, 17.0]])     # same 4px cell as uv_a1
    uv_b2 = np.array([[32.0, 32.0]])
    uv_c0 = np.array([[100.0, 100.0]])
    uv_c2 = np.array([[120.0, 120.0]])
    matches = {
        (0, 1): (uv_a0, uv_a1, np.ones(1)),
        (1, 2): (uv_b1, uv_b2, np.ones(1)),
        (0, 2): (uv_c0, uv_c2, np.ones(1)),
    }
    tracks = pl.build_tracks(matches, quant=4.0, min_len=2)
    lens = sorted(len(v) for v in tracks.values())
    assert lens == [2, 3]
    long = [v for v in tracks.values() if len(v) == 3][0]
    assert [f for f, _ in long] == [0, 1, 2]


def test_reconstruct_sequence_synthetic(rng):
    """Full pipeline on a noiseless synthetic sequence: scale propagation
    keeps the chain consistent and BA converges to a tiny reprojection cost;
    ATE after similarity alignment is small."""
    match_fn, K, centers_gt = synth_sequence(rng, n_frames=5, noise=0.0)
    res = pl.reconstruct_sequence(match_fn, 5, K,
                                  keyframes=list(range(5)),
                                  overlaps=(1, 2), ba_iters=15)
    n_obs = int(np.asarray(res.problem.obs_valid).sum())
    rms = np.sqrt(res.cost / max(n_obs, 1) / 2)
    assert rms < 0.5, rms
    centers = Rc.camera_centers(res.problem)
    ate = Rc.ate_rmse(centers, centers_gt)
    # gt baseline norm ~0.35/frame; demand cm-scale ATE after alignment
    assert ate < 0.05, ate


def test_reconstruct_sequence_noisy_and_adaptive_keyframes(rng):
    """With pixel noise and adaptive keyframing the pipeline still converges
    to sub-pixel mean reprojection error."""
    match_fn, K, centers_gt = synth_sequence(rng, n_frames=7, noise=0.3)
    res = pl.reconstruct_sequence(match_fn, 7, K, min_matches=10_000,
                                  max_gap=2, overlaps=(1, 2), ba_iters=15)
    assert res.keyframes[0] == 0 and res.keyframes[-1] == 6
    assert len(res.keyframes) >= 4       # max_gap forces density
    n_obs = int(np.asarray(res.problem.obs_valid).sum())
    rms = np.sqrt(res.cost / max(n_obs, 1) / 2)
    # a few quantization-cell merges produce outlier observations (no robust
    # loss in BA yet) — px-scale RMS, cm-scale ATE is the real gate
    assert rms < 2.0, rms
    centers = Rc.camera_centers(res.problem)
    kf_gt = centers_gt[res.keyframes]
    assert Rc.ate_rmse(centers, kf_gt) < 0.1


def test_scale_propagation_fixes_chain():
    """Without scale propagation a varying-baseline chain has badly wrong
    translations; chain_with_scale recovers the relative magnitudes."""
    rng = np.random.default_rng(3)
    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
    pts = np.stack([rng.uniform(-4, 4, 150), rng.uniform(-3, 3, 150),
                    rng.uniform(6, 10, 150)], -1)
    # deliberately NON-uniform baselines: 0.3 then 0.9
    tvecs = np.array([[0, 0, 0], [-0.3, 0, 0], [-1.2, 0, 0]])
    rvecs = np.zeros((3, 3))
    uvs = [np.asarray(G.project(jnp.asarray(rv), jnp.asarray(tv),
                                jnp.asarray(pts), jnp.asarray(K)))
           for rv, tv in zip(rvecs, tvecs)]
    matches = {(i, j): (uvs[i], uvs[j], np.ones(len(pts)))
               for i, j in [(0, 1), (1, 2)]}
    Rs, ts = pl.chain_with_scale(matches, [0, 1, 2], K)
    # global scale is arbitrary: compare RATIO of consecutive baselines
    b01 = np.linalg.norm(ts[1] - ts[0])
    b12 = np.linalg.norm(ts[2] - ts[1])
    assert abs(b12 / b01 - 3.0) < 0.15, (b01, b12)


def _chain_centers(Rs, ts):
    return np.stack([-R.T @ t for R, t in zip(Rs, ts)])


def test_chain_pnp_recovery_on_degenerate_pair(rng, monkeypatch):
    """A failed essential-matrix link mid-chain recovers via PnP RANSAC
    against the propagated landmark map (_pnp_pose): metric-scale t, NO
    'trajectory unreliable' warning, and the chain trajectory stays aligned
    with ground truth (the r4 behavior inserted a near-identity guess and
    silently corrupted everything past the failure)."""
    import warnings as w
    match_fn, K, centers_gt = synth_sequence(rng, n_frames=5)
    frames = list(range(5))
    matches = pl.match_pairs(match_fn, pl.pair_graph(frames, overlaps=(1, 2)))
    orig = pl._pair_pose

    def fake(ms, i, j, K_, thresh=0.5):
        if (i, j) == (2, 3):
            return pl._pose_failed(i, j, len(ms[(i, j)][0]))
        return orig(ms, i, j, K_, thresh)

    monkeypatch.setattr(pl, "_pair_pose", fake)
    with w.catch_warnings():
        w.simplefilter("error", RuntimeWarning)   # any warn -> test failure
        Rs, ts = pl.chain_with_scale(matches, frames, K)
    ate = Rc.ate_rmse(_chain_centers(Rs, ts), centers_gt)
    assert ate < 0.08, ate


def test_chain_skip_pair_recovery(rng, monkeypatch):
    """When PnP recovery is impossible the chain composes through the
    wider-baseline overlap-2 pair (h, j) (_skip_pair_pose), rescaled
    against frame h's landmark map — still no warning, still accurate."""
    import warnings as w
    match_fn, K, centers_gt = synth_sequence(rng, n_frames=5)
    frames = list(range(5))
    matches = pl.match_pairs(match_fn, pl.pair_graph(frames, overlaps=(1, 2)))
    orig = pl._pair_pose

    def fake(ms, i, j, K_, thresh=0.5):
        if (i, j) == (2, 3):
            return pl._pose_failed(i, j, len(ms[(i, j)][0]))
        return orig(ms, i, j, K_, thresh)

    monkeypatch.setattr(pl, "_pair_pose", fake)
    monkeypatch.setattr(pl, "_pnp_pose", lambda *a, **k: None)
    with w.catch_warnings():
        w.simplefilter("error", RuntimeWarning)
        Rs, ts = pl.chain_with_scale(matches, frames, K)
    ate = Rc.ate_rmse(_chain_centers(Rs, ts), centers_gt)
    assert ate < 0.08, ate


def test_chain_unrecoverable_still_warns(rng, monkeypatch):
    """With no map recovery possible (PnP disabled, no overlap-2 pairs) the
    near-identity fallback remains and the 'unreliable' warning fires."""
    match_fn, K, _ = synth_sequence(rng, n_frames=5)
    frames = list(range(5))
    matches = pl.match_pairs(match_fn, pl.pair_graph(frames, overlaps=(1,)))
    orig = pl._pair_pose

    def fake(ms, i, j, K_, thresh=0.5):
        if (i, j) == (2, 3):
            return pl._pose_failed(i, j, len(ms[(i, j)][0]))
        return orig(ms, i, j, K_, thresh)

    monkeypatch.setattr(pl, "_pair_pose", fake)
    monkeypatch.setattr(pl, "_pnp_pose", lambda *a, **k: None)
    with pytest.warns(RuntimeWarning, match="unreliable"):
        pl.chain_with_scale(matches, frames, K)


def test_model_match_fn_smoke(rng, tmp_path):
    """model_match_fn drives the real matcher surface (tiny images, random
    init, thr=0): returns pixel-coord arrays of matching lengths."""
    from PIL import Image
    paths = []
    for i in range(2):
        im = (rng.uniform(0, 255, (64, 64))).astype(np.uint8)
        p = tmp_path / f"f{i}.png"
        Image.fromarray(im).save(p)
        paths.append(str(p))
    from casmtr_tpu.configs import build_config
    from casmtr_tpu.models import build_model
    import jax
    cfg = build_config(overrides={
        "loftr": {
            "backbone": {"backbone_type": "ResNetFPN", "initial_dim": 8,
                         "block_dims": [8, 12, 16]},
            "resolution": [8, 4, 2],
            "coarse": {"d_model": 16, "nhead": 2, "block_type": "quadtree",
                       "attn_type": "B", "topks": [4, 4, 4],
                       "layer_names": ["self", "cross"]},
            "coarse2": {"d_model": 12, "nhead": 2,
                        "layer_names": ["cross", "self", "cross"],
                        "self_attn_type": "local", "window_size": 3,
                        "attn_window_size": 3, "sr_ratio": 2,
                        "post_config": {"method": None, "window_size": 3}},
            "fine": {"d_model": 8, "nhead": 2,
                     "layer_names": ["self", "cross"], "attention": "full"},
            "match_coarse": {"max_matches": 16, "thr": 0.0, "border_rm": 0},
            "match_cascade": {
                "thr": [0.0], "pre_thr": [[0.0]], "test_thr": [0.0],
                "border_rm": [0], "double_check": [False],
                "match_type": ["softmax"], "dsmax_temperature": [1.0],
                "train_pad_num_gt_min": [16], "max_matches": [32],
            },
            "cascade": True, "cascade_levels": [4], "training_stage": 9,
            "train_size": 64, "fine_concat_coarse_feat": True,
        },
    })
    model = build_model(cfg.loftr)
    from casmtr_tpu.data.io import load_im_padding
    img0, img1, *_ = load_im_padding(paths[0], paths[1], resize=64, df=32)
    variables = model.init(jax.random.PRNGKey(0),
                           {"image0": jnp.asarray(img0),
                            "image1": jnp.asarray(img1)}, train=False)
    fn = pl.model_match_fn(cfg, variables, paths, resize=64, thr=-1.0)
    mk0, mk1, conf = fn(0, 1)
    assert mk0.shape == mk1.shape and mk0.shape[1] == 2
    assert len(conf) == len(mk0)


def test_chain_with_scale_device_solver():
    """pose_solver='device' (batched on-device RANSAC, sfm/pose.py) chains
    the same trajectory as the cv2 path on the varying-baseline scene."""
    rng = np.random.default_rng(3)
    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
    pts = np.stack([rng.uniform(-4, 4, 150), rng.uniform(-3, 3, 150),
                    rng.uniform(6, 10, 150)], -1)
    tvecs = np.array([[0, 0, 0], [-0.3, 0, 0], [-1.2, 0, 0]])
    rvecs = np.zeros((3, 3))
    uvs = [np.asarray(G.project(jnp.asarray(rv), jnp.asarray(tv),
                                jnp.asarray(pts), jnp.asarray(K)))
           for rv, tv in zip(rvecs, tvecs)]
    matches = {(i, j): (uvs[i], uvs[j], np.ones(len(pts)))
               for i, j in [(0, 1), (1, 2)]}
    Rs, ts = pl.chain_with_scale(matches, [0, 1, 2], K,
                                 pose_solver="device")
    b01 = np.linalg.norm(ts[1] - ts[0])
    b12 = np.linalg.norm(ts[2] - ts[1])
    assert abs(b12 / b01 - 3.0) < 0.15, (b01, b12)
