"""Keyframe-partitioned SfM pipeline over the matcher (north-star capability).

The reference repo has no SfM engine; SURVEY.md §6 "North-star additions" /
BASELINE.md specify one built ON TOP of the matcher: keyframe selection over
an image sequence, pair-graph matching partitioned across hosts (the
`get_local_split` scheme of data/loader.py, reference dataloader.py:6-23),
cross-host aggregation of match results (parallel/comm.py, reference
src/utils/comm.py:142-220 semantics), track building, chained two-view
initialization with per-pair scale propagation (host RANSAC — per-pair CPU
work exactly like the reference eval, src/utils/metrics.py:85-110), DLT
triangulation, and the distributed Schur-complement BA in sfm/ba.py.

Design notes (TPU-first):
* The matcher is a black-box ``match_fn(i, j) -> (mkpts0, mkpts1, mconf)``
  in pixel coords — batched/jitted device work lives behind it; everything
  here is host-side orchestration (RANSAC/pose stays on host by design,
  SURVEY.md §7 "RANSAC/pose off the accelerator").
* Pair matching is embarrassingly parallel: each host matches its
  deterministic slice of the pair graph and results are merged with the
  pickled all_gather. BA observations are padded to a static capacity so the
  LM loop jits once (`build_problem(max_obs=...)`).
"""

from __future__ import annotations

import warnings
from typing import Callable, Dict, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from casmtr_tpu.parallel import comm
from casmtr_tpu.sfm import ba as ba_mod
from casmtr_tpu.sfm import reconstruct as Rc
from casmtr_tpu.sfm.geometry import triangulate
from casmtr_tpu.utils.metrics import estimate_pose

MatchFn = Callable[[int, int], Tuple[np.ndarray, np.ndarray, np.ndarray]]
PairMatches = Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray, np.ndarray]]


# ---------------------------------------------------------------------------
# keyframes & pair graph
# ---------------------------------------------------------------------------

def select_keyframes(n_frames: int, match_fn: MatchFn,
                     min_matches: int = 100, max_gap: int = 8,
                     cache: Optional[PairMatches] = None) -> List[int]:
    """Adaptive keyframe selection: walk the sequence; when frame ``i``'s
    match count to the last keyframe drops below ``min_matches``, promote the
    LAST frame that still matched well (so consecutive keyframe pairs stay
    above the threshold) and re-evaluate ``i`` against it; promote ``i``
    directly only when no such frame exists. A gap of ``max_gap`` also
    promotes. Frame 0 and the last frame are always keyframes.

    ``cache`` (optional dict) collects every computed match result keyed by
    (frame_i, frame_j) so the pair-graph matching can reuse them."""
    cache = cache if cache is not None else {}
    kfs = [0]
    last_good: Optional[int] = None
    i = 1
    while i < n_frames:
        key = (kfs[-1], i)
        if key not in cache:
            cache[key] = tuple(np.asarray(a) for a in match_fn(kfs[-1], i))
        n_match = len(cache[key][0])
        if n_match < min_matches:
            if last_good is not None and last_good != kfs[-1]:
                kfs.append(last_good)   # the last well-matched frame
                last_good = None
                continue                # re-evaluate i vs the new keyframe
            kfs.append(i)
            last_good = None
        elif i - kfs[-1] >= max_gap:
            kfs.append(i)
            last_good = None
        else:
            last_good = i
        i += 1
    if kfs[-1] != n_frames - 1:
        kfs.append(n_frames - 1)
    return kfs


def pair_graph(frames: Sequence[int],
               overlaps: Sequence[int] = (1, 2)) -> List[Tuple[int, int]]:
    """Covisibility pair list: (frames[a], frames[b]) for b-a in overlaps."""
    pairs = []
    for a in range(len(frames)):
        for d in overlaps:
            if a + d < len(frames):
                pairs.append((frames[a], frames[a + d]))
    return pairs


# ---------------------------------------------------------------------------
# partitioned matching
# ---------------------------------------------------------------------------

def match_pairs(match_fn: MatchFn, pairs: Sequence[Tuple[int, int]],
                min_conf: float = 0.0, seed: int = 66,
                world: Optional[int] = None, rank: Optional[int] = None,
                gather: Callable = comm.all_gather,
                precomputed: Optional[PairMatches] = None) -> PairMatches:
    """Match a deterministic per-host slice of the pair graph and merge
    results across hosts (first host wins on the padded duplicates that
    `get_local_split` introduces when len(pairs) % world != 0).
    ``precomputed`` results (e.g. from keyframe selection) are reused
    instead of re-running the model forward."""
    from casmtr_tpu.data.loader import get_local_split
    world = comm.get_world_size() if world is None else world
    rank = comm.get_rank() if rank is None else rank
    precomputed = precomputed or {}
    local = get_local_split(list(range(len(pairs))), world, rank, seed)
    mine: PairMatches = {}
    for pidx in local:
        i, j = pairs[int(pidx)]
        if (i, j) in mine:
            continue
        mk0, mk1, conf = precomputed.get((i, j)) or match_fn(i, j)
        keep = np.asarray(conf) >= min_conf
        mine[(i, j)] = (np.asarray(mk0)[keep], np.asarray(mk1)[keep],
                        np.asarray(conf)[keep])
    merged: PairMatches = {}
    for part in gather(mine):
        for key, val in part.items():
            merged.setdefault(key, val)
    return merged


# ---------------------------------------------------------------------------
# tracks
# ---------------------------------------------------------------------------

class _UnionFind:
    def __init__(self):
        self.parent: Dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        if p != x:
            p = self.parent[x] = self.find(p)
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def build_tracks(matches: PairMatches, quant: float = 4.0,
                 min_len: int = 2) -> Dict[int, List[Tuple[int, np.ndarray]]]:
    """Union-find track building: keypoints are identified across pairs by
    their quantized pixel cell (the coarse grid the matcher predicts on),
    correspondences union the two nodes. Tracks observed in >= ``min_len``
    distinct frames survive; one observation per frame (first wins — a
    second hit in the same cell is the same coarse match)."""
    uf = _UnionFind()
    uv_of: Dict[Tuple[int, int, int], np.ndarray] = {}

    def node(frame, uv):
        key = (frame, int(uv[0] // quant), int(uv[1] // quant))
        uv_of.setdefault(key, np.asarray(uv, np.float64))
        return key

    for (i, j), (mk0, mk1, _) in matches.items():
        for a in range(len(mk0)):
            uf.union(node(i, mk0[a]), node(j, mk1[a]))
    groups: Dict = {}
    for key in uv_of:
        groups.setdefault(uf.find(key), []).append(key)
    tracks: Dict[int, List[Tuple[int, np.ndarray]]] = {}
    tid = 0
    for members in groups.values():
        seen_frames: Dict[int, np.ndarray] = {}
        for key in sorted(members):
            frame = key[0]
            if frame not in seen_frames:
                seen_frames[frame] = uv_of[key]
        if len(seen_frames) >= min_len:
            tracks[tid] = sorted(
                (f, uv) for f, uv in seen_frames.items())
            tid += 1
    return tracks


# ---------------------------------------------------------------------------
# chained initialization with scale propagation
# ---------------------------------------------------------------------------

def _pose_failed(i: int, j: int, n: int):
    """Failure MARKER (inl=None): the chain attempts map-based recovery
    (PnP against triangulated landmarks, then skip-pair composition) before
    giving up — see chain_with_scale. Only the exhausted case warns."""
    return np.eye(3), np.array([0.0, 0.0, 1e-3]), None


def _pnp_pose(mk0: np.ndarray, mk1: np.ndarray,
              prev_depth: Dict[Tuple[int, int], float], K: np.ndarray,
              quant: float, thresh: float):
    """Recover the relative pose i->j by PnP RANSAC against the local map.

    The chain's scale-propagation map (``prev_depth``: frame-i cell ->
    triangulated depth at chain scale) backprojects matched frame-i
    keypoints to 3D camera-i points; cv2.solvePnPRansac then solves the
    frame-i -> frame-j transform from those 3D points and their frame-j
    pixels.  Unlike the essential-matrix RANSAC this stays well-posed under
    the classic two-view degeneracies (near-zero baseline, pure rotation,
    dominant plane) and returns t at METRIC chain scale — no depth-ratio
    rescale needed.

    Returns (R, t, depth_j) with depth_j the frame-j cell->depth map built
    from the PnP-inlier points transformed into camera j (so the next link
    keeps propagating scale without re-triangulating a possibly tiny
    baseline), or None when fewer than 6 map hits / PnP fails."""
    import cv2
    Kinv = np.linalg.inv(K)
    pts3, pts2, cells_j = [], [], []
    for idx in range(len(mk0)):
        cell = (int(mk0[idx][0] // quant), int(mk0[idx][1] // quant))
        d = prev_depth.get(cell)
        if d is not None:
            pts3.append(d * (Kinv @ np.array([mk0[idx][0], mk0[idx][1], 1.0])))
            pts2.append(np.asarray(mk1[idx], np.float64))
            cells_j.append((int(mk1[idx][0] // quant),
                            int(mk1[idx][1] // quant)))
    if len(pts3) < 6:
        return None
    pts3 = np.asarray(pts3, np.float64)
    pts2 = np.asarray(pts2, np.float64)
    ok, rvec, tvec, inl = cv2.solvePnPRansac(
        pts3, pts2, K.astype(np.float64), None,
        reprojectionError=max(2.0 * thresh, 2.0), iterationsCount=1000,
        confidence=0.9999, flags=cv2.SOLVEPNP_EPNP)
    if not ok or inl is None or len(inl) < 6:
        return None
    R = cv2.Rodrigues(rvec)[0]
    t = tvec[:, 0]
    depth_j: Dict[Tuple[int, int], float] = {}
    for row in inl[:, 0]:
        z = float((R @ pts3[row] + t)[2])
        if z > 1e-6:
            depth_j.setdefault(cells_j[row], z)
    return R, t, depth_j


def _skip_pair_pose(matches: PairMatches, h: int, j: int, K: np.ndarray,
                    thresh: float, quant: float,
                    depth_h: Optional[Dict[Tuple[int, int], float]],
                    rel_hi: Tuple[np.ndarray, np.ndarray]):
    """Recover link i->j through the wider-baseline skip pair (h, j).

    When the consecutive pair (i, j) is degenerate, the overlap-2 pair
    (h, j) — two keyframes apart, hence roughly double the baseline — is
    often still solvable by essential-matrix RANSAC.  Its unit translation
    is rescaled against frame h's landmark map (same median depth-ratio
    rule as the chain), then composed with the already-scaled previous
    link h->i:  R_ij = R_hj R_hi^T,  t_ij = t_hj − R_ij t_hi.

    Returns (R_ij, t_ij, depth_j) with depth_j built from the (h, j)
    triangulation transformed into camera j, or None when the pair is
    missing / unsolvable / unscalable."""
    if (h, j) not in matches or not depth_h:
        return None
    mk0, mk1, _ = matches[(h, j)]
    ret = estimate_pose(mk0.astype(np.float64), mk1.astype(np.float64),
                        K, K, thresh)
    if ret is None:
        return None
    R_hj, t_hj, inl = ret
    mk0, mk1 = mk0[inl], mk1[inl]
    if len(mk0) < 8:
        return None
    P0 = K @ np.eye(3, 4)
    P1 = K @ np.concatenate([R_hj, t_hj[:, None]], axis=1)
    X = np.asarray(triangulate(jnp.asarray(P0), jnp.asarray(P1),
                               jnp.asarray(mk0), jnp.asarray(mk1)))
    ratios = []
    for idx in range(len(mk0)):
        cell = (int(mk0[idx][0] // quant), int(mk0[idx][1] // quant))
        d_prev = depth_h.get(cell)
        d_new = float(X[idx][2])
        if d_prev is not None and d_new > 1e-6:
            ratios.append(d_prev / d_new)
    if len(ratios) < 5:
        return None
    s = float(np.median(ratios))
    t_hj = s * t_hj
    R_hi, t_hi = rel_hi
    R_ij = R_hj @ R_hi.T
    t_ij = t_hj - R_ij @ t_hi
    depth_j: Dict[Tuple[int, int], float] = {}
    Xc1 = s * (X @ R_hj.T) + t_hj
    for idx in range(len(mk1)):
        if Xc1[idx][2] > 1e-6:
            cell = (int(mk1[idx][0] // quant), int(mk1[idx][1] // quant))
            depth_j.setdefault(cell, float(Xc1[idx][2]))
    return R_ij, t_ij, depth_j


def _pair_pose(matches: PairMatches, i: int, j: int, K: np.ndarray,
               thresh: float = 0.5):
    mk0, mk1, _ = matches[(i, j)]
    ret = estimate_pose(mk0.astype(np.float64), mk1.astype(np.float64),
                        K, K, thresh)
    if ret is None:
        return _pose_failed(i, j, len(mk0))
    R, t, inl = ret
    return R, t, inl


def _pair_poses_device(matches: PairMatches, pairs, K: np.ndarray,
                       thresh: float):
    """All pair poses in ONE call to the batched on-device RANSAC
    (sfm/pose.py) — replaces the per-pair host cv2 loop. Matches are padded
    to a 256-multiple capacity bucket so repeated reconstructions reuse one
    compiled shape."""
    import jax
    import jax.numpy as jnp

    from casmtr_tpu.sfm.pose import estimate_pose_batch

    counts = [len(matches[p][0]) for p in pairs]
    B = len(pairs)
    M = max(256, int(np.ceil(max(counts) / 256.0)) * 256)
    k0 = np.zeros((B, M, 2), np.float32)
    k1 = np.zeros((B, M, 2), np.float32)
    v = np.zeros((B, M), bool)
    for a, p in enumerate(pairs):
        mk0, mk1, _ = matches[p]
        k0[a, :counts[a]] = mk0
        k1[a, :counts[a]] = mk1
        v[a, :counts[a]] = True
    Kt = jnp.asarray(np.broadcast_to(K.astype(np.float32), (B, 3, 3)))
    res = jax.jit(estimate_pose_batch, static_argnames=("thr_px",))(
        jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(v), Kt, Kt,
        thr_px=float(thresh))
    ok = np.asarray(res.ok)
    Rs, ts, inl = (np.asarray(res.R, np.float64),
                   np.asarray(res.t, np.float64), np.asarray(res.inliers))
    out = []
    for a, (i, j) in enumerate(pairs):
        if ok[a]:
            out.append((Rs[a], ts[a], inl[a, :counts[a]]))
        else:
            out.append(_pose_failed(i, j, counts[a]))
    return out


def pair_relative_poses(matches: PairMatches, pairs, K: np.ndarray,
                        thresh: float = 0.5, pose_solver: str = "cv2"
                        ) -> Dict[Tuple[int, int], tuple]:
    """Relative pose (R, t-unit, inlier mask or None-on-failure) for every
    pair — one batched on-device RANSAC call, or the per-pair cv2 loop."""
    pairs = list(pairs)
    if pose_solver == "device":
        return dict(zip(pairs, _pair_poses_device(matches, pairs, K, thresh)))
    if pose_solver != "cv2":
        raise ValueError(f"unknown pose solver: {pose_solver!r}")
    return {(i, j): _pair_pose(matches, i, j, K, thresh) for i, j in pairs}


def chain_with_scale(matches: PairMatches, frames: Sequence[int],
                     K: np.ndarray, thresh: float = 0.5, quant: float = 4.0,
                     pose_solver: str = "cv2",
                     pair_poses: Optional[Dict[Tuple[int, int], tuple]]
                     = None):
    """Monocular incremental chain: consecutive relative poses from RANSAC,
    with each pair's unit-norm translation rescaled so that the depths of
    keypoints shared between pair (a,b) and pair (b,c) agree in frame b
    (median depth ratio — standard monocular VO scale propagation). The
    first pair sets the global scale (ambiguity is inherent).

    Failed essential-matrix RANSAC links do NOT fall back to a blind
    near-identity guess (the r4 behavior — it silently corrupted the
    trajectory past the failure): the chain recovers from the map instead,
    trying in order (1) PnP RANSAC against the propagated local landmark
    map (``_pnp_pose`` — well-posed under small-baseline / pure-rotation /
    planar degeneracies, returns metric t), (2) wider-baseline composition
    through the overlap-2 pair (frames[a-1], j) when it was matched
    (``_skip_pair_pose``). Only when both are impossible does the
    near-identity fallback remain, with the "trajectory unreliable"
    warning."""
    rel: List[Tuple[np.ndarray, np.ndarray]] = []
    # per-frame landmark maps (quantized cell -> chain-scale depth), used by
    # scale propagation (frame i map) and by the failure recoveries
    frame_depth: Dict[int, Dict[Tuple[int, int], float]] = {}
    device_poses = None
    if pair_poses is not None:
        device_poses = [pair_poses[(frames[a], frames[a + 1])]
                        for a in range(len(frames) - 1)]
    elif pose_solver == "device":
        consecutive = [(frames[a], frames[a + 1])
                       for a in range(len(frames) - 1)]
        device_poses = _pair_poses_device(matches, consecutive, K, thresh)
    elif pose_solver != "cv2":
        raise ValueError(f"unknown pose solver: {pose_solver!r}")
    for a in range(len(frames) - 1):
        i, j = frames[a], frames[a + 1]
        R, t, inl = (device_poses[a] if device_poses is not None
                     else _pair_pose(matches, i, j, K, thresh))
        mk0, mk1, _ = matches[(i, j)]
        prev_depth = frame_depth.get(i)
        metric = False                 # t already at chain scale (recovery)
        depth_j: Optional[Dict[Tuple[int, int], float]] = None
        if inl is None:
            rec = (_pnp_pose(mk0, mk1, prev_depth, K, quant, thresh)
                   if prev_depth else None)
            if rec is not None:
                R, t, depth_j = rec
                metric = True
            else:
                rec2 = (_skip_pair_pose(matches, frames[a - 1], j, K, thresh,
                                        quant, frame_depth.get(frames[a - 1]),
                                        rel[-1]) if a > 0 else None)
                if rec2 is not None:
                    R, t, depth_j = rec2
                    metric = True
                else:
                    warnings.warn(
                        f"RANSAC pose failed for keyframe pair ({i}, {j}) "
                        f"({len(mk0)} matches) and no map recovery was "
                        "possible — inserting a near-identity fallback; "
                        f"the trajectory past frame {i} is unreliable",
                        RuntimeWarning)
        else:
            mk0, mk1 = mk0[inl], mk1[inl]
        # one DLT pass per pair at unit baseline; depths scale linearly with
        # the baseline, so the rescaled cam-1 points are scale * (X R^T + t)
        X = None
        if len(mk0) > 0 and depth_j is None:
            P0 = K @ np.eye(3, 4)
            P1 = K @ np.concatenate([R, t[:, None]], axis=1)
            X = np.asarray(triangulate(jnp.asarray(P0), jnp.asarray(P1),
                                       jnp.asarray(mk0), jnp.asarray(mk1)))
        scale = 1.0
        if not metric and prev_depth and X is not None and len(mk0) >= 8:
            # shared cells in frame i: previous pair's cam-j == this pair's
            # cam-i -> compare this pair's cam-i depths to previous depths
            ratios = []
            for idx in range(len(mk0)):
                cell = (int(mk0[idx][0] // quant), int(mk0[idx][1] // quant))
                d_prev = prev_depth.get(cell)
                d_new = float(X[idx][2])
                if d_prev is not None and d_new > 1e-6:
                    ratios.append(d_prev / d_new)
            if len(ratios) >= 5:
                scale = float(np.median(ratios))
        t = t * scale
        rel.append((R, t))
        if depth_j is not None:
            frame_depth[j] = depth_j
        else:
            frame_depth[j] = {}
            if X is not None:
                Xc1 = scale * (X @ R.T) + t  # == (scale X) R^T + t_scaled
                for idx in range(len(mk1)):
                    if Xc1[idx][2] > 1e-6:
                        cell = (int(mk1[idx][0] // quant),
                                int(mk1[idx][1] // quant))
                        frame_depth[j].setdefault(cell, float(Xc1[idx][2]))
                # augment frame i's map with this pair's cam-i depths (the
                # skip-pair recovery two links later reads it)
                fi = frame_depth.setdefault(i, {})
                for idx in range(len(mk0)):
                    z = float(scale * X[idx][2])
                    if z > 1e-6:
                        cell = (int(mk0[idx][0] // quant),
                                int(mk0[idx][1] // quant))
                        fi.setdefault(cell, z)
    return Rc.chain_poses(rel)


# ---------------------------------------------------------------------------
# pose-graph refinement (rotation + translation/scale averaging)
# ---------------------------------------------------------------------------

def refine_with_pose_graph(Rs: np.ndarray, ts: np.ndarray,
                           pair_poses: Dict[Tuple[int, int], tuple],
                           keyframes: Sequence[int],
                           rot_iters: int = 8, trans_rounds: int = 4
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Distribute the chain's accumulated drift over ALL matched pairs
    (sfm/pose_graph.py): failed-RANSAC pairs contribute no edge; edges are
    weighted by sqrt inlier count. No-op (returns the input) when the graph
    carries no redundancy beyond the chain itself."""
    from casmtr_tpu.sfm.pose_graph import PoseGraph, optimize_pose_graph
    kf_index = {f: a for a, f in enumerate(keyframes)}
    ei, ej, Rr, tr, w = [], [], [], [], []
    for (i, j), (R, t, inl) in pair_poses.items():
        if inl is None or i not in kf_index or j not in kf_index:
            continue
        n = np.linalg.norm(np.asarray(t))
        ei.append(kf_index[i])
        ej.append(kf_index[j])
        Rr.append(np.asarray(R, np.float32))
        tr.append(np.asarray(t, np.float32) / max(float(n), 1e-12))
        w.append(np.sqrt(max(int(np.sum(inl)), 1)))
    # a chain has C-1 edges; PGO needs redundant ones to say anything new
    if len(ei) < len(keyframes):
        return Rs, ts
    wn = np.asarray(w, np.float32)
    g = PoseGraph(jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
                  jnp.asarray(np.stack(Rr)), jnp.asarray(np.stack(tr)),
                  jnp.asarray(wn / wn.max()))
    from casmtr_tpu.sfm.pose_graph import average_rotations, \
        average_translations
    R2 = average_rotations(jnp.asarray(Rs, jnp.float32), g, iters=rot_iters)
    # translation-averaging degeneracy gate: bearing-only edges constrain
    # camera positions only when the WORLD-frame edge directions are
    # diverse. For (near-)collinear motion — the dominant video case — the
    # perpendicular spacing information lives entirely in the chain's
    # depth-propagated scales, and averaging would trade it for direction
    # noise (measured: ATE 0.05 -> 0.43 on an 80-frame linear sweep).
    # World direction of edge (i, j) is -R_j^T t_rel (= c_j - c_i up to
    # scale); skip when the direction cloud's 2nd singular value says the
    # directions span < ~10% anisotropy.
    dirs = np.stack([np.asarray(R2)[j].T @ d
                     for j, d in zip(ej, np.asarray(g.t_rel))])
    # uncentered on purpose: +d and -d are the same bearing constraint
    sv = np.linalg.svd(dirs, compute_uv=False)
    if sv[1] < 0.1 * sv[0]:
        return np.asarray(R2, np.float64), np.asarray(ts, np.float64)
    t2, _ = average_translations(R2, jnp.asarray(ts, jnp.float32), g,
                                 rounds=trans_rounds)
    return np.asarray(R2, np.float64), np.asarray(t2, np.float64)


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------

class SfMResult(NamedTuple):
    keyframes: List[int]
    matches: PairMatches
    tracks: Dict[int, List[Tuple[int, np.ndarray]]]
    problem: ba_mod.BAProblem          # refined (post-BA)
    init_Rs: np.ndarray                # chain init, world->cam
    init_ts: np.ndarray
    cost: float                        # final BA cost (sum sq reproj px)


def reconstruct_sequence(match_fn: MatchFn, n_frames: int, K: np.ndarray,
                         keyframes: Optional[Sequence[int]] = None,
                         min_matches: int = 100, max_gap: int = 8,
                         overlaps: Sequence[int] = (1, 2),
                         min_conf: float = 0.0, ransac_thresh: float = 0.5,
                         quant: float = 4.0, min_track_len: int = 2,
                         ba_iters: int = 20, huber_delta: float = 3.0,
                         max_obs: Optional[int] = None,
                         pose_solver: str = "cv2",
                         pgo: bool = False,
                         solver: str = "auto",
                         cg_iters: int = 100) -> SfMResult:
    """End-to-end: keyframes -> partitioned pair matching -> chained init
    with scale propagation -> tracks -> triangulation -> robust Schur BA
    (Huber, ``huber_delta`` px — wrong track merges become gross outliers;
    pass None for plain least squares). ``cost`` is in rho units.

    ``pgo``: refine the chained init by pose-graph optimization over ALL
    matched pairs (the overlap>=2 / loop pairs cancel chain drift) before
    BA — recommended for long sequences.

    ``solver``: BA solver (ba.run_ba). "auto" picks the sparse matrix-free
    CG path when the dense [P, C, 6, 3] cross-block would exceed ~200 MB
    (P*C > 3e6), else the exact dense direct solve."""
    if 1 not in overlaps:
        raise ValueError("overlaps must include 1: the chained "
                         "initialization needs every consecutive keyframe "
                         f"pair (got {tuple(overlaps)})")
    cache: PairMatches = {}
    if keyframes is None:
        keyframes = select_keyframes(n_frames, match_fn,
                                     min_matches=min_matches,
                                     max_gap=max_gap, cache=cache)
    keyframes = list(keyframes)
    pairs = pair_graph(keyframes, overlaps)
    matches = match_pairs(match_fn, pairs, min_conf=min_conf,
                          precomputed=cache)
    pair_poses = None
    if pgo:
        pair_poses = pair_relative_poses(matches, pairs, K,
                                         thresh=ransac_thresh,
                                         pose_solver=pose_solver)
    Rs, ts = chain_with_scale(matches, keyframes, K, thresh=ransac_thresh,
                              quant=quant, pose_solver=pose_solver,
                              pair_poses=pair_poses)
    if pgo:
        Rs, ts = refine_with_pose_graph(Rs, ts, pair_poses, keyframes)
    kf_index = {f: a for a, f in enumerate(keyframes)}
    raw_tracks = build_tracks(matches, quant=quant, min_len=min_track_len)
    tracks = {tid: [(kf_index[f], uv) for f, uv in views]
              for tid, views in raw_tracks.items()}
    if not tracks:
        raise ValueError("no tracks survived — matcher produced too few "
                         "consistent matches")
    problem = Rc.build_problem(Rs, ts, K, tracks, max_obs=max_obs)
    if solver == "auto":
        pc = problem.points.shape[0] * problem.cam_rvec.shape[0]
        solver = "cg" if pc > 3e6 else "dense"
    refined, cost = ba_mod.run_ba(problem, iters=ba_iters,
                                  huber_delta=huber_delta, solver=solver,
                                  cg_iters=cg_iters)
    return SfMResult(keyframes=keyframes, matches=matches,
                     tracks=raw_tracks, problem=refined,
                     init_Rs=Rs, init_ts=ts, cost=float(cost))


def model_match_fn(cfg, variables, paths: Sequence[str], resize: int = 640,
                   thr: float = 0.2) -> MatchFn:
    """Adapt the full matcher (cli/match_pair.py surface) to the pipeline's
    ``match_fn(i, j)`` interface over a list of image paths. One jitted
    apply is shared across all pairs (same-size frames compile once)."""
    from casmtr_tpu.cli.match_pair import make_matcher
    matcher = make_matcher(cfg, variables, resize=resize, thr=thr)

    def fn(i: int, j: int):
        return matcher(paths[i], paths[j])

    return fn
