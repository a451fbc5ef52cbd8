"""Focused tests of the test-time filtering chain: maxpool NMS tie-breaking,
previous-stage confidence gating with nearest upsampling, and window border
masks — the behaviors SURVEY.md §7 flags as AUC-drift risks."""

import numpy as np
import jax.numpy as jnp
import pytest

from casmtr_tpu.ops import nms
from casmtr_tpu.ops import cascade_matching as cm


def test_maxpool_nms_keeps_local_maxima(rng):
    h = w = 8
    conf = np.zeros((1, h, w), np.float32)
    conf[0, 2, 2] = 0.9    # isolated peak
    conf[0, 2, 3] = 0.5    # suppressed neighbour
    conf[0, 6, 6] = 0.8    # second peak, far away
    mask = np.asarray(nms.maxpool_nms_mask(jnp.asarray(conf.reshape(1, -1)),
                                           (h, w), 3)).reshape(h, w)
    assert mask[2, 2] and mask[6, 6]
    assert not mask[2, 3]


def test_maxpool_nms_tie_breaks_first_in_scan_order(rng):
    """Exact ties: only the first position in row-major kernel scan order is
    its own window argmax (torch max_pool2d return_indices semantics)."""
    h = w = 6
    conf = np.full((1, h, w), 0.5, np.float32)  # everything tied
    mask = np.asarray(nms.maxpool_nms_mask(jnp.asarray(conf.reshape(1, -1)),
                                           (h, w), 3)).reshape(h, w)
    # a position survives iff it is the FIRST max in its own centred window,
    # i.e. the window's top-left in-bounds cell == the position itself ->
    # only (0, 0) for an all-tied map
    assert mask[0, 0]
    assert mask.sum() == 1


def test_local_window_nms_topk(rng):
    h = w = 8
    conf = rng.random((1, h * w)).astype(np.float32)
    mask = np.asarray(nms.local_window_nms_mask(jnp.asarray(conf), (h, w),
                                                4, 2)).reshape(h, w)
    # exactly 2 survivors per non-overlapping 4x4 window
    for by in range(0, h, 4):
        for bx in range(0, w, 4):
            assert mask[by:by + 4, bx:bx + 4].sum() == 2


def test_pre_thr_gate_nearest_upsampling():
    """Previous-stage confidences gate at 2x resolution with NEAREST
    upsampling (reference cascade_matching.py:202-206)."""
    pre = jnp.asarray([[0.9, 0.1, 0.9, 0.9]])  # 2x2 grid
    up = cm.upscale_per_position(pre, (2, 2), (4, 4))
    up = np.asarray(up).reshape(4, 4)
    # each coarse cell expands to a 2x2 block
    assert (up[:2, :2] == pytest.approx(0.9)) and (up[:2, 2:] == pytest.approx(0.1))
    assert (up[2:, :2] == pytest.approx(0.9)) and (up[2:, 2:] == pytest.approx(0.9))


def test_window_border_masks():
    """Source near-border removal + target strict-border test
    (reference cascade_functions.py:120-141)."""
    h0 = w0 = h1 = w1 = 6
    L0 = h0 * w0
    # all matches point at a safe interior target (3, 3)
    next_idx = jnp.full((1, L0), 3 * w1 + 3, jnp.int32)
    ok = np.asarray(cm.window_border_ok(next_idx, (h0, w0), (h1, w1), 1))
    ok = ok.reshape(h0, w0)
    assert not ok[0].any() and not ok[:, 0].any()      # near borders removed
    assert not ok[-1].any() and not ok[:, -1].any()    # far borders removed
    assert ok[1:-1, 1:-1].all()
    # target at the border kills the match everywhere
    next_idx_bad = jnp.zeros((1, L0), jnp.int32)       # target (0, 0)
    ok2 = np.asarray(cm.window_border_ok(next_idx_bad, (h0, w0), (h1, w1), 1))
    assert not ok2.any()


def test_double_check_cycle_consistency():
    """double_check keeps (i, j) only when 1->0 maps j back to i
    (reference cascade_matching.py:244-251)."""
    L = 4
    ws = cm.WindowSoftmaxResult(
        conf01=jnp.zeros((1, L, 2)), conf10=jnp.zeros((1, L, 2)),
        next_idx_c01=jnp.asarray([[1, 0, 3, 3]], jnp.int32),
        next_idx_c10=jnp.asarray([[1, 0, 0, 2]], jnp.int32),
        next_conf_c01=jnp.ones((1, L)), next_conf_c10=jnp.ones((1, L)),
        next_local_c01=jnp.zeros((1, L), jnp.int32))
    mask = cm.cascade_match_mask_test(
        ws, (2, 2), (2, 2), test_thr=0.5, bd=0, pre_confs=[], pre_hws=[],
        pre_thrs=[], post_method=None, post_window=None, double_check=True)
    # i=0 -> j=1, back[1]=0 == 0 OK; i=1 -> j=0, back[0]=1 == 1 OK;
    # i=2 -> j=3, back[3]=2 == 2 OK; i=3 -> j=3, back[3]=2 != 3 FAIL
    np.testing.assert_array_equal(np.asarray(mask)[0],
                                  [True, True, True, False])


def _rand_ws(rng, L0=16, Kw=8, L1=64, track_second=True):
    """Random windowed-softmax result via the real producer."""
    f0 = jnp.asarray(rng.standard_normal((1, L0, 8)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((1, L1, 8)).astype(np.float32))
    idx01 = jnp.asarray(rng.integers(0, L1, (1, L0, Kw)), dtype=jnp.int32)
    idx10 = jnp.asarray(rng.integers(0, L0, (1, L1, Kw)), dtype=jnp.int32)
    ws = cm.window_softmax_matching(f0, f1, idx01, idx10, 0.1,
                                    track_second=track_second)
    return ws, idx01


def test_window_second_best_tracking(rng):
    """next_conf_c01_s / next_idx_c01_s are the second-largest window softmax
    and its GLOBAL index (the tensors the reference declares at
    cascade_matching.py:130 but never computes)."""
    ws, idx01 = _rand_ws(rng)
    conf = np.asarray(ws.conf01)[0]                    # [L0, Kw]
    idx = np.asarray(idx01)[0]
    order = np.argsort(-conf, axis=1, kind="stable")
    np.testing.assert_allclose(np.asarray(ws.next_conf_c01)[0],
                               np.take_along_axis(conf, order[:, :1], 1)[:, 0],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ws.next_conf_c01_s)[0],
                               np.take_along_axis(conf, order[:, 1:2], 1)[:, 0],
                               rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(ws.next_idx_c01_s)[0],
        np.take_along_axis(idx, order[:, 1:2], 1)[:, 0])


def test_dual_softmax_second_best(rng):
    from casmtr_tpu.ops import matching
    f0 = jnp.asarray(rng.standard_normal((1, 12, 8)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((1, 20, 8)).astype(np.float32))
    ds = matching.dual_softmax(f0, f1, 0.1, track_second=True)
    sm = np.asarray(jnp.take_along_axis(
        ds.conf_matrix, ds.next_idx_c01[..., None], axis=2))  # unused sanity
    # numpy re-derivation of the row softmax
    sim = (np.asarray(f0)[0] / np.sqrt(8)) @ (np.asarray(f1)[0].T / np.sqrt(8))
    sim = sim / 0.1
    e = np.exp(sim - sim.max(1, keepdims=True))
    sm01 = e / e.sum(1, keepdims=True)
    order = np.argsort(-sm01, axis=1, kind="stable")
    np.testing.assert_allclose(np.asarray(ds.next_conf_c01_s)[0],
                               np.take_along_axis(sm01, order[:, 1:2], 1)[:, 0],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ds.next_idx_c01_s)[0],
                                  order[:, 1])


def test_rt_gate_current_and_pre_level(rng):
    """rt drops matches whose second/best confidence ratio exceeds it, at the
    current level and (nearest-upsampled) at every pre level
    (reference cascade_matching.py:193-215 semantics)."""
    ws, _ = _rand_ws(rng, L0=16, Kw=8)   # hw0 = (4, 4)
    rt = 0.5
    base = cm.cascade_match_mask_test(
        ws, (4, 4), (8, 8), test_thr=-1.0, bd=0, pre_confs=[], pre_hws=[],
        pre_thrs=[], post_method=None, post_window=None, double_check=False)
    gated = cm.cascade_match_mask_test(
        ws, (4, 4), (8, 8), test_thr=-1.0, bd=0, pre_confs=[], pre_hws=[],
        pre_thrs=[], post_method=None, post_window=None, double_check=False,
        rt=rt)
    ratio = (np.asarray(ws.next_conf_c01_s)
             / (np.asarray(ws.next_conf_c01) + 1e-7))
    expect = np.asarray(base) & ~(ratio > rt)
    if not expect.any():
        expect[:, 0] = True              # keep-at-least-one tail
    np.testing.assert_array_equal(np.asarray(gated), expect)

    # pre-level rt: a 2x2 pre grid with one ambiguous cell masks out its
    # upsampled 2x2 block
    pre_conf = jnp.asarray([[0.9, 0.9, 0.9, 0.9]])
    pre_conf_s = jnp.asarray([[0.1, 0.8, 0.1, 0.1]])   # cell 1 ratio ~0.89
    gated2 = cm.cascade_match_mask_test(
        ws, (4, 4), (8, 8), test_thr=-1.0, bd=0,
        pre_confs=[pre_conf], pre_hws=[(2, 2)], pre_thrs=[0.0],
        post_method=None, post_window=None, double_check=False,
        rt=rt, pre_confs_s=[pre_conf_s])
    g2 = np.asarray(gated2).reshape(4, 4)
    e2 = (np.asarray(base) & ~(ratio > rt)).reshape(4, 4).copy()
    e2[:2, 2:] = False                   # pre cell (0, 1) upsampled block
    if not e2.any():
        e2.flat[0] = True
    np.testing.assert_array_equal(g2, e2)


def test_rd_gate_coarse_distance(rng):
    """rd drops matches whose coarse best/second-best targets are far apart
    in grid-normalized coordinates (reference cascade_matching.py:216-231)."""
    ws, _ = _rand_ws(rng, L0=16, Kw=8, track_second=False)
    # coarse 2x2 grid: cell 0's second-best is the far corner (distance
    # sqrt(0.5^2+0.5^2) ~ 0.707), others match their best (distance 0)
    idx8 = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    idx8_s = jnp.asarray([[3, 1, 2, 3]], jnp.int32)
    base = cm.cascade_match_mask_test(
        ws, (4, 4), (8, 8), test_thr=-1.0, bd=0, pre_confs=[], pre_hws=[],
        pre_thrs=[], post_method=None, post_window=None, double_check=False)
    gated = cm.cascade_match_mask_test(
        ws, (4, 4), (8, 8), test_thr=-1.0, bd=0, pre_confs=[], pre_hws=[],
        pre_thrs=[], post_method=None, post_window=None, double_check=False,
        rd=0.5, rd_coarse=(idx8, idx8_s, (2, 2)))
    g = np.asarray(gated).reshape(4, 4)
    e = np.asarray(base).reshape(4, 4).copy()
    e[:2, :2] = False                    # coarse cell 0's upsampled block
    if not e.any():
        e.flat[0] = True
    np.testing.assert_array_equal(g, e)


def test_softargmax_nms_numpy_oracle(rng):
    """softargmax_nms_mask vs an independent per-window numpy re-derivation
    (reference post_processing.py:93-110 / kornia ConvSoftArgmax2d: every
    stride-1 window votes for its softmax-expected position over the
    zero-padded window; kept positions are the voted-for cells)."""
    h, w, win, T = 8, 10, 3, 0.7
    conf = rng.random((2, h * w)).astype(np.float32)
    got = np.asarray(nms.softargmax_nms_mask(
        jnp.asarray(conf), (h, w), win, temperature=T))

    pad = win // 2
    want = np.zeros((2, h, w), bool)
    for b in range(2):
        c2 = conf[b].reshape(h, w)
        cp = np.zeros((h + 2 * pad, w + 2 * pad), np.float32)
        cp[pad:pad + h, pad:pad + w] = c2
        for y in range(h):
            for x in range(w):
                vals = cp[y:y + win, x:x + win].reshape(-1) / T
                p = np.exp(vals - vals.max())
                p = p / p.sum()
                oy, ox = np.mgrid[0:win, 0:win]
                ey = (p * (y + oy.reshape(-1) - pad)).sum()
                ex = (p * (x + ox.reshape(-1) - pad)).sum()
                ty = int(np.clip(np.round(ey), 0, h - 1))
                tx = int(np.clip(np.round(ex), 0, w - 1))
                want[b, ty, tx] = True
    np.testing.assert_array_equal(got, want.reshape(2, -1))


def test_softargmax_nms_tiled_stride(rng):
    """stride == window_size: one vote per non-overlapping tile, in global
    coordinates."""
    h, w, win = 6, 6, 3
    conf = rng.random((1, h * w)).astype(np.float32)
    got = np.asarray(nms.softargmax_nms_mask(
        jnp.asarray(conf), (h, w), win, temperature=1.0, stride=win))
    assert got.sum() <= (h // win) * (w // win)
    c2 = conf[0].reshape(h, w)
    want = np.zeros((h, w), bool)
    for ty0 in range(0, h, win):
        for tx0 in range(0, w, win):
            tile = c2[ty0:ty0 + win, tx0:tx0 + win].reshape(-1)
            p = np.exp(tile - tile.max()); p /= p.sum()
            oy, ox = np.mgrid[0:win, 0:win]
            ey = (p * (ty0 + oy.reshape(-1))).sum()
            ex = (p * (tx0 + ox.reshape(-1))).sum()
            want[int(round(ey)), int(round(ex))] = True
    np.testing.assert_array_equal(got[0], want.reshape(-1))


def test_softargmax_nms_dispatch_and_thr(rng):
    """post_process_mask dispatch: softargmax votes AND the conf threshold."""
    h = w = 6
    conf = rng.random((1, h * w)).astype(np.float32)
    m = np.asarray(nms.post_process_mask(
        "softargmax_nms", jnp.asarray(conf), (h, w), test_thr=0.5,
        window=3, temperature=1.0))
    assert not np.any(m & (conf <= 0.5))


def test_softargmax_nms_tiled_nondivisible_grid(rng):
    """stride == window on a grid NOT divisible by the window: partial
    border tiles are dropped (a stride=window, padding=0 conv's semantics),
    not a reshape crash — e.g. the 176x176 4c grid with window 5."""
    h, w, win = 7, 8, 3
    conf = rng.random((1, h * w)).astype(np.float32)
    got = np.asarray(nms.softargmax_nms_mask(
        jnp.asarray(conf), (h, w), win, temperature=1.0, stride=win))
    assert got.shape == (1, h * w)
    assert 0 < got.sum() <= (h // win) * (w // win)
