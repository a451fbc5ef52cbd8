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
