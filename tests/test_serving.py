"""Serving API tests: fixed-bucket preprocessing never retraces across input
sizes, outputs come back in original pixel coords, and a B-pair batched
forward reproduces the single-pair results (capacities scale with B)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _tiny_overrides():
    return {
        "loftr": {
            "backbone": {"backbone_type": "ResNetFPN", "initial_dim": 8,
                         "block_dims": [8, 12, 16]},
            "coarse": {"d_model": 16, "nhead": 2, "topks": [4, 4, 4],
                       "layer_names": ["self", "cross"]},
            "coarse2": {"d_model": 12, "nhead": 2, "window_size": 3,
                        "attn_window_size": 3,
                        "layer_names": ["cross", "self", "cross"]},
            "fine": {"d_model": 8, "nhead": 2},
            # capacity > number of coarse rows (64 at bucket 64): selection
            # never binds, so batched and single-pair results must coincide
            "match_coarse": {"max_matches": 128, "thr": 0.0,
                             "border_rm": 0},
            "match_cascade": {"max_matches": [128]},
        },
    }


def _img(rng, h, w):
    return (rng.random((h, w, 3)) * 255).astype(np.uint8)


@pytest.fixture(scope="module")
def matcher():
    from casmtr_tpu.serving import Matcher
    return Matcher("outdoor_casmtr_4c", bucket=64, df=32, thr=0.0,
                   overrides=_tiny_overrides())


def test_match_returns_original_coords_and_one_compile(matcher):
    rng = np.random.default_rng(0)
    res = matcher.match(_img(rng, 48, 40), _img(rng, 56, 64))
    assert res.mkpts0.shape[1] == 2 and len(res.mkpts0) == len(res.mconf)
    assert len(res.mkpts0) > 0
    assert res.mkpts0[:, 0].max() <= 40 and res.mkpts0[:, 1].max() <= 48
    assert res.mkpts1[:, 0].max() <= 64 and res.mkpts1[:, 1].max() <= 56

    # wildly different input geometry -> identical packed shapes, so the
    # jitted graph is reused rather than retraced
    pack_a = matcher._pack([(_img(rng, 48, 40), _img(rng, 56, 64))])
    pack_b = matcher._pack([(_img(rng, 100, 30), _img(rng, 33, 77))])
    assert {k: v.shape for k, v in pack_a.items()} == \
           {k: v.shape for k, v in pack_b.items()}
    matcher.match(_img(rng, 100, 30), _img(rng, 33, 77))
    apply = matcher._get_apply(1)
    if hasattr(apply, "_cache_size"):  # jax-internal, best-effort
        assert apply._cache_size() == 1


def test_batched_matches_equal_single(matcher):
    rng = np.random.default_rng(1)
    pair_a = (_img(rng, 48, 40), _img(rng, 56, 64))
    pair_b = (_img(rng, 64, 64), _img(rng, 40, 48))

    singles = [matcher.match(*pair_a), matcher.match(*pair_b)]
    batched = matcher.match_batch([pair_a, pair_b])

    for s, b in zip(singles, batched):
        assert len(s.mkpts0) == len(b.mkpts0)
        # same match set regardless of selection order
        order_s = np.lexsort(s.mkpts0.T)
        order_b = np.lexsort(b.mkpts0.T)
        np.testing.assert_allclose(s.mkpts0[order_s], b.mkpts0[order_b],
                                   atol=1e-4)
        np.testing.assert_allclose(s.mkpts1[order_s], b.mkpts1[order_b],
                                   atol=1e-4)
        np.testing.assert_allclose(s.mconf[order_s], b.mconf[order_b],
                                   atol=1e-5)


def test_mesh_sharded_serving_matches_single_device(matcher):
    """B=8 pairs sharded over the 8-device mesh reproduce the unsharded
    results (data-parallel serving)."""
    from casmtr_tpu.parallel.mesh import make_mesh
    from casmtr_tpu.serving import Matcher

    rng = np.random.default_rng(3)
    pairs = [(_img(rng, 48, 40), _img(rng, 56, 64)) for _ in range(8)]

    sharded = Matcher("outdoor_casmtr_4c", bucket=64, df=32, thr=0.0,
                      overrides=_tiny_overrides(), mesh=make_mesh(8))
    sharded.variables = matcher.variables  # same weights
    with pytest.raises(ValueError):
        sharded.match_batch(pairs[:3])

    res_s = sharded.match_batch(pairs)
    res_u = matcher.match_batch(pairs)
    for s, u in zip(res_s, res_u):
        assert len(s.mkpts0) == len(u.mkpts0)
        order_s = np.lexsort(s.mkpts0.T)
        order_u = np.lexsort(u.mkpts0.T)
        np.testing.assert_allclose(s.mkpts0[order_s], u.mkpts0[order_u],
                                   atol=1e-4)
        np.testing.assert_allclose(s.mconf[order_s], u.mconf[order_u],
                                   atol=1e-5)

    # 2 pairs per replica (B=16 on 8 devices): exercises the scaled-capacity
    # local model AND the axis_index b_ids offset — pair k must reproduce
    # pair k's single-device matches, not its replica-neighbor's
    pairs16 = pairs + [(p1, p0) for (p0, p1) in pairs]
    res_s16 = sharded.match_batch(pairs16)
    res_u16 = matcher.match_batch(pairs16)
    for s, u in zip(res_s16, res_u16):
        assert len(s.mkpts0) == len(u.mkpts0)
        order_s = np.lexsort(s.mkpts0.T)
        order_u = np.lexsort(u.mkpts0.T)
        np.testing.assert_allclose(s.mkpts0[order_s], u.mkpts0[order_u],
                                   atol=1e-4)


def test_empty_and_threshold(matcher):
    assert matcher.match_batch([]) == []
    rng = np.random.default_rng(2)
    matcher_hi = type(matcher).__new__(type(matcher))
    matcher_hi.__dict__.update(matcher.__dict__)
    matcher_hi.thr = 2.0  # impossible threshold -> zero matches, no crash
    res = matcher_hi.match(_img(rng, 48, 40), _img(rng, 56, 64))
    assert len(res.mkpts0) == 0
