"""Production serving API: a precompiled, fixed-bucket, batched matcher.

The reference ships only a demo script (reference test_single_pair.py:26-104)
that retraces per image geometry. For serving on TPU the compile is the
expensive resource (a 704^2+ graph is a multi-minute remote compile), so this
module fixes the geometry up front:

- every image is resized so its LONG side fits a fixed square ``bucket``
  canvas, padded bottom-right, and masked (the model's border masks ignore
  the padding; ops/matching.py:116-139);
- the forward is jitted ONCE per (bucket, batch) and reused for every call —
  arbitrary input sizes and aspect ratios never retrace;
- keypoints come back in ORIGINAL image pixel coordinates (the matching ops
  apply the resize factors on device; ops/matching.py:169-170);
- ``match_batch`` packs B pairs into one forward; NOTE measured on v5e
  (BASELINE.md): per-chip throughput is HIGHEST at batch 1 (4.77 pairs/s
  vs 3.95 at b4 — the candidate gathers scale superlinearly with batch),
  so scale serving with batch-1 data-parallel replicas over the mesh and
  reserve match_batch for latency-insensitive multi-pair requests.

Checkpoints: pass an orbax directory or a released torch ``.ckpt`` (converted
in memory, utils/convert.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from casmtr_tpu.config import Config, override
from casmtr_tpu.configs import build_config
from casmtr_tpu.models import build_model

ImageLike = Union[str, np.ndarray]


class MatchResult(NamedTuple):
    """Matches for one pair, in original image pixel coordinates."""
    mkpts0: np.ndarray  # [N, 2] (x, y) in image0
    mkpts1: np.ndarray  # [N, 2] (x, y) in image1
    mconf: np.ndarray   # [N]


def _to_rgb_array(img: ImageLike) -> np.ndarray:
    """Accepts a path or an array: [H, W] gray, [H, W, 3] RGB, or [H, W, 4]
    RGBA (alpha dropped); uint8 in [0, 255] or float (rescaled if it looks
    like a 0-255 range)."""
    if isinstance(img, str):
        from casmtr_tpu.data.io import _imread
        return _imread(img, gray=False).astype(np.float32) / 255.0
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    elif arr.ndim == 3 and arr.shape[2] == 4:
        arr = arr[:, :, :3]
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected [H,W], [H,W,3] or [H,W,4], got {arr.shape}")
    if arr.dtype == np.uint8:
        return arr.astype(np.float32) / 255.0
    arr = arr.astype(np.float32)
    if arr.max(initial=0.0) > 1.5:  # float image still on the 0-255 scale
        arr = arr / 255.0
    return arr


class Matcher:
    """Precompiled image matcher at a fixed canvas size.

    Example::

        m = Matcher("outdoor_casmtr_4c", ckpt="CasMTR-4c.ckpt", bucket=832)
        res = m.match("a.jpg", "b.jpg")          # MatchResult
        results = m.match_batch([("a.jpg", "b.jpg"), (img2, img3)])

    Parameters
    ----------
    model: recipe name (casmtr_tpu.configs.MODEL_RECIPES) or a built Config.
    ckpt: orbax checkpoint dir or torch .ckpt/.pth (converted in memory).
    bucket: square canvas side; every input is resized (long side) + padded
        to this. One compile per distinct (bucket, batch size).
    df: size divisor for the resize (backbone stride alignment).
    thr: confidence threshold applied host-side to the returned matches.
    overrides: optional config override dict (applied last).
    mesh: optional ``jax.sharding.Mesh`` with a 'data' axis — batches are
        sharded over it (data-parallel serving: B pairs spread across chips
        in ONE jitted forward, GSPMD inserts the collectives). B must be a
        multiple of the mesh size.
    """

    def __init__(self, model: Union[str, Config] = "outdoor_casmtr_4c",
                 ckpt: Optional[str] = None, bucket: int = 832, df: int = 64,
                 thr: float = 0.2, overrides: Optional[Dict] = None,
                 rng_seed: int = 0, mesh=None):
        cfg = build_config(model) if isinstance(model, str) else model
        if overrides:
            cfg = override(cfg, overrides)
        self.cfg = cfg
        self.bucket = int(bucket)
        self.df = int(df)
        if self.bucket < self.df or self.bucket % self.df != 0:
            raise ValueError(f"bucket {bucket} must be a multiple of df {df}")
        self.thr = float(thr)
        self._model = build_model(cfg.loftr)
        # per-batch-size applies: the fixed match capacity is GLOBAL across
        # the flattened batch (ops/matching.py:162), so a B-pair forward
        # scales every capacity by B. Per-pair results equal B=1 as long as
        # no single pair saturates the config's max_matches (see match_batch
        # docstring). Params are capacity-independent: one weight set serves
        # every batch size.
        self._applies: Dict[int, Any] = {}

        init_batch = {
            "image0": jnp.zeros((1, self.bucket, self.bucket, 3), jnp.float32),
            "image1": jnp.zeros((1, self.bucket, self.bucket, 3), jnp.float32),
        }
        # jit the init: one compiled graph (persistently cached) instead of
        # dispatching the whole bucket-resolution forward op by op
        variables = jax.jit(
            lambda rng: self._model.init(rng, init_batch, train=False)
        )(jax.random.PRNGKey(rng_seed))
        if ckpt:
            variables = self._load_ckpt(ckpt, variables)
        self.mesh = mesh
        if mesh is not None:
            from casmtr_tpu.parallel.mesh import replicate_state
            variables = replicate_state(variables, mesh)
        self.variables = variables

    def _get_apply(self, B: int):
        """Jitted eval forward with match capacities scaled by B.

        Mesh mode runs the forward under ``shard_map`` so each replica's
        B/n pairs are processed FULLY locally.  Plain GSPMD sharding of the
        batch axis is NOT replica-parallel here: match selection is a
        global top-(B*M) across the batch, so the partitioner inserts
        hundreds of all-to-all/all-gather resharding collectives (counted
        on the compiled 8-replica module).  Under shard_map the selection
        is per-replica (== the B/n-pair single-device behavior) and the
        compiled module is collective-free; local b_ids are offset by
        ``axis_index * (B/n)`` to stay globally meaningful."""
        if B not in self._applies:
            lcfg = self.cfg.loftr
            n = self.mesh.size if self.mesh is not None else 1
            Bl = B // n  # pairs per replica (match_batch checks B % n == 0)
            if Bl == 1:
                model = self._model
            else:
                scaled = override(self.cfg, {"loftr": {
                    "match_coarse": {
                        "max_matches": lcfg.match_coarse.max_matches * Bl},
                    "match_cascade": {
                        "max_matches": tuple(
                            m * Bl for m in lcfg.match_cascade.max_matches)},
                }})
                model = build_model(scaled.loftr)
            if self.mesh is None:
                self._applies[B] = jax.jit(
                    lambda v, b: self._strip(model.apply(v, b, train=False)))
            else:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                def local_fwd(v, b):
                    out = Matcher._strip(model.apply(v, b, train=False))
                    off = jax.lax.axis_index("data") * Bl
                    out["b_ids"] = out["b_ids"] + off
                    return jax.tree_util.tree_map(lambda x: x[None], out)

                sm = shard_map(local_fwd, mesh=self.mesh,
                               in_specs=(P(), P("data")),
                               out_specs=P("data"))
                self._applies[B] = jax.jit(
                    lambda v, b: jax.tree_util.tree_map(
                        lambda x: x.reshape((-1,) + x.shape[2:]), sm(v, b)))
        return self._applies[B]

    @staticmethod
    def _strip(out):
        fm = out.final_matches
        return {"b_ids": fm.b_ids, "mkpts0": fm.mkpts0, "mkpts1": fm.mkpts1,
                "mconf": fm.mconf, "valid": fm.valid}

    def _load_ckpt(self, ckpt: str, variables):
        from casmtr_tpu.train.checkpoints import load_checkpoint_variables
        return load_checkpoint_variables(ckpt, variables)

    # ---- preprocessing -------------------------------------------------

    def _preprocess(self, img: ImageLike):
        """Resize long side into the bucket (df-divisible), pad bottom-right.
        Returns (canvas [S,S,3], mask [S,S] bool, scale [2] orig-px/model-px).
        """
        from casmtr_tpu.data.io import get_divisible_wh

        arr = _to_rgb_array(img)
        h, w = arr.shape[:2]
        s = self.bucket / max(h, w)
        # df-divisible floor keeps the resized image inside the bucket
        w_new, h_new = get_divisible_wh(int(round(w * s)), int(round(h * s)),
                                        self.df)
        w_new, h_new = max(self.df, w_new), max(self.df, h_new)
        if (h_new, w_new) != (h, w):
            import cv2
            arr = cv2.resize(arr, (w_new, h_new))
        S = self.bucket
        canvas = np.zeros((S, S, 3), np.float32)
        canvas[:h_new, :w_new] = arr
        mask = np.zeros((S, S), bool)
        mask[:h_new, :w_new] = True
        scale = np.array([w / w_new, h / h_new], np.float32)
        return canvas, mask, scale

    def _pack(self, pairs: Sequence[Tuple[ImageLike, ImageLike]]):
        b0, b1, m0, m1, s0, s1 = [], [], [], [], [], []
        for img0, img1 in pairs:
            c0, k0, sc0 = self._preprocess(img0)
            c1, k1, sc1 = self._preprocess(img1)
            b0.append(c0); b1.append(c1)
            m0.append(k0); m1.append(k1)
            s0.append(sc0); s1.append(sc1)
        # numpy until placement: mesh serving device_puts exactly once
        return {
            "image0": np.stack(b0), "image1": np.stack(b1),
            "mask0": np.stack(m0), "mask1": np.stack(m1),
            "scale0": np.stack(s0), "scale1": np.stack(s1),
        }

    # ---- matching ------------------------------------------------------

    def match(self, img0: ImageLike, img1: ImageLike) -> MatchResult:
        """Match one pair. Any input sizes; one compile per Matcher."""
        return self.match_batch([(img0, img1)])[0]

    def match_batch(self, pairs: Sequence[Tuple[ImageLike, ImageLike]]
                    ) -> List[MatchResult]:
        """Match B pairs in ONE forward. Each distinct B compiles once;
        keep B fixed in a serving loop (pad with a repeated pair if needed).

        Capacity note: selection is global top-(B*M) by confidence across
        the batch (matching the training semantics); per-pair counts equal
        the B=1 behavior whenever per-pair match counts stay below the
        config's ``max_matches`` — size that config field for your scenes.
        """
        if not pairs:
            return []
        batch = self._pack(pairs)
        if self.mesh is not None:
            from casmtr_tpu.parallel.mesh import shard_batch
            if len(pairs) % self.mesh.size != 0:
                raise ValueError(
                    f"batch {len(pairs)} not divisible by mesh size "
                    f"{self.mesh.size}")
            batch = shard_batch(batch, self.mesh)
        out = self._get_apply(len(pairs))(self.variables, batch)
        out = {k: np.asarray(v) for k, v in out.items()}
        keep = out["valid"] & (out["mconf"] >= self.thr)
        results = []
        for b in range(len(pairs)):
            sel = keep & (out["b_ids"] == b)
            results.append(MatchResult(out["mkpts0"][sel],
                                       out["mkpts1"][sel],
                                       out["mconf"][sel]))
        return results

    def warmup(self, batch_sizes: Sequence[int] = (1,)) -> None:
        """Pay the compiles up front (serving cold-start control): run one
        dummy batch per batch size. Under mesh serving, each size is rounded
        up to the next mesh-size multiple (the only sizes that can run)."""
        dummy = np.zeros((self.bucket // 2, self.bucket // 2, 3), np.float32)
        for bs in batch_sizes:
            if self.mesh is not None:
                bs = -(-bs // self.mesh.size) * self.mesh.size
            self.match_batch([(dummy, dummy)] * bs)
