"""Rank-zero logging + TensorBoard scalars/figures (reference:
src/utils/misc.py:34-43 rank-zero loguru; lightning_cascade.py:230-257
TensorBoardLogger usage)."""

from __future__ import annotations

import logging
import os
import sys
from typing import Dict, Optional

from casmtr_tpu.parallel.comm import is_main_process

_configured = set()


def get_logger(name: str = "casmtr_tpu") -> logging.Logger:
    """Rank-zero-only logger (non-main processes log at ERROR only).
    Configured once PER NAME (a single cached instance would hand every
    caller the first name ever requested)."""
    lg = logging.getLogger(name)
    if name not in _configured:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(name)s: %(message)s"))
        lg.addHandler(handler)
        lg.setLevel(logging.INFO if is_main_process() else logging.ERROR)
        _configured.add(name)
    return lg


class TensorBoardWriter:
    """Thin tf.summary wrapper; silently no-ops if TF is unavailable or on
    non-main processes."""

    def __init__(self, log_dir: str):
        self._writer = None
        if not is_main_process():
            return
        try:
            import tensorflow as tf
            self._tf = tf
            self._writer = tf.summary.create_file_writer(log_dir)
        except ImportError:  # pragma: no cover
            get_logger().warning("tensorflow unavailable; TB logging disabled")

    def scalars(self, tag_values: Dict[str, float], step: int):
        if self._writer is None:
            return
        with self._writer.as_default():
            for k, v in tag_values.items():
                self._tf.summary.scalar(k, float(v), step=step)

    def figure(self, tag: str, fig, step: int):
        if self._writer is None:
            return
        import io
        import numpy as np
        buf = io.BytesIO()
        fig.savefig(buf, format="png", bbox_inches="tight")
        buf.seek(0)
        img = self._tf.image.decode_png(buf.getvalue(), channels=4)
        with self._writer.as_default():
            self._tf.summary.image(tag, img[None], step=step)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()
