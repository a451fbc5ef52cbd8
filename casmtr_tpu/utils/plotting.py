"""Match visualization (reference: src/utils/plotting.py:21-157): side-by-side
pair figure with match lines colored by epipolar error or confidence, with
dynamic alpha and precision/recall text overlay."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt


def error_colormap(err: np.ndarray, thr: float, alpha: float = 1.0):
    """Green (correct) -> red (wrong) per-match colors
    (reference plotting.py:8-16)."""
    x = 1 - np.clip(err / (thr * 2), 0, 1)
    return np.clip(np.stack([2 - x * 2, x * 2, np.zeros_like(x),
                             np.ones_like(x) * alpha], -1), 0, 1)


def dynamic_alpha(n_matches: int,
                  milestones=(0, 300, 1000, 2000),
                  alphas=(1.0, 0.8, 0.4, 0.2)) -> float:
    """Fade lines as match count grows (reference plotting.py:110-130)."""
    if n_matches == 0:
        return 1.0
    ranges = list(zip(alphas, alphas[1:] + (alphas[-1],)))
    la, next_milestone = 1.0, None
    for (m0, m1), (a0, a1) in zip(zip(milestones, milestones[1:] + (None,)),
                                  ranges):
        if m1 is None or n_matches < m1:
            if m1 is None:
                return a0
            t = (n_matches - m0) / (m1 - m0)
            return a0 + t * (a1 - a0)
    return alphas[-1]


def make_matching_figure(img0: np.ndarray, img1: np.ndarray,
                         mkpts0: np.ndarray, mkpts1: np.ndarray,
                         color: np.ndarray, text=(), dpi: int = 75,
                         path: Optional[str] = None):
    """Side-by-side match figure (reference plotting.py:21-67).
    img: [H, W] or [H, W, 3] in [0, 1]."""
    fig, axes = plt.subplots(1, 2, figsize=(10, 6), dpi=dpi)
    for ax, img in zip(axes, (img0, img1)):
        ax.imshow(img, cmap="gray" if img.ndim == 2 else None)
        ax.get_yaxis().set_ticks([])
        ax.get_xaxis().set_ticks([])
    plt.tight_layout(pad=1)

    if len(mkpts0) > 0:
        fig.canvas.draw()
        tf = fig.transFigure.inverted()
        f0 = tf.transform(axes[0].transData.transform(mkpts0))
        f1 = tf.transform(axes[1].transData.transform(mkpts1))
        fig.lines = [matplotlib.lines.Line2D(
            (f0[i, 0], f1[i, 0]), (f0[i, 1], f1[i, 1]),
            transform=fig.transFigure, c=color[i], linewidth=1)
            for i in range(len(mkpts0))]
        axes[0].scatter(mkpts0[:, 0], mkpts0[:, 1], c=color, s=4)
        axes[1].scatter(mkpts1[:, 0], mkpts1[:, 1], c=color, s=4)

    # white text on dark images (reference plotting.py:57; its 0-255
    # threshold of 200 is 200/255 on our [0, 1] images)
    txt_color = "k" if np.asarray(img0)[:100, :200].mean() > 200 / 255 else "w"
    fig.text(0.01, 0.99, "\n".join(text), transform=fig.axes[0].transAxes,
             fontsize=15, va="top", ha="left", color=txt_color)
    if path:
        plt.savefig(path, bbox_inches="tight", pad_inches=0)
        plt.close(fig)
        return None
    return fig


def make_evaluation_figure(img0, img1, mkpts0, mkpts1, epi_errs, epi_err_thr,
                           path: Optional[str] = None):
    """Evaluation-mode figure with precision overlay
    (reference plotting.py:70-107)."""
    alpha = dynamic_alpha(len(mkpts0))
    correct = epi_errs < epi_err_thr
    precision = float(np.mean(correct)) if len(correct) else 0.0
    color = error_colormap(epi_errs, epi_err_thr, alpha)
    text = [f"#Matches {len(mkpts0)}",
            f"Precision({epi_err_thr:.2e}) ({100 * precision:.1f}%): "
            f"{int(correct.sum())}/{len(mkpts0)}"]
    return make_matching_figure(img0, img1, mkpts0, mkpts1, color, text,
                                path=path)
