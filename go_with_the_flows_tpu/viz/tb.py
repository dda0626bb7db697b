"""TensorBoard reconstruction figures.

Behavior port of `lib/visualization/utils.py:41-61`: 2-D scatter of ground
truth vs reconstruction, points colored by mixture-component label, after a
fixed 3-D rotation (25, 135, 0) so shapes are recognizable in 2-D.
"""

from __future__ import annotations

import numpy as np

_PALETTE = np.array([
    [0.35, 0.35, 0.35],   # label 0 (unlabeled / GT)
    [0.894, 0.102, 0.110],
    [0.216, 0.494, 0.722],
    [0.302, 0.686, 0.290],
    [0.596, 0.306, 0.639],
    [1.000, 0.498, 0.000],
    [0.651, 0.337, 0.157],
], dtype=np.float32)


def _rotate(points: np.ndarray, angles=(25.0, 135.0, 0.0)) -> np.ndarray:
    """Apply the fixed viewing rotation; points are (3, N)."""
    from scipy.spatial.transform import Rotation

    rot = Rotation.from_euler("xyz", angles, degrees=True)
    return rot.apply(points.T).T


def _scatter_figure(gt, recon, labels):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(8, 4))
    for ax, (cloud, lab, title) in zip(
        axes,
        [(gt, np.zeros(gt.shape[1]), "ground truth"),
         (recon, labels, "reconstruction")],
    ):
        pts = _rotate(np.asarray(cloud))
        colors = _PALETTE[np.asarray(lab).astype(int) % len(_PALETTE)]
        ax.scatter(pts[0], pts[1], s=2.0, c=colors)
        ax.set_title(title)
        ax.set_aspect("equal")
        ax.axis("off")
    fig.tight_layout()
    return fig


def add_figures_reconstruction_tb(
    gts, samples, labels, writer, epoch: int, max_figures: int = 4
):
    """Log GT-vs-reconstruction scatter figures
    (reference visualization/utils.py:41-51)."""
    import matplotlib.pyplot as plt

    n = min(len(gts), max_figures)
    for i in range(n):
        fig = _scatter_figure(gts[i], samples[i], labels[i])
        writer.add_figure(f"reconstruction/{i}", fig, epoch)
        plt.close(fig)


def add_svr_reconstruction_tb(
    images, gts, samples, labels, writer, epoch: int, max_figures: int = 4
):
    """Log SVR figures including the conditioning image
    (reference visualization/utils.py:52-61). Images are (H, W, C)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = min(len(gts), max_figures)
    for i in range(n):
        fig, axes = plt.subplots(1, 3, figsize=(12, 4))
        img = np.asarray(images[i])
        rgb = img[..., 1:4] if img.shape[-1] >= 4 else img[..., :3]
        axes[0].imshow(np.clip(rgb, 0, 1))
        axes[0].set_title("input image")
        axes[0].axis("off")
        for ax, (cloud, lab, title) in zip(
            axes[1:],
            [(gts[i], np.zeros(gts[i].shape[1]), "ground truth"),
             (samples[i], labels[i], "reconstruction")],
        ):
            pts = _rotate(np.asarray(cloud))
            colors = _PALETTE[np.asarray(lab).astype(int) % len(_PALETTE)]
            ax.scatter(pts[0], pts[1], s=2.0, c=colors)
            ax.set_title(title)
            ax.set_aspect("equal")
            ax.axis("off")
        fig.tight_layout()
        writer.add_figure(f"svr_reconstruction/{i}", fig, epoch)
        plt.close(fig)
