"""Debug visualization.

Reproduces the reference's human-in-the-loop checks
(reference: scripts/optimize.py:28-74 `viz` — thresholded render vs mask
symmetric difference with 2D joint scatter; scripts/utils.py:148-179
`render_batch` — joints over images; scripts/create_smpl_gt.py:599-634
pointcloud viz — matplotlib 3D scatter suffices per SURVEY §2b).

Matplotlib-only, headless (Agg); everything writes PNG files.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def save_silhouette_comparison(
    render: np.ndarray,  # (B, S, S) soft silhouette
    mask: np.ndarray,  # (B, S, S) target
    out_dir: str,
    joints_2d: Optional[np.ndarray] = None,  # (B, J, 2)
    name: str = "silhouette",
    render_threshold: float = 0.5,
    mask_threshold: float = 0.8,
) -> None:
    """Symmetric-difference view, as the reference's `viz`
    (reference: scripts/optimize.py:35-48: binarize both, show where they
    disagree, scatter joints)."""
    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    r = (np.asarray(render) > render_threshold).astype(np.float32)
    m = (np.asarray(mask) > mask_threshold).astype(np.float32)
    diff = np.abs(r - m)
    for i in range(r.shape[0]):
        fig, axes = plt.subplots(1, 3, figsize=(9, 3))
        for ax, img, title in zip(axes, (r[i], m[i], diff[i]), ("render", "mask", "xor")):
            ax.imshow(img, cmap="gray")
            ax.set_title(title)
            ax.axis("off")
        if joints_2d is not None:
            axes[0].scatter(joints_2d[i, :, 0], joints_2d[i, :, 1], s=8, c="g")
        fig.savefig(os.path.join(out_dir, f"{i:03d}_{name}.png"), dpi=150)
        plt.close(fig)


def save_joints_overlay(
    image: np.ndarray,  # (B, 3, H, W) in [0, 1]
    joint_sets: Sequence[np.ndarray],  # list of (B, J, 2)
    out_dir: str,
    name: str = "joints",
    colors: Sequence[str] = ("r", "g", "b"),
) -> None:
    """2D joints over crops (reference: scripts/utils.py:148-179)."""
    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    imgs = np.transpose(np.asarray(image), (0, 2, 3, 1))
    for i in range(imgs.shape[0]):
        fig, ax = plt.subplots(figsize=(4, 4))
        ax.imshow(np.clip(imgs[i], 0, 1))
        for js, c in zip(joint_sets, colors):
            ax.scatter(js[i, :, 0], js[i, :, 1], s=8, c=c)
        ax.axis("off")
        fig.savefig(os.path.join(out_dir, f"{i:03d}_{name}.png"), dpi=150)
        plt.close(fig)


def save_pointcloud(
    points: np.ndarray,  # (N, 3)
    path: str,
    gt_points: Optional[np.ndarray] = None,
) -> None:
    """3D scatter (reference: scripts/create_smpl_gt.py:599-634)."""
    plt = _plt()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(projection="3d")
    p = np.asarray(points)
    ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=2, alpha=0.5)
    if gt_points is not None:
        g = np.asarray(gt_points)
        ax.scatter(g[:, 0], g[:, 1], g[:, 2], s=20, c="r", marker="x")
    fig.savefig(path, dpi=150)
    plt.close(fig)
