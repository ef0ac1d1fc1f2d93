"""Headless map / trajectory visualization.

Parity target: the reference's Pangolin Viewer/MapDrawer/FrameDrawer
(SURVEY L8 — optional GL thread drawing map points, keyframes, the
covisibility graph and the tracked-feature overlay).  A TPU deployment is
headless, so the equivalent is artifact export: matplotlib snapshots of
the map + trajectory and per-frame tracked-feature overlays, callable at
any time from the host loop.
"""

from __future__ import annotations

import numpy as np


def plot_map(system, path: str, title: str = "orbslam3_tpu map"):
    """Top-down + 3D view of map points, keyframes and trajectory."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    m = system.map
    pts = np.asarray(m.pt_xyz)[np.asarray(m.pt_valid)]
    kf_mask = np.asarray(m.kf_valid)
    kf_R = np.asarray(m.kf_R)[kf_mask]
    kf_t = np.asarray(m.kf_t)[kf_mask]
    centers = np.einsum("kji,kj->ki", kf_R, -kf_t)
    traj = np.stack([p[2] for p in system.trajectory]) \
        if system.trajectory else np.zeros((0, 3))

    fig = plt.figure(figsize=(12, 5))
    ax = fig.add_subplot(1, 2, 1)
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 2], s=1, c="#888888", label="points")
    if len(traj):
        ax.plot(traj[:, 0], traj[:, 2], "-", c="#d62728", lw=1.5,
                label="trajectory")
    if len(centers):
        ax.scatter(centers[:, 0], centers[:, 2], s=14, c="#1f77b4",
                   marker="s", label="keyframes")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_title(f"{title} (top view)")
    ax.axis("equal")
    ax.legend(loc="best", fontsize=8)

    ax3 = fig.add_subplot(1, 2, 2, projection="3d")
    if len(pts):
        ax3.scatter(pts[:, 0], pts[:, 2], pts[:, 1], s=1, c="#888888")
    if len(traj):
        ax3.plot(traj[:, 0], traj[:, 2], traj[:, 1], "-", c="#d62728")
    ax3.set_title("3D")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_frame(img: np.ndarray, ff, kp_pt, path: str):
    """Tracked-feature overlay (reference FrameDrawer::DrawFrame):
    green = keypoint bound to a map point, blue = unbound keypoint."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    valid = np.asarray(ff.valid)
    xy = np.asarray(ff.xy)
    bound = np.asarray(kp_pt) >= 0
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.imshow(np.asarray(img), cmap="gray", vmin=0, vmax=255)
    ax.scatter(xy[valid & ~bound, 0], xy[valid & ~bound, 1], s=6,
               facecolors="none", edgecolors="#1f77b4", lw=0.8)
    ax.scatter(xy[valid & bound, 0], xy[valid & bound, 1], s=6,
               facecolors="none", edgecolors="#2ca02c", lw=0.8)
    ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
