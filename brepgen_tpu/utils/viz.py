"""Visualization helpers (parity with reference ``utils.py:121-145``
``plot_3d_bbox`` plus wireframe/solid debug plots). Matplotlib is imported
lazily so headless/minimal environments never pay for it."""

from __future__ import annotations

import numpy as np


def plot_3d_bbox(ax, min_corner, max_corner, color="r"):
    """Draw an axis-aligned box wireframe on a 3D axes."""
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    mn, mx = np.asarray(min_corner), np.asarray(max_corner)
    v = np.array([
        [mn[0], mn[1], mn[2]], [mx[0], mn[1], mn[2]],
        [mx[0], mx[1], mn[2]], [mn[0], mx[1], mn[2]],
        [mn[0], mn[1], mx[2]], [mx[0], mn[1], mx[2]],
        [mx[0], mx[1], mx[2]], [mn[0], mx[1], mx[2]],
    ])
    faces = [
        [v[0], v[1], v[2], v[3]], [v[4], v[5], v[6], v[7]],
        [v[0], v[1], v[5], v[4]], [v[2], v[3], v[7], v[6]],
        [v[1], v[2], v[6], v[5]], [v[4], v[7], v[3], v[0]],
    ]
    ax.add_collection3d(
        Poly3DCollection(faces, facecolors="blue", linewidths=1, edgecolors=color, alpha=0)
    )


def plot_sample(sample: dict, batch_idx: int, path: str) -> None:
    """Render one cascade output's face bboxes + edge curves to a PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    surf_mask = np.asarray(sample["surf_mask"][batch_idx])
    surf_pos = np.asarray(sample["surf_pos"][batch_idx])
    for bbox, masked in zip(surf_pos, surf_mask):
        if not masked:
            plot_3d_bbox(ax, bbox[:3], bbox[3:])
    ax.set_xlim(-1, 1), ax.set_ylim(-1, 1), ax.set_zlim(-1, 1)
    fig.savefig(path, dpi=100)
    plt.close(fig)


def plot_solid(solid, path: str) -> None:
    """Render a SolidMesh's triangles to a PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    tris = solid.triangles()
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    ax.add_collection3d(
        Poly3DCollection(list(tris), facecolors="lightsteelblue",
                         edgecolors="gray", linewidths=0.1)
    )
    lo, hi = tris.min(), tris.max()
    ax.set_xlim(lo, hi), ax.set_ylim(lo, hi), ax.set_zlim(lo, hi)
    fig.savefig(path, dpi=100)
    plt.close(fig)
