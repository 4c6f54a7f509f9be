"""3D box fitting to object point clouds (fixed-trip RANSAC, jit-safe).

Capability parity with `FitBox3DWithRANSAC` / `FitBox3DSimple`
(`estimator/vio_util.cpp:205-257,351`): given a point cloud, known box
dims and orientation, find the box center maximizing inliers; plus a
centroid fallback. Rebuilt with a fixed candidate count so the whole
fit (including across all objects via vmap) is one compiled kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dynamic_vins_tpu.geometry import lie


def fit_box_center(pts_w, valid, q_wo, dims, num_candidates: int = 64,
                   margin: float = 1.2):
    """Find the box center from a world point cloud.

    Each valid point proposes the candidate 'center = point' (the
    reference samples cluster points likewise); the candidate with the
    most points inside `margin * dims/2` of a box at that center wins;
    the final center is the mean of that candidate's inliers.

    Returns (center [3], inlier_count [], inlier_mask [N]).
    """
    R = lie.quat_to_matrix(q_wo)
    pts_obj = (pts_w - 0.0) @ R          # rotate into object axes
    half = margin * dims / 2.0

    n = pts_w.shape[0]
    idx = jnp.linspace(0, n - 1, num_candidates).astype(jnp.int32)
    cand = pts_obj[idx]                  # [C,3] candidate centers
    cand_ok = valid[idx]

    d = jnp.abs(pts_obj[None, :, :] - cand[:, None, :])  # [C,N,3]
    inside = jnp.all(d <= half[None, None, :], axis=-1) & valid[None, :]
    counts = jnp.sum(inside, axis=-1) * cand_ok
    best = jnp.argmax(counts)
    mask = inside[best]
    cnt = jnp.maximum(jnp.sum(mask), 1)
    center_obj = jnp.sum(jnp.where(mask[:, None], pts_obj, 0.0),
                         axis=0) / cnt
    center_w = R @ center_obj
    return center_w, counts[best], mask


def centroid(pts_w, valid):
    """Masked centroid fallback (reference: else-branch of
    InitialInstance, estimator_insts.cpp:495-560)."""
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid[:, None], pts_w, 0.0), axis=0) / n


def radius_filter(pts, valid, radius: float = 1.0, min_neighbors: int = 3):
    """Fixed-shape replacement for the reference's PCL radius outlier
    filter (`dynamic_tracker.cpp:159-341`): keep points with at least
    `min_neighbors` other valid points within `radius`."""
    d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    near = (d2 <= radius * radius) & valid[None, :] & valid[:, None]
    neighbors = jnp.sum(near, axis=-1) - 1
    return valid & (neighbors >= min_neighbors)


def largest_cluster(pts, valid, radius: float = 0.8,
                    num_iters: int = 8):
    """Fixed-iteration replacement for PCL EuclideanClusterExtraction
    (keep cluster containing the densest point): label propagation on
    the radius graph for `num_iters` rounds."""
    n = pts.shape[0]
    d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    adj = (d2 <= radius * radius) & valid[None, :] & valid[:, None]
    labels = jnp.where(valid, jnp.arange(n), n)

    def body(_, lab):
        # propagate min label over neighbors
        neigh = jnp.where(adj, lab[None, :], n)
        return jnp.minimum(lab, jnp.min(neigh, axis=-1))

    labels = jax.lax.fori_loop(0, num_iters, body, labels)
    # densest point's cluster
    degree = jnp.sum(adj, axis=-1) * valid
    seed = jnp.argmax(degree)
    return valid & (labels == labels[seed])
