"""Offline visualization: feature overlays, 3D boxes, top view.

Capability parity with the reference's visualization surface
(`utils/io/visualization.cpp` rviz publishers, `output.cpp:563`
DrawTopView, `basic/box3d.cpp` corner projection): with no ROS, the
same content renders to image files / arrays.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

try:
    import cv2
except Exception:                       # pragma: no cover
    cv2 = None

from dynamic_vins_tpu.geometry import lie_np

# 12 box edges as corner-index pairs (box3d.h corner layout)
_BOX_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
              (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]


def box_corners_world(p_wo, q_wo, dims):
    """8 corners [8,3] of an oriented box (Box3D::corners parity)."""
    d = np.asarray(dims) / 2.0
    signs = np.array([[sx, sy, sz] for sz in (-1, 1) for sy in (-1, 1)
                      for sx in (-1, 1)], float)
    # order: consistent ring for edge drawing
    order = [0, 1, 3, 2, 4, 5, 7, 6]
    corners_obj = signs[order] * d[None, :]
    R = lie_np.quat_to_matrix(np.asarray(q_wo))
    return corners_obj @ R.T + np.asarray(p_wo)[None, :]


def draw_features(img, pts, valid, track_cnt=None, radius: int = 3):
    """Tracked-feature overlay (FeatureTracker::DrawTrack parity):
    long tracks red -> new tracks blue."""
    if cv2 is None:
        return img
    out = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_GRAY2BGR) \
        if img.ndim == 2 else img.copy()
    for i in np.flatnonzero(valid):
        ratio = 1.0 if track_cnt is None else min(
            1.0, track_cnt[i] / 20.0)
        color = (int(255 * (1 - ratio)), 0, int(255 * ratio))
        cv2.circle(out, (int(pts[i, 0]), int(pts[i, 1])), radius,
                   color, -1)
    return out


def draw_box3d(img, corners_cam, fx, fy, cx, cy, color=(0, 255, 0)):
    """Project world->camera corners [8,3] and draw wireframe
    (Box3D corner projection / PubPredictBox3D parity)."""
    if cv2 is None:
        return img
    out = img.copy()
    uv = []
    for c in corners_cam:
        if c[2] < 0.2:
            uv.append(None)
            continue
        uv.append((int(fx * c[0] / c[2] + cx),
                   int(fy * c[1] / c[2] + cy)))
    for a, b in _BOX_EDGES:
        if uv[a] is not None and uv[b] is not None:
            cv2.line(out, uv[a], uv[b], color, 2)
    return out


def draw_top_view(traj_ego, instances: Optional[Dict] = None,
                  size: int = 600, margin: float = 2.0):
    """Bird's-eye trajectory + object boxes image (DrawTopView,
    output.cpp:563). traj_ego: [N,3]; instances: {id: dict(p, q, dims)}.
    """
    img = np.full((size, size, 3), 255, np.uint8)
    if cv2 is None or len(traj_ego) == 0:
        return img
    pts = np.asarray(traj_ego)[:, :2]
    lo = pts.min(axis=0) - margin
    hi = pts.max(axis=0) + margin
    scale = (size - 20) / max(float((hi - lo).max()), 1e-6)

    def to_px(xy):
        p = (np.asarray(xy) - lo) * scale + 10
        return int(p[0]), size - int(p[1])

    for a, b in zip(pts[:-1], pts[1:]):
        cv2.line(img, to_px(a), to_px(b), (200, 0, 0), 2)
    if instances:
        for tid, s in instances.items():
            corners = box_corners_world(s["p"], s["q"], s["dims"])
            ring = corners[:4, :2]
            for i in range(4):
                cv2.line(img, to_px(ring[i]), to_px(ring[(i + 1) % 4]),
                         (0, 128, 0), 2)
            cv2.putText(img, str(tid), to_px(s["p"][:2]),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 0, 0), 1)
    return img


def draw_line_tracks(img, segs, radius: int = 2):
    """Tracked line-segment overlay (PubLines / the reference's line
    visualizers, line_detector.cpp visualize helpers): color is stable
    per line id so tracks are visually continuous across frames."""
    if cv2 is None:
        return img
    out = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_GRAY2BGR) \
        if img.ndim == 2 else img.copy()
    for seg in segs:
        rng = np.random.default_rng(max(int(getattr(seg, "id", 0)), 0))
        color = tuple(int(c) for c in rng.integers(60, 255, 3))
        a = (int(round(seg.sx)), int(round(seg.sy)))
        b = (int(round(seg.ex)), int(round(seg.ey)))
        cv2.line(out, a, b, color, 2)
        cv2.circle(out, a, radius, color, -1)
        cv2.circle(out, b, radius, color, -1)
    return out
