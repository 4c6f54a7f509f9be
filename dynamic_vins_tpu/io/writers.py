"""Trajectory / MOT output writers.

Capability parity with `utils/io/output.cpp`: TUM-format ego trajectory
(`SaveBodyTrajectory` output.cpp:189), per-object KITTI-tracking-format
MOT files (`SaveMotTrajectory` output.cpp:470) and per-object TUM files
(`SaveInstancesTrajectory` output.cpp:279) — same formats so the
reference's evo / KITTI-devkit evaluation scripts apply verbatim.
"""

from __future__ import annotations

import os
from typing import IO, Optional

import numpy as np


class TumWriter:
    """TUM format: `timestamp tx ty tz qx qy qz qw` (one line/pose)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f: IO = open(path, "w")

    def write(self, timestamp: float, p, q_wxyz):
        p = np.asarray(p)
        q = np.asarray(q_wxyz)
        self._f.write(
            f"{timestamp:.9f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
            f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n")

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class KittiMotWriter:
    """KITTI tracking format (one file per sequence):

    frame track_id type truncated occluded alpha x1 y1 x2 y2 h w l X Y Z
    rotation_y [score]
    (matches SaveMotTrajectory output.cpp:470-561 so
    devkit_tracking/evaluate_tracking.py runs unchanged).
    """

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f: IO = open(path, "w")

    def write(self, frame: int, track_id: int, obj_type: str,
              bbox2d, dims_hwl, center_xyz, rotation_y: float,
              score: Optional[float] = None, alpha: float = 0.0,
              truncated: float = 0.0, occluded: int = 0):
        x1, y1, x2, y2 = [float(v) for v in bbox2d]
        h, w, l = [float(v) for v in dims_hwl]
        X, Y, Z = [float(v) for v in center_xyz]
        line = (f"{frame} {track_id} {obj_type} {truncated:.2f} "
                f"{occluded} {alpha:.6f} {x1:.2f} {y1:.2f} {x2:.2f} "
                f"{y2:.2f} {h:.6f} {w:.6f} {l:.6f} {X:.6f} {Y:.6f} "
                f"{Z:.6f} {rotation_y:.6f}")
        if score is not None:
            line += f" {score:.6f}"
        self._f.write(line + "\n")

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def read_tum(path: str):
    """Read a TUM trajectory -> (t [N], p [N,3], q_wxyz [N,4])."""
    data = np.loadtxt(path)
    if data.ndim == 1:
        data = data[None, :]
    t = data[:, 0]
    p = data[:, 1:4]
    q_xyzw = data[:, 4:8]
    q_wxyz = np.concatenate([q_xyzw[:, 3:4], q_xyzw[:, 0:3]], axis=1)
    return t, p, q_wxyz


def write_pcd(path: str, points: np.ndarray, colors=None):
    """ASCII PCD v0.7 writer (instance point-cloud dumps,
    `SaveInstancesPointCloud` utils/io/output.cpp — the reference uses
    pcl::io::savePCDFile; same on-disk format, no PCL needed).

    points: [N,3]; colors: optional [N,3] uint8 RGB."""
    points = np.asarray(points, np.float32).reshape(-1, 3)
    n = points.shape[0]
    with open(path, "w") as f:
        f.write("# .PCD v0.7 - Point Cloud Data file format\n"
                "VERSION 0.7\n")
        if colors is None:
            f.write("FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                    "COUNT 1 1 1\n")
        else:
            f.write("FIELDS x y z rgb\nSIZE 4 4 4 4\nTYPE F F F U\n"
                    "COUNT 1 1 1 1\n")
        f.write(f"WIDTH {n}\nHEIGHT 1\n"
                "VIEWPOINT 0 0 0 1 0 0 0\n"
                f"POINTS {n}\nDATA ascii\n")
        if colors is None:
            for p in points:
                f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        else:
            colors = np.asarray(colors, np.uint32).reshape(-1, 3)
            for p, c in zip(points, colors):
                rgb = (int(c[0]) << 16) | (int(c[1]) << 8) | int(c[2])
                f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {rgb}\n")


def read_pcd(path: str):
    """Read an ASCII PCD written by `write_pcd` -> [N,3] float array."""
    pts = []
    with open(path) as f:
        in_data = False
        for line in f:
            if in_data:
                vals = line.split()
                if len(vals) >= 3:
                    pts.append([float(v) for v in vals[:3]])
            elif line.startswith("DATA"):
                if "ascii" not in line:
                    raise ValueError("only ascii PCD supported")
                in_data = True
    return np.asarray(pts, np.float32).reshape(-1, 3)
