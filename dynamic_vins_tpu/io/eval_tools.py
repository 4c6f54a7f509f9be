"""Evaluation tooling — parity with the `dynamic_vins_eval` package.

Reference binaries rebuilt as library functions + one CLI
(`python -m dynamic_vins_tpu.io.eval_tools <cmd> ...`):
  * `save_oxts_tum`      — OXTS GPS/IMU logs -> TUM ego ground truth
                           (dynamic_vins_eval/src save_oxts; mercator
                           conversion per the KITTI devkit).
  * `split_mot_to_single`— per-object KITTI-format files out of one
                           MOT result (split_mot_to_single).
  * `split_mot_to_tum`   — per-object TUM trajectories
                           (split_mot_to_tum).
  * `convert_tracking_to_object` — tracking-format -> per-frame KITTI
                           object-detection files.
  * `clear_mot`          — CLEAR-MOT metrics (MOTA/MOTP/IDS/FP/FN),
                           the devkit_tracking
                           evaluate_tracking.py measures, computed
                           in-repo so no external devkit is needed.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np

EARTH_RADIUS = 6378137.0


def oxts_to_pose(lat, lon, alt, roll, pitch, yaw, scale=None):
    """One OXTS record -> (p[3], R[3,3]) world pose, KITTI devkit
    mercator projection (convertOxtsToPose.m semantics)."""
    if scale is None:
        scale = math.cos(lat * math.pi / 180.0)
    tx = scale * lon * math.pi * EARTH_RADIUS / 180.0
    ty = scale * EARTH_RADIUS * math.log(
        math.tan((90.0 + lat) * math.pi / 360.0))
    tz = alt
    cr, sr = math.cos(roll), math.sin(roll)
    cp, sp = math.cos(pitch), math.sin(pitch)
    cy, sy = math.cos(yaw), math.sin(yaw)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return np.array([tx, ty, tz]), Rz @ Ry @ Rx


def read_oxts_dir(oxts_dir: str, timestamps=None):
    """KITTI raw `oxts/data/*.txt` -> list of (t, p, R), first pose as
    origin (save_oxts parity)."""
    files = sorted(f for f in os.listdir(oxts_dir)
                   if f.endswith(".txt"))
    out = []
    scale = None
    origin = None
    for i, fname in enumerate(files):
        vals = np.loadtxt(os.path.join(oxts_dir, fname))
        lat, lon, alt, roll, pitch, yaw = vals[:6]
        if scale is None:
            scale = math.cos(lat * math.pi / 180.0)
        p, R = oxts_to_pose(lat, lon, alt, roll, pitch, yaw, scale)
        if origin is None:
            origin = (p.copy(), R.copy())
        p0, R0 = origin
        p_rel = R0.T @ (p - p0)
        R_rel = R0.T @ R
        t = timestamps[i] if timestamps is not None else float(i)
        out.append((t, p_rel, R_rel))
    return out


def _quat_from_matrix(R):
    from dynamic_vins_tpu.geometry import lie_np

    return lie_np.matrix_to_quat(R)


def save_oxts_tum(oxts_dir: str, out_path: str, timestamps=None):
    poses = read_oxts_dir(oxts_dir, timestamps)
    with open(out_path, "w") as f:
        for t, p, R in poses:
            q = _quat_from_matrix(R)            # wxyz
            f.write(f"{t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                    f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n")
    return len(poses)


# ---------------------------------------------------------------------------
# MOT file surgery (KITTI tracking format: frame tid type trunc occ
# alpha x1 y1 x2 y2 h w l X Y Z ry [score])
# ---------------------------------------------------------------------------

def read_mot_file(path: str) -> List[dict]:
    rows = []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if len(tok) < 17:
                continue
            rows.append(dict(
                frame=int(tok[0]), tid=int(tok[1]), cls=tok[2],
                trunc=float(tok[3]), occ=int(float(tok[4])),
                alpha=float(tok[5]),
                bbox=[float(v) for v in tok[6:10]],
                hwl=[float(v) for v in tok[10:13]],
                xyz=[float(v) for v in tok[13:16]],
                ry=float(tok[16]),
                score=float(tok[17]) if len(tok) > 17 else 1.0,
                line=line.rstrip("\n")))
    return rows


def split_mot_to_single(mot_path: str, out_dir: str) -> List[int]:
    """One KITTI file per track id (split_mot_to_single parity)."""
    os.makedirs(out_dir, exist_ok=True)
    by_tid: Dict[int, List[str]] = {}
    for r in read_mot_file(mot_path):
        by_tid.setdefault(r["tid"], []).append(r["line"])
    for tid, lines in by_tid.items():
        with open(os.path.join(out_dir, f"{tid:04d}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return sorted(by_tid)


def split_mot_to_tum(mot_path: str, out_dir: str, fps: float = 10.0
                     ) -> List[int]:
    """Per-object TUM trajectory from the 3D box centers
    (split_mot_to_tum parity: position = box center, yaw about -y)."""
    os.makedirs(out_dir, exist_ok=True)
    by_tid: Dict[int, List[dict]] = {}
    for r in read_mot_file(mot_path):
        by_tid.setdefault(r["tid"], []).append(r)
    for tid, rows in by_tid.items():
        with open(os.path.join(out_dir, f"{tid:04d}_tum.txt"),
                  "w") as f:
            for r in rows:
                t = r["frame"] / fps
                x, y, z = r["xyz"]
                y -= r["hwl"][0] / 2.0           # bottom -> center
                half, ry = 0.5 * r["ry"], r["ry"]
                # yaw about camera -y: q = (cos, 0, -sin, 0)
                qw, qy = math.cos(half), -math.sin(half)
                f.write(f"{t:.6f} {x:.6f} {y:.6f} {z:.6f} "
                        f"0.000000 {qy:.6f} 0.000000 {qw:.6f}\n")
    return sorted(by_tid)


def convert_tracking_to_object(mot_path: str, out_dir: str) -> int:
    """Tracking-format file -> per-frame KITTI object files
    (convert_tracking_to_object parity: drop frame/tid columns)."""
    os.makedirs(out_dir, exist_ok=True)
    by_frame: Dict[int, List[str]] = {}
    for r in read_mot_file(mot_path):
        tok = r["line"].split()
        by_frame.setdefault(r["frame"], []).append(" ".join(tok[2:]))
    n = max(by_frame) + 1 if by_frame else 0
    for frame in range(n):
        with open(os.path.join(out_dir, f"{frame:06d}.txt"),
                  "w") as f:
            f.write("\n".join(by_frame.get(frame, [])) + "\n")
    return n


# ---------------------------------------------------------------------------
# CLEAR-MOT (devkit_tracking/python/evaluate_tracking.py measures)
# ---------------------------------------------------------------------------

@dataclass
class MotMetrics:
    mota: float
    motp: float
    id_switches: int
    fp: int
    fn: int
    matches: int
    gt_total: int

    def as_dict(self):
        return self.__dict__.copy()


def _iou2d(a, b):
    x1 = max(a[0], b[0])
    y1 = max(a[1], b[1])
    x2 = min(a[2], b[2])
    y2 = min(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    area = ((a[2] - a[0]) * (a[3] - a[1])
            + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / area if area > 0 else 0.0


def clear_mot(gt_rows: List[dict], est_rows: List[dict],
              iou_thresh: float = 0.5, use_3d: bool = False,
              dist_thresh: float = 2.0) -> MotMetrics:
    """CLEAR-MOT over parsed MOT rows. Association per frame by
    Hungarian on 2D IoU (devkit behavior) or, with `use_3d`, on 3D
    bottom-center distance (for box-less pipelines).
    """
    from scipy.optimize import linear_sum_assignment

    frames = sorted({r["frame"] for r in gt_rows}
                    | {r["frame"] for r in est_rows})
    gt_by_f: Dict[int, List[dict]] = {}
    est_by_f: Dict[int, List[dict]] = {}
    for r in gt_rows:
        if r["cls"] != "DontCare":
            gt_by_f.setdefault(r["frame"], []).append(r)
    for r in est_rows:
        est_by_f.setdefault(r["frame"], []).append(r)

    fp = fn = ids = matches = gt_total = 0
    dist_sum = 0.0
    last_match: Dict[int, int] = {}              # gt tid -> est tid
    for f in frames:
        g = gt_by_f.get(f, [])
        e = est_by_f.get(f, [])
        gt_total += len(g)
        if not g or not e:
            fn += len(g)
            fp += len(e)
            continue
        C = np.full((len(g), len(e)), 1e6)
        for i, gr in enumerate(g):
            for j, er in enumerate(e):
                if use_3d:
                    d = float(np.linalg.norm(
                        np.array(gr["xyz"]) - np.array(er["xyz"])))
                    if d <= dist_thresh:
                        C[i, j] = d
                else:
                    iou = _iou2d(gr["bbox"], er["bbox"])
                    if iou >= iou_thresh:
                        C[i, j] = 1.0 - iou
        ri, ci = linear_sum_assignment(C)
        used_g, used_e = set(), set()
        for i, j in zip(ri, ci):
            if C[i, j] >= 1e6:
                continue
            used_g.add(i)
            used_e.add(j)
            matches += 1
            dist_sum += C[i, j]
            gtid, etid = g[i]["tid"], e[j]["tid"]
            if gtid in last_match and last_match[gtid] != etid:
                ids += 1
            last_match[gtid] = etid
        fn += len(g) - len(used_g)
        fp += len(e) - len(used_e)

    mota = 1.0 - (fp + fn + ids) / max(gt_total, 1)
    motp = dist_sum / max(matches, 1)
    return MotMetrics(mota, motp, ids, fp, fn, matches, gt_total)


def evaluate_mot_files(gt_path: str, est_path: str, **kw) -> MotMetrics:
    return clear_mot(read_mot_file(gt_path), read_mot_file(est_path),
                     **kw)


def main(argv=None):
    import argparse
    import json

    ap = argparse.ArgumentParser(prog="eval_tools")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("save_oxts")
    p.add_argument("oxts_dir")
    p.add_argument("out")
    p = sub.add_parser("split_mot_to_single")
    p.add_argument("mot")
    p.add_argument("out_dir")
    p = sub.add_parser("split_mot_to_tum")
    p.add_argument("mot")
    p.add_argument("out_dir")
    p = sub.add_parser("convert_tracking_to_object")
    p.add_argument("mot")
    p.add_argument("out_dir")
    p = sub.add_parser("eval_mot")
    p.add_argument("gt")
    p.add_argument("est")
    p.add_argument("--use-3d", action="store_true")
    a = ap.parse_args(argv)
    if a.cmd == "save_oxts":
        print(save_oxts_tum(a.oxts_dir, a.out), "poses written")
    elif a.cmd == "split_mot_to_single":
        print(split_mot_to_single(a.mot, a.out_dir))
    elif a.cmd == "split_mot_to_tum":
        print(split_mot_to_tum(a.mot, a.out_dir))
    elif a.cmd == "convert_tracking_to_object":
        print(convert_tracking_to_object(a.mot, a.out_dir), "frames")
    elif a.cmd == "eval_mot":
        m = evaluate_mot_files(a.gt, a.est, use_3d=a.use_3d)
        print(json.dumps(m.as_dict()))


if __name__ == "__main__":
    main()
