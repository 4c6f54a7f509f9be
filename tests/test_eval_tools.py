"""Eval tooling: OXTS conversion, MOT surgery, CLEAR-MOT metrics."""

import os

import numpy as np
import pytest

from dynamic_vins_tpu.io import eval_tools as et


def _mot_line(frame, tid, cls="Car", bbox=(0, 0, 10, 10),
              hwl=(1.5, 1.8, 4.0), xyz=(0.0, 1.5, 10.0), ry=0.1):
    return (f"{frame} {tid} {cls} 0 0 0.0 "
            f"{bbox[0]} {bbox[1]} {bbox[2]} {bbox[3]} "
            f"{hwl[0]} {hwl[1]} {hwl[2]} "
            f"{xyz[0]} {xyz[1]} {xyz[2]} {ry} 0.9")


def _write(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_oxts_to_tum(tmp_path):
    d = tmp_path / "oxts"
    os.makedirs(d)
    # drive east at constant speed; 30 columns like KITTI raw
    for i in range(5):
        vals = np.zeros(30)
        vals[0] = 49.0                      # lat
        vals[1] = 8.43 + i * 1e-5           # lon
        vals[2] = 110.0                     # alt
        vals[5] = 0.2                       # yaw
        np.savetxt(d / f"{i:010d}.txt", vals[None])
    out = tmp_path / "gt_tum.txt"
    n = et.save_oxts_tum(str(d), str(out))
    assert n == 5
    rows = np.loadtxt(out)
    assert rows.shape == (5, 8)
    assert np.allclose(rows[0, 1:4], 0.0)          # origin-anchored
    dists = np.linalg.norm(np.diff(rows[:, 1:4], axis=0), axis=1)
    assert np.allclose(dists, dists[0], rtol=1e-3)  # constant speed
    assert dists[0] > 0.5                           # ~0.72m per 1e-5 deg


def test_mot_split_and_convert(tmp_path):
    mot = tmp_path / "mot.txt"
    _write(mot, [_mot_line(0, 1), _mot_line(0, 2), _mot_line(1, 1),
                 _mot_line(2, 2)])
    tids = et.split_mot_to_single(str(mot), str(tmp_path / "single"))
    assert tids == [1, 2]
    assert len(open(tmp_path / "single" / "0001.txt").readlines()) == 2

    et.split_mot_to_tum(str(mot), str(tmp_path / "tum"))
    rows = np.loadtxt(tmp_path / "tum" / "0001_tum.txt")
    assert rows.shape == (2, 8)
    assert rows[0, 2] == pytest.approx(1.5 - 0.75)  # bottom -> center

    n = et.convert_tracking_to_object(str(mot), str(tmp_path / "obj"))
    assert n == 3
    line = open(tmp_path / "obj" / "000000.txt").readline().split()
    assert line[0] == "Car"                         # frame/tid dropped


def test_clear_mot_perfect_and_noisy():
    gt = [dict(frame=f, tid=1, cls="Car", bbox=[0, 0, 10, 10],
               xyz=[0, 0, 10]) for f in range(10)]
    est_perfect = [dict(frame=f, tid=7, cls="Car", bbox=[0, 0, 10, 10],
                        xyz=[0, 0, 10]) for f in range(10)]
    m = et.clear_mot(gt, est_perfect)
    assert m.mota == pytest.approx(1.0)
    assert m.id_switches == 0
    assert m.matches == 10

    # id switch halfway + 2 missed frames + 1 false positive
    est = []
    for f in range(10):
        if f in (3, 4):
            continue
        tid = 7 if f < 5 else 8
        est.append(dict(frame=f, tid=tid, cls="Car",
                        bbox=[1, 0, 11, 10], xyz=[0, 0, 10]))
    est.append(dict(frame=9, tid=9, cls="Car", bbox=[50, 50, 60, 60],
                    xyz=[5, 5, 50]))
    m = et.clear_mot(gt, est)
    assert m.fn == 2 and m.fp == 1 and m.id_switches == 1
    assert m.mota == pytest.approx(1.0 - 4 / 10)
    # 3D association mode
    m3 = et.clear_mot(gt, est, use_3d=True)
    assert m3.fn == 2 and m3.fp == 1


def test_eval_tools_cli(tmp_path, capsys):
    mot = tmp_path / "m.txt"
    _write(mot, [_mot_line(0, 1)])
    et.main(["eval_mot", str(mot), str(mot)])
    out = capsys.readouterr().out
    assert '"mota": 1.0' in out


# ---------------------------------------------------------------------------
# object-detection AP (devkit_object parity)
# ---------------------------------------------------------------------------

def _row(frame, tid, cls="Car", bbox=(100, 100, 200, 180), hwl=(1.5, 1.7, 4.0),
         xyz=(0.0, 1.5, 10.0), ry=0.0, score=0.9, occ=0, trunc=0.0):
    return dict(frame=frame, tid=tid, cls=cls, trunc=trunc, occ=occ,
                alpha=0.0, bbox=list(bbox), hwl=list(hwl),
                xyz=list(xyz), ry=ry, score=score, line="")


def test_iou_bev_identity_and_disjoint():
    from dynamic_vins_tpu.io.eval_tools import iou_bev, iou_3d

    a = _row(0, 0)
    assert abs(iou_bev(a, a) - 1.0) < 1e-9
    assert abs(iou_3d(a, a) - 1.0) < 1e-9
    b = _row(0, 1, xyz=(50.0, 1.5, 10.0))
    assert iou_bev(a, b) == 0.0
    assert iou_3d(a, b) == 0.0


def test_iou_bev_rotated_overlap():
    from dynamic_vins_tpu.io.eval_tools import iou_bev
    import math as m

    # square boxes (w == l) rotated 90 deg coincide exactly
    a = _row(0, 0, hwl=(1.5, 2.0, 2.0))
    b = _row(0, 1, hwl=(1.5, 2.0, 2.0), ry=m.pi / 2)
    assert abs(iou_bev(a, b) - 1.0) < 1e-6
    # half-shifted boxes: IoU = 1/3
    c = _row(0, 2, hwl=(1.5, 2.0, 2.0), xyz=(1.0, 1.5, 10.0))
    assert abs(iou_bev(a, c) - 1.0 / 3.0) < 1e-6


def test_object_detection_ap_perfect_and_missed():
    from dynamic_vins_tpu.io.eval_tools import eval_object_detection

    gt = [_row(f, f) for f in range(10)]
    # perfect detections -> AP 1.0 in all three metrics
    for metric in ("2d", "bev", "3d"):
        m = eval_object_detection(gt, gt, metric=metric,
                                  difficulty="moderate")
        assert m.ap > 0.999, (metric, m.ap)
        assert m.n_gt == 10
    # half the frames missed -> recall caps at 0.5
    m = eval_object_detection(gt, gt[:5], metric="2d")
    assert 0.4 < m.ap < 0.6, m.ap


def test_object_detection_difficulty_ignores_small_boxes():
    from dynamic_vins_tpu.io.eval_tools import eval_object_detection

    # 20-px-high gt box: below even the hard min height -> ignored
    gt = [_row(0, 0), _row(1, 1, bbox=(100, 100, 140, 120))]
    est = [_row(0, 0)]
    m = eval_object_detection(gt, est, difficulty="easy")
    assert m.n_gt == 1
    assert m.ap > 0.999


def test_object_detection_false_positives_lower_ap():
    from dynamic_vins_tpu.io.eval_tools import eval_object_detection

    gt = [_row(f, f) for f in range(4)]
    est = [_row(f, f) for f in range(4)]
    # 4 high-scoring FPs in other frames
    est += [_row(f + 10, f, score=0.95,
                 bbox=(300, 300, 400, 380)) for f in range(4)]
    m = eval_object_detection(gt, est)
    assert m.ap < 0.6
