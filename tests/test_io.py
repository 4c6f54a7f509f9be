import os

import numpy as np
import pytest

from dynamic_vins_tpu.io import datasets, evaluation, writers


def test_tum_writer_roundtrip(tmp_path):
    path = str(tmp_path / "traj.txt")
    with writers.TumWriter(path) as w:
        for i in range(5):
            w.write(i * 0.1, [i, 2 * i, 3 * i],
                    [1.0, 0.0, 0.0, 0.0])
    t, p, q = writers.read_tum(path)
    assert len(t) == 5
    np.testing.assert_allclose(p[3], [3, 6, 9], atol=1e-6)
    np.testing.assert_allclose(q[0], [1, 0, 0, 0], atol=1e-6)


def test_kitti_mot_writer_format(tmp_path):
    path = str(tmp_path / "mot.txt")
    with writers.KittiMotWriter(path) as w:
        w.write(0, 3, "Car", (10, 20, 110, 120), (1.5, 1.8, 4.0),
                (2.0, 1.0, 15.0), 0.3, score=0.9)
    line = open(path).read().strip().split()
    assert line[0] == "0" and line[1] == "3" and line[2] == "Car"
    assert len(line) == 18


def test_ate_alignment_invariance():
    rng = np.random.default_rng(0)
    t = np.arange(50) * 0.1
    p_gt = np.cumsum(rng.normal(size=(50, 3)), axis=0)
    # estimate = rotated+translated gt + small noise
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    p_est = (R @ p_gt.T).T + np.array([5.0, -2.0, 1.0])
    p_est += rng.normal(scale=0.01, size=p_est.shape)
    ate = evaluation.ate_rmse(t, p_est, t, p_gt, align=True)
    assert ate < 0.02
    ate_noalign = evaluation.ate_rmse(t, p_est, t, p_gt, align=False)
    assert ate_noalign > 1.0


def test_rpe_identity():
    from dynamic_vins_tpu.geometry import lie
    import jax.numpy as jnp

    t = np.arange(10) * 0.1
    p = np.cumsum(np.ones((10, 3)), axis=0)
    q = np.tile([1.0, 0, 0, 0], (10, 1))
    tr, rot = evaluation.rpe(t, p, q, t, p, q)
    assert tr < 1e-9 and rot < 1e-9


def test_euroc_reader(tmp_path):
    # build a mock EuRoC tree
    import cv2

    root = tmp_path / "MH_01"
    for cam in ("cam0", "cam1"):
        (root / "mav0" / cam / "data").mkdir(parents=True)
    (root / "mav0" / "imu0").mkdir(parents=True)
    rows = ["#timestamp [ns],filename"]
    for i in range(3):
        ts = 1000000000 + i * 50000000
        name = f"{ts}.png"
        img = np.full((48, 64), i * 10, np.uint8)
        for cam in ("cam0", "cam1"):
            cv2.imwrite(str(root / "mav0" / cam / "data" / name), img)
            pass
        rows.append(f"{ts},{name}")
    for cam in ("cam0", "cam1"):
        (root / "mav0" / cam / "data.csv").write_text("\n".join(rows))
    imu_rows = ["#timestamp,wx,wy,wz,ax,ay,az"]
    for i in range(10):
        ts = 1000000000 + i * 5000000
        imu_rows.append(f"{ts},0.01,0.02,0.03,0.1,0.2,9.8")
    (root / "mav0" / "imu0" / "data.csv").write_text("\n".join(imu_rows))

    ds = datasets.EurocDataset(str(root))
    imu = ds.imu()
    assert len(imu) == 10
    assert abs(imu[1].t - imu[0].t - 0.005) < 1e-9
    frames = list(ds.frames())
    assert len(frames) == 3
    assert frames[0].img_right is not None
    assert frames[1].img_left.mean() == 10.0


def test_kitti_calib_parse(tmp_path):
    calib = tmp_path / "calib.txt"
    P2 = " ".join(str(float(i)) for i in range(12))
    calib.write_text(f"P2: {P2}\n")
    out = datasets.parse_kitti_calib(str(calib))
    assert out["P2"].shape == (3, 4)
    assert out["P2"][0, 1] == 1.0


def test_viode_masks():
    seg = np.zeros((20, 20, 3), np.uint8)
    seg[2:12, 2:12] = (0, 0, 142)    # car instance
    seg[14:19, 14:19] = (70, 70, 70)  # static structure
    mask = datasets.viode_dynamic_mask(seg)
    assert mask[5, 5] and not mask[15, 15]
    insts = datasets.viode_instance_masks(seg, min_area=10)
    assert len(insts) == 1
    assert list(insts.values())[0].sum() == 100


def test_config_yaml_roundtrip(tmp_path):
    from dynamic_vins_tpu.utils.config import VioConfig, SlamMode

    y = tmp_path / "cfg.yaml"
    y.write_text("""
slam: dynamic
dataset: kitti
is_stereo: true
imu: 1
max_cnt: 250
min_dist: 30
keyframe_parallax: 12.0
acc_n: 0.1
body_T_cam0: [1,0,0, 0.1, 0,1,0, 0.2, 0,0,1, 0.3, 0,0,0,1]
""")
    cfg = VioConfig.from_yaml(str(y), "0003")
    assert cfg.slam == SlamMode.DYNAMIC
    assert cfg.max_cnt == 250
    assert cfg.acc_n == 0.1
    p_bc, q_bc = cfg.extrinsics()
    np.testing.assert_allclose(p_bc[0], [0.1, 0.2, 0.3])
    np.testing.assert_allclose(q_bc[0], [1, 0, 0, 0])


def test_kitti_raw_dataset(tmp_path):
    import cv2
    import numpy as np
    from dynamic_vins_tpu.io.datasets import KittiRawDataset

    drive = tmp_path / "2011_09_26_drive_0001_sync"
    for cam in ("image_00", "image_01"):
        d = drive / cam / "data"
        d.mkdir(parents=True)
        with open(drive / cam / "timestamps.txt", "w") as f:
            for i in range(3):
                f.write(f"2011-09-26 13:02:{25 + i:02d}.500000000\n")
        for i in range(3):
            cv2.imwrite(str(d / f"{i:010d}.png"),
                        np.full((40, 60), i * 40, np.uint8))
    oxts = drive / "oxts" / "data"
    oxts.mkdir(parents=True)
    with open(drive / "oxts" / "timestamps.txt", "w") as f:
        for i in range(3):
            f.write(f"2011-09-26 13:02:{25 + i:02d}.500000000\n")
    for i in range(3):
        vals = np.zeros(30)
        vals[0], vals[1], vals[2] = 49.0, 8.43 + i * 1e-5, 110.0
        np.savetxt(oxts / f"{i:010d}.txt", vals[None])

    ds = KittiRawDataset(str(drive))
    frames = list(ds.frames())
    assert len(frames) == 3
    assert frames[1].t - frames[0].t == pytest.approx(1.0)
    assert frames[0].img_right is not None

    gt = ds.oxts_ground_truth(str(tmp_path / "gt.txt"))
    assert len(gt) == 3
    assert os.path.exists(tmp_path / "gt.txt")


def test_viode_dataset_reader(tmp_path):
    """ViodeDataset: extracted-bag layout with cam0/cam1/segmentation
    dirs + EuRoC-style imu csv + odometry GT."""
    import cv2
    from dynamic_vins_tpu.io.datasets import (ViodeDataset,
                                              viode_dynamic_mask)

    root = tmp_path / "viode"
    for d in ("cam0", "cam1", "segmentation", "imu0", "odometry"):
        (root / d / "data").mkdir(parents=True) if d not in (
            "imu0", "odometry") else (root / d).mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        t_ns = 1403636579763555584 + i * 100_000_000
        img = rng.integers(0, 255, (48, 64), np.uint8)
        cv2.imwrite(str(root / "cam0" / "data" / f"{t_ns}.png"), img)
        cv2.imwrite(str(root / "cam1" / "data" / f"{t_ns}.png"), img)
        seg = np.zeros((48, 64, 3), np.uint8)
        seg[10:20, 10:20] = (142, 0, 0)       # BGR of car rgb(0,0,142)
        cv2.imwrite(str(root / "segmentation" / "data" / f"{t_ns}.png"),
                    seg)
    with open(root / "imu0" / "data.csv", "w") as f:
        f.write("#ts,gx,gy,gz,ax,ay,az\n")
        for k in range(10):
            f.write(f"{1403636579763555584 + k * 5_000_000},"
                    "0.01,0.02,0.03,0.1,0.2,9.8\n")
    with open(root / "odometry" / "data.csv", "w") as f:
        for i in range(3):
            t_ns = 1403636579763555584 + i * 100_000_000
            f.write(f"{t_ns},{0.1 * i},0.0,0.0,1.0,0.0,0.0,0.0\n")

    ds = ViodeDataset(str(root))
    frames = list(ds.frames())
    assert len(frames) == 3
    assert frames[0].img_right is not None
    assert frames[0].seg_left is not None
    assert frames[1].t - frames[0].t == pytest.approx(0.1, abs=1e-6)
    # seg decodes to a dynamic mask over the painted car region
    m = viode_dynamic_mask(frames[0].seg_left)
    assert m[15, 15] and not m[0, 0]
    assert len(ds.imu()) == 10
    gt = ds.ground_truth()
    assert len(gt) == 3 and gt[2][1][0] == pytest.approx(0.2)


def test_pcd_writer_roundtrip(tmp_path):
    from dynamic_vins_tpu.io.writers import read_pcd, write_pcd

    pts = np.random.default_rng(0).normal(size=(17, 3)).astype(np.float32)
    path = str(tmp_path / "cloud.pcd")
    write_pcd(path, pts)
    back = read_pcd(path)
    np.testing.assert_allclose(back, pts, atol=1e-5)
    # with colors
    cols = np.random.default_rng(1).integers(0, 255, (17, 3))
    write_pcd(path, pts, cols)
    head = open(path).read()
    assert "FIELDS x y z rgb" in head
    np.testing.assert_allclose(read_pcd(path), pts, atol=1e-5)
