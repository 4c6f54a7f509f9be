import numpy as np
import pytest

from dynamic_vins_tpu.frontend.line_tracker import (LineTracker,
                                                    LineTrackerConfig,
                                                    detect_lines)

cv2 = pytest.importorskip("cv2")


def _line_image(offset=(0, 0), seed=0):
    rng = np.random.default_rng(seed)
    img = np.full((240, 320), 40, np.uint8)
    img = img + rng.integers(0, 10, size=img.shape).astype(np.uint8)
    dx, dy = offset
    lines = [((40, 50), (200, 60)), ((60, 180), (250, 150)),
             ((150, 30), (160, 200)), ((260, 40), (280, 220))]
    for (x1, y1), (x2, y2) in lines:
        cv2.line(img, (x1 + dx, y1 + dy), (x2 + dx, y2 + dy), 220, 2,
                 cv2.LINE_AA)
    return img


def test_detect_lines_finds_drawn_segments():
    img = _line_image()
    segs = detect_lines(img, LineTrackerConfig(min_length=40))
    assert len(segs) >= 4


def test_track_assigns_stable_ids():
    tr = LineTracker(LineTrackerConfig(min_length=40))
    segs0, _ = tr.track(_line_image((0, 0)))
    segs1, _ = tr.track(_line_image((6, 4)))
    ids0 = {s.id for s in segs0}
    ids1 = {s.id for s in segs1}
    # most lines keep their ids across the shift
    assert len(ids0 & ids1) >= 3


def test_track_mask_gates_detection():
    img = _line_image()
    mask = np.ones(img.shape, bool)
    mask[:, :170] = False      # exclude left half
    segs = detect_lines(img, LineTrackerConfig(min_length=40), mask)
    for s in segs:
        assert s.center[0] >= 150


def test_stereo_line_matching():
    tr = LineTracker(LineTrackerConfig(min_length=40))
    segs, right = tr.track(_line_image((0, 0)),
                           img_right=_line_image((-8, 0)))
    assert len(right) >= 2
    for lid, rseg in right.items():
        lseg = [s for s in segs if s.id == lid][0]
        # disparity shift ≈ 8 px leftward
        assert abs((lseg.center[0] - rseg.center[0]) - 8) < 4


def test_hv_balance_topup():
    """Budget-bound selection keeps both orientation classes
    (line_detector.cpp:160-192 H/V balance)."""
    from dynamic_vins_tpu.frontend.line_tracker import (LineSeg,
                                                        _balanced_select)
    # 20 long horizontal + 6 short vertical lines, budget 10
    horiz = [LineSeg(0.0, float(i), 100.0 + i, float(i))
             for i in range(20)]
    vert = [LineSeg(float(i), 0.0, float(i), 40.0 + i)
            for i in range(6)]
    segs = sorted(horiz + vert, key=lambda s: -s.length)
    out = _balanced_select(segs, 10)
    assert len(out) == 10
    n_v = sum(1 for s in out if abs(s.ex - s.sx) < 1e-6)
    assert n_v == 5                    # vertical not starved
    # when one class is scarce, slack flows to the other
    out2 = _balanced_select(sorted(horiz + vert[:2],
                                   key=lambda s: -s.length), 10)
    assert len(out2) == 10
    assert sum(1 for s in out2 if abs(s.ex - s.sx) < 1e-6) == 2
