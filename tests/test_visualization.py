import numpy as np
import pytest

from dynamic_vins_tpu.io import visualization as viz

cv2 = pytest.importorskip("cv2")


def test_box_corners_world():
    c = viz.box_corners_world([1.0, 2.0, 3.0], [1.0, 0, 0, 0],
                              [4.0, 2.0, 1.0])
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c.mean(axis=0), [1, 2, 3], atol=1e-12)
    np.testing.assert_allclose(c.max(axis=0) - c.min(axis=0),
                               [4, 2, 1], atol=1e-12)


def test_draw_features_and_box():
    img = np.zeros((120, 160), np.uint8)
    pts = np.array([[40.0, 40.0], [100.0, 80.0]])
    out = viz.draw_features(img, pts, np.array([True, True]),
                            track_cnt=np.array([1, 30]))
    assert out.shape == (120, 160, 3)
    assert out.sum() > 0
    corners = viz.box_corners_world([0, 0, 6.0], [1.0, 0, 0, 0],
                                    [2, 1, 1])
    out2 = viz.draw_box3d(out, corners, 100, 100, 80, 60)
    assert (out2[..., 1] > 0).any()


def test_top_view():
    traj = np.stack([np.linspace(0, 5, 20), np.sin(np.linspace(0, 3, 20)),
                     np.zeros(20)], axis=1)
    inst = {7: dict(p=np.array([2.0, 1.0, 0.0]),
                    q=np.array([1.0, 0, 0, 0]),
                    dims=np.array([4.0, 2.0, 1.5]))}
    img = viz.draw_top_view(traj, inst)
    assert img.shape == (600, 600, 3)
    assert (img != 255).any()


def test_draw_line_tracks_stable_colors():
    import pytest
    pytest.importorskip("cv2")
    from dynamic_vins_tpu.frontend.line_tracker import LineSeg
    from dynamic_vins_tpu.io.visualization import draw_line_tracks
    img = np.zeros((64, 64), np.uint8)
    segs = [LineSeg(5.0, 5.0, 50.0, 20.0, id=3),
            LineSeg(10.0, 40.0, 60.0, 42.0, id=7)]
    out1 = draw_line_tracks(img, segs)
    out2 = draw_line_tracks(img, segs)
    assert out1.shape == (64, 64, 3)
    assert out1.sum() > 0
    np.testing.assert_array_equal(out1, out2)  # id-stable colors
