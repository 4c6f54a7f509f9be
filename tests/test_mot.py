import numpy as np

from dynamic_vins_tpu.mot.kalman import BoxKalman, xyah_from_tlbr
from dynamic_vins_tpu.mot.tracker import (MotConfig, MultiObjectTracker,
                                          iou)


def test_kalman_tracks_constant_velocity():
    kf = BoxKalman(xyah_from_tlbr([10, 10, 50, 90]))
    for k in range(1, 10):
        kf.predict()
        kf.update(xyah_from_tlbr([10 + 5 * k, 10, 50 + 5 * k, 90]))
    pred = kf.predict()
    # after consistent motion the filter predicts the next position
    assert abs(pred[0] - (30 + 5 * 10)) < 2.0


def test_iou():
    assert iou([0, 0, 10, 10], [0, 0, 10, 10]) == 1.0
    assert iou([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0
    assert abs(iou([0, 0, 10, 10], [5, 0, 15, 10]) - 1 / 3) < 1e-9


def test_tracker_maintains_ids_through_motion():
    mot = MultiObjectTracker(MotConfig(n_init=2))
    ids_hist = []
    for k in range(8):
        dets = np.array([
            [10 + 6 * k, 20, 60 + 6 * k, 100],     # moving right
            [200, 50 + 4 * k, 260, 130 + 4 * k],   # moving down
        ])
        out = mot.update(dets)
        ids_hist.append((out[0], out[1]))
    first = ids_hist[0]
    assert all(h == first for h in ids_hist)
    assert first[0] != first[1]
    assert len(mot.visible_tracks()) == 2


def test_tracker_survives_missed_detection():
    mot = MultiObjectTracker(MotConfig(n_init=2, max_age=3))
    tid = None
    for k in range(4):
        out = mot.update(np.array([[10 + 5 * k, 10, 60 + 5 * k, 80]]))
        tid = out[0]
    # occlusion for 2 frames
    mot.update(np.zeros((0, 4)))
    mot.update(np.zeros((0, 4)))
    out = mot.update(np.array([[10 + 5 * 6, 10, 60 + 5 * 6, 80]]))
    assert out[0] == tid


def test_tracker_class_gate():
    mot = MultiObjectTracker(MotConfig(n_init=1))
    out0 = mot.update(np.array([[10, 10, 60, 80]]), classes=[1])
    # same box, different class -> new id
    out1 = mot.update(np.array([[10, 10, 60, 80]]), classes=[2])
    assert out0[0] != out1[0]


def test_feature_bundle_ring_buffer():
    """FeatureBundle parity (mot/feature_bundle.h:23): per-track ring
    of recent ReID embeddings; appearance = best match over bundle."""
    from dynamic_vins_tpu.mot.tracker import MotConfig, \
        MultiObjectTracker

    def fake_embed(img, boxes):
        # embedding = normalized box center (deterministic appearance)
        c = np.stack([(boxes[:, 0] + boxes[:, 2]) / 2,
                      (boxes[:, 1] + boxes[:, 3]) / 2], -1)
        c = np.concatenate([c, np.ones((len(boxes), 1))], -1)
        return c / np.linalg.norm(c, axis=-1, keepdims=True)

    mot = MultiObjectTracker(MotConfig(n_init=1, feature_budget=3),
                             embed_fn=fake_embed)
    img = np.zeros((100, 100), np.float32)
    for k in range(6):
        box = np.array([[10 + 2 * k, 10, 40 + 2 * k, 40]], float)
        out = mot.update(box, img=img)
    t = mot.tracks[0]
    assert len(t.features) == 3          # ring trimmed to budget
    # bundle scores a revisit of an OLD appearance higher than the
    # latest-only feature would
    old_feat = fake_embed(img, np.array([[16, 10, 46, 40]], float))[0]
    assert t.appearance_score(old_feat) >= float(
        np.dot(t.features[-1], old_feat))
