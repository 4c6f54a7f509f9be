"""Online perception models: shapes, jit-compilation, decode logic."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


HW = (64, 96)


def test_solov2_forward_and_decode():
    from dynamic_vins_tpu.models.solov2 import OnlineDetector2D

    det = OnlineDetector2D(HW, max_dets=8)
    img = np.random.randint(0, 255, HW, np.uint8)
    seg = det(img)
    assert seg.masks.ndim == 3
    if len(seg.masks):
        assert seg.masks.shape[1:] == HW
        assert np.all(seg.scores > 0)
    # second call must not retrace (same shapes)
    det(img)


def test_matrix_nms_suppresses_duplicates():
    from dynamic_vins_tpu.models.solov2 import matrix_nms

    m1 = np.zeros(100, np.float32)
    m1[:40] = 1
    m2 = np.zeros(100, np.float32)
    m2[:38] = 1          # ~0.95 IoU with m1
    m3 = np.zeros(100, np.float32)
    m3[60:] = 1          # disjoint
    masks = jnp.asarray(np.stack([m1, m2, m3]))
    labels = jnp.asarray([1, 1, 1])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    out = np.asarray(matrix_nms(masks, labels, scores, sigma=0.5))
    assert out[0] == pytest.approx(0.9)          # top survives
    assert out[1] < 0.2                          # duplicate decayed
    assert out[2] == pytest.approx(0.7, rel=0.05)  # disjoint survives

    # different label -> no suppression
    out2 = np.asarray(matrix_nms(masks, jnp.asarray([1, 2, 1]), scores,
                                 sigma=0.5))
    assert out2[1] == pytest.approx(0.8)


def test_stereo_soft_argmin_decode():
    """Hand-crafted cost volume -> soft-argmin picks the right disparity."""
    d, h, w = 16, 4, 4
    cost = np.full((1, d, h, w), 10.0, np.float32)
    cost[0, 5] = -10.0                           # best disparity = 5
    prob = jax.nn.softmax(-jnp.asarray(cost), axis=1)
    cand = jnp.arange(d, dtype=jnp.float32)
    disp = jnp.einsum("bdhw,d->bhw", prob, cand)
    assert np.allclose(np.asarray(disp), 5.0, atol=1e-3)


def test_stereo_net_runs():
    from dynamic_vins_tpu.models.stereo_net import OnlineStereoMatcher

    m = OnlineStereoMatcher(HW, max_disp=32)
    a = np.random.randint(0, 255, HW, np.uint8)
    b = np.roll(a, -3, axis=1)
    disp = m(a, b)
    assert disp.shape == HW
    assert np.all(np.isfinite(disp))
    assert disp.min() >= 0 and disp.max() <= 32


def test_correlation_volume_peak():
    """Correlation volume peaks at the true shift for identical rows."""
    from dynamic_vins_tpu.models.stereo_net import correlation_volume

    rng = np.random.RandomState(0)
    fl = rng.randn(1, 4, 32, 16).astype(np.float32)
    fr = np.roll(fl, -5, axis=2)                 # right shifted left 5
    vol = np.asarray(correlation_volume(jnp.asarray(fl),
                                        jnp.asarray(fr), 12))
    # disparity d matches when right[x-d] == left[x] -> d = 5
    mean = vol[0, :, :, 8:28].mean(axis=(1, 2, 3))
    assert mean.argmax() == 5


def test_det3d_decode_geometry():
    from dynamic_vins_tpu.models.det3d import OnlineDetector3D

    det = OnlineDetector3D(HW, (100.0, 100.0, 48.0, 32.0), max_dets=4,
                           score_thresh=0.0)
    img = np.random.randint(0, 255, HW, np.uint8)
    boxes = det(img)
    for b in boxes:
        assert b.dims.shape == (3,)
        assert np.all(b.dims > 0)
        assert np.isfinite(b.bottom_center).all()
        assert -np.pi <= b.yaw <= np.pi


def test_raft_flow_runs():
    from dynamic_vins_tpu.models.raft import OnlineFlowEstimator

    est = OnlineFlowEstimator(HW, iters=2)
    a = np.random.randint(0, 255, HW, np.uint8)
    flow = est(a, a)
    assert flow.shape == HW + (2,)
    assert np.all(np.isfinite(flow))


def test_raft_lookup_bilinear():
    from dynamic_vins_tpu.models.raft import lookup

    h, w = 6, 8
    corr = jnp.asarray(np.arange(h * w, dtype=np.float32)
                       .reshape(1, h, w))
    coords = jnp.asarray([[2.5, 3.0]])          # x=2.5, y=3
    out = np.asarray(lookup(corr, coords, radius=0))
    assert out[0, 0] == pytest.approx(3 * w + 2.5)


def test_reid_embeddings():
    from dynamic_vins_tpu.models.reid import ReidExtractor

    ext = ReidExtractor(max_boxes=4)
    img = np.random.randint(0, 255, (64, 96), np.uint8)
    boxes = np.array([[5, 5, 30, 60], [40, 10, 70, 55]])
    emb = ext(img, boxes)
    assert emb.shape == (2, 128)
    assert np.allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)
    # same crop -> same embedding; deterministic
    emb2 = ext(img, boxes)
    assert np.allclose(emb, emb2)


def test_mot_with_embed_fn():
    from dynamic_vins_tpu.models.reid import ReidExtractor
    from dynamic_vins_tpu.mot.tracker import (MotConfig,
                                              MultiObjectTracker)

    ext = ReidExtractor(max_boxes=4)
    mot = MultiObjectTracker(MotConfig(n_init=1), embed_fn=ext)
    img = np.random.randint(0, 255, (64, 96), np.uint8)
    dets = np.array([[5.0, 5, 30, 60]])
    a = mot.update(dets, img=img)
    b = mot.update(dets + 1.0, img=img)
    assert a[0] == b[0]                          # track persists


def test_params_save_load_roundtrip(tmp_path):
    from dynamic_vins_tpu.models.reid import ReidNet
    from dynamic_vins_tpu.models.solov2 import load_params, save_params

    net = ReidNet()
    p = net.init(jax.random.PRNGKey(0),
                 jnp.zeros((1, 64, 32, 3)))
    path = str(tmp_path / "w.npz")
    save_params(p, path)
    p2 = jax.tree.map(jnp.zeros_like, p)
    p3 = load_params(p2, path)
    chk = jax.tree.map(lambda a, b: np.allclose(a, b), p, p3)
    assert all(jax.tree.leaves(chk))
