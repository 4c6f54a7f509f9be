"""Frontend kernels: LK tracking, corner detection, image ops."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.frontend import corners, lk, pyramid as pyr


def _texture(H=240, W=320, seed=0, smooth=2):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, size=(H, W))
    x = jnp.asarray(img, jnp.float32)
    for _ in range(smooth):
        x = pyr.gaussian_blur5(x)
    return x


def _shift_image(img, dx, dy):
    """Subpixel shift via bilinear sampling: out(x) = img(x - d)."""
    H, W = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=img.dtype),
                          jnp.arange(W, dtype=img.dtype), indexing="ij")
    coords = jnp.stack([xx - dx, yy - dy], axis=-1)
    return pyr.bilinear_sample(img, coords)


def test_bilinear_sample_exact_on_grid():
    img = _texture(64, 64)
    xy = jnp.asarray([[3.0, 5.0], [10.0, 20.0]])
    v = pyr.bilinear_sample(img, xy)
    np.testing.assert_allclose(np.asarray(v),
                               [float(img[5, 3]), float(img[20, 10])],
                               rtol=1e-6)


def test_lk_recovers_translation():
    img0 = _texture()
    shift = (7.3, -4.6)
    img1 = _shift_image(img0, *shift)
    # avoid border effects: points well inside
    rng = np.random.default_rng(1)
    N = 64
    pts = np.stack([rng.uniform(40, 280, N), rng.uniform(40, 200, N)],
                   axis=-1).astype(np.float32)
    tracker = lk.make_tracker(levels=3, radius=10, iters=12)
    pts1, ok = tracker(img0, img1, jnp.asarray(pts),
                       jnp.ones(N, bool))
    ok = np.asarray(ok)
    assert ok.sum() > N * 0.8, f"only {ok.sum()} tracked"
    flow = np.asarray(pts1)[ok] - pts[ok]
    np.testing.assert_allclose(flow.mean(axis=0), shift, atol=0.1)
    assert np.abs(flow - np.asarray(shift)).max() < 0.5


def test_lk_large_motion_via_pyramid():
    img0 = _texture(H=320, W=480, seed=3, smooth=1)
    img1 = _shift_image(img0, 25.0, 13.0)
    # track corners (as the real pipeline does), not random positions
    pts_all, _, found = corners.detect(img0, max_corners=64, min_dist=16,
                                       border=40)
    sel = np.asarray(found)
    pts = np.asarray(pts_all)[sel].astype(np.float32)
    N = len(pts)
    assert N >= 20
    tracker = lk.make_tracker(levels=5, radius=10, iters=15,
                              fb_thresh=1.0)
    pts1, ok = tracker(img0, img1, jnp.asarray(pts), jnp.ones(N, bool))
    ok = np.asarray(ok)
    assert ok.sum() > N * 0.5, ok.sum()
    flow = np.asarray(pts1)[ok] - pts[ok]
    med = np.median(flow, axis=0)
    np.testing.assert_allclose(med, (25.0, 13.0), atol=0.2)


def test_lk_rejects_occluded():
    img0 = _texture()
    img1 = _texture(seed=99)   # unrelated image
    rng = np.random.default_rng(3)
    N = 32
    pts = np.stack([rng.uniform(40, 280, N), rng.uniform(40, 200, N)],
                   axis=-1).astype(np.float32)
    tracker = lk.make_tracker(levels=3)
    _, ok = tracker(img0, img1, jnp.asarray(pts), jnp.ones(N, bool))
    assert np.asarray(ok).sum() < N * 0.3


def test_corner_detection_finds_synthetic_corners():
    # checkerboard has strong corners at cell boundaries
    H = W = 256
    cell = 32
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = (((yy // cell) + (xx // cell)) % 2).astype(np.float32) * 255.0
    img_j = pyr.gaussian_blur5(jnp.asarray(img))
    pts, score, found = corners.detect(img_j, max_corners=100,
                                       min_dist=16, quality=0.05)
    found = np.asarray(found)
    assert found.sum() >= 40
    p = np.asarray(pts)[found]
    # all detections near lattice crossings (multiples of cell)
    off = np.minimum(p % cell, cell - (p % cell))
    assert np.max(off) < 4.0


def test_corner_exclusion_mask():
    img = _texture(128, 128, seed=5)
    pts0, _, found0 = corners.detect(img, max_corners=30, min_dist=12)
    # exclude everything found; re-detect => far from old points
    pts1, _, found1 = corners.detect(img, max_corners=30, min_dist=12,
                                     exclude_pts=pts0,
                                     exclude_valid=found0)
    p0 = np.asarray(pts0)[np.asarray(found0)]
    p1 = np.asarray(pts1)[np.asarray(found1)]
    if len(p1) and len(p0):
        d = np.linalg.norm(p1[:, None] - p0[None, :], axis=-1).min(1)
        assert d.min() > 4.0


def test_erode_dilate_roundtrip():
    m = np.zeros((32, 32), bool)
    m[8:24, 8:24] = True
    mj = jnp.asarray(m)
    er = pyr.erode3(mj, 2)
    assert np.asarray(er).sum() == (16 - 4) ** 2
    di = pyr.dilate3(er, 2)
    np.testing.assert_array_equal(np.asarray(di), m)


def test_track_by_dense_flow():
    # FeatureTrackByDenseFlow parity: constant-translation field
    import jax.numpy as jnp
    from dynamic_vins_tpu.frontend import lk

    H, W = 64, 96
    flow = np.zeros((H, W, 2), np.float32)
    flow[..., 0], flow[..., 1] = 3.0, -2.0
    pts = jnp.asarray([[10.0, 10.0], [50.0, 30.0], [94.0, 5.0]],
                      jnp.float32)
    valid = jnp.ones(3, bool)
    p1, ok = lk.track_by_dense_flow(jnp.asarray(flow), pts, valid,
                                    jnp.asarray(-flow))
    assert np.allclose(np.asarray(p1)[0], [13.0, 8.0])
    assert bool(ok[0]) and bool(ok[1]) and not bool(ok[2])
    # inconsistent backward field fails the fwd-bwd check
    bad = np.zeros((H, W, 2), np.float32)
    _, ok2 = lk.track_by_dense_flow(jnp.asarray(flow), pts, valid,
                                    jnp.asarray(bad))
    assert not bool(ok2[0])


def test_lk_fb_levels1_matches_full_backward():
    """Seeded level-0 backward check (fb_levels=1, the TPU/pallas
    default — 4x fewer backward level kernels) keeps the same inliers
    and flows as the full-pyramid backward pass on good matches, and
    still rejects occluded features."""
    img0 = _texture(H=320, W=480, seed=3, smooth=1)
    img1 = _shift_image(img0, 25.0, 13.0)
    pts_all, _, found = corners.detect(img0, max_corners=64,
                                       min_dist=16, border=40)
    pts = np.asarray(pts_all)[np.asarray(found)].astype(np.float32)
    N = len(pts)
    tr_full = lk.make_tracker(levels=5, radius=10, iters=15,
                              fb_thresh=1.0)
    tr_fb1 = lk.make_tracker(levels=5, radius=10, iters=15,
                             fb_thresh=1.0, fb_levels=1)
    p_full, ok_full = tr_full(img0, img1, jnp.asarray(pts),
                              jnp.ones(N, bool))
    p_fb1, ok_fb1 = tr_fb1(img0, img1, jnp.asarray(pts),
                           jnp.ones(N, bool))
    ok_full, ok_fb1 = np.asarray(ok_full), np.asarray(ok_fb1)
    both = ok_full & ok_fb1
    assert both.sum() >= 0.9 * max(ok_full.sum(), 1)
    np.testing.assert_allclose(np.asarray(p_fb1)[both],
                               np.asarray(p_full)[both], atol=0.05)

    # occlusion still rejected: blank a region in img1
    img1_occ = np.asarray(img1).copy()
    img1_occ[100:220, 150:330] = 0.0
    _, ok_occ = tr_fb1(img0, jnp.asarray(img1_occ), jnp.asarray(pts),
                       jnp.ones(N, bool))
    occluded = (pts[:, 0] > 150 + 40) & (pts[:, 0] < 330 - 40) \
        & (pts[:, 1] > 100 + 40) & (pts[:, 1] < 220 - 40)
    if occluded.sum():
        assert (~np.asarray(ok_occ)[occluded]).mean() >= 0.5
