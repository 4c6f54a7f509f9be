"""ORB extractor: corners, orientation, descriptors, matching."""

import numpy as np
import pytest


def _checker_img(h=96, w=128, seed=0):
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w), np.float32)
    # scatter bright blobs -> strong FAST corners at blob edges
    for _ in range(40):
        y, x = rng.randint(20, h - 20), rng.randint(20, w - 20)
        img[y:y + 6, x:x + 6] = 200.0
    img += rng.uniform(0, 10, (h, w)).astype(np.float32)
    return img


def test_fast_detects_blob_corners():
    from dynamic_vins_tpu.frontend.orb import OrbExtractor

    img = _checker_img()
    orb = OrbExtractor(n_features=128, n_levels=2)
    res = orb(img)
    valid = np.asarray(res.response) > 0
    assert valid.sum() > 20
    xy = np.asarray(res.xy)[valid]
    assert xy[:, 0].max() < img.shape[1]
    assert np.all(np.isfinite(np.asarray(res.angle)))


def test_orb_matching_under_shift():
    """Descriptors of the same scene shifted by a few px must match."""
    from dynamic_vins_tpu.frontend.orb import (OrbExtractor,
                                               match_descriptors)

    img = _checker_img()
    img2 = np.roll(img, (3, 5), (0, 1))
    orb = OrbExtractor(n_features=96, n_levels=1)
    r1, r2 = orb(img), orb(img2)
    v1 = np.asarray(r1.response) > 0
    v2 = np.asarray(r2.response) > 0
    m = match_descriptors(np.asarray(r1.desc)[v1],
                          np.asarray(r2.desc)[v2], max_dist=40)
    assert len(m) >= 6
    xy1 = np.asarray(r1.xy)[v1][m[:, 0]]
    xy2 = np.asarray(r2.xy)[v2][m[:, 1]]
    d = xy2 - xy1
    med = np.median(d, axis=0)
    assert np.allclose(med, [5.0, 3.0], atol=1.5)


def test_orb_rotation_invariant_angle():
    from dynamic_vins_tpu.frontend.orb import OrbExtractor

    img = _checker_img()
    orb = OrbExtractor(n_features=64, n_levels=1)
    res = orb(img)
    a = np.asarray(res.angle)
    assert np.all((a >= -np.pi) & (a <= np.pi))
