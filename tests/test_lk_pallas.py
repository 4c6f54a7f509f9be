"""Pallas LK kernel (interpreter mode — numerics match the XLA path)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.frontend import pyramid as pyr
from dynamic_vins_tpu.frontend.lk import _lk_level
from dynamic_vins_tpu.ops import lk_pallas


def _pair(shift=(3.2, -2.4), seed=0, H=240, W=320):
    rng = np.random.default_rng(seed)
    img0 = pyr.gaussian_blur5(
        jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32))
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    img1 = pyr.bilinear_sample(
        img0, jnp.stack([xx - shift[0], yy - shift[1]], -1))
    return img0, img1


def test_pallas_lk_recovers_shift():
    img0, img1 = _pair()
    rng = np.random.default_rng(1)
    N = 32
    pts = jnp.asarray(np.stack([rng.uniform(80, 240, N),
                                rng.uniform(80, 160, N)], -1),
                      jnp.float32)
    flow, ok = lk_pallas.lk_level(img0, img1, pts,
                                  jnp.zeros((N, 2), jnp.float32),
                                  radius=10, iters=12, interpret=True)
    flow = np.asarray(flow)[np.asarray(ok)]
    med = np.median(flow, axis=0)
    np.testing.assert_allclose(med, [3.2, -2.4], atol=0.05)


def test_pallas_matches_xla_level():
    img0, img1 = _pair(seed=3)
    rng = np.random.default_rng(2)
    N = 16
    pts = jnp.asarray(np.stack([rng.uniform(100, 220, N),
                                rng.uniform(100, 140, N)], -1),
                      jnp.float32)
    z = jnp.zeros((N, 2), jnp.float32)
    f_p, ok_p = lk_pallas.lk_level(img0, img1, pts, z, radius=10,
                                   iters=10, interpret=True)
    f_x, ok_x = _lk_level(img0, img1, pts, z, 10, 10)
    # same template-patch formulation: flows agree sub-0.1px on the
    # points both accept
    both = np.asarray(ok_p) & np.asarray(ok_x)
    assert both.sum() >= N * 0.7
    d = np.abs(np.asarray(f_p)[both] - np.asarray(f_x)[both])
    assert np.median(d) < 0.1, np.median(d)


def test_pallas_lk_with_nonzero_guess():
    img0, img1 = _pair(shift=(14.0, 6.0), seed=5)
    rng = np.random.default_rng(4)
    N = 16
    pts = jnp.asarray(np.stack([rng.uniform(100, 220, N),
                                rng.uniform(80, 150, N)], -1),
                      jnp.float32)
    # coarse guess (e.g. from a coarser pyramid level)
    guess = jnp.tile(jnp.asarray([[12.0, 5.0]], jnp.float32), (N, 1))
    flow, ok = lk_pallas.lk_level(img0, img1, pts, guess, radius=10,
                                  iters=12, interpret=True)
    flow = np.asarray(flow)[np.asarray(ok)]
    med = np.median(flow, axis=0)
    np.testing.assert_allclose(med, [14.0, 6.0], atol=0.1)
