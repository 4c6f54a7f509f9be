"""Pipelined tracker split (track_begin/track_collect) vs sync track().

ADVICE r4: the System's async frontend dispatches begin(k+1) BEFORE
collect(k); these tests assert that ordering produces identical
FrameFeatures to the sequential path, and that a RANSAC-style kill
issued while a frame is in flight is never resurrected (pending-kill
mask) — the reference's rejectWithF removes outliers before they are
ever published (background_tracker.cpp:716-757).
"""

import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.frontend import pyramid as pyr
from dynamic_vins_tpu.frontend.tracker import FeatureTracker, TrackerConfig
from dynamic_vins_tpu.geometry.camera import PinholeIntrinsics


def _texture(H=160, W=240, seed=0, smooth=2):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0, 255, size=(H, W)), jnp.float32)
    for _ in range(smooth):
        x = pyr.gaussian_blur5(x)
    return x


def _shift_image(img, dx, dy):
    H, W = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=img.dtype),
                          jnp.arange(W, dtype=img.dtype), indexing="ij")
    return pyr.bilinear_sample(img, jnp.stack([xx - dx, yy - dy], -1))


def _make_seq(n=6, dx=2.5, dy=-1.5, stereo_dx=4.0):
    base = _texture()
    left = [np.asarray(_shift_image(base, k * dx, k * dy))
            for k in range(n)]
    right = [np.asarray(_shift_image(base, k * dx + stereo_dx, k * dy))
             for k in range(n)]
    return left, right


def _tracker(**kw):
    cfg = TrackerConfig(max_cnt=48, min_dist=12, levels=3, border=8,
                        use_ransac_f=False, **kw)
    intr = PinholeIntrinsics.make(200.0, 200.0, 120.0, 80.0,
                                  dtype=jnp.float32)
    return FeatureTracker(cfg, intr)


def _assert_feats_equal(fa, fb, k):
    assert fa.timestamp == fb.timestamp
    assert set(fa.features) == set(fb.features), \
        (k, set(fa.features) ^ set(fb.features))
    for fid in fa.features:
        a, b = fa.features[fid], fb.features[fid]
        for xa, xb in zip(a, b):
            if xa is None or xb is None:
                assert xa is None and xb is None, (k, fid)
            else:
                np.testing.assert_array_equal(np.asarray(xa),
                                              np.asarray(xb), err_msg=f"{k}/{fid}")


def test_pipelined_split_matches_sync_stereo_mask():
    left, right = _make_seq()
    H, W = left[0].shape
    mask = np.ones((H, W), bool)
    mask[:, :40] = False            # mask variant exercised too

    tr_sync = _tracker()
    tr_pipe = _tracker()

    feats_sync = [tr_sync.track(left[k], 0.1 * k, mask=mask,
                                img_right=right[k])
                  for k in range(len(left))]

    # System._use_async_fe ordering: begin(k) ... then collect(k-1)
    feats_pipe = []
    pending = []
    for k in range(len(left)):
        pending.append(tr_pipe.track_begin(left[k], 0.1 * k, mask=mask,
                                           img_right=right[k]))
        if len(pending) > 1:
            feats_pipe.append(tr_pipe.track_collect(pending.pop(0)))
    while pending:                  # close() drain
        feats_pipe.append(tr_pipe.track_collect(pending.pop(0)))

    assert len(feats_sync) == len(feats_pipe)
    for k, (fa, fb) in enumerate(zip(feats_sync, feats_pipe)):
        _assert_feats_equal(fa, fb, k)
    assert len(feats_sync[0].features) > 10


def test_pipelined_split_matches_sync_mono_first_frames():
    left, _ = _make_seq(n=4)
    tr_sync = _tracker(stereo=False)
    tr_pipe = _tracker(stereo=False)
    feats_sync = [tr_sync.track(left[k], 0.1 * k)
                  for k in range(len(left))]
    feats_pipe = []
    pending = []
    for k in range(len(left)):
        pending.append(tr_pipe.track_begin(left[k], 0.1 * k))
        if len(pending) > 1:
            feats_pipe.append(tr_pipe.track_collect(pending.pop(0)))
    while pending:
        feats_pipe.append(tr_pipe.track_collect(pending.pop(0)))
    for k, (fa, fb) in enumerate(zip(feats_sync, feats_pipe)):
        _assert_feats_equal(fa, fb, k)


def _inject_kill(tr, slot):
    """What rejectWithF does at collect time (tracker.py RANSAC block)."""
    tr.valid[slot] = False
    tr._kill[slot] = True
    tr._pending_kill[slot] = True


def test_inflight_kill_is_not_resurrected():
    left, right = _make_seq(n=7)
    tr = _tracker()
    pending = [tr.track_begin(left[0], 0.0, img_right=right[0])]
    pending.append(tr.track_begin(left[1], 0.1, img_right=right[1]))
    f0 = tr.track_collect(pending.pop(0))
    # frame 2 goes in flight, THEN a kill lands (collect(1) RANSAC):
    pending.append(tr.track_begin(left[2], 0.2, img_right=right[2]))
    f1 = tr.track_collect(pending.pop(0))
    slot = int(np.flatnonzero(tr.valid & (tr.track_cnt > 1))[0])
    killed_id = int(tr.ids[slot])
    assert killed_id in f1.features
    _inject_kill(tr, slot)
    # the kill rides dispatch(3); collect(2) must NOT republish the id
    pending.append(tr.track_begin(left[3], 0.3, img_right=right[3]))
    f2 = tr.track_collect(pending.pop(0))
    assert killed_id not in f2.features, \
        "in-flight kill resurrected (pending-kill mask broken)"
    pending.append(tr.track_begin(left[4], 0.4, img_right=right[4]))
    f3 = tr.track_collect(pending.pop(0))
    assert killed_id not in f3.features
    # after the kill has ridden a dispatch the slot is free again: it
    # may be re-assigned, but only under a NEW id
    f4 = tr.track_collect(pending.pop(0))
    assert killed_id not in f4.features
    if bool(tr.valid[slot]):
        assert int(tr.ids[slot]) != killed_id
