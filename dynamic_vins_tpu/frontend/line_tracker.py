"""Line segment detection and frame-to-frame tracking.

Capability parity with `LineDetector`
(`line_detector/line_detector.cpp`): LSD detection (`Detect:60` — host
OpenCV LSD, matching the reference's choice of a CPU LSD), geometric +
appearance matching with the reference's gates (descriptor distance,
endpoint motion < 200 px, angle difference < 0.1 rad,
`line_detector.cpp:116-126`), id assignment, mask gating, and
left-right stereo matching.

Descriptors: instead of the thirdparty LBD binary descriptor (4.4k LoC
C++), lines are described by a normalized intensity-gradient profile
sampled in a band around the segment (computed with the JAX bilinear
sampler) — same role, jit-friendly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    import cv2
except Exception:                                  # pragma: no cover
    cv2 = None

from dynamic_vins_tpu.frontend import pyramid as pyr


class LineSeg(NamedTuple):
    sx: float
    sy: float
    ex: float
    ey: float
    id: int = -1

    @property
    def angle(self):
        return np.arctan2(self.ey - self.sy, self.ex - self.sx)

    @property
    def length(self):
        return float(np.hypot(self.ex - self.sx, self.ey - self.sy))

    @property
    def center(self):
        return np.array([(self.sx + self.ex) / 2,
                         (self.sy + self.ey) / 2])


@dataclass
class LineTrackerConfig:
    min_length: float = 30.0
    max_lines: int = 50
    match_motion: float = 200.0      # endpoint motion gate (px)
    match_angle: float = 0.1         # angle gate (rad)
    desc_thresh: float = 0.6         # correlation threshold
    band_samples: int = 16


def detect_lines(img_u8: np.ndarray, cfg: LineTrackerConfig,
                 mask: Optional[np.ndarray] = None) -> List[LineSeg]:
    """LSD detection with length filter and optional mask gating."""
    if cv2 is None:
        return []
    lsd = cv2.createLineSegmentDetector()
    out = lsd.detect(img_u8)
    segs = []
    if out[0] is None:
        return segs
    for l in out[0].reshape(-1, 4):
        seg = LineSeg(float(l[0]), float(l[1]), float(l[2]), float(l[3]))
        if seg.length < cfg.min_length:
            continue
        if mask is not None:
            c = seg.center.astype(int)
            h, w = mask.shape
            if not mask[np.clip(c[1], 0, h - 1), np.clip(c[0], 0, w - 1)]:
                continue
        segs.append(seg)
    segs.sort(key=lambda s: -s.length)
    return _balanced_select(segs, cfg.max_lines)


def _balanced_select(segs: List[LineSeg], max_lines: int
                     ) -> List[LineSeg]:
    """Horizontal/vertical balance top-up (line_detector.cpp:160-192):
    when the budget binds, neither orientation class may be starved —
    near-horizontal (|angle| < 45 deg) and near-vertical lines each get
    up to half the budget, with slack flowing to the fuller class.
    Keeps both line DoF families observable in corridor-like scenes."""
    if len(segs) <= max_lines:
        return segs
    horiz, vert = [], []
    for s in segs:                       # already length-sorted
        a = abs(np.arctan2(np.sin(s.angle), np.cos(s.angle)))
        a = min(a, np.pi - a)            # fold to [0, pi/2]
        (horiz if a < np.pi / 4 else vert).append(s)
    half = max_lines // 2
    take_h = min(len(horiz), max(half, max_lines - len(vert)))
    take_v = max_lines - take_h
    out = horiz[:take_h] + vert[:take_v]
    out.sort(key=lambda s: -s.length)
    return out


def _descriptors(img_j, segs: List[LineSeg], n_samples: int):
    """Normalized intensity profile along each segment [K, n_samples]."""
    if not segs:
        return np.zeros((0, n_samples), np.float32)
    t = jnp.linspace(0.0, 1.0, n_samples)
    s = jnp.asarray([[g.sx, g.sy] for g in segs], img_j.dtype)
    e = jnp.asarray([[g.ex, g.ey] for g in segs], img_j.dtype)
    coords = s[:, None, :] + (e - s)[:, None, :] * t[None, :, None]
    vals = pyr.bilinear_sample(img_j, coords)
    vals = vals - jnp.mean(vals, axis=1, keepdims=True)
    norm = jnp.linalg.norm(vals, axis=1, keepdims=True)
    return np.asarray(vals / jnp.maximum(norm, 1e-6))


def match_lines(prev: List[LineSeg], prev_desc, cur: List[LineSeg],
                cur_desc, cfg: LineTrackerConfig):
    """Greedy best-correlation matching with geometric gates.

    Returns list of (i_prev, i_cur). A profile may be reversed if the
    detector flipped endpoints — both orientations are scored."""
    matches = []
    if not prev or not cur:
        return matches
    corr = cur_desc @ prev_desc.T                         # [C, P]
    corr_rev = cur_desc[:, ::-1] @ prev_desc.T
    corr = np.maximum(corr, corr_rev)
    used_prev = set()
    order = np.argsort(-corr.max(axis=1))
    for ci in order:
        pi = int(np.argmax(corr[ci]))
        if pi in used_prev or corr[ci, pi] < cfg.desc_thresh:
            continue
        a = abs(np.arctan2(np.sin(cur[ci].angle - prev[pi].angle),
                           np.cos(cur[ci].angle - prev[pi].angle)))
        a = min(a, np.pi - a)
        if a > cfg.match_angle:
            continue
        if np.linalg.norm(cur[ci].center - prev[pi].center) \
                > cfg.match_motion:
            continue
        matches.append((pi, ci))
        used_prev.add(pi)
    return matches


class LineTracker:
    """Stateful frame-to-frame line tracking with persistent ids."""

    def __init__(self, cfg: LineTrackerConfig = LineTrackerConfig()):
        self.cfg = cfg
        self.prev_segs: List[LineSeg] = []
        self.prev_desc = None
        self._next_id = 0

    def track(self, img: np.ndarray, mask: Optional[np.ndarray] = None,
              img_right: Optional[np.ndarray] = None):
        """Returns (segs with ids, right matches {id: LineSeg}).

        img: grayscale uint8 or float [H,W]."""
        cfg = self.cfg
        img_u8 = img.astype(np.uint8) if img.dtype != np.uint8 else img
        img_j = jnp.asarray(img, jnp.float32)
        segs = detect_lines(img_u8, cfg, mask)
        desc = _descriptors(img_j, segs, cfg.band_samples)

        ids = [-1] * len(segs)
        if self.prev_segs:
            for pi, ci in match_lines(self.prev_segs, self.prev_desc,
                                      segs, desc, cfg):
                ids[ci] = self.prev_segs[pi].id
        out = []
        for seg, i in zip(segs, ids):
            if i < 0:
                i = self._next_id
                self._next_id += 1
            out.append(seg._replace(id=i))

        right = {}
        if img_right is not None:
            img_r_u8 = img_right.astype(np.uint8) \
                if img_right.dtype != np.uint8 else img_right
            segs_r = detect_lines(img_r_u8, cfg)
            desc_r = _descriptors(jnp.asarray(img_right, jnp.float32),
                                  segs_r, cfg.band_samples)
            for li, ri in match_lines(out, _np_or(desc, out), segs_r,
                                      desc_r, cfg):
                right[out[li].id] = segs_r[ri]

        self.prev_segs = out
        self.prev_desc = desc
        return out, right


def _np_or(desc, segs):
    return desc if len(segs) else np.zeros((0, 16), np.float32)
