"""Frontend feature stream serialization for frontend-free replay.

Capability parity with `utils/io/feature_serialization.{h,cpp}` +
the replay hook at `system/main.cpp:287-295`: record every
FrameFeatures emitted by the frontend to a file, then re-run the
backend deterministically without images. Format: one JSON line per
frame (timestamp, point features, line features, instances optional).
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

import numpy as np

from dynamic_vins_tpu.estimator.estimator import FrameFeatures


def _arr(x):
    return None if x is None else np.asarray(x).tolist()


def serialize_frame(frame: FrameFeatures, imu=None) -> str:
    feats = {
        str(fid): [_arr(pl), _arr(vl), _arr(pr), _arr(vr)]
        for fid, (pl, vl, pr, vr) in frame.features.items()
    }
    rec = {"t": frame.timestamp, "features": feats}
    if frame.lines:
        rec["lines"] = {
            str(lid): [_arr(s), _arr(e), _arr(sr), _arr(er)]
            for lid, (s, e, sr, er) in frame.lines.items()}
    if imu is not None:
        acc, gyr, dts = imu
        rec["imu"] = [_arr(acc), _arr(gyr), _arr(dts)]
    return json.dumps(rec)


def deserialize_frame(line: str):
    rec = json.loads(line)
    feats = {}
    for fid, (pl, vl, pr, vr) in rec["features"].items():
        feats[int(fid)] = (
            np.asarray(pl), np.asarray(vl),
            None if pr is None else np.asarray(pr),
            None if vr is None else np.asarray(vr))
    lines = None
    if "lines" in rec:
        lines = {}
        for lid, (s, e, sr, er) in rec["lines"].items():
            lines[int(lid)] = (
                np.asarray(s), np.asarray(e),
                None if sr is None else np.asarray(sr),
                None if er is None else np.asarray(er))
    imu = None
    if "imu" in rec:
        acc, gyr, dts = rec["imu"]
        imu = (np.asarray(acc), np.asarray(gyr), np.asarray(dts))
    return FrameFeatures(rec["t"], feats, lines), imu


class FeatureRecorder:
    def __init__(self, path: str):
        self._f = open(path, "w")

    def record(self, frame: FrameFeatures, imu=None):
        self._f.write(serialize_frame(frame, imu) + "\n")

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def replay(path: str) -> Iterator:
    """Yield (FrameFeatures, imu_interval) from a recorded stream."""
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                yield deserialize_frame(line)
