"""Shipped synthetic-trained weights for the online perception nets.

The reference ships none of its NN weights either — they come from
mmdetection/mmdetection3d model zoos (README.md dependency list) and
are converted offline (`scripts/python/conv_model_format.py`). This
container has no network egress, so the checkpoints under
`dynamic_vins_tpu/weights/` are trained in-repo on the exact-ground-
truth synthetic generators (`training/data.py`) via
`python -m dynamic_vins_tpu.training.cli`. They prove the full online
path (net -> fused decode -> tracker/estimator) end to end and give
each task non-trivial accuracy on its synthetic distribution; swap in
zoo-converted weights through the same `params_path` argument for real
datasets.

`MANIFEST.json` pins the constructor hyperparameters each checkpoint
was trained with (flax param shapes must match; image size and
max_disp/iters are free — the nets are fully convolutional, the stereo
aggregation treats disparity as a spatial axis, and RAFT's recurrent
update shares parameters across iterations).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

WEIGHTS_DIR = os.path.join(os.path.dirname(__file__), os.pardir,
                           "weights")


def manifest() -> Dict[str, Any]:
    path = os.path.join(WEIGHTS_DIR, "MANIFEST.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def weights_path(task: str) -> Optional[str]:
    """Path of the shipped checkpoint for `task`, or None."""
    entry = manifest().get(task)
    if entry is None:
        return None
    path = os.path.join(WEIGHTS_DIR, entry["file"])
    return path if os.path.exists(path) else None


def hyperparams(task: str) -> Dict[str, Any]:
    """Model-constructor kwargs the checkpoint was trained with."""
    return dict(manifest().get(task, {}).get("model", {}))


def load_online(task: str, image_hw, intrinsics=None, **overrides):
    """Build the online wrapper for `task` with the shipped weights.

    task: 'solo' | 'det3d' | 'stereo' | 'flow' | 'reid'. Extra kwargs
    override the wrapper's own arguments (thresholds etc.); the
    model-shape kwargs always come from the manifest.
    """
    path = weights_path(task)
    hp = hyperparams(task)
    if task == "solo":
        from dynamic_vins_tpu.models.solov2 import OnlineDetector2D

        return OnlineDetector2D(image_hw, params_path=path,
                                **{**hp, **overrides})
    if task == "det3d":
        from dynamic_vins_tpu.models.det3d import OnlineDetector3D

        if intrinsics is None:
            raise ValueError("det3d needs intrinsics (fx,fy,cx,cy)")
        return OnlineDetector3D(image_hw, intrinsics, params_path=path,
                                **{**hp, **overrides})
    if task == "stereo":
        from dynamic_vins_tpu.models.stereo_net import \
            OnlineStereoMatcher

        return OnlineStereoMatcher(image_hw, params_path=path,
                                   **{**hp, **overrides})
    if task == "flow":
        from dynamic_vins_tpu.models.raft import OnlineFlowEstimator

        return OnlineFlowEstimator(image_hw, params_path=path,
                                   **{**hp, **overrides})
    if task == "reid":
        from dynamic_vins_tpu.models.reid import ReidExtractor

        return ReidExtractor(params_path=path, **{**hp, **overrides})
    raise ValueError(f"unknown task {task!r}")
