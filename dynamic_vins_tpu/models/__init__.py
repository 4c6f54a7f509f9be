"""Online perception model families (JAX/flax, TPU-native).

The reference runs its neural stages via TensorRT/LibTorch or — the
dominant configuration — offline artifacts (SURVEY.md §2 L2). This
package provides the ONLINE equivalents as XLA-compiled networks whose
outputs plug into the exact same `FrameInput` slots as the offline
loaders in `io/perception.py`:

  * `solov2`     — instance segmentation + MatrixNMS  (det2d)
  * `stereo_net` — correlation-volume disparity       (stereo)
  * `det3d`      — FCOS3D-style monocular 3D boxes    (det3d)
  * `raft`       — recurrent dense optical flow       (flow)
  * `reid`       — appearance embeddings for MOT      (mot)
"""

from dynamic_vins_tpu.models.det3d import OnlineDetector3D
from dynamic_vins_tpu.models.raft import OnlineFlowEstimator
from dynamic_vins_tpu.models.reid import ReidExtractor
from dynamic_vins_tpu.models.solov2 import OnlineDetector2D
from dynamic_vins_tpu.models.stereo_net import OnlineStereoMatcher

__all__ = ["OnlineDetector2D", "OnlineDetector3D",
           "OnlineStereoMatcher", "OnlineFlowEstimator",
           "ReidExtractor"]
