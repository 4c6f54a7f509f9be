"""dynamic_vins_tpu — a TPU-native dynamic visual-inertial odometry engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of
chenjianqu/dynamic_vins: stereo/mono VIO with point and line features,
instance-segmentation-gated dynamic-scene handling, multi-object tracking,
and per-object 6-DoF pose + velocity + 3D-box estimation.

Layering (mirrors SURVEY.md §7 build plan):
  geometry/  — Lie groups, cameras, Plücker lines
  imu/       — preintegration (lax.scan) + propagation
  factors/   — residual/Jacobian kernels (IMU, reprojection, line, prior, box)
  solver/    — batched LM/dogleg with dense Schur, marginalization
  frontend/  — LK optical flow, corner detection, line detection (Pallas)
  estimator/ — sliding-window orchestration, feature/instance managers
  mot/       — Kalman + Hungarian multi-object tracking
  parallel/  — mesh/pjit distributed Schur BA
  io/        — dataset readers (EuRoC/KITTI/VIODE) + TUM/MOT writers
  sim/       — synthetic trajectory/IMU/feature simulation for tests & bench
"""

__version__ = "0.1.0"
