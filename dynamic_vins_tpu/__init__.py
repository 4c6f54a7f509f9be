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

__version__ = "0.2.0"


def enable_compile_cache(path: str = "/root/repo/.jax_cache") -> None:
    """Enable JAX's persistent compilation cache (off by default so unit
    tests keep hermetic timing). First TPU compiles through the tunneled
    backend take tens of seconds to minutes (CLAUDE.md); the on-disk
    cache makes every process after the first start warm."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
