"""Accuracy probe: the bench e2e protocol at a chosen dtype/platform.

Prints ONE JSON line {"ate_aligned": ..., "ate_raw": ..., "seeds": N}.
Used by bench.py (subprocess, CPU+f64) to record the f64 baseline of
the protocol metric next to the f32-TPU number (VERDICT r4 Missing #4:
Ceres runs in double, marginalization_factor.cpp — the rebuild's f32
gap must be measured against an f64 run of the SAME aligned protocol,
scripts/eval_euroc_odometry.sh:85).

    python -m dynamic_vins_tpu.tools.accuracy_probe --platform cpu \
        --x64 --seeds 1
"""

from __future__ import annotations

import argparse
import json


def run_protocol(seeds, pipelined: bool = True):
    """The exact bench.py e2e protocol: 42-frame sequence, window 11,
    512 landmark slots, pixel noise 0.5, seed-varied frontend draws."""
    import numpy as np

    from dynamic_vins_tpu.estimator.estimator import (Estimator,
                                                      EstimatorConfig)
    from dynamic_vins_tpu.io import evaluation as ev
    from dynamic_vins_tpu.sim import frontend_sim
    from dynamic_vins_tpu.sim import synthetic as sim_mod

    seq = sim_mod.generate_sequence(num_frames=42, imu_hz=200.0,
                                    acc_noise=0.05, gyr_noise=0.005,
                                    num_landmarks=250, seed=0)
    rig = seq.rig
    p_bc = np.stack([np.asarray(rig.p_bc),
                     np.asarray(rig.right_extrinsics()[0])])
    q_bc = np.stack([np.asarray(rig.q_bc),
                     np.asarray(rig.right_extrinsics()[1])])

    ates, ates_raw = [], []
    for seed in seeds:
        frames = frontend_sim.make_frames(seq, pixel_noise=0.5,
                                          seed=seed)
        est = Estimator(EstimatorConfig(
            num_frames=11, lm_capacity=512, obs_capacity=8192,
            pipelined=pipelined), p_bc, q_bc)
        est.set_initial_pose(
            np.asarray(seq.gt_p[0]), np.asarray(seq.gt_q[0]),
            np.asarray(sim_mod.state_at(seq.frame_times[0])[2]))
        outs = []
        for frame, imu in frames:
            o = est.process_frame(frame, imu)
            if o is not None:
                outs.append(o)
        outs.extend(est.flush())
        t = np.array([o.timestamp for o in outs])
        p = np.stack([o.p for o in outs])
        gt = np.stack([np.asarray(sim_mod.state_at(ts)[0]) for ts in t])
        ates.append(float(ev.ate_rmse(t, p, t, gt, align=True)))
        ates_raw.append(float(frontend_sim.ate_rmse(p, gt)))
    import numpy as np
    return float(np.median(ates)), float(np.median(ates_raw)), \
        [round(a, 4) for a in ates]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--seeds", type=int, default=1)
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    ate, ate_raw, per_seed = run_protocol(list(range(args.seeds)))
    print(json.dumps({"ate_aligned": round(ate, 4),
                      "ate_raw": round(ate_raw, 4),
                      "per_seed": per_seed,
                      "x64": bool(args.x64)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
