"""Dynamic-mode e2e timing: ego VIO + per-object estimation per frame.

Measures the full dynamic pipeline (megastep ego solve + instance
pipeline: push/propagate/init/triangulate/classify/optimize/reject) on
the current backend and prints a JSON summary. The reference's budget
for the same work is its 10 Hz design point (kitti_tracking.yaml:59).

Usage: python -m dynamic_vins_tpu.tools.dynamic_bench [--frames N]
       [--objects K] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--objects", type=int, default=2)
    ap.add_argument("--window", type=int, default=11)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--warm-frames", type=int, default=None,
                    help="frames to skip before timing (default: window+4)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dynamic_vins_tpu
    dynamic_vins_tpu.enable_compile_cache()

    from dynamic_vins_tpu.estimator.estimator import (Estimator,
                                                      EstimatorConfig)
    from dynamic_vins_tpu.sim import frontend_sim, objects as objsim
    from dynamic_vins_tpu.sim import synthetic as sim

    seq = sim.generate_sequence(num_frames=args.frames, imu_hz=200.0,
                                acc_noise=0.05, gyr_noise=0.005,
                                num_landmarks=250, seed=0)
    frames = frontend_sim.make_frames(seq, pixel_noise=0.5, seed=0)
    inst_frames, truths = objsim.make_object_frames(
        seq, num_objects=args.objects, seed=0)

    rig = seq.rig
    p_bc = np.stack([np.asarray(rig.p_bc),
                     np.asarray(rig.right_extrinsics()[0])])
    q_bc = np.stack([np.asarray(rig.q_bc),
                     np.asarray(rig.right_extrinsics()[1])])

    def drive():
        est = Estimator(EstimatorConfig(
            num_frames=args.window, lm_capacity=512, obs_capacity=8192,
            dynamic=True), p_bc, q_bc)
        est.set_initial_pose(
            np.asarray(seq.gt_p[0]), np.asarray(seq.gt_q[0]),
            np.asarray(sim.state_at(seq.frame_times[0])[2]))
        outs, times = [], []
        for (frame, imu), inst in zip(frames, inst_frames):
            t0 = time.perf_counter()
            o = est.process_frame(frame, imu, instances=inst)
            times.append(time.perf_counter() - t0)
            if o is not None:
                outs.append(o)
        outs.extend(est.flush() if hasattr(est, "flush") else [])
        return est, outs, times

    drive()                      # warm compiles
    est, outs, times = drive()

    warm = args.warm_frames if args.warm_frames is not None \
        else args.window + 4
    steady = np.array(times[warm:]) * 1000
    ate = frontend_sim.ate_rmse(
        np.stack([o.p for o in outs]),
        np.stack([np.asarray(sim.state_at(o.timestamp)[0])
                  for o in outs]))

    # object accuracy at the last frame
    obj_err = {}
    states = est.get_instance_states()
    for t in truths:
        info = states.get(t.track_id)
        if info is None:
            continue
        pe = float(np.linalg.norm(np.asarray(info["p"]) - t.gt_p[-1]))
        ve = float(np.linalg.norm(np.asarray(info["v"]) - t.v_obj)) \
            if "v" in info else None
        obj_err[t.track_id] = dict(pos_err_m=round(pe, 3),
                                   vel_err_mps=(round(ve, 3)
                                                if ve is not None
                                                else None))

    print(json.dumps({
        "metric": "dynamic_e2e_ms_per_frame",
        "value": round(float(np.median(steady)), 1),
        "unit": "ms/frame",
        "detail": {
            "mean_ms": round(float(steady.mean()), 1),
            "p90_ms": round(float(np.percentile(steady, 90)), 1),
            "frames": args.frames, "objects": args.objects,
            "ego_ate_m": round(float(ate), 4),
            "objects_err": obj_err,
            "device": str(jax.devices()[0]),
        }}))


if __name__ == "__main__":
    main()
