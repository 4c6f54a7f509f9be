#!/usr/bin/env python
"""Benchmark: BA iterations/s on the reference-size sliding window.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's Ceres budget is <=10 iterations in <=0.08 s
(kitti_tracking.yaml:70-71, estimator.cpp:297-314) => ~125 iter/s
ceiling on its CPU. We measure full LM iterations (jacobian build +
Schur solve + cost re-evaluation) on the reference-size problem:
11-frame window, 1000 landmark slots, ~4000 projection rows, IMU
factors + marginalization prior columns active.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CERES_BASELINE_ITERS_PER_S = 125.0


def main():
    t_script0 = time.perf_counter()
    dtype = jnp.float32

    import os
    if os.environ.get("DV_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")

    import dynamic_vins_tpu
    dynamic_vins_tpu.enable_compile_cache()

    from dynamic_vins_tpu.imu import preintegration as pre
    from dynamic_vins_tpu.sim import ba_problems
    from dynamic_vins_tpu.solver import gauss_newton as gn

    # f32-friendly IMU noise floor (keeps the whitened system within
    # float32 dynamic range; see SolverConfig/Jacobi preconditioning)
    noise = pre.ImuNoise(acc_n=0.08, gyr_n=0.004, acc_w=1e-3, gyr_w=1e-4)

    ba = ba_problems.build(num_frames=11, num_landmarks=900,
                           obs_capacity=8192, lm_capacity=1024,
                           pixel_noise=0.5, seed=0)

    # re-preintegrate with the f32 noise model, cast problem to f32
    def cast(x):
        if hasattr(x, "dtype") and x.dtype == jnp.float64:
            return x.astype(dtype)
        return x

    problem = jax.tree.map(cast, ba.problem)
    # rebuild preintegration covariance with floored noise in f64 then cast
    seq = ba.seq
    F = 11
    ipf = round(float((seq.imu_times.shape[0] - 1) / (F - 1)))
    zeros = jnp.zeros(3)

    def edge(k):
        a, b = k * ipf, (k + 1) * ipf
        return pre.preintegrate(seq.acc[a:b + 1], seq.gyr[a:b + 1],
                                jnp.diff(seq.imu_times[a:b + 1]),
                                zeros, zeros, noise=noise)

    pres = jax.tree.map(lambda *xs: jnp.stack(xs).astype(dtype),
                        *[edge(k) for k in range(F - 1)])
    problem = problem._replace(pres=pres)

    state0 = jax.tree.map(cast, ba_problems.perturb_state(
        ba.gt_state, pos_sigma=0.05, rot_sigma=0.02, seed=1))
    dep0 = ba.gt_inv_depth.astype(dtype)

    ITERS = 10
    cfg = gn.SolverConfig(use_imu=True, max_iters=ITERS)
    from dynamic_vins_tpu.utils.precision import precise_jit
    solve = precise_jit(lambda s, d, p: gn.solve(s, d, p, cfg))

    # warmup/compile (twice: compile, then one clean warm run)
    st, dep, info = solve(state0, dep0, problem)
    jax.block_until_ready(st.p)
    if not bool(np.isfinite(float(info.final_cost))):
        print(json.dumps({"metric": "ba_iterations_per_s", "value": 0.0,
                          "unit": "iter/s", "vs_baseline": 0.0,
                          "error": "non-finite cost"}))
        return 1
    st, dep, info = solve(state0, dep0, problem)
    jax.block_until_ready(st.p)

    # Tunnel-robust measurement (the chip is remote-attached; a single
    # tunnel stall can eat a 2x margin — BENCH_r02 recorded 74 ms for a
    # solve the builder measured at 30 ms).  Three estimators:
    #   * queued rounds: R solves dispatched back-to-back, one sync.
    #     Async dispatch overlaps the tunnel, so t/R -> device time as
    #     R grows; min over M rounds rejects stalls.
    #   * synced solves: block after each -> wall-clock incl. round
    #     trip; median is the honest per-call latency.
    #   * tunnel RTT: trivial-op round trip, to explain the gap.
    def _queued_round(R):
        t0 = time.perf_counter()
        for _ in range(R):
            s, _, _ = solve(state0, dep0, problem)
        jax.block_until_ready(s.p)
        return (time.perf_counter() - t0) / R

    R, M = 8, 4
    queued = [_queued_round(R) for _ in range(M)]
    best_q = min(queued)

    sync_times = []
    for _ in range(7):
        t0 = time.perf_counter()
        s, _, _ = solve(state0, dep0, problem)
        jax.block_until_ready(s.p)
        sync_times.append(time.perf_counter() - t0)
    sync_med = float(np.median(sync_times))
    sync_min = float(np.min(sync_times))

    one = jnp.zeros(8, dtype)
    trivial = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(trivial(one))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(trivial(one))
        rtts.append(time.perf_counter() - t0)
    rtt_ms = float(np.median(rtts)) * 1000

    # device-only estimate: best queued per-solve minus the single
    # round trip amortized over the round
    device_ms = max(best_q * 1000 - rtt_ms / R, 0.0)
    iters_per_s = ITERS / best_q

    # secondary: end-to-end estimator frame loop. Pipelined steady state
    # (device-resident window; frame k+1 dispatches without waiting on
    # frame k) measured as throughput over the steady-state frames; the
    # sequential megastep's latency recorded alongside. Skipped when the
    # primary bench already ate the time budget (cold remote compiles —
    # the persistent cache makes reruns warm) or under DV_BENCH_FAST.
    import os
    e2e_ms = e2e_ate = e2e_seq_ms = e2e_ate_raw = None
    e2e_ate_seeds = e2e_ate_raw_seeds = None
    t_budget_ok = (time.perf_counter() - t_script0) < 800.0
    try:
        if os.environ.get("DV_BENCH_FAST") or not t_budget_ok:
            raise RuntimeError("skip e2e")
        from dynamic_vins_tpu.estimator.estimator import (Estimator,
                                                          EstimatorConfig)
        from dynamic_vins_tpu.sim import frontend_sim
        from dynamic_vins_tpu.sim import synthetic as sim_mod

        seq2 = sim_mod.generate_sequence(num_frames=42, imu_hz=200.0,
                                         acc_noise=0.05,
                                         gyr_noise=0.005,
                                         num_landmarks=250, seed=0)
        fr2 = frontend_sim.make_frames(seq2, pixel_noise=0.5)
        rig = seq2.rig
        p_bc = np.stack([np.asarray(rig.p_bc),
                         np.asarray(rig.right_extrinsics()[0])])
        q_bc = np.stack([np.asarray(rig.q_bc),
                         np.asarray(rig.right_extrinsics()[1])])

        def drive(pipelined, n_frames=None, frames=None):
            est = Estimator(EstimatorConfig(
                num_frames=11, lm_capacity=512, obs_capacity=8192,
                pipelined=pipelined), p_bc, q_bc)
            est.set_initial_pose(
                np.asarray(seq2.gt_p[0]), np.asarray(seq2.gt_q[0]),
                np.asarray(sim_mod.state_at(seq2.frame_times[0])[2]))
            outs, times = [], []
            frames = frames if frames is not None else fr2
            if n_frames is not None:
                frames = frames[:n_frames]
            for frame, imu in frames:
                f_t0 = time.perf_counter()
                o = est.process_frame(frame, imu)
                times.append(time.perf_counter() - f_t0)
                if o is not None:
                    outs.append(o)
            t_fl = time.perf_counter()
            outs.extend(est.flush())
            flush_s = time.perf_counter() - t_fl
            return est, outs, times, flush_s

        def ate_of(outs):
            return frontend_sim.ate_rmse(
                np.stack([o.p for o in outs]),
                np.stack([np.asarray(sim_mod.state_at(o.timestamp)[0])
                          for o in outs]))

        def ate_aligned(outs):
            # the reference's own protocol is `evo_ape tum --align`
            # (scripts/eval_*_odometry.sh): Umeyama SE(3) alignment
            # before the RMSE — global gauge (yaw+origin) removed
            from dynamic_vins_tpu.io import evaluation as ev
            t = np.array([o.timestamp for o in outs])
            p = np.stack([o.p for o in outs])
            gt = np.stack([np.asarray(sim_mod.state_at(ts)[0])
                           for ts in t])
            return ev.ate_rmse(t, p, t, gt, align=True)

        # seed-1 drive doubles as the compile warm-up; then measure the
        # steady-state throughput on the seed-0 protocol. Single-seed
        # ATE is noisy (spread 0.03-0.16 m measured): record the median
        # over 3 frontend noise draws (identical shapes, no recompiles).
        fr_s1 = frontend_sim.make_frames(seq2, pixel_noise=0.5, seed=1)
        _, outs_s1, _, _ = drive(True, frames=fr_s1)
        est, outs, times, flush_s = drive(True)
        n_steady = len(times) - 18
        e2e_ms = float((sum(times[18:]) + flush_s) / n_steady * 1000)
        all_outs = [outs, outs_s1]
        fr_s2 = frontend_sim.make_frames(seq2, pixel_noise=0.5, seed=2)
        _, outs_s2, _, _ = drive(True, frames=fr_s2)
        all_outs.append(outs_s2)
        # headline ATE follows the reference protocol (evo_ape --align);
        # the raw unaligned diff is kept as a detail row
        ates = [float(ate_aligned(o)) for o in all_outs]
        ates_raw = [float(ate_of(o)) for o in all_outs]
        e2e_ate = float(np.median(ates))
        e2e_ate_seeds = [round(a, 4) for a in ates]
        e2e_ate_raw = float(np.median(ates_raw))
        e2e_ate_raw_seeds = [round(a, 4) for a in ates_raw]
        _, _, times_s, _ = drive(False)
        e2e_seq_ms = float(np.median(np.array(times_s[18:]) * 1000))
    except Exception:
        if os.environ.get("DV_BENCH_DEBUG"):
            import traceback
            traceback.print_exc()

    # secondary: dynamic-mode frame time (ego VIO + K object pipeline;
    # the mode the project is named for — VERDICT r2 asked for a
    # recorded TPU number). Reference budget: 10 Hz design point.
    e2e_dyn_ms = dyn_ego_ate = None
    try:
        if (os.environ.get("DV_BENCH_FAST")
                or (time.perf_counter() - t_script0) > 800.0):
            raise RuntimeError("skip dynamic e2e")
        from dynamic_vins_tpu.estimator.estimator import (Estimator,
                                                          EstimatorConfig)
        from dynamic_vins_tpu.sim import frontend_sim
        from dynamic_vins_tpu.sim import objects as objsim
        from dynamic_vins_tpu.sim import synthetic as sim_mod

        seqd = sim_mod.generate_sequence(num_frames=30, imu_hz=200.0,
                                         acc_noise=0.05, gyr_noise=0.005,
                                         num_landmarks=250, seed=0)
        frd = frontend_sim.make_frames(seqd, pixel_noise=0.5)
        instd, _ = objsim.make_object_frames(seqd, num_objects=2, seed=0)
        rig = seqd.rig
        p_bc = np.stack([np.asarray(rig.p_bc),
                         np.asarray(rig.right_extrinsics()[0])])
        q_bc = np.stack([np.asarray(rig.q_bc),
                         np.asarray(rig.right_extrinsics()[1])])

        def drive_dyn():
            est = Estimator(EstimatorConfig(
                num_frames=11, lm_capacity=512, obs_capacity=8192,
                dynamic=True, pipelined=True), p_bc, q_bc)
            est.set_initial_pose(
                np.asarray(seqd.gt_p[0]), np.asarray(seqd.gt_q[0]),
                np.asarray(sim_mod.state_at(seqd.frame_times[0])[2]))
            outs, times = [], []
            for (frame, imu), inst in zip(frd, instd):
                f_t0 = time.perf_counter()
                o = est.process_frame(frame, imu, instances=inst)
                times.append(time.perf_counter() - f_t0)
                if o is not None:
                    outs.append(o)
            outs.extend(est.flush())
            return outs, times

        drive_dyn()                       # warm compiles
        outs_d, times_d = drive_dyn()
        e2e_dyn_ms = float(np.median(np.array(times_d[15:]) * 1000))
        dyn_ego_ate = frontend_sim.ate_rmse(
            np.stack([o.p for o in outs_d]),
            np.stack([np.asarray(sim_mod.state_at(o.timestamp)[0])
                      for o in outs_d]))
    except Exception:
        if os.environ.get("DV_BENCH_DEBUG"):
            import traceback
            traceback.print_exc()

    # secondary: LinePoint-mode frame time
    e2e_line_ms = None
    try:
        if (os.environ.get("DV_BENCH_FAST")
                or (time.perf_counter() - t_script0) > 1100.0):
            raise RuntimeError("skip line e2e")
        from dynamic_vins_tpu.estimator.estimator import (Estimator,
                                                          EstimatorConfig,
                                                          FrameFeatures)
        from dynamic_vins_tpu.sim import frontend_sim
        from dynamic_vins_tpu.sim import synthetic as sim_mod

        rng_l = np.random.default_rng(0)
        seql = sim_mod.generate_sequence(num_frames=30, imu_hz=200.0,
                                         acc_noise=0.05, gyr_noise=0.005,
                                         num_landmarks=250, seed=0)
        frl = frontend_sim.make_frames(seql, pixel_noise=0.5)
        s_w, e_w = frontend_sim.make_line_segments(40, seed=9)
        line_obs = [frontend_sim.line_obs_for_frame(seql, k, s_w, e_w,
                                                    rng_l)
                    for k in range(len(frl))]
        rig = seql.rig
        p_bc = np.stack([np.asarray(rig.p_bc),
                         np.asarray(rig.right_extrinsics()[0])])
        q_bc = np.stack([np.asarray(rig.q_bc),
                         np.asarray(rig.right_extrinsics()[1])])

        def drive_line():
            est = Estimator(EstimatorConfig(
                num_frames=11, lm_capacity=512, obs_capacity=8192,
                use_line=True, line_capacity=64,
                line_obs_capacity=512, pipelined=True), p_bc, q_bc)
            est.set_initial_pose(
                np.asarray(seql.gt_p[0]), np.asarray(seql.gt_q[0]),
                np.asarray(sim_mod.state_at(seql.frame_times[0])[2]))
            times = []
            for k, (frame, imu) in enumerate(frl):
                frame = FrameFeatures(frame.timestamp, frame.features,
                                      line_obs[k])
                f_t0 = time.perf_counter()
                est.process_frame(frame, imu)
                times.append(time.perf_counter() - f_t0)
            est.flush()
            return times

        drive_line()                      # warm compiles
        times_l = drive_line()
        e2e_line_ms = float(np.median(np.array(times_l[15:]) * 1000))
    except Exception:
        if os.environ.get("DV_BENCH_DEBUG"):
            import traceback
            traceback.print_exc()

    # secondary: FULL image-domain System loop (VERDICT r3 #4): rendered
    # stereo frames through System.process — perception + fused image
    # tracker + backend — so the recorded number covers the WHOLE
    # pipeline the reference's 100 ms / 10 Hz budget applies to
    # (main.cpp:300-308), not just the backend.
    e2e_sys_ms = None
    sys_stages = None
    try:
        if (os.environ.get("DV_BENCH_FAST")
                or (time.perf_counter() - t_script0) > 1400.0):
            raise RuntimeError("skip system e2e")
        from dynamic_vins_tpu.geometry import lie as lie_mod
        from dynamic_vins_tpu.sim import frontend_sim, render
        from dynamic_vins_tpu.sim import synthetic as sim_mod
        from dynamic_vins_tpu.system import FrameInput, System
        from dynamic_vins_tpu.utils.config import SlamMode, VioConfig

        rigS = render.small_rig(0.5, jnp.float32)
        seqS = sim_mod.generate_sequence(num_frames=26, imu_hz=200.0,
                                         acc_noise=0.05,
                                         gyr_noise=0.005,
                                         num_landmarks=200, seed=0)
        seqS = seqS._replace(rig=rigS)
        intenS = render.make_intensities(200, seed=0)
        render_j = jax.jit(lambda p, q, c: render.render_frame(
            rigS, p, q, seqS.landmarks, intenS, cam=c),
            static_argnums=2)
        imgs = []
        for k in range(26):
            imgs.append((
                np.asarray(render_j(seqS.gt_p[k], seqS.gt_q[k], 0)),
                np.asarray(render_j(seqS.gt_p[k], seqS.gt_q[k], 1))))

        cfgS = VioConfig()
        cfgS.window_size = 10
        cfgS.slam = SlamMode.RAW
        cfgS.pipelined = True
        cfgS.image_width, cfgS.image_height = rigS.width, rigS.height
        cfgS.intrinsics_left = [float(rigS.intr.fx),
                                float(rigS.intr.fy),
                                float(rigS.intr.cx),
                                float(rigS.intr.cy)]
        cfgS.intrinsics_right = cfgS.intrinsics_left
        T0 = np.eye(4)
        T0[:3, :3] = np.asarray(jax.jit(lie_mod.quat_to_matrix)(
            rigS.q_bc))
        T0[:3, 3] = np.asarray(rigS.p_bc)
        prS, qrS = rigS.right_extrinsics()
        T1 = np.eye(4)
        T1[:3, :3] = np.asarray(jax.jit(lie_mod.quat_to_matrix)(qrS))
        T1[:3, 3] = np.asarray(prS)
        cfgS.body_T_cam0 = T0.reshape(-1).tolist()
        cfgS.body_T_cam1 = T1.reshape(-1).tolist()
        frames_imu = frontend_sim.make_frames(seqS)

        # host copy of the timestamps: float(device_scalar) inside the
        # frame loop is a D2H sync that drains the whole device queue
        ftS = np.asarray(seqS.frame_times)

        def drive_sys():
            sysm = System(cfgS, output_prefix="/tmp/dv_bench_sys")
            sysm.estimator.set_initial_pose(
                np.asarray(seqS.gt_p[0]), np.asarray(seqS.gt_q[0]),
                np.asarray(sim_mod.state_at(seqS.frame_times[0])[2]))
            times = []
            for k in range(26):
                if k == 16:        # stage means over steady state only
                    # (k=14 can still pay a one-off persistent-cache load)
                    sysm.reset_timers()
                _, imu = frames_imu[k]
                f_t0 = time.perf_counter()
                sysm.process(FrameInput(float(ftS[k]),
                                        imgs[k][0], imgs[k][1],
                                        imu=imu))
                times.append(time.perf_counter() - f_t0)
            sysm.estimator.flush()
            summary = sysm.close()
            return times, summary

        drive_sys()                       # warm compiles
        times_sys, sys_summary = drive_sys()
        e2e_sys_ms = float(np.median(np.array(times_sys[14:]) * 1000))
        sys_stages = sys_summary
    except Exception:
        if os.environ.get("DV_BENCH_DEBUG"):
            import traceback
            traceback.print_exc()

    # secondary: pallas LK kernel rate (256 features x 10 iterations)
    lk_ms = None
    try:
        from dynamic_vins_tpu.frontend import pyramid as pyr
        from dynamic_vins_tpu.ops import lk_pallas

        rng = np.random.default_rng(0)
        im0 = pyr.gaussian_blur5(jnp.asarray(
            rng.uniform(0, 255, (480, 752)), jnp.float32))
        im1 = jnp.roll(im0, 3, axis=1)
        pts = jnp.asarray(np.stack([rng.uniform(150, 600, 256),
                                    rng.uniform(150, 330, 256)], -1),
                          jnp.float32)
        z = jnp.zeros((256, 2), jnp.float32)
        f, _ = lk_pallas.lk_level(im0, im1, pts, z)
        jax.block_until_ready(f)
        t2 = time.perf_counter()
        for _ in range(10):
            f, _ = lk_pallas.lk_level(im0, im1, pts, z)
        jax.block_until_ready(f)
        lk_ms = (time.perf_counter() - t2) / 10 * 1000
    except Exception:
        if os.environ.get("DV_BENCH_DEBUG"):
            import traceback
            traceback.print_exc()
    out = {
        "metric": "ba_iterations_per_s",
        "value": round(iters_per_s, 2),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_s / CERES_BASELINE_ITERS_PER_S, 3),
        "detail": {
            "window_frames": 11,
            "landmark_slots": 1024,
            "obs_rows": 8192,
            "dtype": "float32",
            "device": str(jax.devices()[0]),
            "solve_ms_10iter": round(best_q * 1000, 2),
            "solve_ms_10iter_sync_median": round(sync_med * 1000, 2),
            "solve_ms_10iter_sync_min": round(sync_min * 1000, 2),
            "solve_ms_10iter_queued_rounds": [round(q * 1000, 2)
                                              for q in queued],
            "device_ms_10iter": round(device_ms, 2),
            "tunnel_rtt_ms": round(rtt_ms, 2),
            "cost_drop": [float(info.initial_cost),
                          float(info.final_cost)],
            "pallas_lk_ms_256pts": (round(lk_ms, 3)
                                    if lk_ms is not None else None),
            "e2e_ms_per_frame": (round(e2e_ms, 1)
                                 if e2e_ms is not None else None),
            "e2e_seq_ms_per_frame": (round(e2e_seq_ms, 1)
                                     if e2e_seq_ms is not None else None),
            "e2e_ate_m": (round(float(e2e_ate), 4)
                          if e2e_ate is not None else None),
            "e2e_ate_m_seeds": e2e_ate_seeds,
            "e2e_ate_raw_m": (round(float(e2e_ate_raw), 4)
                              if e2e_ate_raw is not None else None),
            "e2e_ate_raw_m_seeds": e2e_ate_raw_seeds,
            "e2e_dynamic_ms_per_frame": (round(e2e_dyn_ms, 1)
                                         if e2e_dyn_ms is not None
                                         else None),
            "e2e_dynamic_ego_ate_m": (round(float(dyn_ego_ate), 4)
                                      if dyn_ego_ate is not None
                                      else None),
            "e2e_line_ms_per_frame": (round(e2e_line_ms, 1)
                                      if e2e_line_ms is not None
                                      else None),
            "e2e_system_ms_per_frame": (round(e2e_sys_ms, 1)
                                        if e2e_sys_ms is not None
                                        else None),
            "e2e_system_stages": sys_stages,   # mean ms per stage
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
