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

    # f64-CPU baseline of the protocol metric, in a CPU subprocess that
    # runs CONCURRENTLY with the TPU sections (the chip is held by this
    # process; the child pins jax to cpu+x64). Ceres runs in double
    # (marginalization_factor.cpp) — the f32 gap must be measured
    # against an f64 run of the SAME aligned protocol (VERDICT r4 #4).
    import os
    import subprocess
    f64_proc = None
    if not os.environ.get("DV_BENCH_FAST"):
        try:
            env = dict(os.environ)
            env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
            f64_proc = subprocess.Popen(
                [sys.executable, "-m",
                 "dynamic_vins_tpu.tools.accuracy_probe",
                 "--platform", "cpu", "--x64", "--seeds", "1"],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                env=env, cwd="/root/repo")
        except Exception:
            f64_proc = None

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
    e2e_dyn_ms = dyn_ego_ate = dyn_ego_ate_raw = None
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
        # ego ATE on the aligned protocol (evo_ape --align), raw kept
        # as a detail row — consistent with the headline e2e_ate_m
        from dynamic_vins_tpu.io import evaluation as _ev
        _td = np.array([o.timestamp for o in outs_d])
        _pd = np.stack([o.p for o in outs_d])
        _gtd = np.stack([np.asarray(sim_mod.state_at(ts)[0])
                         for ts in _td])
        dyn_ego_ate = _ev.ate_rmse(_td, _pd, _td, _gtd, align=True)
        dyn_ego_ate_raw = frontend_sim.ate_rmse(_pd, _gtd)
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
            # uint8 like a real camera (4x cheaper tunnel H2D: the f32
            # stereo pair alone was ~20 ms/frame of channel time)
            imgs.append((
                np.asarray(render_j(seqS.gt_p[k], seqS.gt_q[k],
                                    0)).astype(np.uint8),
                np.asarray(render_j(seqS.gt_p[k], seqS.gt_q[k],
                                    1)).astype(np.uint8)))

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

    # secondary: DYNAMIC image-domain System loop (VERDICT r4 #1): the
    # reference's 100 ms / 10 Hz budget covers its full dynamic
    # pipeline — seg masks + 2D<->3D association
    # (image_process.cpp:105-238), MOT + per-object tracking
    # (dynamic_tracker.cpp:348), then the backend (main.cpp:300-308).
    # Rendered moving objects + SOLO-like masks + disparity + Box3D
    # through System.process in DYNAMIC mode; also the NAIVE
    # (mask-gated, VIODE-style) mode row (VERDICT r4 #7,
    # eval_viode_odometry.sh:137 gate).
    e2e_sysdyn_ms = sysdyn_stages = sysdyn_ate = None
    e2e_sysnaive_ms = None
    try:
        if (os.environ.get("DV_BENCH_FAST")
                or (time.perf_counter() - t_script0) > 1700.0):
            raise RuntimeError("skip dynamic system e2e")
        from dynamic_vins_tpu.geometry import lie as lie_mod
        from dynamic_vins_tpu.io import evaluation as ev_mod
        from dynamic_vins_tpu.sim import dynamic_scene, frontend_sim
        from dynamic_vins_tpu.sim import render
        from dynamic_vins_tpu.sim import synthetic as sim_mod
        from dynamic_vins_tpu.system import FrameInput, System
        from dynamic_vins_tpu.utils.config import SlamMode, VioConfig

        F_D = 26
        rigD = render.small_rig(0.5, jnp.float32)
        seqD = sim_mod.generate_sequence(num_frames=F_D, imu_hz=200.0,
                                         acc_noise=0.05,
                                         gyr_noise=0.005,
                                         num_landmarks=200, seed=0)
        seqD = seqD._replace(rig=rigD)
        framesD, _ = dynamic_scene.make_dynamic_scene(
            seqD, num_objects=2, seed=0)
        frames_imuD = frontend_sim.make_frames(seqD)
        ftD = np.asarray(seqD.frame_times)

        def cfg_for(mode):
            c = VioConfig()
            c.window_size = 10
            c.slam = mode
            c.pipelined = True
            c.mot_n_init = 2
            c.image_width, c.image_height = rigD.width, rigD.height
            c.intrinsics_left = [float(rigD.intr.fx),
                                 float(rigD.intr.fy),
                                 float(rigD.intr.cx),
                                 float(rigD.intr.cy)]
            c.intrinsics_right = c.intrinsics_left
            T0 = np.eye(4)
            T0[:3, :3] = np.asarray(jax.jit(lie_mod.quat_to_matrix)(
                rigD.q_bc))
            T0[:3, 3] = np.asarray(rigD.p_bc)
            prD, qrD = rigD.right_extrinsics()
            T1 = np.eye(4)
            T1[:3, :3] = np.asarray(jax.jit(lie_mod.quat_to_matrix)(
                qrD))
            T1[:3, 3] = np.asarray(prD)
            c.body_T_cam0 = T0.reshape(-1).tolist()
            c.body_T_cam1 = T1.reshape(-1).tolist()
            return c

        def drive_mode(mode):
            sysm = System(cfg_for(mode),
                          output_prefix="/tmp/dv_bench_sysdyn")
            sysm.estimator.set_initial_pose(
                np.asarray(seqD.gt_p[0]), np.asarray(seqD.gt_q[0]),
                np.asarray(sim_mod.state_at(seqD.frame_times[0])[2]))
            times, outs = [], []
            for k in range(F_D):
                if k == 16:
                    sysm.reset_timers()
                _, imu = frames_imuD[k]
                df = framesD[k]
                if mode == SlamMode.DYNAMIC:
                    fi = FrameInput(float(ftD[k]), df.img_left,
                                    df.img_right, imu=imu, seg=df.seg,
                                    boxes3d=df.boxes3d,
                                    disparity=df.disparity)
                else:      # NAIVE: mask-gated rejection only
                    dyn_mask = (df.seg.masks.any(0)
                                if len(df.seg.masks) else None)
                    fi = FrameInput(float(ftD[k]), df.img_left,
                                    df.img_right, imu=imu,
                                    dynamic_mask=dyn_mask)
                f_t0 = time.perf_counter()
                o = sysm.process(fi)
                times.append(time.perf_counter() - f_t0)
                if o is not None:
                    outs.append(o)
            outs.extend(sysm.drain())
            summary = sysm.close()
            return times, summary, outs

        drive_mode(SlamMode.DYNAMIC)           # warm compiles
        times_sd, sysdyn_stages, outs_sd = drive_mode(SlamMode.DYNAMIC)
        e2e_sysdyn_ms = float(np.median(np.array(times_sd[14:]) * 1000))
        t_sd = np.array([o.timestamp for o in outs_sd])
        p_sd = np.stack([o.p for o in outs_sd])
        gt_sd = np.stack([np.asarray(sim_mod.state_at(ts)[0])
                          for ts in t_sd])
        sysdyn_ate = ev_mod.ate_rmse(t_sd, p_sd, t_sd, gt_sd,
                                     align=True)
        drive_mode(SlamMode.NAIVE)             # warm compiles
        times_sn, _, _ = drive_mode(SlamMode.NAIVE)
        e2e_sysnaive_ms = float(np.median(np.array(times_sn[14:])
                                          * 1000))
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
    # join the concurrent f64-CPU protocol baseline
    f64_ate = f64_ate_raw = None
    if f64_proc is not None:
        try:
            stdout, _ = f64_proc.communicate(
                timeout=max(300.0, 2200.0 - (time.perf_counter()
                                             - t_script0)))
            d64 = json.loads(stdout.decode().strip().splitlines()[-1])
            f64_ate = d64["ate_aligned"]
            f64_ate_raw = d64["ate_raw"]
        except Exception:
            try:
                f64_proc.kill()
            except Exception:
                pass

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
            "e2e_ate_m_f64": f64_ate,       # aligned, CPU x64, seed 0
            "e2e_ate_raw_m_f64": f64_ate_raw,
            "e2e_dynamic_ms_per_frame": (round(e2e_dyn_ms, 1)
                                         if e2e_dyn_ms is not None
                                         else None),
            "e2e_dynamic_ego_ate_m": (round(float(dyn_ego_ate), 4)
                                      if dyn_ego_ate is not None
                                      else None),
            "e2e_dynamic_ego_ate_raw_m": (
                round(float(dyn_ego_ate_raw), 4)
                if dyn_ego_ate_raw is not None else None),
            "e2e_line_ms_per_frame": (round(e2e_line_ms, 1)
                                      if e2e_line_ms is not None
                                      else None),
            "e2e_system_ms_per_frame": (round(e2e_sys_ms, 1)
                                        if e2e_sys_ms is not None
                                        else None),
            "e2e_system_stages": sys_stages,   # mean ms per stage
            "e2e_system_dynamic_ms_per_frame": (
                round(e2e_sysdyn_ms, 1)
                if e2e_sysdyn_ms is not None else None),
            "e2e_system_dynamic_stages": sysdyn_stages,
            "e2e_system_dynamic_ego_ate_m": (
                round(float(sysdyn_ate), 4)
                if sysdyn_ate is not None else None),
            "e2e_naive_ms_per_frame": (
                round(e2e_sysnaive_ms, 1)
                if e2e_sysnaive_ms is not None else None),
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
