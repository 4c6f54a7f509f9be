"""float32 regression coverage (the dtype the TPU actually runs).

conftest.py forces x64 on globally, and x64-off cannot be restored
per-test once jit caches exist — so the f32 runs happen in a
subprocess with JAX_ENABLE_X64 unset. Rationale: the
eigenvalue-floor episode (commit 9778711) showed estimator accuracy is
dtype-dependent; without these, f32 regressions are only caught by
bench on the real chip.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # e2e sequences; fast subset: -m 'not slow'

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_E2E_SCRIPT = r"""
import json
import jax
jax.config.update("jax_platforms", "cpu")
assert not jax.config.jax_enable_x64

import numpy as np
from dynamic_vins_tpu.estimator.estimator import Estimator, EstimatorConfig
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
est = Estimator(EstimatorConfig(num_frames=11, lm_capacity=512,
                                obs_capacity=8192, pipelined=True),
                p_bc, q_bc)
est.set_initial_pose(np.asarray(seq.gt_p[0]), np.asarray(seq.gt_q[0]),
                     np.asarray(sim_mod.state_at(seq.frame_times[0])[2]))
outs = []
for frame, imu in frontend_sim.make_frames(seq, pixel_noise=0.5, seed=1):
    o = est.process_frame(frame, imu)
    if o is not None:
        outs.append(o)
outs.extend(est.flush())
ate = frontend_sim.ate_rmse(
    np.stack([o.p for o in outs]),
    np.stack([np.asarray(sim_mod.state_at(o.timestamp)[0])
              for o in outs]))
from dynamic_vins_tpu.io import evaluation as ev
t = np.array([o.timestamp for o in outs])
p = np.stack([o.p for o in outs])
gt = np.stack([np.asarray(sim_mod.state_at(ts)[0]) for ts in t])
ate_aligned = ev.ate_rmse(t, p, t, gt, align=True)
print(json.dumps({"ate": float(ate), "ate_aligned": float(ate_aligned),
                  "frames": len(outs)}))
"""

_SOLVER_SCRIPT = r"""
import json
import jax
jax.config.update("jax_platforms", "cpu")
assert not jax.config.jax_enable_x64

import jax.numpy as jnp
import numpy as np
from dynamic_vins_tpu.sim import ba_problems
from dynamic_vins_tpu.solver import gauss_newton as gn
from dynamic_vins_tpu.utils.precision import precise_jit

ba = ba_problems.build(num_frames=11, num_landmarks=400,
                       obs_capacity=4096, lm_capacity=512,
                       pixel_noise=0.5, seed=0)
state0 = ba_problems.perturb_state(ba.gt_state, pos_sigma=0.05,
                                   rot_sigma=0.02, seed=1)
cfg = gn.SolverConfig(use_imu=True, max_iters=10)
solve = precise_jit(lambda s, d, p: gn.solve(s, d, p, cfg))
st, dep, info = solve(state0, ba.gt_inv_depth, ba.problem)
err = float(jnp.max(jnp.linalg.norm(st.p - ba.gt_state.p, axis=-1)))
print(json.dumps({"final_cost": float(info.final_cost),
                  "initial_cost": float(info.initial_cost),
                  "pos_err": err}))
"""


def _run_f32(script):
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stderr[-4000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_solver_converges_f32():
    """The windowed LM solve must converge in pure float32."""
    res = _run_f32(_SOLVER_SCRIPT)
    assert res["final_cost"] < 0.05 * res["initial_cost"]
    assert res["pos_err"] < 0.05


def test_e2e_ate_f32():
    """42-frame noisy protocol in float32: ATE within the f32 target.

    Guards the f32/f64 accuracy gap (VERDICT r3: f32 TPU median was
    0.0635 vs 0.032 f64; the equilibrated marginalization eigh closes
    most of it). Threshold has ~2x headroom over the measured value on
    this seed so frontend-noise variance doesn't flake the suite; a
    real dtype regression (like the 1e-12 eig floor) is 3-10x.
    """
    res = _run_f32(_E2E_SCRIPT)
    assert res["frames"] >= 40
    assert res["ate"] < 0.10, res
    # reference protocol (evo_ape --align): gauge removed, the stable
    # drift-shape metric; measured 0.020-0.025 across seeds in f32
    assert res["ate_aligned"] < 0.045, res
