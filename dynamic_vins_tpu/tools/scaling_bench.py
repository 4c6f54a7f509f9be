"""Multi-device scaling measurement for the distributed BA solver.

Measures strong scaling of `parallel.dist_ba.make_distributed_solver`
over a 1-D mesh: the observation table (the dominant cost) is sharded
across N devices, the camera-block reduction rides `psum`. Reports
solve time and parallel efficiency for N in {1, 2, 4, 8}.

Run on CPU with a virtual mesh (what this container supports — see
CLAUDE.md; the driver separately dry-runs the sharded path via
`__graft_entry__.dryrun_multichip`):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m dynamic_vins_tpu.tools.scaling_bench

Caveat recorded in the output: virtual CPU devices share one host's
cores, so absolute times measure the collective/partitioning overhead
of the SPMD program, not ICI hardware. On a real slice the same
program's psum rides ICI; the number to watch here is that per-device
work drops ~1/N while the replicated Schur solve stays constant
(Amdahl floor ~178x178 solve + LM control).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def run(devices_list=(1, 2, 4, 8), obs_rows=8192, iters=10, reps=3):
    from dynamic_vins_tpu.parallel import dist_ba
    from dynamic_vins_tpu.sim import ba_problems
    from dynamic_vins_tpu.solver import gauss_newton as gn

    ba = ba_problems.build(num_frames=11, num_landmarks=900,
                           obs_capacity=obs_rows, lm_capacity=1024,
                           pixel_noise=0.5, seed=0)
    state0 = ba_problems.perturb_state(ba.gt_state, pos_sigma=0.05,
                                       rot_sigma=0.02, seed=1)
    cfg = gn.SolverConfig(use_imu=True, max_iters=iters)

    all_devs = jax.devices()
    results = []
    for n in devices_list:
        if n > len(all_devs):
            continue
        mesh = Mesh(np.array(all_devs[:n]), ("lm",))
        solve = dist_ba.make_distributed_solver(mesh, ba.problem, cfg)
        problem = dist_ba.shard_problem(ba.problem, mesh)
        st, dep, info = solve(state0, ba.gt_inv_depth, problem)
        jax.block_until_ready(st.p)
        if not np.isfinite(float(info.final_cost)):
            raise RuntimeError(f"non-finite cost at n={n}")
        t0 = time.perf_counter()
        for _ in range(reps):
            st, dep, info = solve(state0, ba.gt_inv_depth, problem)
        jax.block_until_ready(st.p)
        dt = (time.perf_counter() - t0) / reps
        results.append({"devices": n, "solve_ms": round(dt * 1000, 2),
                        "final_cost": float(info.final_cost)})

    base = results[0]["solve_ms"]
    for r in results:
        r["speedup"] = round(base / r["solve_ms"], 3)
        r["efficiency"] = round(base / r["solve_ms"] / r["devices"], 3)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obs-rows", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--backend", default="cpu",
                    help="cpu (virtual mesh; default) or a real "
                         "multi-chip backend name")
    args = ap.parse_args()
    # env-var JAX_PLATFORMS alone is overridden by the axon
    # sitecustomize (CLAUDE.md); force via config before first use
    jax.config.update("jax_platforms", args.backend)
    results = run(obs_rows=args.obs_rows, iters=args.iters,
                  reps=args.reps)
    print(json.dumps({
        "bench": "dist_ba_strong_scaling",
        "backend": jax.default_backend(),
        "note": ("virtual-mesh timing measures SPMD partitioning/"
                 "collective overhead, not ICI hardware"),
        "results": results}))


if __name__ == "__main__":
    main()
