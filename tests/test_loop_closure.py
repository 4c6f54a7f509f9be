"""Loop closure: ORB keyframe database -> PnP loop edge -> pose graph.

North-star capability (BASELINE.json): loop-closure pose-graph
optimization, including the distributed solve on the virtual mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e sequences; fast subset: -m 'not slow'
from jax.sharding import Mesh

from dynamic_vins_tpu.geometry import lie, lie_np
from dynamic_vins_tpu.loop import LoopCloser, LoopClosureConfig
from dynamic_vins_tpu.sim import render
from dynamic_vins_tpu.sim.synthetic import StereoRig


def _circle_scene(K=25, radius=6.0, n_landmarks=220, seed=3):
    """Camera circles a textured landmark cloud, ending where it began.

    Returns (rig, poses [(p, q)], landmarks, intensities)."""
    rng = np.random.default_rng(seed)
    rig = render.small_rig(0.5, jnp.float64)
    landmarks = jnp.asarray(
        rng.uniform(-2.5, 2.5, size=(n_landmarks, 3))
        * np.array([1.0, 1.0, 0.8]))
    inten = render.make_intensities(n_landmarks, seed=seed)
    poses = []
    for k in range(K):
        th = 2 * np.pi * k / (K - 1)       # last pose == first pose
        p = np.array([radius * np.cos(th), radius * np.sin(th), 0.3])
        x = -p / np.linalg.norm(p)          # body x -> cloud center
        z = np.array([0.0, 0.0, 1.0])
        z = z - x * (z @ x)
        z /= np.linalg.norm(z)
        y = np.cross(z, x)
        R_wb = np.stack([x, y, z], axis=1)
        q = np.asarray(lie.matrix_to_quat(jnp.asarray(R_wb)))
        poses.append((p, q))
    return rig, poses, landmarks, inten


def _drive_closer(mesh=None):
    rig, poses, landmarks, inten = _circle_scene()
    cfg = LoopClosureConfig(min_gap=12, prox_radius=4.0,
                            min_matches=20, min_inliers=10)
    closer = LoopCloser(cfg, rig.intr, np.asarray(rig.p_bc),
                        np.asarray(rig.q_bc))

    render_j = jax.jit(lambda p, q: render.render_frame(
        rig, p, q, landmarks, inten, cam=0))
    depth_j = jax.jit(lambda p, q: render.render_depth(
        rig, p, q, landmarks, cam=0))

    drift_step = np.array([0.035, 0.02, 0.0])
    drifted = []
    for k, (p, q) in enumerate(poses):
        img = np.asarray(render_j(jnp.asarray(p), jnp.asarray(q)))
        dep = np.asarray(depth_j(jnp.asarray(p), jnp.asarray(q)))
        p_vio = p + k * drift_step          # simulated VIO drift
        drifted.append(p_vio)
        closer.add_keyframe(img, 0.1 * k, p_vio, q, depth=dep,
                            frame_idx=k)
    return closer, poses, np.stack(drifted), mesh


def test_loop_closure_cuts_drift():
    closer, poses, drifted, _ = _drive_closer()
    assert len(closer.edges) >= 1, "no loop detected"
    e = closer.edges[-1]
    assert e.j - e.i >= closer.cfg.min_gap

    # the measured loop edge is drift-free: compare against GT relative
    gt_i = poses[e.i]
    gt_j = poses[e.j]
    p_iw, q_iw = lie_np.pose_inverse(gt_i[0], gt_i[1])
    rp_gt, rq_gt = lie_np.pose_compose(p_iw, q_iw, gt_j[0], gt_j[1])
    assert np.linalg.norm(e.rel_p - rp_gt) < 0.15

    out = closer.optimize()
    assert out is not None
    p_corr, q_corr, info = out
    assert float(info["final_cost"]) < float(info["initial_cost"])

    gt_p = np.stack([p for p, _ in poses])
    err_vio = np.linalg.norm(drifted[-1] - gt_p[-1])
    err_pgo = np.linalg.norm(p_corr[len(poses) - 1] - gt_p[-1])
    # closing the loop cuts final drift at least 2x (VERDICT r2 #6)
    assert err_pgo < err_vio / 2.0, (err_vio, err_pgo)


def test_loop_closure_distributed_matches_single():
    closer, poses, drifted, _ = _drive_closer()
    if len(closer.edges) == 0:
        pytest.skip("no loop edge (scene regression)")
    p1, q1, _ = closer.optimize()
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("edge",))
    p8, q8, info8 = closer.optimize(mesh=mesh)
    np.testing.assert_allclose(p8[:len(poses)], p1[:len(poses)],
                               atol=1e-6)
    assert float(info8["final_cost"]) < float(info8["initial_cost"])


def test_keyframe_db_proximity_and_gap_gates():
    """Far-away or too-recent keyframes are never returned."""
    rig, poses, landmarks, inten = _circle_scene(K=16)
    cfg = LoopClosureConfig(min_gap=8, prox_radius=2.0,
                            min_matches=10)
    closer = LoopCloser(cfg, rig.intr, np.asarray(rig.p_bc),
                        np.asarray(rig.q_bc))
    render_j = jax.jit(lambda p, q: render.render_frame(
        rig, p, q, landmarks, inten, cam=0))
    hits = []
    for k, (p, q) in enumerate(poses):
        img = np.asarray(render_j(jnp.asarray(p), jnp.asarray(q)))
        e = closer.add_keyframe(img, 0.1 * k, p, q, frame_idx=k)
        if e is not None:
            hits.append(e)
    # without depth no PnP edge can form, and mid-circle keyframes are
    # outside the 2 m proximity gate of the early ones
    assert hits == []
