"""Loop closure: keyframe database -> loop-edge proposal -> pose graph.

The reference has no loop closure of its own (VINS-Fusion's pose-graph
node is a separate package); the capability is mandated by the north
star ("loop-closure pose-graph optimization runs as a distributed
solve", BASELINE.json). Design:

  * `KeyframeDatabase` — per-keyframe ORB descriptors
    (`frontend/orb.py`, the rebuilt `utils/orb/ORBextractor` capability)
    plus a pose-proximity gate; place recognition is brute-force
    Hamming matching with cross-check over gated candidates.
  * `LoopCloser` — on each keyframe: extract ORB, query the database,
    estimate the relative pose of a hit by robust PnP on the stored
    keypoint depths (`triangulation.pnp_gauss_newton`, the
    cv::solvePnP replacement), accumulate loop edges.
  * `optimize()` — odometry edges from the VIO poses + loop edges into
    a fixed-capacity `solver/pose_graph.PoseGraph`; solved single-chip
    or across a `jax.sharding.Mesh` via `parallel/dist_pose_graph`
    (edges sharded, normal equations reduced with psum).

Everything here runs OFF the per-frame critical path: keyframes are
inserted at a stride and the graph solve happens on demand (end of
sequence or on loop detection).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, NamedTuple, Optional

import numpy as np

from dynamic_vins_tpu.frontend.orb import OrbExtractor, match_descriptors
from dynamic_vins_tpu.geometry import lie_np


class Keyframe(NamedTuple):
    kf_id: int
    frame_idx: int
    timestamp: float
    p: np.ndarray            # [3] VIO world<-body at insertion
    q: np.ndarray            # [4]
    desc: np.ndarray         # [N,32] uint8 ORB descriptors
    norm: np.ndarray         # [N,2] normalized keypoint coords
    depth: np.ndarray        # [N] camera depth (nan = unknown)
    valid: np.ndarray        # [N] keypoint slot validity
    path_len: float = 0.0    # cumulative VIO path length at insertion


class LoopEdge(NamedTuple):
    i: int                   # older keyframe index (into keyframe list)
    j: int                   # newer keyframe index
    rel_p: np.ndarray        # measured T_bi^-1 T_bj translation
    rel_q: np.ndarray
    n_inliers: int
    mean_err: float


@dataclass
class LoopClosureConfig:
    n_features: int = 300
    n_levels: int = 3
    min_gap: int = 12            # keyframes between query and hit
    prox_radius: float = 4.0     # pose-proximity gate (m, VIO estimate)
    # the proximity gate is evaluated on the DRIFTED VIO estimate, so it
    # must widen with the path length travelled since the candidate was
    # stored (drift grows with distance); 0 disables the widening and
    # a large prox_radius disables the metric gate entirely
    # (appearance-only retrieval, VINS pose-graph-node style)
    prox_drift_rate: float = 0.03  # gate widening per metre of path
    min_matches: int = 25        # descriptor matches to consider a hit
    min_inliers: int = 12        # PnP inliers to accept the edge
    max_desc_dist: int = 48      # Hamming gate
    pnp_err_thresh: float = 4.0 / 460.0   # mean normalized reproj err
    max_keyframes: int = 512
    odom_info: float = 1.0       # sqrt-info scale of odometry edges
    loop_info: float = 10.0      # sqrt-info scale of loop edges


class KeyframeDatabase:
    """ORB keyframe store with pose-proximity-gated place queries."""

    def __init__(self, cfg: LoopClosureConfig):
        self.cfg = cfg
        self.keyframes: List[Keyframe] = []

    def __len__(self):
        return len(self.keyframes)

    def add(self, kf: Keyframe):
        if len(self.keyframes) < self.cfg.max_keyframes:
            self.keyframes.append(kf)

    def query(self, desc, valid, p, path_len: float = 0.0):
        """Best stored keyframe by descriptor-match count among those
        past the index gap and inside the (drift-widened) proximity
        radius.

        Returns (index into keyframes, matches [M,2] (db_kp, query_kp))
        or (None, None)."""
        cfg = self.cfg
        n = len(self.keyframes)
        best, best_matches = None, None
        d_query = desc[valid]
        qidx = np.flatnonzero(valid)
        if not len(d_query):
            return None, None
        for i in range(n - cfg.min_gap):
            kf = self.keyframes[i]
            gate = cfg.prox_radius + cfg.prox_drift_rate * max(
                path_len - kf.path_len, 0.0)
            if np.linalg.norm(kf.p - p) > gate:
                continue
            kidx = np.flatnonzero(kf.valid)
            if not kidx.size:
                continue
            m = match_descriptors(kf.desc[kidx], d_query,
                                  max_dist=cfg.max_desc_dist)
            if len(m) < cfg.min_matches:
                continue
            if best_matches is None or len(m) > len(best_matches):
                best = i
                best_matches = np.stack([kidx[m[:, 0]],
                                         qidx[m[:, 1]]], -1)
        return best, best_matches


class LoopCloser:
    def __init__(self, cfg: LoopClosureConfig, intr, p_bc, q_bc,
                 baseline: float = 0.1):
        """intr: PinholeIntrinsics of the left camera; (p_bc, q_bc):
        body<-camera extrinsic; baseline for disparity->depth."""
        self.cfg = cfg
        self.intr = intr
        self.p_bc = np.asarray(p_bc, float)
        self.q_bc = np.asarray(q_bc, float)
        self.baseline = baseline
        self.db = KeyframeDatabase(cfg)
        self.edges: List[LoopEdge] = []
        self._orb = OrbExtractor(n_features=cfg.n_features,
                                 n_levels=cfg.n_levels)
        self._path_len = 0.0          # cumulative VIO path length
        self._last_p: Optional[np.ndarray] = None

    # ------------------------------------------------------------------
    def add_keyframe(self, img, timestamp: float, p_wb, q_wb,
                     depth: Optional[np.ndarray] = None,
                     disparity: Optional[np.ndarray] = None,
                     frame_idx: int = -1) -> Optional[LoopEdge]:
        """Insert a keyframe; returns a LoopEdge if this view closes a
        loop against the database."""
        cfg = self.cfg
        res = self._orb(np.asarray(img, np.float32))
        xy = np.asarray(res.xy)
        valid = np.asarray(res.response) > 0.0
        desc = np.asarray(res.desc)

        fx, fy = float(self.intr.fx), float(self.intr.fy)
        cx, cy = float(self.intr.cx), float(self.intr.cy)
        norm = np.stack([(xy[:, 0] - cx) / fx, (xy[:, 1] - cy) / fy],
                        -1)

        H, W = np.asarray(img).shape
        d = np.full(len(xy), np.nan)
        if depth is None and disparity is not None:
            disp = np.asarray(disparity, float)
            depth = np.where(disp > 0.5,
                             fx * self.baseline / np.maximum(disp,
                                                             1e-6),
                             np.nan)
        if depth is not None:
            dep = np.asarray(depth, float)
            xi = np.clip(xy[:, 0].astype(int), 0, W - 1)
            yi = np.clip(xy[:, 1].astype(int), 0, H - 1)
            d = dep[yi, xi]
            d = np.where(np.isfinite(d) & (d > 0.1) & (d < 120.0), d,
                         np.nan)

        p_wb = np.asarray(p_wb, float)
        q_wb = np.asarray(q_wb, float)
        if self._last_p is not None:
            self._path_len += float(np.linalg.norm(p_wb - self._last_p))
        self._last_p = p_wb.copy()
        edge = None
        # a loop edge references this keyframe by its db index; once the
        # db is full, add() silently drops keyframes, so an edge built
        # against len(db) would point at a node that never exists and
        # the pose-graph gather would clamp it onto the wrong node
        if len(self.db) >= cfg.max_keyframes:
            return None
        hit, matches = self.db.query(desc, valid, p_wb, self._path_len)
        if hit is not None:
            edge = self._estimate_edge(hit, matches, norm, p_wb, q_wb)
            if edge is not None:
                self.edges.append(edge)

        self.db.add(Keyframe(len(self.db), frame_idx, timestamp,
                             p_wb, q_wb, desc, norm, d, valid,
                             path_len=self._path_len))
        return edge

    # ------------------------------------------------------------------
    def _estimate_edge(self, hit: int, matches, norm_cur, p_wb, q_wb
                       ) -> Optional[LoopEdge]:
        """Robust PnP of current frame against the hit keyframe's
        stored keypoint depths -> body-frame relative pose edge."""
        import jax.numpy as jnp

        from dynamic_vins_tpu.estimator.triangulation import \
            pnp_gauss_newton

        cfg = self.cfg
        kf = self.db.keyframes[hit]
        di = kf.depth[matches[:, 0]]
        keep = np.isfinite(di)
        if keep.sum() < cfg.min_inliers:
            return None
        m = matches[keep]
        di = di[keep]
        # 3D points in the OLD keyframe's camera frame
        ni = kf.norm[m[:, 0]]
        pts_old = np.concatenate([ni * di[:, None], di[:, None]], -1)
        obs_cur = np.concatenate(
            [norm_cur[m[:, 1]], np.ones((len(m), 1))], -1)

        # initial guess T_cj<-ci from the (drifted) VIO poses
        p_wci, q_wci = lie_np.pose_compose(kf.p, kf.q, self.p_bc,
                                           self.q_bc)
        p_wcj, q_wcj = lie_np.pose_compose(p_wb, q_wb, self.p_bc,
                                           self.q_bc)
        p_cjw, q_cjw = lie_np.pose_inverse(p_wcj, q_wcj)
        p0, q0 = lie_np.pose_compose(p_cjw, q_cjw, p_wci, q_wci)

        val = np.ones(len(m), bool)
        p_cji, q_cji, err = pnp_gauss_newton(
            jnp.asarray(pts_old), jnp.asarray(obs_cur),
            jnp.asarray(val), jnp.asarray(p0), jnp.asarray(q0))
        # inlier re-fit (poor-man's RANSAC: one reject pass)
        pc = lie_np.quat_rotate(np.asarray(q_cji)[None, :], pts_old) \
            + np.asarray(p_cji)[None, :]
        e = np.linalg.norm(pc[:, :2] / np.maximum(pc[:, 2:3], 1e-6)
                           - obs_cur[:, :2], axis=-1)
        inl = e < 2.0 * cfg.pnp_err_thresh
        if inl.sum() < cfg.min_inliers:
            return None
        p_cji, q_cji, err = pnp_gauss_newton(
            jnp.asarray(pts_old), jnp.asarray(obs_cur),
            jnp.asarray(inl), jnp.asarray(p_cji), jnp.asarray(q_cji))
        if float(err) > cfg.pnp_err_thresh:
            return None

        # camera edge T_ci<-cj -> body edge T_bi^-1 T_bj
        p_cij, q_cij = lie_np.pose_inverse(np.asarray(p_cji, float),
                                           np.asarray(q_cji, float))
        p_cb, q_cb = lie_np.pose_inverse(self.p_bc, self.q_bc)
        pa, qa = lie_np.pose_compose(self.p_bc, self.q_bc, p_cij,
                                     q_cij)
        rel_p, rel_q = lie_np.pose_compose(pa, qa, p_cb, q_cb)
        return LoopEdge(hit, len(self.db), rel_p, rel_q,
                        int(inl.sum()), float(err))

    # ------------------------------------------------------------------
    def build_graph(self, capacity_nodes=None, capacity_edges=None,
                    dtype=None):
        """Odometry edges between consecutive keyframes (from the VIO
        poses, which carry the drift) + the accumulated loop edges."""
        import jax.numpy as jnp

        from dynamic_vins_tpu.solver import pose_graph as pg

        cfg = self.cfg
        kfs = self.db.keyframes
        K = len(kfs)
        if K < 2:
            return None
        edges, rels, infos = [], [], []
        for k in range(K - 1):
            a, b = kfs[k], kfs[k + 1]
            p_iw, q_iw = lie_np.pose_inverse(a.p, a.q)
            rp, rq = lie_np.pose_compose(p_iw, q_iw, b.p, b.q)
            edges.append((k, k + 1))
            rels.append((rp, rq))
            infos.append(cfg.odom_info)
        for e in self.edges:
            edges.append((e.i, e.j))
            rels.append((e.rel_p, e.rel_q))
            infos.append(cfg.loop_info)

        g = pg.make_graph([kf.p for kf in kfs], [kf.q for kf in kfs],
                          edges, rels, capacity_nodes=capacity_nodes,
                          capacity_edges=capacity_edges,
                          fixed_nodes=(0,),
                          dtype=dtype or jnp.float64)
        si = np.asarray(g.sqrt_info).copy()
        for k, s in enumerate(infos):
            si[k] *= s
        return g._replace(sqrt_info=jnp.asarray(si, si.dtype))

    def rebase(self, p, q):
        """Overwrite the stored keyframe poses with a pose-graph result
        (live relocalization): after the estimator window is re-anchored
        (`Estimator.apply_loop_correction`), future VIO outputs live in
        the corrected frame, so the stored keyframes must too —
        otherwise the next odometry edge would measure the correction
        jump as motion."""
        kfs = self.db.keyframes
        for k in range(len(kfs)):
            kfs[k] = kfs[k]._replace(p=np.asarray(p[k], float),
                                     q=np.asarray(q[k], float))
        if kfs:
            self._last_p = kfs[-1].p.copy()

    def optimize(self, mesh=None, config=None):
        """Solve the pose graph; returns (p [K,3], q [K,4], info) of the
        corrected keyframe trajectory, or None if nothing to solve.

        mesh: optional jax.sharding.Mesh — the solve then runs
        distributed (edges sharded, psum reduction; north-star phase).
        """
        from dynamic_vins_tpu.solver import pose_graph as pg

        config = config or pg.PgoConfig()
        if mesh is None:
            g = self.build_graph()
            if g is None:
                return None
            g2, info = pg.solve(g, config)
        else:
            from dynamic_vins_tpu.parallel import dist_pose_graph as dp

            n = int(np.prod(list(mesh.shape.values())))
            K = len(self.db.keyframes)
            E = K - 1 + len(self.edges)
            Ec = ((E + n - 1) // n) * n
            g = self.build_graph(capacity_edges=Ec)
            if g is None:
                return None
            solver = dp.make_distributed_pgo(mesh, config)
            sharded = dp.shard_graph(g, mesh)
            g2, c0, c1 = solver(sharded)
            info = {"initial_cost": c0, "final_cost": c1}
        return np.asarray(g2.p), np.asarray(g2.q), info
