"""Line landmark store for the sliding-window estimator.

Capability parity with the line half of `FeatureManager`
(`feature_manager.cpp:339-567`: TriangulateLineMono/Stereo, line orth
pack/unpack, reprojection/length outlier removal, window-shift
removals). Lines live in the WORLD frame (orthonormal 4-dof params, no
anchor re-parameterization on slide) as in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from dynamic_vins_tpu.factors.line_factor import LineObs
from dynamic_vins_tpu.geometry import lie_np, lines as line_geom


@dataclass
class LineManager:
    num_frames: int = 11
    capacity: int = 64
    obs_capacity: int = 512
    min_obs_for_ba: int = 2

    def __post_init__(self):
        Lc, F = self.capacity, self.num_frames
        self.active = np.zeros(Lc, bool)
        self.line_id = np.full(Lc, -1, np.int64)
        self.has_obs = np.zeros((Lc, F), bool)
        self.has_right = np.zeros((Lc, F), bool)
        self.s = np.zeros((Lc, F, 3))
        self.e = np.zeros((Lc, F, 3))
        self.s_r = np.zeros((Lc, F, 3))
        self.e_r = np.zeros((Lc, F, 3))
        self.orth = np.zeros((Lc, 4))
        self.orth_valid = np.zeros(Lc, bool)
        self._id_to_slot: dict = {}

    def add_lines(self, frame: int, lines: dict):
        """lines: {line_id: (s_l[3], e_l[3], s_r[3]|None, e_r[3]|None)}
        (normalized endpoints, z=1)."""
        for lid, (sl, el, sr, er) in lines.items():
            slot = self._id_to_slot.get(lid)
            if slot is None:
                free = np.flatnonzero(~self.active)
                if not free.size:
                    continue
                slot = int(free[0])
                self._id_to_slot[lid] = slot
                self.active[slot] = True
                self.line_id[slot] = lid
                self.orth_valid[slot] = False
            self.has_obs[slot, frame] = True
            self.s[slot, frame] = sl
            self.e[slot, frame] = el
            if sr is not None:
                self.has_right[slot, frame] = True
                self.s_r[slot, frame] = sr
                self.e_r[slot, frame] = er

    def triangulate(self, state, frame: int, min_base_frames: int = 3,
                    min_baseline: float = 0.15):
        """Init world Plücker lines by a robust multi-view fit over all
        observations (left + right cameras). Replaces the reference's
        noise-sensitive two-plane intersection; requires
        >= min_base_frames views and a minimum baseline, then gates by
        reprojection error."""
        st = state
        for slot in np.flatnonzero(self.active & ~self.orth_valid):
            frames = np.flatnonzero(self.has_obs[slot, :frame + 1])
            if frames.size < min_base_frames:
                continue
            k0, k1 = int(frames[0]), int(frames[-1])
            if np.linalg.norm(np.asarray(st.p[k1])
                              - np.asarray(st.p[k0])) < min_baseline:
                continue
            views = [(int(k), 0) for k in frames]
            views += [(int(k), 1) for k in frames
                      if self.has_right[slot, k]]
            p_cw = np.zeros((len(views), 3))
            q_cw = np.zeros((len(views), 4))
            ss = np.zeros((len(views), 3))
            ee = np.zeros((len(views), 3))
            for i, (k, c) in enumerate(views):
                p_wc, q_wc = lie_np.pose_compose(
                    np.asarray(st.p[k]), np.asarray(st.q[k]),
                    np.asarray(st.p_bc[c]), np.asarray(st.q_bc[c]))
                p_cw[i], q_cw[i] = lie_np.pose_inverse(p_wc, q_wc)
                if c == 0:
                    ss[i] = self.s[slot, k]
                    ee[i] = self.e[slot, k]
                else:
                    ss[i] = self.s_r[slot, k]
                    ee[i] = self.e_r[slot, k]
            # host twin of lines.triangulate_line_multiview — variable
            # view counts would recompile + round-trip per line on a
            # remote chip (see CLAUDE.md host-bookkeeping note)
            n_w, d_w = _triangulate_line_multiview_np(p_cw, q_cw, ss,
                                                      ee)
            if not (np.all(np.isfinite(n_w)) and np.all(np.isfinite(d_w))
                    and np.linalg.norm(d_w) > 1e-8):
                continue
            orth = _plucker_to_orth_np(n_w, d_w)
            if not np.all(np.isfinite(orth)):
                continue
            # gate the init: reproject into every observing view and
            # reject degenerate triangulations (near-parallel planes
            # produce wildly wrong lines that drag the BA)
            err = self._reproj_error(st, slot, np.asarray(n_w),
                                     np.asarray(d_w), frame)
            if err > 2.0 / 460.0:
                continue
            self.orth[slot] = orth
            self.orth_valid[slot] = True

    def _reproj_error(self, st, slot, n_w, d_w, frame):
        """Mean endpoint-to-projected-line distance over observations."""
        errs = []
        for k in np.flatnonzero(self.has_obs[slot, :frame + 1]):
            p_wc, q_wc = lie_np.pose_compose(
                np.asarray(st.p[k]), np.asarray(st.q[k]),
                np.asarray(st.p_bc[0]), np.asarray(st.q_bc[0]))
            p_cw, q_cw = lie_np.pose_inverse(p_wc, q_wc)
            R = lie_np.quat_to_matrix(q_cw)
            d_c = R @ d_w
            n_c = R @ n_w + np.cross(p_cw, d_c)
            denom = max(np.hypot(n_c[0], n_c[1]), 1e-12)
            errs.append(abs(np.dot(n_c, self.s[slot, k])) / denom)
            errs.append(abs(np.dot(n_c, self.e[slot, k])) / denom)
        return float(np.mean(errs)) if errs else 1e9

    def build_obs_table(self, dtype=jnp.float64):
        # f64 requests truncate (with a per-call warning) when x64 is
        # off; canonicalize so the hot path traces warning-free
        import jax

        dtype = jax.dtypes.canonicalize_dtype(dtype)
        mask = self.active & self.orth_valid
        rows = []
        for slot in np.flatnonzero(mask):
            for f in np.flatnonzero(self.has_obs[slot]):
                rows.append((f, 0, slot, self.s[slot, f],
                             self.e[slot, f]))
                if self.has_right[slot, f]:
                    rows.append((f, 1, slot, self.s_r[slot, f],
                                 self.e_r[slot, f]))
        n = min(len(rows), self.obs_capacity)
        C = self.obs_capacity
        fj = np.zeros(C, np.int32)
        cj = np.zeros(C, np.int32)
        li = np.zeros(C, np.int32)
        ss = np.zeros((C, 3)); ss[:, 2] = 1.0
        ee = np.zeros((C, 3)); ee[:, 2] = 1.0
        valid = np.zeros(C, bool)
        for i, (f, c, slot, sv, ev) in enumerate(rows[:n]):
            fj[i] = f; cj[i] = c; li[i] = slot
            ss[i] = sv; ee[i] = ev; valid[i] = True
        obs = LineObs(frame_j=jnp.asarray(fj), cam_j=jnp.asarray(cj),
                      line=jnp.asarray(li), s=jnp.asarray(ss, dtype),
                      e=jnp.asarray(ee, dtype), valid=jnp.asarray(valid))
        return obs, jnp.asarray(mask)

    def build_obs_packed(self):
        """Numpy-packed line obs for the megastep blob: returns
        (li [C,3] int32 (frame, cam, slot), lf [C,4] (sxy, exy),
        lvalid [C] bool, mask [Lc] bool). Same rows as
        `build_obs_table`, marshalled for single-blob upload."""
        mask = self.active & self.orth_valid
        C = self.obs_capacity
        li = np.zeros((C, 3), np.int32)
        lf = np.zeros((C, 4))
        lvalid = np.zeros(C, bool)
        i = 0
        for slot in np.flatnonzero(mask):
            for f in np.flatnonzero(self.has_obs[slot]):
                if i >= C:
                    break
                li[i] = (f, 0, slot)
                lf[i, 0:2] = self.s[slot, f, :2]
                lf[i, 2:4] = self.e[slot, f, :2]
                lvalid[i] = True
                i += 1
                if self.has_right[slot, f] and i < C:
                    li[i] = (f, 1, slot)
                    lf[i, 0:2] = self.s_r[slot, f, :2]
                    lf[i, 2:4] = self.e_r[slot, f, :2]
                    lvalid[i] = True
                    i += 1
        return li, lf, lvalid, mask

    def set_orth(self, orth, updated_mask=None):
        m = self.active & self.orth_valid if updated_mask is None \
            else np.asarray(updated_mask)
        self.orth[m] = np.asarray(orth)[m]

    def remove_outliers(self, errors, thresh: float = 5.0 / 460.0):
        """Drop lines with mean endpoint-line distance above thresh
        (RemoveLineOutlier parity)."""
        bad = self.active & self.orth_valid & (np.asarray(errors)
                                               > thresh)
        self._remove(np.flatnonzero(bad))

    def _remove(self, slots):
        for slot in slots:
            self._id_to_slot.pop(int(self.line_id[slot]), None)
        self.active[slots] = False
        self.line_id[slots] = -1
        self.has_obs[slots] = False
        self.has_right[slots] = False
        self.orth_valid[slots] = False

    def slide_old(self):
        self.has_obs[:, :-1] = self.has_obs[:, 1:]
        self.has_obs[:, -1] = False
        self.has_right[:, :-1] = self.has_right[:, 1:]
        self.has_right[:, -1] = False
        for a in (self.s, self.e, self.s_r, self.e_r):
            a[:, :-1] = a[:, 1:]
        dead = self.active & ~self.has_obs.any(axis=1)
        self._remove(np.flatnonzero(dead))

    def slide_new(self):
        F = self.num_frames
        self.has_obs[:, F - 2] = self.has_obs[:, F - 1]
        self.has_right[:, F - 2] = self.has_right[:, F - 1]
        for a in (self.s, self.e, self.s_r, self.e_r):
            a[:, F - 2] = a[:, F - 1]
        self.has_obs[:, F - 1] = False
        self.has_right[:, F - 1] = False
        dead = self.active & ~self.has_obs.any(axis=1)
        self._remove(np.flatnonzero(dead))


def _triangulate_line_multiview_np(p_cw, q_cw, s_obs, e_obs):
    """Host numpy twin of `geometry.lines.triangulate_line_multiview`
    (same plane-normal nullspace formulation); returns (n_w, d_w)."""
    R = np.stack([lie_np.quat_to_matrix(q) for q in q_cw])   # [K,3,3]
    l_obs = np.cross(s_obs, e_obs)
    l_obs /= np.maximum(np.linalg.norm(l_obs, axis=-1, keepdims=True),
                        1e-12)
    m = np.einsum("kij,ki->kj", R, l_obs)           # Rᵀ l (world)
    centers = -np.einsum("kij,ki->kj", R, p_cw)
    _, sv, vt = np.linalg.svd(m, full_matrices=False)
    d = vt[-1]
    tmp = np.array([0.0, 0.0, 1.0]) if abs(d[2]) < 0.9 \
        else np.array([1.0, 0.0, 0.0])
    b1 = np.cross(d, tmp)
    b1 /= max(np.linalg.norm(b1), 1e-12)
    b2 = np.cross(d, b1)
    B = np.stack([b1, b2], axis=1)
    A2 = m @ B
    rhs = np.sum(m * centers, axis=-1)
    AtA = A2.T @ A2 + 1e-12 * np.eye(2)
    y = np.linalg.solve(AtA, A2.T @ rhs)
    p0 = B @ y
    return np.cross(p0, d), d


def _plucker_to_orth_np(n, d):
    """Host numpy twin of `geometry.lines.plucker_to_orth`."""
    nn = np.linalg.norm(n)
    nd = np.linalg.norm(d)
    u1 = n / max(nn, 1e-12)
    u2 = d / max(nd, 1e-12)
    u3 = np.cross(u1, u2)
    R = np.stack([u1, u2, u3], axis=-1)
    psi = lie_np.so3_log(R)
    phi = np.arctan2(nd, nn)
    return np.concatenate([psi, [phi]])
