"""Pose-graph optimization: sparse Gauss-Newton over SE(3).

Replaces the reference's GTSAM/ISAM2 dependency (reference:
utils/pgo.py:18-338) with an in-repo batch Gauss-Newton solver:

* residual per edge (i, j, Z): r = [so3_log(R_err), t_err] of
  E = Z^-1 (T_i^-1 T_j), weighted by the per-edge sqrt information
  (fixed tran/rot stds or the registration covariance,
  reference :84-188),
* Jacobians by vectorized numerical differentiation of the right-perturbed
  tangent (all edges in one batched einsum per perturbation column),
* normal equations assembled block-sparse and solved with scipy's sparse LU;
  node 0 (or the earliest loop node) is gauge-fixed.

Loop frequency is low (reference pgo_freq=30 frames), so a host solve is
the right placement; the heavy consequences (elastic map deformation, pool
transform) run on the TPU.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def so3_log_batch(R: np.ndarray) -> np.ndarray:
    """[..., 3, 3] -> [..., 3] axis-angle (numerically safe)."""
    tr = np.trace(R, axis1=-2, axis2=-1)
    cos = np.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = np.arccos(cos)
    w = 0.5 * np.stack(
        [R[..., 2, 1] - R[..., 1, 2],
         R[..., 0, 2] - R[..., 2, 0],
         R[..., 1, 0] - R[..., 0, 1]], axis=-1)
    s = np.sin(theta)
    factor = np.where(theta < 1e-6, 1.0 + theta**2 / 6.0, theta / np.where(
        np.abs(s) < 1e-12, 1.0, s))
    return w * factor[..., None]


def _so3_exp(w: np.ndarray) -> np.ndarray:
    theta = np.linalg.norm(w)
    if theta < 1e-12:
        return np.eye(3) + _skew(w)
    k = w / theta
    K = _skew(k)
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def _skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def _apply_tangent(T: np.ndarray, xi: np.ndarray) -> np.ndarray:
    """Right perturbation: T' = T * [exp(xi_rot), xi_tran]."""
    D = np.eye(4)
    D[:3, :3] = _so3_exp(xi[:3])
    D[:3, 3] = xi[3:]
    return T @ D


class PoseGraphManager:
    """API mirrors the reference PoseGraphManager (utils/pgo.py:18-338)."""

    def __init__(self, config):
        self.config = config
        self.silence = config.silence
        self.tran_std = config.pgo_tran_std
        self.rot_std = np.radians(config.pgo_rot_std)
        self.max_iter = config.pgo_max_iter
        self.error_thre_frame = config.pgo_error_thre_frame

        self.nodes: Dict[int, np.ndarray] = {}
        self.edges: List[dict] = []  # {i, j, Z, sqrt_w[6], is_loop}
        self.pgo_poses: Optional[np.ndarray] = None
        self.init_poses: Optional[np.ndarray] = None
        self.cur_pose: Optional[np.ndarray] = None

        self.last_loop_idx = 0
        self.min_loop_idx = int(1e9)
        self.pgo_count = 0
        self.drift_radius = 0.0
        self.loop_edges: List[np.ndarray] = []
        self.loop_trans: List[np.ndarray] = []

    # ------------------------------------------------------------- factors

    def add_frame_node(self, idx: int, pose: np.ndarray):
        self.nodes[idx] = np.asarray(pose, np.float64)

    def _sqrt_w(self, cov: Optional[np.ndarray]) -> np.ndarray:
        if cov is not None and self.config.use_reg_cov_mat:
            d = np.sqrt(np.clip(np.diag(cov), 1e-12, None))
            return 1.0 / d
        return np.array([1.0 / self.rot_std] * 3 + [1.0 / self.tran_std] * 3)

    def add_odometry_factor(self, cur: int, prev: int, T_rel: np.ndarray,
                            cov: Optional[np.ndarray] = None):
        """T_rel = T_prev<-cur (reference: utils/pgo.py:119-142)."""
        self.edges.append(dict(
            i=prev, j=cur, Z=np.asarray(T_rel, np.float64),
            sqrt_w=self._sqrt_w(cov), is_loop=False))

    def add_loop_factor(self, cur: int, loop: int, T_rel: np.ndarray,
                        cov: Optional[np.ndarray] = None) -> bool:
        """T_rel = T_loop<-cur. Optimizes and applies the error-budget
        outlier rejection (reference: utils/pgo.py:144-188); returns
        acceptance."""
        self.edges.append(dict(
            i=loop, j=cur, Z=np.asarray(T_rel, np.float64),
            sqrt_w=self._sqrt_w(cov), is_loop=True))
        return True

    def estimate_drift(self, travel_dist, cur_id: int,
                       correct_ratio: float = 0.01):
        """Drift proportional to travel since the last loop
        (reference: utils/pgo.py:323-338)."""
        d_since = travel_dist[cur_id] - travel_dist[min(
            self.last_loop_idx, cur_id)]
        self.drift_radius = d_since * correct_ratio
        if self.pgo_count > 0:
            self.drift_radius += travel_dist[cur_id] * 0.001
        return self.drift_radius

    # ------------------------------------------------------------ residual

    def _residuals(self, poses: np.ndarray, ii, jj, Zinv, sqrt_w):
        rel = np.einsum("eab,ebc->eac", _inv_batch(poses[ii]), poses[jj])
        E = np.einsum("eab,ebc->eac", Zinv, rel)
        r = np.concatenate([so3_log_batch(E[:, :3, :3]), E[:, :3, 3]], axis=1)
        return (r * sqrt_w).reshape(-1)

    def total_error(self, poses: np.ndarray) -> float:
        if not self.edges:
            return 0.0
        ii, jj, Zinv, sqrt_w = self._edge_arrays()
        r = self._residuals(poses, ii, jj, Zinv, sqrt_w)
        return float(0.5 * np.dot(r, r))

    def _edge_arrays(self):
        ii = np.array([e["i"] for e in self.edges])
        jj = np.array([e["j"] for e in self.edges])
        Zinv = _inv_batch(np.stack([e["Z"] for e in self.edges]))
        sqrt_w = np.stack([e["sqrt_w"] for e in self.edges])
        return ii, jj, Zinv, sqrt_w

    # ------------------------------------------------------------ optimize

    def optimize_pose_graph(self, fixed_node: int = 0) -> bool:
        """Batch GN solve over all nodes (reference: utils/pgo.py:190-234).
        Updates self.pgo_poses / cur_pose. Applies the loop error budget;
        returns False (and reverts the last loop edge) on rejection."""
        n = max(self.nodes.keys()) + 1
        poses = np.stack([self.nodes[i] for i in range(n)])
        init_err = self.total_error(poses)
        ii, jj, Zinv, sqrt_w = self._edge_arrays()
        ne = len(self.edges)
        eps = 1e-6

        for it in range(self.max_iter):
            r0 = self._residuals(poses, ii, jj, Zinv, sqrt_w)
            # vectorized numerical jacobian: 12 tangent columns per edge
            rows, cols, vals = [], [], []
            for side, nodes_idx in (("i", ii), ("j", jj)):
                for d in range(6):
                    xi = np.zeros(6)
                    xi[d] = eps
                    pert = poses.copy()
                    # perturb every node once; edges pick up their endpoint
                    D = np.eye(4)
                    D[:3, :3] = _so3_exp(xi[:3])
                    D[:3, 3] = xi[3:]
                    pert = np.einsum("nab,bc->nac", poses, D)
                    if side == "i":
                        mixed = poses[jj]
                        rel = np.einsum(
                            "eab,ebc->eac", _inv_batch(pert[ii]), mixed)
                    else:
                        rel = np.einsum(
                            "eab,ebc->eac", _inv_batch(poses[ii]), pert[jj])
                    E = np.einsum("eab,ebc->eac", Zinv, rel)
                    r1 = (np.concatenate(
                        [so3_log_batch(E[:, :3, :3]), E[:, :3, 3]], axis=1)
                        * sqrt_w).reshape(-1)
                    col_block = (r1 - r0) / eps               # [ne*6]
                    er = np.arange(ne * 6)
                    ec = np.repeat(nodes_idx * 6 + d, 6)
                    rows.append(er)
                    cols.append(ec)
                    vals.append(col_block)
            J = sp.coo_matrix(
                (np.concatenate(vals),
                 (np.concatenate(rows), np.concatenate(cols))),
                shape=(ne * 6, n * 6)).tocsr()
            # gauge fix
            keep = np.ones(n * 6, bool)
            keep[fixed_node * 6: fixed_node * 6 + 6] = False
            Jk = J[:, keep]
            H = (Jk.T @ Jk).tocsc() + 1e-6 * sp.eye(keep.sum(), format="csc")
            g = -Jk.T @ r0
            dx = spla.spsolve(H, g)
            full_dx = np.zeros(n * 6)
            full_dx[keep] = dx
            for k in range(n):
                poses[k] = _apply_tangent(poses[k], full_dx[k * 6:(k + 1) * 6])
            if np.linalg.norm(dx) < 1e-8:
                break

        final_err = self.total_error(poses)
        # loop outlier rejection by error budget (reference :174-188)
        if final_err > self.error_thre_frame * n and final_err > init_err:
            if self.edges and self.edges[-1]["is_loop"]:
                self.edges.pop()
            if not self.silence:
                print(f"pgo rejected: error {final_err:.1f}")
            return False

        self.init_poses = np.stack([self.nodes[i] for i in range(n)])
        self.pgo_poses = poses
        for i in range(n):
            self.nodes[i] = poses[i]
        self.cur_pose = poses[-1]
        self.pgo_count += 1
        return True

    def get_pose_diff(self) -> np.ndarray:
        """Per-frame correction transforms for the elastic map deformation
        (reference: utils/pgo.py:318-321): diff[i] = T_new[i] @ T_old[i]^-1."""
        return np.einsum("nab,nbc->nac", self.pgo_poses,
                         _inv_batch(self.init_poses))

    # ---------------------------------------------------------------- io

    def write_g2o(self, path: str):
        """(reference: utils/pgo.py:237-239)"""
        from pin_slam_tpu.ops.transforms import rotmat_to_quat
        import jax.numpy as jnp

        n = max(self.nodes.keys()) + 1
        with open(path, "w") as f:
            for i in range(n):
                T = self.nodes[i]
                q = np.asarray(rotmat_to_quat(jnp.asarray(T[:3, :3],
                                                          jnp.float32)))
                t = T[:3, 3]
                f.write(f"VERTEX_SE3:QUAT {i} {t[0]} {t[1]} {t[2]} "
                        f"{q[1]} {q[2]} {q[3]} {q[0]}\n")
            for e in self.edges:
                Z = e["Z"]
                q = np.asarray(rotmat_to_quat(jnp.asarray(Z[:3, :3],
                                                          jnp.float32)))
                t = Z[:3, 3]
                info = " ".join(["100 0 0 0 0 0", "100 0 0 0 0",
                                 "100 0 0 0", "100 0 0", "100 0", "100"])
                f.write(f"EDGE_SE3:QUAT {e['i']} {e['j']} "
                        f"{t[0]} {t[1]} {t[2]} {q[1]} {q[2]} {q[3]} {q[0]} "
                        f"{info}\n")

    def write_loops(self, path: str):
        """(reference: utils/pgo.py:241-250)"""
        with open(path, "w") as f:
            for (edge, T) in zip(self.loop_edges, self.loop_trans):
                f.write(f"{edge[0]} {edge[1]} "
                        + " ".join(str(v) for v in T.reshape(-1)) + "\n")


def _inv_batch(T: np.ndarray) -> np.ndarray:
    out = np.zeros_like(T)
    Rt = np.swapaxes(T[..., :3, :3], -1, -2)
    out[..., :3, :3] = Rt
    out[..., :3, 3] = -np.einsum("...ab,...b->...a", Rt, T[..., :3, 3])
    out[..., 3, 3] = 1.0
    return out
