"""Loop closure + PGO orchestration for the SLAM loop.

Rebuilds the reference's per-frame loop block (reference:
pin_slam.py:281-348): descriptor node insertion, drift-gated local/global
candidate detection, scan-to-map refinement of the loop transform (the
query-time travel-dist filter re-anchored at the loop frame replaces the
reference's local-map rehash trick, model/neural_points.py:819), pose-graph
optimization, and the consequences on success: elastic map deformation +
rehash + replay-pool transform + pose updates.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pin_slam_tpu.config import Config
from pin_slam_tpu.models import neural_points as npm
from pin_slam_tpu.slam.loop_detector import (
    ScanContextManager,
    detect_local_loop,
)
from pin_slam_tpu.slam.pgo import PoseGraphManager
from pin_slam_tpu.slam import map_query as mq


class LoopPgoManager:
    def __init__(self, config: Config, system):
        self.config = config
        self.system = system
        self.silence = config.silence
        self.detector = ScanContextManager(config)
        self.pgm = PoseGraphManager(config)
        self.loop_reg_failed_count = 0

        c = config
        self._rehash = jax.jit(
            lambda state, ts: npm.rehash(
                state, ts, resolution=c.voxel_size_m,
                use_mid_ts=c.use_mid_ts),
        )
        self._deform = jax.jit(
            lambda state, diffs: npm.deform_map(
                state, diffs, use_mid_ts=c.use_mid_ts))

        def transform_pool(pool, diffs):
            from pin_slam_tpu.ops.transforms import transform_points_by_ts
            coord = transform_points_by_ts(pool.coord, pool.ts, diffs)
            return pool.replace(coord=coord)

        self._transform_pool = jax.jit(transform_pool)

        self._lm_mask = jax.jit(
            lambda state, travel, ts, pos: npm.local_map_mask(
                state, travel, ts, system.local_window_dist,
                by_travel_dist=c.loop_local_map_by_travel_dist,
                time_window=c.loop_local_map_time_window,
                sensor_pos=pos, local_map_radius=c.local_map_radius,
                use_mid_ts=c.use_mid_ts))

    # ------------------------------------------------------- map context

    def _local_map_context(self, lm_fid: int):
        """Local-map points (world frame) + optionally their geo features
        around the pose of `lm_fid` (reference: pin_slam.py:284-290,
        model/neural_points.py:424-513)."""
        sysm = self.system
        pose = sysm.pgo_poses[lm_fid]
        td = jnp.asarray(sysm.travel_dist[: sysm.max_frames], jnp.float32)
        m = np.asarray(self._lm_mask(
            sysm.state, td, jnp.int32(lm_fid),
            jnp.asarray(pose[:3, 3], jnp.float32)))
        if m.sum() < 100:                  # too few: fall back to all alive
            m = np.arange(sysm.state.capacity) < int(sysm.state.count)
        pts = np.asarray(sysm.state.positions[:-1])[m]
        feats = None
        if self.config.loop_with_feature:
            feats = np.asarray(sysm.params["geo_features"][:-1])[m]
        return pts, feats, pose

    # ------------------------------------------------------------ per-frame

    def after_frame(self, frame_id: int, points: np.ndarray) -> bool:
        """Run the loop-closure block after odometry+mapping of `frame_id`
        (reference: pin_slam.py:281-348). Returns True if a loop was closed
        and poses/map were corrected."""
        c = self.config
        sysm = self.system

        valid_flag = not (sysm.lose_track or sysm.stop_status)
        self._ctx_pc_global = None
        self._ctx_features = None
        if c.local_map_context and c.global_loop_on and \
                frame_id >= c.local_map_context_latency:
            # local-map context: descriptor from the neural points around
            # the (delayed) frame, in that frame's sensor frame
            # (reference: pin_slam.py:284-290)
            lm_fid = frame_id - c.local_map_context_latency
            pts_w, feats, lm_pose = self._local_map_context(lm_fid)
            Tinv = np.linalg.inv(lm_pose)
            pts_local = pts_w @ Tinv[:3, :3].T + Tinv[:3, 3]
            self.detector.add_node(lm_fid, pts_local, feats, valid_flag)
            self._ctx_pc_global = pts_w
            self._ctx_features = feats
        else:
            # scan-context mode: descriptor from the current scan in the
            # sensor frame
            self.detector.add_node(frame_id, points[:, :3],
                                   valid_flag=valid_flag)

        self.pgm.add_frame_node(frame_id, sysm.pgo_poses[frame_id])
        if frame_id == 0:
            return False
        self.pgm.add_odometry_factor(
            frame_id, frame_id - 1, sysm.last_odom_tran,
            cov=np.asarray(sysm.last_tracking.cov)
            if (c.use_reg_cov_mat and sysm.last_tracking is not None)
            else None)
        travel_dist = sysm.travel_dist[: frame_id + 1]
        self.pgm.estimate_drift(travel_dist, frame_id)

        if frame_id - self.pgm.last_loop_idx <= c.pgo_freq or \
                sysm.stop_status:
            return False

        cand_mask = (travel_dist[-1] - travel_dist) > (
            c.min_loop_travel_dist_ratio * c.local_map_radius)
        if not np.any(cand_mask):
            return False

        pgo_poses = sysm.pgo_poses[: frame_id + 1]
        loop_id, loop_dist, loop_transform = detect_local_loop(
            pgo_poses, cand_mask, self.pgm.drift_radius, frame_id,
            self.loop_reg_failed_count, c.local_loop_dist_thre,
            c.local_loop_dist_thre * 3.0, self.silence)
        if loop_id is None and c.global_loop_on:
            loop_id, _, loop_transform = self.detector.detect_global_loop(
                pgo_poses,
                self.pgm.drift_radius * c.loop_dist_drift_ratio_thre,
                cand_mask,
                context_pc_global=self._ctx_pc_global,
                context_features=self._ctx_features)
        if loop_id is None:
            return False
        if not self.detector.valid_flags.get(int(loop_id), False):
            return False  # loop node invalid (reference: pin_slam.py:314)

        if c.loop_z_check_on and abs(loop_transform[2, 3]) > \
                c.voxel_size_m * 4.0:
            return False

        return self._close_loop(frame_id, int(loop_id), loop_transform,
                                points)

    # ---------------------------------------------------------- loop close

    def _close_loop(self, frame_id: int, loop_id: int,
                    loop_transform: np.ndarray, points: np.ndarray) -> bool:
        c = self.config
        sysm = self.system

        # 1. re-anchor the hash table at the loop frame so the registration
        #    sees the old geometry (reference: pin_slam.py:317)
        sysm.state = self._rehash(sysm.state, jnp.int32(loop_id))

        # 2. scan-to-map refinement with the loop init guess
        pose_init = sysm.pgo_poses[loop_id] @ loop_transform
        src = np.asarray(points[:, :3], np.float32)
        raw, n_raw = _pad(src, sysm.config.source_point_cap * 4)
        attr = np.zeros((raw.shape[0], 1), np.float32)
        (_, _, _, src_pts, _, src_n, _, _) = sysm._preprocess(
            raw, attr, n_raw)

        anchor = pose_init[:3, 3].copy()
        T_init = pose_init.copy()
        T_init[:3, 3] -= anchor
        lf = sysm._lf(loop_id, sensor_pos=pose_init[:3, 3] - anchor)
        extra = {}
        reg_feats = sysm.params["geo_features"]
        if getattr(sysm, "_use_join", False):
            td = jnp.asarray(sysm.travel_dist[: sysm.max_frames], jnp.float32)
            lset_t, reg_feats, _ = sysm._build_lset_track(
                sysm.state, sysm.params["geo_features"], td,
                jnp.int32(loop_id),
                jnp.asarray(pose_init[:3, 3], jnp.float32),
                jnp.int32(sysm.reboot_ts))
            extra["lset"] = lset_t
        res = sysm._track_loop(
            sysm.state, reg_feats, sysm.params["geo_mlp"],
            src_pts, jnp.arange(src_pts.shape[0]) < src_n,
            jnp.asarray(T_init, jnp.float32), lf,
            jnp.asarray(anchor, jnp.float32), **extra)
        reg_valid = bool(res.valid)

        if reg_valid:
            pose_refined = np.asarray(res.pose, np.float64)
            pose_refined[:3, 3] += anchor
            # refinement-deviation gate: the registration may only move the
            # pose within the loop detector's own uncertainty budget — the
            # drift-scaled radius that qualified the candidate (local loops
            # start from the CURRENT estimate, so the true correction is
            # bounded by the drift; global candidates by the drift-ratio
            # search radius). A refinement that slid further latched onto
            # aliased geometry (e.g. a symmetric wall segment): accepting
            # it warps the whole trajectory through PGO, which the graph
            # absorbs with low residual — so it must be rejected HERE.
            dev = float(np.linalg.norm(pose_refined[:3, 3]
                                       - pose_init[:3, 3]))
            dev_budget = max(
                self.pgm.drift_radius * c.loop_dist_drift_ratio_thre,
                4.0 * c.voxel_size_m)
            if dev > dev_budget:
                if not self.silence:
                    print(f"loop refinement rejected: moved {dev:.2f} m "
                          f"> budget {dev_budget:.2f} m")
                reg_valid = False
        if reg_valid:
            loop_transform = np.linalg.inv(
                sysm.pgo_poses[loop_id]) @ pose_refined
            reg_valid = self.pgm.add_loop_factor(
                frame_id, loop_id, loop_transform,
                cov=np.asarray(res.cov) if c.use_reg_cov_mat else None)
            reg_valid = reg_valid and self.pgm.optimize_pose_graph()

        if not reg_valid:
            # restore the hash anchored at the current frame
            # (reference: pin_slam.py:344-348)
            sysm.state = self._rehash(sysm.state, jnp.int32(frame_id))
            self.loop_reg_failed_count += 1
            if not self.silence:
                print("loop registration failed, candidate rejected")
            return False

        # 3. apply consequences (reference: pin_slam.py:329-343)
        self.pgm.loop_edges.append(np.array([loop_id, frame_id]))
        self.pgm.loop_trans.append(loop_transform)
        # per-closure diagnostics: the refined edge, the pre-solve chain
        # edge (whose deviation from GT = accumulated drift), and the
        # registration covariance diag — the evidence needed to attribute
        # post-closure rotation error to the edge vs the solver pricing
        self.pgm.loop_diags.append(dict(
            frame=frame_id, loop=loop_id,
            T_edge=np.asarray(loop_transform, np.float64).copy(),
            T_chain=np.linalg.inv(self.pgm.init_poses[loop_id])
            @ self.pgm.init_poses[frame_id],
            cov_diag=np.diag(np.asarray(res.cov, np.float64)).copy(),
            residual_cm=float(res.residual_cm),
            refine_moved_m=float(np.linalg.norm(
                pose_refined[:3, 3] - pose_init[:3, 3]))))
        pose_diff = self.pgm.get_pose_diff()                 # [T,4,4]
        if not self.silence:
            dmag = np.linalg.norm(pose_diff[: frame_id + 1, :3, 3], axis=1)
            print(f"  reg: residual {float(res.residual_cm):.2f} cm, "
                  f"valid {int(res.valid_count)}, moved "
                  f"{float(np.linalg.norm(pose_refined[:3, 3] - pose_init[:3, 3])):.3f} m; "
                  f"pgo diff |t| max {dmag.max():.3f} m "
                  f"(argmax {int(dmag.argmax())}), cur {dmag[frame_id]:.3f} m")
        diffs = jnp.asarray(pose_diff, jnp.float32)
        sysm.state = self._deform(sysm.state, diffs)
        sysm.state = self._rehash(sysm.state, jnp.int32(frame_id))
        sysm.pool = self._transform_pool(sysm.pool, diffs)
        sysm.params["geo_features"] = sysm.state.geo_features
        # the deformation moved map points: the cached post-train local
        # set (tracker reuse) is stale until the next training run, and
        # orientations are non-identity from here on (the quat-carrying
        # program variants take over; compiled once, cache-persisted)
        sysm._cur_lset = None
        sysm._map_deformed = True
        # schedule the post-closure training boost (config
        # post_loop_iter_boost): re-sharpen the SDF around the deformed
        # region with the now-consistent transformed pool
        sysm.post_loop_iter_boost_pending = max(
            sysm.post_loop_iter_boost_pending, c.post_loop_iter_boost)

        n = frame_id + 1
        sysm.pgo_poses[:n] = self.pgm.pgo_poses[:n]
        sysm.cur_pose_ref = sysm.pgo_poses[frame_id]
        sysm.last_pose_ref = sysm.cur_pose_ref
        sysm.set_after_pgo(True)

        self.pgm.last_loop_idx = frame_id
        self.pgm.min_loop_idx = min(self.pgm.min_loop_idx, loop_id)
        self.loop_reg_failed_count = 0
        if not self.silence:
            print(f"loop closed: {frame_id} --- {loop_id}")
        return True

    # ------------------------------------------------------------ finalize

    def final_refine(self, frames, n_frames: int, *,
                     dev_budget_m: Optional[float] = None,
                     train_boost: Optional[int] = None) -> int:
        """End-of-run map-consistency refinement (one alternating-
        optimization pass, beyond the reference's final prune+merge,
        pin_slam.py:510-543): re-register every frame's scan against the
        FINAL map, elastic-deform map + replay pool by the per-frame
        corrections, then boost-train to re-sharpen the SDF.

        Residual per-frame drift smears surfaces: each scan was inserted
        at its odometry/PGO pose, so the built map is the superposition of
        slightly-offset copies. Registering each scan against the finished
        (consensus) map pulls every frame toward the common surface,
        cutting the inter-frame inconsistency that costs mesh precision.

        `frames(fid) -> [N,3+] points` must return the same (deskewed)
        clouds the run processed. Frame 0 is kept fixed (gauge). Returns
        the number of frames whose pose was refined."""
        c = self.config
        sysm = self.system
        old = sysm.pgo_poses[:n_frames].copy()
        refined = old.copy()
        if dev_budget_m is None:
            # refinement corrects residual drift, not gross error
            dev_budget_m = max(4.0 * c.voxel_size_m, 0.3)
        td = jnp.asarray(sysm.travel_dist[: sysm.max_frames], jnp.float32)
        n_ok = 0
        for fid in range(1, n_frames):
            pts = frames(fid)
            src = np.asarray(pts[:, :3], np.float32)
            raw, n_raw = _pad(src, sysm.config.source_point_cap * 4)
            attr = np.zeros((raw.shape[0], 1), np.float32)
            (_, _, _, src_pts, _, src_n, _, _) = sysm._preprocess(
                raw, attr, n_raw)
            pose0 = refined[fid]
            anchor = pose0[:3, 3].copy()
            T_init = pose0.copy()
            T_init[:3, 3] -= anchor
            lf = sysm._lf(fid, sensor_pos=pose0[:3, 3] - anchor)
            extra = {}
            reg_feats = sysm.params["geo_features"]
            if getattr(sysm, "_use_join", False):
                lset_t, reg_feats, _ = sysm._build_lset_track(
                    sysm.state, sysm.params["geo_features"], td,
                    jnp.int32(fid),
                    jnp.asarray(pose0[:3, 3], jnp.float32),
                    jnp.int32(sysm.reboot_ts))
                extra["lset"] = lset_t
            res = sysm._track_loop(
                sysm.state, reg_feats, sysm.params["geo_mlp"],
                src_pts, jnp.arange(src_pts.shape[0]) < src_n,
                jnp.asarray(T_init, jnp.float32), lf,
                jnp.asarray(anchor, jnp.float32), **extra)
            if not bool(res.valid):
                continue
            pose_r = np.asarray(res.pose, np.float64)
            pose_r[:3, 3] += anchor
            if np.linalg.norm(pose_r[:3, 3] - pose0[:3, 3]) > dev_budget_m:
                continue
            refined[fid] = pose_r
            n_ok += 1

        if n_ok == 0:
            return 0
        # per-frame corrections -> elastic deformation (same machinery as
        # a loop closure's consequences)
        diffs_n = np.einsum("nab,nbc->nac", refined,
                            np.linalg.inv(old))
        diffs = np.tile(np.eye(4, dtype=np.float32),
                        (sysm.max_frames, 1, 1))
        diffs[:n_frames] = diffs_n.astype(np.float32)
        diffs = jnp.asarray(diffs)
        sysm.state = self._deform(sysm.state, diffs)
        sysm.state = self._rehash(sysm.state, jnp.int32(n_frames - 1))
        sysm.pool = self._transform_pool(sysm.pool, diffs)
        sysm.params["geo_features"] = sysm.state.geo_features
        sysm._cur_lset = None
        sysm._map_deformed = True
        sysm.pgo_poses[:n_frames] = refined
        sysm.cur_pose_ref = refined[n_frames - 1]
        sysm.last_pose_ref = sysm.cur_pose_ref
        for i in range(n_frames):
            self.pgm.nodes[i] = refined[i]
        sysm.set_after_pgo(True)
        if train_boost is None:
            train_boost = 4 * c.iters
        if train_boost > 0:
            sysm.train(train_boost, n_frames - 1)
        if not self.silence:
            mag = np.linalg.norm(diffs_n[:, :3, 3], axis=1)
            print(f"final refine: {n_ok}/{n_frames - 1} frames, "
                  f"|t| mean {mag.mean()*100:.2f} cm, "
                  f"max {mag.max()*100:.2f} cm")
        return n_ok

    # ------------------------------------------------------------------ io

    @property
    def pgo_count(self):
        return self.pgm.pgo_count

    def write_g2o(self, path: str):
        self.pgm.write_g2o(path)

    def write_loops(self, path: str):
        self.pgm.write_loops(path)


def _pad(pts: np.ndarray, cap: int):
    n = min(pts.shape[0], cap)
    out = np.zeros((cap, 3), np.float32)
    out[:n] = pts[:n, :3]
    return out, n
