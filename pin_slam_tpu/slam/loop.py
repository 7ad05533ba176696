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
            T = diffs[jnp.clip(pool.ts, 0, diffs.shape[0] - 1)]
            coord = jnp.einsum(
                "nij,nj->ni", T[:, :3, :3], pool.coord) + T[:, :3, 3]
            return pool.replace(coord=coord)

        self._transform_pool = jax.jit(transform_pool)

    # ------------------------------------------------------------ per-frame

    def after_frame(self, frame_id: int, points: np.ndarray) -> bool:
        """Run the loop-closure block after odometry+mapping of `frame_id`
        (reference: pin_slam.py:281-348). Returns True if a loop was closed
        and poses/map were corrected."""
        c = self.config
        sysm = self.system

        valid_flag = not (sysm.lose_track or sysm.stop_status)
        # descriptor from the current scan in the sensor frame (scan-context
        # mode; local-map-context mode is a later round)
        self.detector.add_node(frame_id, points[:, :3], valid_flag)

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
                cand_mask)
        if loop_id is None:
            return False

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
        attr = jnp.zeros((raw.shape[0], 1), jnp.float32)
        _, _, _, src_pts, _, src_n = sysm._preprocess(
            jnp.asarray(raw), attr, jnp.int32(n_raw))

        anchor = pose_init[:3, 3].copy()
        T_init = pose_init.copy()
        T_init[:3, 3] -= anchor
        lf = sysm._lf(loop_id, sensor_pos=pose_init[:3, 3] - anchor)
        res = sysm._track_loop(
            sysm.state, sysm.params["geo_features"], sysm.params["geo_mlp"],
            src_pts, jnp.arange(src_pts.shape[0]) < src_n,
            jnp.asarray(T_init, jnp.float32), lf,
            jnp.asarray(anchor, jnp.float32))
        reg_valid = bool(res.valid)

        if reg_valid:
            pose_refined = np.asarray(res.pose, np.float64)
            pose_refined[:3, 3] += anchor
            loop_transform = np.linalg.inv(
                sysm.pgo_poses[loop_id]) @ pose_refined
            self.pgm.add_loop_factor(
                frame_id, loop_id, loop_transform,
                cov=np.asarray(res.cov) if c.use_reg_cov_mat else None)
            reg_valid = self.pgm.optimize_pose_graph()

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
        pose_diff = self.pgm.get_pose_diff()                 # [T,4,4]
        diffs = jnp.asarray(pose_diff, jnp.float32)
        sysm.state = self._deform(sysm.state, diffs)
        sysm.state = self._rehash(sysm.state, jnp.int32(frame_id))
        sysm.pool = self._transform_pool(sysm.pool, diffs)
        sysm.params["geo_features"] = sysm.state.geo_features

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
