"""PIN-SLAM system orchestrator: the per-frame SLAM loop.

Rebuilds the reference's orchestration (reference: pin_slam.py:236-508 +
SLAMDataset pose bookkeeping dataset/slam_dataset.py:359-575) around jitted
device programs:

  I.   preprocess   — range/z crop + train/source voxel downsample (one jit)
  II.  odometry     — single-jit GN registration (slam/tracker.py)
  III. loop+PGO     — slam/loop_detector.py + slam/pgo.py (host-orchestrated)
  IV.  mapping      — sample + map insert + pool append + new-sample detect
                      (one jit), then `iters` jitted train steps
  V.   meshing/vis  — slam/mesher.py, on demand

Host keeps float64 pose chains and travel distance; the device works in
float32 with a per-frame anchor (the current sensor position) where
conditioning matters.
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pin_slam_tpu.config import Config
from pin_slam_tpu.models import neural_points as npm
from pin_slam_tpu.models.decoder import init_mlp_params
from pin_slam_tpu.models.sampler import sample_training_points
from pin_slam_tpu.ops.transforms import (
    np_se3_inv,
    np_rotation_angle_deg,
    transform_points,
)
from pin_slam_tpu.ops.voxel import (
    voxel_down_sample_hash_mask,
    voxel_down_sample_mask,
)
from pin_slam_tpu.slam import map_query as mq
from pin_slam_tpu.slam import mapper as mp
from pin_slam_tpu.slam import tracker as tk


def compute_init_guess(uniform_motion: bool, motion_model: str,
                       last_pose: np.ndarray,
                       last_tran: np.ndarray,
                       damping: float = 0.5) -> np.ndarray:
    """Tracker initial guess (reference: slam_dataset.py:359-389).
    "full" extrapolates the whole last relative motion; "translation"
    extrapolates the translation rate but keeps the last orientation —
    rotation-rate extrapolation feeds each frame's residual yaw error back
    through the freshly-mapped sector and destabilizes sustained turns
    (measured exponential yaw runaway on eval/eval_gauntlet.py scenes),
    while rotation re-convergence from the last orientation is cheap.
    "damped" extrapolates the translation fully but only `damping` of the
    rotation (axis-angle scaling): the init stays deliberately BEHIND the
    true rotation, so residual errors oppose the turn instead of feeding
    the overshoot loop, while starting closer than "translation" (fewer
    GN iterations on sustained turns)."""
    if not uniform_motion:
        return last_pose.copy()
    if motion_model == "translation":
        init = last_pose.copy()
        init[:3, 3] = (last_pose @ last_tran)[:3, 3]
        return init
    if motion_model == "damped":
        from pin_slam_tpu.ops.transforms import np_slerp_rotmats
        tran = last_tran.copy()
        tran[:3, :3] = np_slerp_rotmats(
            last_tran[:3, :3], np.array([damping]))[0]
        init = last_pose @ tran
        init[:3, 3] = (last_pose @ last_tran)[:3, 3]
        return init
    return last_pose @ last_tran


def _pad_points(pts: np.ndarray, cap: int, attr_dim: int = 0):
    """Pad [N, 3+attr] to [cap, 3] + [cap, attr_dim]."""
    n = min(pts.shape[0], cap)
    out = np.zeros((cap, 3), np.float32)
    out[:n] = pts[:n, :3]
    attr = np.zeros((cap, max(attr_dim, 1)), np.float32)
    if attr_dim > 0:
        attr[:n, :] = pts[:n, 3: 3 + attr_dim]
    return out, attr, n


class PinSLAMSystem:
    """Host-side orchestrator owning all device state and jitted programs."""

    def __init__(self, config: Config, key: Optional[jax.Array] = None):
        self.config = config
        self.key = key if key is not None else jax.random.PRNGKey(config.seed)

        # TPU MXU defaults to bf16 passes for f32 matmuls; our matmuls are
        # tiny (decoder MLPs, 6x6 normal equations) but numerically load-
        # bearing — force full f32 everywhere (no measurable cost here).
        jax.config.update("jax_default_matmul_precision", "highest")

        c = config
        self.qp = mq.make_query_params(c)
        self.after_pgo = False

        # multi-chip data parallelism (config `tpu: dp_on`): mapping
        # training runs per-device batches with an ICI gradient all-reduce
        # (mapper.make_train_loop(mesh=...)); the mesher shards its dense
        # SDF-grid queries over the same mesh
        self.mesh = None
        if c.dp_on and len(jax.devices()) > 1:
            from pin_slam_tpu.parallel import dp
            self.mesh = dp.make_mesh(c.dp_devices or None)

        # ------------------------------------------------ device state
        # join mode never reads the brick cache — allocate a dump-brick-only
        # btable (~400 MB + per-program copies saved at a 4M table)
        self.state = npm.init_map_state(
            c.map_capacity, c.buffer_size, c.feature_dim, c.color_on,
            with_btable=self.qp.probe_mode != "join")
        sample_cap = c.frame_point_cap * c.all_sample_n
        self.pool = mp.init_pool(
            c.pool_capacity, sample_cap,
            c.semantic_on, c.color_channel if c.color_on else 0)

        in_dim = c.feature_dim + c.pos_input_dim
        k = self.key
        k, k1, k2, k3 = jax.random.split(k, 4)
        self.key = k
        self.params = {
            "geo_features": self.state.geo_features,
            "geo_mlp": init_mlp_params(
                k1, in_dim, c.geo_mlp_hidden_dim, c.geo_mlp_level, 1,
                c.mlp_bias_on),
        }
        if c.color_on:
            self.params["color_features"] = self.state.color_features
            self.params["color_mlp"] = init_mlp_params(
                k2, in_dim, c.color_mlp_hidden_dim, c.color_mlp_level,
                c.color_channel, c.mlp_bias_on)
        if c.semantic_on:
            self.params["sem_mlp"] = init_mlp_params(
                k3, in_dim, c.sem_mlp_hidden_dim, c.sem_mlp_level,
                c.sem_class_count, c.mlp_bias_on)

        self.optimizer = optax.adam(c.lr, eps=c.adam_eps)
        self.opt_state = self.optimizer.init(self.params)

        # ------------------------------------------------ host state
        self.max_frames = c.max_frames
        self.odom_poses = np.zeros((self.max_frames, 4, 4))
        self.pgo_poses = np.zeros((self.max_frames, 4, 4))
        self.gt_poses: Optional[np.ndarray] = None
        self.travel_dist = np.zeros(self.max_frames)
        self.cur_pose_ref = np.eye(4)
        self.last_pose_ref = np.eye(4)
        self.last_odom_tran = np.eye(4)
        self.cur_frame = 0
        self.lose_track = False
        self.cap_overflow_frames = 0
        self.cap_overflow_max_ratio = 0.0
        self.stop_status = False
        self.stop_count = 0
        self.consecutive_lose_track_frame = 0
        self.reboot_ts = 0
        self.decoder_freezed = c.decoder_freezed
        self.last_tracking = None  # TrackResult of the last frame
        self.last_train_metrics = None  # device-scalar loss dict
        self.timings = []  # per-frame [preprocess, odometry, pgo, map_prep, map_opt]
        self.loop_edges = []
        self.new_obs_ratio = 1.0
        self.adaptive_iter_offset = 0
        self.localization_mode = False
        self.last_did_map = False
        # post-train local set + trained compact features (join mode),
        # reused as the next frame's tracker search structure
        self._cur_lset = None
        self._cur_track_feats = None
        # False until the first elastic deformation: the training local
        # set is built WITHOUT orientations (all identity), statically
        # skipping the offset-rotation gathers in every decode
        self._map_deformed = False
        # extra mapping iterations requested by an accepted loop closure
        self.post_loop_iter_boost_pending = 0
        self.last_static_mask = None  # dynamic filter's latest verdicts
        self.last_train_pts = None    # the train cloud those verdicts cover
        self.last_train_n = None
        # (frame_id, preprocess outputs) dispatched ahead of time: when the
        # caller passes next_points, the next frame's preprocess is issued
        # BEFORE this frame's blocking host pull, so the device works on it
        # during the pull's ~35 ms tunnel notification instead of idling
        self._prefetch = None
        # PIN_SYNC_TIMING=1: block after each stage so self.timings
        # attributes device time to the right column (debug/profiling)
        import os as _os
        self._sync_timing = _os.environ.get("PIN_SYNC_TIMING") == "1"

        self._build_jits()

    # ------------------------------------------------------------------ jits

    def _build_jits(self):
        c = self.config
        lwd = c.local_map_radius * c.local_map_travel_dist_ratio
        self.local_window_dist = lwd

        loss_kwargs = dict(
            # the reference's BCE sharpness is the *scaled* sigma
            # (logistic_gaussian_ratio * sigma_sigmoid_m,
            # reference: utils/mapper.py:66,736) — NOT sigma_sigmoid_m itself
            sigma_sigmoid_m=c.sdf_scale,
            loss_weight_on=c.loss_weight_on,
            ekional_loss_on=c.ekional_loss_on,
            weight_e=c.weight_e,
            numerical_grad_eps=c.voxel_size_m * c.num_grad_step_ratio,
            gradient_decimation=c.gradient_decimation,
            surface_sample_range_m=c.surface_sample_range_m,
            main_loss_type=c.main_loss_type,
            semantic_on=c.semantic_on,
            weight_s=c.weight_s,
            freespace_label_on=c.freespace_label_on,
            sem_label_decimation=c.sem_label_decimation,
            color_on=c.color_on,
            weight_i=c.weight_i,
            color_channel=c.color_channel,
            proj_correction_on=c.proj_correction_on,
            consistency_loss_on=c.consistency_loss_on,
            weight_c=c.weight_c,
            consistency_count=c.consistency_count,
            consistency_range=c.consistency_range,
        )
        tp = tk.TrackerParams(
            reg_iter_n=c.reg_iter_n,
            min_grad_norm=c.reg_min_grad_norm,
            max_grad_norm=c.reg_max_grad_norm,
            gm_dist=c.reg_GM_dist_m,
            gm_grad=c.reg_GM_grad,
            lm_lambda=c.reg_lm_lambda,
            term_thre_deg=c.reg_term_thre_deg,
            term_thre_m=c.reg_term_thre_m,
            max_sdf_std=c.surface_sample_range_m * c.max_sdf_std_ratio,
            max_valid_residual_cm=(
                c.surface_sample_range_m * c.final_residual_ratio_thre * 100.0),
            min_valid_ratio=0.2,
            min_valid_points=30,
            mask_min_nn_count=c.track_mask_query_nn_k,
            eigenvalue_check=c.eigenvalue_check,
            eigenvalue_ratio_thre=c.eigenvalue_ratio_thre,
            weighted_first=c.weighted_first,
            color_mode=(2 if (c.color_on and c.photometric_loss_on)
                        else 1 if (c.color_on and c.consist_wieght_on)
                        else 0),
            photometric_weight=c.photometric_loss_weight,
            color_channel=max(c.color_channel, 1),
        )
        self._track = jax.jit(tk.make_tracker(self.qp, tp))
        self._track_loop = jax.jit(
            tk.make_tracker(self.qp, tp._replace(min_valid_ratio=0.15)))

        # spatial-join probe: per-frame compacted+sorted local sets
        # (ops/knn_join.py) replace the hash probe on TPU
        self._use_join = self.qp.probe_mode == "join"
        from pin_slam_tpu.ops import knn_join as kj


        def build_lset_track(state, geo_features, travel, cur_ts,
                             sensor_pos, reboot_ts):
            m = npm.local_map_mask(
                state, travel, cur_ts, lwd,
                sensor_pos=sensor_pos, local_map_radius=c.local_map_radius,
                reboot_ts=reboot_ts, use_mid_ts=c.use_mid_ts)
            ls = kj.build_local_set(
                state.positions, m, c.voxel_size_m, c.local_set_cap,
                certainty=state.certainty,
                orientations=state.orientations)
            feats = geo_features[ls.gidx]
            cfeats = (state.color_features[ls.gidx]
                      if state.color_features is not None else None)
            return ls, feats, cfeats

        def build_lset_train(state, travel, cur_ts, reboot_ts,
                             with_quat=True):
            m = npm.local_map_mask(
                state, travel, cur_ts, lwd, reboot_ts=reboot_ts,
                use_mid_ts=c.use_mid_ts)
            return kj.build_local_set(
                state.positions, m, c.voxel_size_m, c.local_set_cap,
                certainty=state.certainty, ts_update=state.ts_update,
                orientations=state.orientations if with_quat else None)

        self._build_lset_track = jax.jit(build_lset_track)
        # quat-free variant used until the first elastic deformation: with
        # lset.quat=None every decode statically skips the offset-rotation
        # gathers (identity quaternions make it arithmetically identical);
        # the host flips _map_deformed at the first closure and the
        # quat-carrying variants compile then (once, persisted in cache)
        self._build_lset_train = jax.jit(build_lset_train)
        self._build_lset_train_nq = jax.jit(
            functools.partial(build_lset_train, with_quat=False))
        self._loss_kwargs = loss_kwargs
        self._train_loops = {}

        # --- preprocess: crop + train/source downsample, compacted outputs.
        # max_range and the derived voxel sizes are traced scalars so the
        # adaptive-range path (reference: dataset/slam_dataset.py:398-416)
        # doesn't recompile per frame.
        def preprocess(raw, attr, n_valid, max_range_eff, train_vox,
                       source_vox, key):
            cap_r = raw.shape[0]
            mask = jnp.arange(cap_r) < n_valid
            d = jnp.linalg.norm(raw, axis=1)
            mask &= (d > c.min_range) & (d < max_range_eff)
            mask &= (raw[:, 2] > c.min_z) & (raw[:, 2] < c.max_z)
            if c.rand_downsample:
                # random instead of voxel downsampling (reference:
                # dataset/slam_dataset.py:430-434)
                train_keep = mask & (
                    jax.random.uniform(key, (cap_r,)) < c.rand_down_r)
            else:
                train_keep = voxel_down_sample_hash_mask(
                    raw, mask, train_vox, 1 << 21) & mask

            def compact(keep, cap):
                # capacity overflow thins UNIFORMLY (a prefix cut would drop
                # a contiguous azimuth wedge of the scan — a fixed blind
                # sector in the sensor frame that destabilizes tracking at
                # certain headings); `total` (the pre-cap count) is returned
                # so the host can count overflow frames — thinning must
                # never be silent
                order = jnp.cumsum(keep.astype(jnp.int32)) - 1
                total = jnp.maximum(order[-1] + 1, 1)
                stride = (total + cap - 1) // cap
                keep = keep & (jnp.mod(order, stride) == 0)
                order = jnp.cumsum(keep.astype(jnp.int32)) - 1
                ok = keep & (order < cap)
                dest = jnp.where(ok, order, cap).astype(jnp.int32)
                out = jnp.zeros((cap + 1, 3), jnp.float32).at[dest].set(raw)
                a_out = jnp.zeros((cap + 1, attr.shape[1]), jnp.float32
                                  ).at[dest].set(attr)
                cnt = jnp.sum(ok.astype(jnp.int32))
                return out[:cap], a_out[:cap], cnt, total

            train_pts, train_attr, train_n, train_total = compact(
                train_keep, c.frame_point_cap)
            src_keep = voxel_down_sample_hash_mask(
                raw, train_keep, source_vox, 1 << 18) & train_keep
            src_pts, src_attr, src_n, src_total = compact(
                src_keep, c.source_point_cap)
            return (train_pts, train_attr, train_n, src_pts, src_attr,
                    src_n, train_total, src_total)

        self._preprocess_jit = jax.jit(preprocess)

        def preprocess_host(raw, attr, n_raw):
            """Compute the (possibly adaptive) range + voxel sizes on host,
            then run the jitted preprocess."""
            max_range_eff = c.max_range
            if c.adaptive_range_on:
                pts = raw[:n_raw]
                mx = np.max(pts, axis=0)
                mn = np.min(pts, axis=0)
                min_x_range = min(abs(mx[0]), abs(mn[0]))
                min_y_range = min(abs(mx[1]), abs(mn[1]))
                max_x_y_min_range = max(min_x_range, min_y_range)
                max_range_eff = float(
                    min(c.max_range, 2.0 * max_x_y_min_range))
            ratio = max_range_eff / c.max_range
            self.key, kp = jax.random.split(self.key)
            return self._preprocess_jit(
                jnp.asarray(raw), jnp.asarray(attr), jnp.int32(n_raw),
                jnp.float32(max_range_eff), jnp.float32(c.vox_down_m * ratio),
                jnp.float32(c.source_vox_down_m * ratio), kp)

        self._preprocess = preprocess_host

        # --- map-based dynamic filtering (reference: utils/mapper.py:99-137)
        def dynamic_filter(state, geo_features, geo_mlp, pts_world, mask, lf,
                           hist_origins=None):
            out = mq.query_decode(state, geo_features, geo_mlp, pts_world,
                                  self.qp, lf=lf)
            # measurements inside confidently-free space are dynamic
            static = (out.certainty < c.dynamic_certainty_thre) | (
                out.sdf < c.dynamic_sdf_ratio_thre * c.voxel_size_m)
            if c.visibility_filter_on and hist_origins is not None:
                # complementary visibility test (ops/visibility.py): the
                # certainty filter is blind in open space (no neural points
                # within query radius ⇒ certainty 0); movers crossing space
                # that HISTORIC scans saw through are caught here
                from pin_slam_tpu.ops.visibility import (
                    render_min_range_bins, visibility_free_mask)
                # elevation FOV from the current scan around its own origin
                # (hist origins share the sensor's el band, minus slack)
                d0 = pts_world - hist_origins[0]
                r0 = jnp.linalg.norm(d0, axis=1)
                el0 = jnp.arcsin(jnp.clip(
                    d0[:, 2] / jnp.maximum(r0, 1e-6), -1.0, 1.0))
                big = jnp.float32(1e9)
                el_lo = jnp.min(jnp.where(mask, el0, big))
                el_hi = jnp.max(jnp.where(mask, el0, -big))
                cap = state.capacity
                pvalid = ((jnp.arange(cap + 1) < state.count)
                          & (state.certainty
                             >= c.visibility_min_certainty))
                img = render_min_range_bins(
                    hist_origins[1:], state.positions, pvalid,
                    n_az=c.visibility_bins_az, n_el=c.visibility_bins_el,
                    el_lo=el_lo, el_hi=el_hi)
                dyn = visibility_free_mask(
                    hist_origins[1:], img, pts_world, mask,
                    margin_m=c.visibility_margin_m,
                    rel_margin=c.visibility_rel_margin,
                    min_judge_range=c.min_range,
                    max_judge_range=c.visibility_range_ratio * c.max_range,
                    el_lo=el_lo, el_hi=el_hi,
                    el_slack=np.radians(c.visibility_el_slack_deg),
                    min_votes=c.visibility_min_votes)
                # known-surface veto: a measurement the map confidently
                # decodes as near-surface is an established static surface
                # regardless of what the coarse visibility bins say (the
                # bins under-resolve grazing surfaces at range)
                known_surface = (
                    (out.certainty >= c.dynamic_certainty_thre)
                    & (jnp.abs(out.sdf) < 1.5 * c.voxel_size_m))
                static &= ~(dyn & ~known_surface)
            return mask & static

        self._dynamic_filter = jax.jit(dynamic_filter)

        # --- frame update: sample + map insert + pool append + new detect
        # `do_map` is a traced gate (tracker validity is decided on-device
        # so the frame runs as one dispatch chain with a single host pull);
        # when False every sample mask is cleared, making the whole update
        # a no-op on state/pool counts.
        def frame_update(state, pool, train_pts, train_attr, train_n, T,
                         cur_ts, travel_dist, key, force_all_new,
                         static_mask, do_map, insert_cap=1 << 16):
            mask = ((jnp.arange(train_pts.shape[0]) < train_n)
                    & static_mask & do_map)
            key, ks = jax.random.split(key)
            colors = (train_attr[:, : c.color_channel]
                      if c.color_on else None)
            sem = (train_attr[:, c.color_channel].astype(jnp.int32)
                   if c.semantic_on else None)
            cos_inc = None
            if c.incidence_label_on:
                from pin_slam_tpu.ops.range_image import (
                    estimate_scan_incidence)
                cos_inc = estimate_scan_incidence(
                    train_pts, mask, n_az=c.incidence_bins_az,
                    n_el=c.incidence_bins_el,
                    range_gate_m=c.incidence_range_gate_m,
                    cos_floor=c.incidence_cos_floor)
            smp = sample_training_points(
                ks, train_pts, mask,
                surface_sample_range_m=c.surface_sample_range_m,
                surface_sample_n=c.surface_sample_n,
                free_front_n=c.free_front_n,
                free_behind_n=c.free_behind_n,
                free_sample_begin_ratio=c.free_sample_begin_ratio,
                free_sample_end_dist_m=c.free_sample_end_dist_m,
                max_range=c.max_range,
                dist_weight_on=c.dist_weight_on,
                dist_weight_scale=c.dist_weight_scale,
                sem_labels=sem,
                colors=colors,
                cos_inc=cos_inc,
                incidence_mode=c.incidence_mode,
            )
            world = transform_points(smp.points, T)
            # ONE near-surface compaction (|sdf| < 3x range, uniform
            # thinning) feeds BOTH the map-insert candidates and the
            # new-sample detection: the multi-ms scatter/gather sweeps
            # downstream then run over `k_near` rows instead of all
            # rays x samples rows. The |sdf| < range*map_surface_ratio
            # insert criterion (reference: utils/mapper.py:239-251)
            # provably excludes every free-space sample (their labels are
            # >= surface_sample_range_m by construction), so no static
            # column slice is needed.
            k_near = min(world.shape[0], 1 << 17)
            ki, kvalid, kpts, ksdf = mp.compact_near_surface(
                world, smp.sdf_label, smp.mask,
                surface_sample_range_m=c.surface_sample_range_m,
                cap=k_near)
            if c.from_sample_points and not c.from_all_samples:
                upd_pts = kpts
                upd_mask = kvalid & (
                    jnp.abs(ksdf)
                    < c.surface_sample_range_m * c.map_surface_ratio)
            else:
                # from_all_samples: free-space samples too — no compacted
                # view exists for those, use the full sample set
                upd_pts = world
                upd_mask = smp.mask
            state, new_ratio = npm.insert_points(
                state, upd_pts, upd_mask, cur_ts, travel_dist,
                resolution=c.voxel_size_m, local_window_dist=lwd,
                force_all_new=force_all_new, insert_cap=insert_cap,
                maintain_btable=not self._use_join)

            frame_start = mp.append_start(pool, world.shape[0])
            pool = mp.append_samples(
                pool, world, smp.sdf_label, smp.weight, smp.mask, cur_ts,
                sem_label=smp.sem_label, color_label=smp.color_label)
            pool = mp.detect_new_samples_compact(
                state, pool, kpts, kvalid, frame_start + ki,
                resolution=c.voxel_size_m,
                new_certainty_thre=c.new_certainty_thre)
            new_obs_ratio = (
                pool.new_count.astype(jnp.float32)
                / jnp.maximum(jnp.sum(smp.mask.astype(jnp.int32)), 1)
                .astype(jnp.float32))
            return state, pool, key, new_ratio, new_obs_ratio

        # two static insert-cap variants: the INIT program (first frames /
        # reboot, whole scenes arrive at once) accepts 64k new points per
        # call; the STEADY program runs the same pipeline at 16k — a frame
        # adds only a few thousand points, and the insert pipeline's cost
        # scales with the static cap (probe gathers, block blends, table
        # scatters). Overflow beyond the cap drops harmlessly: undetected
        # novelty re-inserts on the following frames via the hash probe.
        # NOTE: buffer donation (donate_argnums) on these state/pool
        # programs compiles but the axon TPU backend rejects the aliased
        # execution with INVALID_ARGUMENT at the second frame — measured
        # win was ~2 ms/frame of pass-through copies, so donation stays off
        self._frame_update_init = jax.jit(frame_update)
        self._frame_update = jax.jit(
            functools.partial(frame_update, insert_cap=1 << 14))
        self._filter_pool = jax.jit(
            lambda pool, origin, key: mp.filter_pool(
                pool, origin, c.window_radius, key))

        # map pruning + rehash (reference: utils/mapper.py:253-256)
        def prune_and_rehash(state, cur_ts, travel_dist):
            state, n = npm.prune_map(
                state, cur_ts, travel_dist,
                prune_certainty_thre=c.max_prune_certainty,
                local_window_dist=lwd)
            state = npm.rehash(state, cur_ts, resolution=c.voxel_size_m,
                               use_mid_ts=c.use_mid_ts)
            return state, n

        self._prune_and_rehash = jax.jit(prune_and_rehash)

        # --- device-side post-track bookkeeping (the piece that used to
        # force a host sync between odometry and mapping): select the pose
        # the frame logic would pick (reference tracker.py:221-223 keeps
        # the initial guess on early failure), extend the travel-dist
        # array, and compute the mapping gate — all on device, so mapping
        # can be dispatched behind the tracker without waiting for its
        # result. The anchored frame has the last pose at the origin.
        def select_pose(valid, iters, pose_a, T_init_a, anchor, td, fid):
            use_pose = valid | (iters >= 10)
            Ta = jnp.where(use_pose, pose_a, T_init_a)
            tran = jnp.linalg.norm(Ta[:3, 3])
            td_new = td.at[fid].set(td[fid - 1] + tran)
            # teleport check (reference slam_dataset.py:552-557)
            teleport = tran > c.surface_sample_range_m * 20.0
            T_world = Ta.at[:3, 3].add(anchor)
            return T_world, td_new, valid & ~teleport

        self._select_pose = jax.jit(select_pose)

        # fused odometry chain for the standard (join-mode, geometry-only)
        # path: lset build + GN track + device pose selection in ONE
        # dispatch (each separate dispatch costs tunnel latency)
        if self._use_join:
            def track_chain(state, geo_features, geo_mlp, src_pts, src_n,
                            T_init, lf, anchor, fid, reboot_ts,
                            sensor_pos):
                lset_t, feats, _ = self._build_lset_track(
                    state, geo_features, lf.travel_dist, lf.cur_ts,
                    sensor_pos, reboot_ts)
                res = self._track(
                    state, feats, geo_mlp, src_pts,
                    jnp.arange(src_pts.shape[0]) < src_n, T_init, lf,
                    anchor, lset=lset_t)
                T32, td_new, mapok = select_pose(
                    res.valid, res.iterations, res.pose, T_init, anchor,
                    lf.travel_dist, fid)
                return res, T32, td_new, mapok

            self._track_chain = jax.jit(track_chain)

            # cached variant: registers against the previous frame's
            # POST-TRAIN local set + trained compact features returned by
            # the fused train program (same window the reference's local
            # map holds after reset_local_map) — no per-frame lset build
            # or feature gather on the tracking path. The temporal window
            # filter is baked into the set; the sensor-radius filter is
            # subsumed by the probe's own radius bound.
            def track_chain_cached(state, feats, geo_mlp, src_pts, src_n,
                                   T_init, td, anchor, fid, lset):
                res = self._track(
                    state, feats, geo_mlp, src_pts,
                    jnp.arange(src_pts.shape[0]) < src_n, T_init, None,
                    anchor, lset=lset)
                T32, td_new, mapok = select_pose(
                    res.valid, res.iterations, res.pose, T_init, anchor,
                    td, fid)
                return res, T32, td_new, mapok

            self._track_chain_cached = jax.jit(track_chain_cached)

    # -------------------------------------------------------------- helpers

    def _get_train_loop(self, iters: int, train_decoder: bool):
        k = (iters, train_decoder, self._map_deformed)
        if k not in self._train_loops:
            c = self.config
            inner = mp.make_train_loop(
                self.qp, self.optimizer, n_iters=iters, bs=c.bs,
                bs_new=c.bs_new_sample, train_decoder=train_decoder,
                loss_kwargs=self._loss_kwargs, mesh=self.mesh,
                subset_hist=c.train_subset_hist)
            if self._use_join:
                # fuse the lset build into the same program: one dispatch
                # for the whole mapping run (jitted callees trace inline).
                # The program also returns the lset + the TRAINED compact
                # features: the lset's window (cur_ts = this frame, post-
                # insert) is exactly the local map the NEXT frame's
                # tracker registers against (reference reset_local_map
                # runs after update, model/neural_points.py:424), so the
                # tracker skips its own 17 ms build+gather.
                build = (self._build_lset_train if self._map_deformed
                         else self._build_lset_train_nq)

                # takes MLP-only params and reads the feature arrays
                # from state (no buffer is passed twice, which would make
                # future donation an XLA error; see the donation NOTE in
                # _build_jits for why donate_argnums stays off)
                def fused(mlp_params, opt_state, state, pool, key, lf,
                          use_new, reboot_ts):
                    params = dict(mlp_params)
                    params["geo_features"] = state.geo_features
                    if c.color_on and state.color_features is not None:
                        params["color_features"] = state.color_features
                    ls = build(
                        state, lf.travel_dist, lf.cur_ts, reboot_ts)
                    out = inner(params, opt_state, state, pool, key,
                                lf, use_new, ls)
                    feats = out[0]["geo_features"][ls.gidx]
                    return out + (ls, feats)
                self._train_loops[k] = jax.jit(fused)
            else:
                self._train_loops[k] = inner
        return self._train_loops[k]

    def _lf(self, cur_ts: int, sensor_pos=None):
        td = jnp.asarray(self.travel_dist[: self.max_frames], jnp.float32)
        origins = None
        if self.config.proj_correction_on:
            origins = jnp.asarray(
                self.pgo_poses[: self.max_frames, :3, 3], jnp.float32)
        return mq.LocalFilter(
            travel_dist=td, cur_ts=jnp.int32(cur_ts),
            local_window_dist=self.local_window_dist,
            sensor_pos=None if sensor_pos is None
            else jnp.asarray(sensor_pos, jnp.float32),
            local_map_radius=self.config.local_map_radius,
            reboot_ts=self.reboot_ts,
            sensor_origins=origins)

    def set_gt_poses(self, gt: np.ndarray):
        self.gt_poses = gt

    def map_memory_mb(self, used_only: bool = True) -> float:
        """Neural-point map memory in MB (reference:
        model/neural_points.py:160-173 record_memory). With
        `used_only`, scales the preallocated fixed-capacity arrays by
        count/capacity — the reference's grow-on-demand equivalent."""
        s = self.state
        per_point = sum(
            a.dtype.itemsize * int(np.prod(a.shape[1:])) * (a.shape[0] - 1)
            for a in (s.positions, s.orientations, s.geo_features,
                      s.ts_create, s.ts_update, s.certainty)
            if a is not None)
        if s.color_features is not None:
            per_point += s.color_features.dtype.itemsize * \
                s.color_features.shape[1] * (s.color_features.shape[0] - 1)
        aux = s.table.nbytes + s.btable.nbytes
        frac = (int(self.state.count) / max(s.capacity, 1)) if used_only \
            else 1.0  # count pull costs a device RTT; call on a cadence
        return (per_point * frac + aux) / (1024.0 ** 2)

    # ------------------------------------------------------------ main loop

    def load_map(self, path: str):
        """Enter localization-with-prebuilt-map mode (reference:
        pin_slam.py:157-177): load the saved map, freeze decoders, disable
        mapping, track against the global map (no temporal filtering)."""
        from pin_slam_tpu.utils.map_io import load_implicit_map

        state, mlps, meta = load_implicit_map(
            path, capacity=self.config.map_capacity,
            with_btable=self._use_join is False)
        self.state = state
        self.params["geo_features"] = state.geo_features
        self.params["geo_mlp"] = mlps["geo_mlp"]
        if "color_mlp" in mlps and self.config.color_on:
            self.params["color_mlp"] = mlps["color_mlp"]
            self.params["color_features"] = state.color_features
        self.decoder_freezed = True
        self.localization_mode = True
        # a saved map may carry deformed orientations
        self._map_deformed = bool(
            np.any(np.asarray(state.orientations[:, 1:4]) != 0.0))
        if self._use_join:
            # the map is frozen: build the spatial-join set ONCE over all
            # alive rows and reuse it every frame (no per-frame local-map
            # rebuild, and the tracker keeps the fast join probe instead
            # of falling back to the cell-table path)
            from pin_slam_tpu.ops import knn_join as kj
            cnt = int(self.state.count)
            cap = max(1, -(-cnt // kj.TL)) * kj.TL
            m = jnp.arange(self.state.capacity) < cnt
            deformed = self._map_deformed
            self._loc_lset = jax.jit(
                lambda s: kj.build_local_set(
                    s.positions, m, self.config.voxel_size_m, cap,
                    certainty=s.certainty,
                    orientations=s.orientations if deformed else None)
            )(self.state)
            self._loc_feats = self.params["geo_features"][
                self._loc_lset.gidx]

    def grow_map_capacity(self, factor: int = 2):
        """Double the neural-point capacity when the map nears it
        (reference grows unboundedly via torch.cat,
        model/neural_points.py:378; here growth is an explicit host-side
        reallocation). Recompiles the capacity-shaped programs once —
        rare, and strictly better than silently dropping map points."""
        c = self.config
        new_cap = c.map_capacity * factor
        if not c.silence:
            print(f"map capacity {c.map_capacity} -> {new_cap} "
                  f"(count {int(self.state.count)})")
        self.state = npm.grow_capacity(self.state, new_cap)
        c.map_capacity = new_cap
        self.params["geo_features"] = self.state.geo_features
        if c.color_on:
            self.params["color_features"] = self.state.color_features
        self.opt_state = self.optimizer.init(self.params)
        self._train_loops = {}
        self._cur_lset = None          # gidx refers to the old capacity
        self._cur_track_feats = None
        self._build_jits()

    def set_after_pgo(self, on: bool):
        """Offset rotation by point orientations is ALWAYS active (identity
        quaternions until the first deformation make it a no-op), so the
        first loop closure triggers no recompiles. Kept for API parity
        (reference: model/neural_points.py:645-648)."""
        self.after_pgo = on

    def _run_preprocess(self, points, sem_labels):
        """Pad + dispatch stage I (crop/downsample) for one raw cloud."""
        c = self.config
        attr_dim = (c.color_channel if c.color_on else 0) + int(c.semantic_on)
        pts_in = np.asarray(points, np.float32)
        if c.semantic_on and sem_labels is not None:
            pts_in = np.hstack([
                pts_in, np.asarray(sem_labels, np.float32)[:, None]])
        raw, attr, n_raw = _pad_points(
            pts_in, 1 << int(np.ceil(np.log2(max(points.shape[0], 2)))),
            attr_dim)
        return self._preprocess(raw, attr, n_raw)

    def process_frame(self, frame_id: int, points: np.ndarray,
                      point_ts: Optional[np.ndarray] = None,
                      gt_pose: Optional[np.ndarray] = None,
                      loop_hook=None,
                      sem_labels: Optional[np.ndarray] = None,
                      next_points: Optional[np.ndarray] = None,
                      next_sem_labels: Optional[np.ndarray] = None):
        """Run steps I-IV for one frame. `points` is [N, 3+color] float in
        the sensor frame; `sem_labels` [N] int when semantic_on.
        `loop_hook(frame_id)` runs between odometry and mapping (the
        reference's loop+PGO slot, pin_slam.py:280-348).
        `next_points` (optional) is the NEXT frame's raw cloud: its
        preprocess is dispatched before this frame's host pull and reused
        when the caller passes the same cloud as frame_id+1's `points`.
        Returns the odometry pose estimate (4x4 float64)."""
        c = self.config
        t0 = time.time()

        # ---- initial guess (reference: slam_dataset.py:359-389)
        if frame_id == 0:
            if self.gt_poses is not None and not c.first_frame_ref:
                self.cur_pose_ref = self.gt_poses[0]
            self.odom_poses[0] = self.cur_pose_ref
            self.pgo_poses[0] = self.cur_pose_ref
            self.travel_dist[0] = 0.0
            self.last_pose_ref = self.cur_pose_ref
            init_guess = self.cur_pose_ref
        else:
            init_guess = compute_init_guess(
                c.uniform_motion_on and not self.lose_track,
                c.motion_model, self.last_pose_ref, self.last_odom_tran,
                damping=c.motion_damping)
            if not c.track_on and self.gt_poses is not None:
                init_guess = self.gt_poses[frame_id]

        # ---- invalid frame guard (reference: slam_dataset.py:421-428)
        if points.shape[0] < 10:
            self.odom_poses[frame_id] = init_guess
            self.pgo_poses[frame_id] = init_guess
            self.cur_pose_ref = init_guess
            self.travel_dist[frame_id] = self.travel_dist[max(frame_id - 1, 0)]
            self.timings.append([0.0] * 5)
            self.cur_frame = frame_id + 1
            return init_guess.copy()

        # ---- I. preprocess (reuse the result dispatched ahead by the
        # previous frame when the caller passed next_points)
        if self._prefetch is not None and self._prefetch[0] == frame_id:
            pre = self._prefetch[1]
        else:
            pre = self._run_preprocess(points, sem_labels)
        self._prefetch = None
        (train_pts, train_attr, train_n, src_pts, src_attr,
         src_n, train_total, src_total) = pre
        if self._sync_timing:
            jax.block_until_ready(train_pts)
        t1 = time.time()

        # ---- II. odometry
        if frame_id > 0 and c.track_on:
            anchor = self.last_pose_ref[:3, 3].copy()
            T_init = init_guess.copy()
            T_init[:3, 3] -= anchor
            # localization mode tracks against the global map without the
            # temporal window (reference: pin_slam.py:176-177)
            lf = (None if self.localization_mode else
                  self._lf(frame_id - 1,
                           sensor_pos=self.last_pose_ref[:3, 3] - anchor))
            use_color = c.color_on and (c.photometric_loss_on
                                        or c.consist_wieght_on)
            # NO host sync in either branch: the pose the frame logic
            # needs is picked on device (select_pose) so mapping can be
            # dispatched right behind the tracker; everything the host
            # needs surfaces in ONE batched pull after the mapping
            # dispatches (each separate pull costs a ~35 ms tunnel RTT).
            if self._use_join and not self.localization_mode \
                    and not use_color:
                if self._cur_lset is not None:
                    # register against the previous frame's post-train
                    # local set (no lset build on the tracking path)
                    res, T32_dev, td_dev, mapok_dev = \
                        self._track_chain_cached(
                            self.state, self._cur_track_feats,
                            self.params["geo_mlp"], src_pts, src_n,
                            jnp.asarray(T_init, jnp.float32),
                            jnp.asarray(
                                self.travel_dist[: self.max_frames],
                                jnp.float32),
                            jnp.asarray(anchor, jnp.float32),
                            jnp.int32(frame_id), self._cur_lset)
                else:
                    # fused chain: lset build + track + select = ONE
                    # dispatch (first frames / post-deform / post-grow)
                    res, T32_dev, td_dev, mapok_dev = self._track_chain(
                        self.state, self.params["geo_features"],
                        self.params["geo_mlp"], src_pts, src_n,
                        jnp.asarray(T_init, jnp.float32), lf,
                        jnp.asarray(anchor, jnp.float32),
                        jnp.int32(frame_id), jnp.int32(self.reboot_ts),
                        jnp.asarray(self.last_pose_ref[:3, 3],
                                    jnp.float32))
                self.last_tracking = res
                tracked = True
            else:
                color_kwargs = {}
                track_feats = self.params["geo_features"]
                track_cfeats = self.params.get("color_features")
                if self._use_join and self.localization_mode:
                    # frozen-map lset precomputed at load_map
                    color_kwargs["lset"] = self._loc_lset
                    track_feats = self._loc_feats
                if self._use_join and not self.localization_mode:
                    td_t = jnp.asarray(
                        self.travel_dist[: self.max_frames], jnp.float32)
                    lset_t, track_feats, lcf = self._build_lset_track(
                        self.state, self.params["geo_features"], td_t,
                        jnp.int32(frame_id - 1),
                        jnp.asarray(self.last_pose_ref[:3, 3],
                                    jnp.float32),
                        jnp.int32(self.reboot_ts))
                    color_kwargs["lset"] = lset_t
                    if lcf is not None:
                        track_cfeats = lcf
                if use_color:
                    cols = src_attr[:, : c.color_channel]
                    # rgb -> intensity (reference color_to_intensity,
                    # utils/tools.py)
                    inten = (cols[:, 0] if c.color_channel == 1 else
                             0.299 * cols[:, 0] + 0.587 * cols[:, 1]
                             + 0.114 * cols[:, 2])
                    color_kwargs.update(
                        src_intensity=inten,
                        color_features=track_cfeats,
                        color_mlp=self.params.get("color_mlp"))
                res = self._track(
                    self.state, track_feats,
                    self.params["geo_mlp"], src_pts,
                    jnp.arange(c.source_point_cap) < src_n,
                    jnp.asarray(T_init, jnp.float32), lf,
                    jnp.asarray(anchor, jnp.float32), **color_kwargs)
                self.last_tracking = res
                T32_dev, td_dev, mapok_dev = self._select_pose(
                    res.valid, res.iterations, res.pose,
                    jnp.asarray(T_init, jnp.float32),
                    jnp.asarray(anchor, jnp.float32),
                    jnp.asarray(self.travel_dist[: self.max_frames],
                                jnp.float32),
                    jnp.int32(frame_id))
                tracked = True
        elif frame_id > 0:
            if self.gt_poses is None:
                raise ValueError("mapping mode requires gt poses")
            self._update_odom_pose(frame_id, init_guess)
            tracked = False
        else:
            self.cur_pose_ref = init_guess
            tracked = False
        if self._sync_timing and self.last_tracking is not None:
            jax.block_until_ready(self.last_tracking.pose)
        t2 = time.time()

        # ---- reboot check (reference: pin_slam.py:352-363). Uses the
        # lose-track counter as of the previous frame (one frame later
        # than the reference) so mapping can be dispatched without
        # waiting for the tracker result.
        system_rebooted = False
        if self.consecutive_lose_track_frame >= c.reboot_frame_thre:
            self.pool = self.pool.replace(
                count=jnp.zeros((), jnp.int32),
                new_count=jnp.zeros((), jnp.int32))
            self.reboot_ts = frame_id
            system_rebooted = True
            self.consecutive_lose_track_frame = 0
            self.decoder_freezed = False

        # ---- IV. mapping (dispatched behind the tracker; gated on
        # device by tracker validity via frame_update's do_map input)
        stop_prev = self.stop_status  # stop gate lags one frame
        host_force = frame_id < 5 or system_rebooted
        if not tracked:
            T32_dev = jnp.asarray(self.cur_pose_ref, jnp.float32)
            td_dev = jnp.asarray(
                self.travel_dist[: self.max_frames], jnp.float32)
            mapok_dev = jnp.bool_(not self.lose_track)
        do_map_dev = jnp.logical_or(
            jnp.bool_(host_force),
            jnp.logical_and(mapok_dev, jnp.bool_(not stop_prev)))
        dispatched_map = not self.localization_mode
        pool_cadence = (frame_id + 1) % c.pool_filter_freq == 0
        new_obs_ratio = None
        if dispatched_map:
            # prune inactive low-certainty points (reference:
            # utils/mapper.py:253-256); half-period phase offset so the
            # prune+rehash program never lands on a pool-filter frame —
            # cadence programs stacking on one frame are the p95 outliers
            if c.prune_map_on and (
                    frame_id + 1 + c.prune_freq_frame // 2) \
                    % c.prune_freq_frame == 0:
                self.state, _ = self._prune_and_rehash(
                    self.state, jnp.int32(frame_id), td_dev)
                self.params["geo_features"] = self.state.geo_features
                if c.color_on:
                    self.params["color_features"] = self.state.color_features
            static_mask = jnp.ones(c.frame_point_cap, bool)
            if c.dynamic_filter_on and frame_id > 0:
                # judge valid rows only (pad rows sit at the sensor origin
                # after the transform and would pollute the el-FOV bounds)
                static_mask &= jnp.arange(c.frame_point_cap) < train_n
                world = transform_points(train_pts, T32_dev)
                hist = None
                if c.visibility_filter_on:
                    # row 0 = current origin (elevation-FOV estimation
                    # only); rows 1.. = historic origins the visibility
                    # test judges from. Before enough history exists the
                    # offsets clamp to frame 0 — the map there is tiny, so
                    # early bins are mostly empty (unjudgeable = kept).
                    orig = np.stack(
                        [self.pgo_poses[max(frame_id - off, 0)][:3, 3]
                         for off in c.visibility_hist_offsets])
                    hist = jnp.concatenate([
                        T32_dev[:3, 3][None],
                        jnp.asarray(orig, jnp.float32)])
                static_mask = self._dynamic_filter(
                    self.state, self.params["geo_features"],
                    self.params["geo_mlp"], world,
                    static_mask, self._lf(frame_id - 1), hist)
                # device arrays over the train cloud (rows < train_n);
                # evals pull them on a cadence to score the filter
                # against mover ground truth (precision/recall)
                self.last_static_mask = static_mask
                self.last_train_pts = train_pts
                self.last_train_n = train_n
            fu = (self._frame_update_init if host_force
                  else self._frame_update)
            (self.state, self.pool, self.key, new_ratio,
             new_obs_ratio) = fu(
                self.state, self.pool, train_pts, train_attr, train_n,
                T32_dev, jnp.int32(frame_id), td_dev, self.key,
                jnp.bool_(system_rebooted), static_mask, do_map_dev)
            self.params["geo_features"] = self.state.geo_features
            if c.color_on:
                self.params["color_features"] = self.state.color_features

            # pool filtering (reference: utils/mapper.py:316-360); the
            # origin comes from the device pose — still no host sync
            if pool_cadence:
                self.key, kf = jax.random.split(self.key)
                self.pool = self._filter_pool(
                    self.pool, T32_dev[:3, 3], kf)
        if self._sync_timing:
            jax.block_until_ready(self.pool.count)

        # ---- training dispatch (reference: pin_slam.py:370-390). In the
        # default SLAM path it is dispatched BEFORE the frame's batched
        # host pull: every host-side gate on the training path
        # (lose-track, stop, adaptive iteration count) lags one frame —
        # the same pattern the reboot check above already uses — so the
        # ~35 ms tunnel completion-notification of the pull overlaps the
        # device executing the train program instead of gating it.
        # The device-side do_map gate (frame_update) stays exact.
        def run_training():
            did_map = dispatched_map and (
                host_force or (not self.lose_track and not stop_prev))
            self.last_did_map = did_map
            if frame_id % c.mapping_freq_frame == 0 and did_map:
                cur_iters = (c.iters * c.init_iter_ratio
                             if (frame_id == 0 or system_rebooted)
                             else c.iters)
                if self.stop_status:
                    cur_iters = max(1, cur_iters - 10)
                cur_iters = max(1, cur_iters + self.adaptive_iter_offset)
                if self.post_loop_iter_boost_pending:
                    # re-converge the SDF around just-deformed geometry
                    cur_iters += self.post_loop_iter_boost_pending
                    self.post_loop_iter_boost_pending = 0

                if (frame_id - self.reboot_ts) == c.freeze_after_frame:
                    self.decoder_freezed = True

                # local bundle adjustment (reference: pin_slam.py:388-389)
                if ba_due:
                    from pin_slam_tpu.slam.ba import run_bundle_adjustment
                    run_bundle_adjustment(self, frame_id)

                # when training is dispatched BEFORE the pull, the host
                # travel_dist[frame_id] is still unset (0) — the window
                # lower bound would collapse to ts_lo=0 and the training
                # local set would never age out old geometry. At a revisit
                # that keeps the drift-offset duplicates (re-inserted by
                # the re-observation rule) visible to the NEXT frame's
                # tracker, whose registration then blurs between the two
                # wall copies — a positive-feedback drift runaway (measured
                # 0.95 m ATE at frame 145 vs 2.6 cm with the correct
                # window). select_pose already extended the travel array
                # on device, so pass that — exact, still zero host syncs.
                self.train(cur_iters, frame_id,
                           td_dev=td_dev if lag_pull else None,
                           T_dev=T32_dev if lag_pull else None)

        ba_due = (c.track_on and c.ba_freq_frame > 0
                  and (frame_id + 1) % c.ba_freq_frame == 0)
        # BA needs this frame's pulled pose; sync-timing mode keeps the
        # legacy order so the stage buckets stay attributable
        lag_pull = dispatched_map and not ba_due and not self._sync_timing
        if lag_pull:
            run_training()

        # next frame's stage I rides ahead of the blocking pull: the device
        # (and the host padding memcpy) overlap the pull's tunnel wait
        if next_points is not None and next_points.shape[0] >= 10:
            self._prefetch = (
                frame_id + 1,
                self._run_preprocess(next_points, next_sem_labels))

        # ---- THE one batched host pull of the frame
        pull = []
        if tracked:
            res = self.last_tracking
            pull += [res.valid, res.iterations, res.pose]
        if dispatched_map and c.adaptive_iters:
            pull.append(new_obs_ratio)
        if dispatched_map and pool_cadence:
            pull.append(self.state.count)
        pull += [train_total, src_total]
        t_pull0 = time.time()
        vals = list(jax.device_get(tuple(pull))) if pull else []
        self.last_pull_block = time.time() - t_pull0
        # cap-overflow accounting (rides the one batched pull): the
        # preprocess thins uniformly past the static caps — never silently
        tt, st = int(vals[-2]), int(vals[-1])
        vals = vals[:-2]
        if tt > c.frame_point_cap or st > c.source_point_cap:
            self.cap_overflow_frames += 1
            self.cap_overflow_max_ratio = max(
                self.cap_overflow_max_ratio, tt / c.frame_point_cap,
                st / c.source_point_cap)
            if not c.silence and self.cap_overflow_frames == 1:
                print(f"[warn] frame {frame_id}: point caps exceeded "
                      f"(train {tt}/{c.frame_point_cap}, source "
                      f"{st}/{c.source_point_cap}); thinning uniformly")
        if tracked:
            valid, iters, pose_d = (
                bool(vals[0]), int(vals[1]), vals[2])
            self.last_track_iters = iters
            vals = vals[3:]
            if not valid and iters < 10:
                # keep guess (reference tracker.py:221-223)
                cur_pose = init_guess
            else:
                cur_pose = np.asarray(pose_d, np.float64)
                cur_pose[:3, 3] += anchor
            self.lose_track = not valid
            self._update_odom_pose(frame_id, cur_pose)

        # adaptive iteration count (reference: utils/mapper.py:425-438)
        self.adaptive_iter_offset = 0
        if dispatched_map and c.adaptive_iters:
            self.new_obs_ratio = float(vals.pop(0))
            if self.new_obs_ratio < c.new_sample_ratio_less:
                self.adaptive_iter_offset = -5
            elif self.new_obs_ratio > c.new_sample_ratio_more:
                self.adaptive_iter_offset = 5
                if (frame_id > c.freeze_after_frame
                        and self.new_obs_ratio > c.new_sample_ratio_restart):
                    self.adaptive_iter_offset = 10
        if dispatched_map and pool_cadence:
            # capacity watchdog (shares the batched pull): grow the map
            # before insert_points starts dropping points silently
            if int(vals.pop(0)) > 0.9 * c.map_capacity:
                self.grow_map_capacity()
        t4 = time.time()

        # ---- III. loop closure + PGO (after the pull — the already-
        # inserted current frame carries ts=frame_id, so a closure's
        # elastic deformation corrects it like every other frame)
        if loop_hook is not None:
            loop_hook(frame_id)
        t3 = time.time()

        if not lag_pull:
            run_training()
        if self._sync_timing:
            jax.block_until_ready(self.params["geo_features"])
        t5 = time.time()

        # [preprocess, odometry, pgo, map-prep, map-opt]; odometry is the
        # tracker dispatch, map-prep the mapping dispatches + the frame's
        # single batched host pull, pgo the (post-pull) loop-closure block
        self.timings.append([t1 - t0, t2 - t1, t3 - t4, t4 - t2, t5 - t3])
        self.cur_frame = frame_id + 1
        return self.cur_pose_ref.copy()

    def train(self, iters: int, frame_id: int, td_dev=None, T_dev=None):
        """Run `iters` mapping iterations with a fresh optimizer (the
        reference creates a new Adam per mapping() call, utils/tools.py:153).
        The whole run is one jitted lax.scan program, cached per
        (iters, decoder-frozen) variant.

        `td_dev`/`T_dev` carry the DEVICE-side travel-dist array and pose
        when training is dispatched before the frame's host pull (the host
        mirrors are one frame stale at that point — see process_frame)."""
        if not self._use_join:
            self.opt_state = self.optimizer.init(self.params)
        lf = self._lf(frame_id)
        if td_dev is not None:
            lf = lf._replace(travel_dist=td_dev)
        if T_dev is not None and lf.sensor_origins is not None:
            # proj-correction ray origins: the host pose row for this
            # frame is also stale pre-pull
            lf = lf._replace(sensor_origins=lf.sensor_origins
                             .at[frame_id].set(T_dev[:3, 3]))
        use_new = jnp.bool_(not (self.lose_track or self.stop_status))
        loop = self._get_train_loop(iters, not self.decoder_freezed)
        if self._use_join:
            # the fused program reads feature arrays from the (donated)
            # state; passing them again via params would alias a donated
            # buffer (a hard XLA error) — hand over the MLPs only
            mlp_params = {k: v for k, v in self.params.items()
                          if k not in ("geo_features", "color_features")}
            out = loop(mlp_params, self.opt_state, self.state, self.pool,
                       self.key, lf, use_new, jnp.int32(self.reboot_ts))
        else:
            out = loop(self.params, self.opt_state, self.state, self.pool,
                       self.key, lf, use_new, None)
        (self.params, self.opt_state, self.state, self.key,
         losses) = out[:5]
        if self._use_join:
            # post-train local map + trained compact features, reused as
            # the next frame's tracker search structure (see _build_jits)
            self._cur_lset, self._cur_track_feats = out[5], out[6]
        metrics = {"loss": losses[-1]}
        # write trained features back to the map (assign_local_to_global
        # equivalent; reference model/neural_points.py:515-526)
        self.state = self.state.replace(
            geo_features=self.params["geo_features"],
            color_features=self.params.get("color_features",
                                           self.state.color_features))
        # device scalars; pulled only if a logger reads them on cadence
        self.last_train_metrics = metrics
        return metrics

    def _update_odom_pose(self, frame_id: int, cur_pose: np.ndarray):
        """(reference: dataset/slam_dataset.py:507-569)"""
        c = self.config
        # project the tracker's float32 rotation back onto SO(3): each
        # frame's output carries ~1e-5 scale/shear which COMPOUNDS through
        # the pose chain (~0.3 % by frame 1000, measured) — enough to
        # corrupt downstream relative-pose math and rotation metrics
        U, _, Vt = np.linalg.svd(cur_pose[:3, :3])
        if np.linalg.det(U) * np.linalg.det(Vt) < 0:
            U[:, 2] *= -1.0
        cur_pose = cur_pose.copy()
        cur_pose[:3, :3] = U @ Vt
        self.cur_pose_ref = cur_pose
        self.last_odom_tran = np_se3_inv(self.last_pose_ref) @ cur_pose

        rot_close = np_rotation_angle_deg(self.last_odom_tran) < 0.057
        tran_close = np.linalg.norm(
            self.last_odom_tran[:3, 3]) < c.voxel_size_m * 0.1
        if rot_close and tran_close:
            self.stop_count += 1
        else:
            self.stop_count = 0
        self.stop_status = self.stop_count > c.stop_frame_thre

        self.pgo_poses[frame_id] = cur_pose
        self.odom_poses[frame_id] = (
            self.odom_poses[frame_id - 1] @ self.last_odom_tran)

        if self.lose_track:
            self.consecutive_lose_track_frame += 1
        else:
            self.consecutive_lose_track_frame = 0

        tran_dist = np.linalg.norm(self.last_odom_tran[:3, 3])
        if tran_dist > c.surface_sample_range_m * 20.0:
            self.lose_track = True
            self.consecutive_lose_track_frame = c.reboot_frame_thre

        self.travel_dist[frame_id] = self.travel_dist[frame_id - 1] + tran_dist
        self.last_pose_ref = self.cur_pose_ref
