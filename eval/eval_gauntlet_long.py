#!/usr/bin/env python3
"""Long-horizon gauntlet: the stress dimensions the 240-frame gauntlet
does not cover (VERDICT round-2 items):

  * >= 1000 frames on an oval track with VERTICAL motion (z oscillation),
  * swept (rolling-shutter) scans with DESKEW on (the run.py deskew path),
  * a map large enough to cross PRUNE events and the capacity-growth
    watchdog (map_capacity starts small on purpose; slam/system.py
    grow_map_capacity must fire mid-run),
  * --dynamic: moving spheres in the scene, driving the map-based dynamic
    filter end-to-end; reports dynamic-measurement rejection quality.

Scored like the main gauntlet: ATE/drift + exact mesh metrics against the
analytic STATIC scene.

    python eval/eval_gauntlet_long.py [--frames 1000] [--dynamic] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _edge_errors(dg, gt_eval):
    """Rotation/translation error of a closure's refined edge and of the
    pre-solve odometry-chain edge, both vs the GT relative transform
    (relative edges are start-frame invariant)."""
    from pin_slam_tpu.slam.pgo import so3_log_batch

    i, j = int(dg["loop"]), int(dg["frame"])
    gt_edge = np.linalg.inv(gt_eval[i]) @ gt_eval[j]
    out = {"loop": i, "frame": j,
           "residual_cm": dg["residual_cm"],
           "refine_moved_m": dg["refine_moved_m"],
           "cov_rot_std_deg": float(np.degrees(np.sqrt(
               np.clip(dg["cov_diag"][:3], 0, None).mean()))),
           "cov_tran_std_m": float(np.sqrt(
               np.clip(dg["cov_diag"][3:], 0, None).mean()))}
    for name, T in (("edge", dg["T_edge"]), ("chain", dg["T_chain"])):
        E = np.linalg.inv(gt_edge) @ T
        out[f"{name}_rot_err_deg"] = float(np.degrees(np.linalg.norm(
            so3_log_batch(E[None, :3, :3])[0])))
        out[f"{name}_tran_err_m"] = float(np.linalg.norm(E[:3, 3]))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=1000)
    # ~0.29 m/frame: swept 16k-ray scans track reliably below ~0.4 m/frame
    # (measured: 0.52 m/frame loses track at the first curve; 0.26 is
    # stable); 3.8 laps still revisits the loop-closure zone repeatedly
    p.add_argument("--laps", type=float, default=3.8)
    # 25 m: at 60 m the synthetic floor is observed at extreme grazing
    # incidence out to the far walls, and the projective SDF labels' known
    # along-ray bias mis-learns the floor height by ~0.5 m EVEN WITH GT
    # POSES (measured: vertical zero-crossing probe under the track at
    # -5.47 m vs true -5.0). Tracking then sinks to follow the biased
    # floor at ~0.05 m/frame (body-frame error is pure -z) and the
    # displaced re-inserts snowball the map (39 m ATE / 1.2M points at
    # range 60 over 1000 frames). Real spinning LiDARs return nothing
    # from pavement at that incidence; 25 m matches an indoor/NCD-style
    # range and bounds the residual sink to what the per-lap loop
    # closures correct.
    p.add_argument("--range", type=float, default=25.0, dest="rng")
    p.add_argument("--noise", type=float, default=0.01)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--dynamic", action="store_true",
                   help="add moving spheres + map-based dynamic filter")
    p.add_argument("--no-deskew", action="store_true")
    p.add_argument("--no-sweep", action="store_true",
                   help="instantaneous scans (diagnostic: isolates the "
                        "swept-scan/deskew path from the rest)")
    p.add_argument("--skip-mesh", action="store_true",
                   help="trajectory metrics only (fast diagnostics)")
    p.add_argument("--incidence-cos-floor", type=float, default=None,
                   help="clamp |cos(incidence)| >= this before scaling "
                        "(label mode: keeps grazing free labels decisively "
                        "positive instead of teaching sdf~0 in free space)")
    p.add_argument("--incidence-mode", default="label",
                   choices=["label", "weight"],
                   help="free-space incidence handling: relabel by |cos| "
                        "or downweight by |cos| (see config.py)")
    p.add_argument("--incidence", action="store_true",
                   help="incidence-weighted projective SDF labels "
                        "(ops/range_image.py) — the grazing-incidence "
                        "floor-bias fix; bins match the synthetic scan's "
                        "512x32 ray grid")
    p.add_argument("--cap", type=int, default=14,
                   help="log2 initial map capacity (small on purpose so "
                        "the growth watchdog fires; raise to isolate it)")
    p.add_argument("--gt-poses", action="store_true",
                   help="mapping mode: feed mid-sweep GT poses, no "
                        "tracking/PGO — isolates MAP fidelity (the floor "
                        "probe's pose-error-free upper bound)")
    p.add_argument("--out", default=None)
    a = p.parse_args()

    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp  # noqa: E402

    from pin_slam_tpu.config import Config
    from pin_slam_tpu.dataset.slam_dataset import SLAMDataset
    from pin_slam_tpu.dataset.synthetic import (
        SyntheticSequence, large_scene, lidar_directions,
        moving_spheres_scene, oval_trajectory)
    from pin_slam_tpu.slam.loop import LoopPgoManager
    from pin_slam_tpu.slam.mesher import Mesher, MeshConfig
    from pin_slam_tpu.slam.system import PinSLAMSystem
    from pin_slam_tpu.utils.eval_mesh import (
        crop_points_to_region, point_to_mesh_distance, sample_mesh_points)
    from pin_slam_tpu.utils.eval_traj import absolute_error, relative_error

    cfg = Config()
    cfg.track_on = not a.gt_poses
    cfg.pgo_on = not a.gt_poses
    cfg.max_range = a.rng
    cfg.min_range = 0.5
    cfg.vox_down_m = 0.1
    cfg.source_vox_down_m = 0.5
    cfg.voxel_size_m = 0.35
    cfg.sigma_sigmoid_m = 0.05
    cfg.surface_sample_range_m = 0.3
    cfg.free_behind_n = 2
    cfg.loss_weight_on = True
    cfg.bs = 8192
    cfg.iters = 10
    cfg.init_iter_ratio = 25
    cfg.bs_new_sample = 1024
    cfg.reg_iter_n = 50
    # deliberately small: the capacity-growth watchdog
    # (slam/system.py grow_map_capacity) MUST fire mid-run
    cfg.map_capacity = 1 << a.cap
    cfg.buffer_size = 1 << 21
    cfg.frame_point_cap = 1 << 14
    # 1<<13: at full range the 0.5 m-voxel source cloud of the hall is
    # ~8k points; the old 4096 cap uniformly thinned HALF the source
    # every frame (cap_overflow_frames fired on every frame)
    cfg.source_point_cap = 1 << 13
    cfg.max_frames = 1 << int(np.ceil(np.log2(a.frames + 1)))
    cfg.local_map_context = False
    cfg.pgo_freq = 20
    cfg.silence = True
    # prune must actually run in-window
    cfg.prune_map_on = True
    cfg.prune_freq_frame = 100
    cfg.max_prune_certainty = 3.0
    cfg.deskew = not a.no_deskew
    if a.dynamic:
        cfg.dynamic_filter_on = True
        # multi-viewpoint visibility test: catches movers crossing open
        # space, where the certainty filter has no neural points to judge
        # from (ops/visibility.py)
        cfg.visibility_filter_on = True
        cfg.visibility_hist_offsets = (10, 30, 60)
    if a.incidence:
        cfg.incidence_label_on = True
        cfg.incidence_mode = a.incidence_mode
        if a.incidence_cos_floor is not None:
            cfg.incidence_cos_floor = a.incidence_cos_floor
        # el-bin count must not exceed the scan's ring count, else rows
        # are empty and the op conservatively falls back to no correction
        cfg.incidence_bins_az = 512
        cfg.incidence_bins_el = 32
    cfg.finalize()
    cfg.pool_capacity = 3_000_000
    # keep the same ~27 m absolute travel window the ratio 0.45 gave at
    # the old 60 m range (local_map_radius = max_range + 2)
    cfg.local_map_travel_dist_ratio = 27.9 / (a.rng + 2.0)
    cfg.min_loop_travel_dist_ratio = 0.8
    cfg.use_mid_ts = True

    static_scene = large_scene()
    scene_t = movers = None
    if a.dynamic:
        scene_t, movers = moving_spheres_scene(static_scene, a.frames)
    poses = oval_trajectory(a.frames, a=16.0, b=8.0, laps=a.laps,
                            height_amp=1.2, height_waves=2.0,
                            ease_in_frames=8)
    if a.no_sweep:
        a.no_deskew = True
        cfg.deskew = False
    seq = SyntheticSequence(
        scene_sdf=static_scene, scene_sdf_t=scene_t, poses=poses,
        dirs=lidar_directions(512, 32), max_range=a.rng,
        sweep=not a.no_sweep)

    system = PinSLAMSystem(cfg)
    if a.gt_poses:
        # deskew anchors every scan at its MID-SWEEP pose; mapping mode
        # must be fed the same convention or every insert is half a frame
        # of motion off
        system.set_gt_poses(np.stack(
            [seq._pose_at(i, 0.5) for i in range(len(seq))])
            if cfg.deskew else poses)
    loop_mgr = LoopPgoManager(cfg, system)

    rng = np.random.RandomState(7)
    gt_points = []
    growth_events = []
    cap0 = cfg.map_capacity
    dyn_stats = {"n_dyn": 0, "n_dyn_rejected": 0, "n_static": 0,
                 "n_static_rejected": 0, "tp": 0, "fp": 0, "fn": 0}
    t0 = time.time()
    for fid in range(len(seq)):
        pts_clean, ts = seq.frame_with_ts(fid)
        pts = pts_clean
        if a.noise > 0:
            d = np.linalg.norm(pts[:, :3], axis=1, keepdims=True)
            pts = pts.copy()
            pts[:, :3] *= 1.0 + (a.noise * rng.randn(pts.shape[0], 1)
                                 / np.maximum(d, 1.0))
        if cfg.deskew and fid > 0 and not system.lose_track:
            pts = SLAMDataset.deskew(pts, ts, system.last_odom_tran)
        hook = ((lambda f, _p=pts: loop_mgr.after_frame(f, _p))
                if cfg.pgo_on else None)
        system.process_frame(fid, pts, loop_hook=hook)
        if cfg.map_capacity != cap0 and (
                not growth_events or growth_events[-1][1] != cfg.map_capacity):
            growth_events.append((fid, cfg.map_capacity))

        # GT surface samples: static geometry only, true swept poses
        w = np.empty_like(pts_clean[:, :3])
        NSEG = 16
        seg = np.minimum((ts * NSEG).astype(int), NSEG - 1)
        for s in np.unique(seg):
            m = seg == s
            T = seq._pose_at(fid, (s + 0.5) / NSEG)
            w[m] = pts_clean[m, :3] @ T[:3, :3].T + T[:3, 3]
        if movers is not None:
            dmov = np.min(np.linalg.norm(
                w[:, None, :] - movers[fid][None], axis=-1), axis=1)
            is_dyn = dmov < 0.8 + 0.15
            gt_points.append(w[~is_dyn][::4].astype(np.float32))
            dyn_stats["n_dyn"] += int(is_dyn.sum())
            dyn_stats["n_static"] += int((~is_dyn).sum())
            if fid % 20 == 10 and system.last_static_mask is not None:
                # score the filter per measurement on a cadence: its
                # verdicts cover the train cloud (sensor frame); mover
                # ground truth comes from the GT mid-scan pose, so a
                # drifted estimate cannot mislabel the reference
                sm, tp_pts, tn = jax.device_get(
                    (system.last_static_mask, system.last_train_pts,
                     system.last_train_n))
                n = int(tn)
                sm, tp_pts = sm[:n], tp_pts[:n]
                Tgt = seq._pose_at(fid, 0.5)
                wtr = tp_pts @ Tgt[:3, :3].T + Tgt[:3, 3]
                gt_dyn = np.min(np.linalg.norm(
                    wtr[:, None, :] - movers[fid][None], axis=-1),
                    axis=1) < 0.8 + 0.15
                pred_dyn = ~sm
                dyn_stats["tp"] += int((pred_dyn & gt_dyn).sum())
                dyn_stats["fp"] += int((pred_dyn & ~gt_dyn).sum())
                dyn_stats["fn"] += int((~pred_dyn & gt_dyn).sum())
                dyn_stats["n_static_rejected"] += int(pred_dyn.sum())
                dyn_stats["n_checked"] = dyn_stats.get("n_checked", 0) + n
        else:
            gt_points.append(w[::4].astype(np.float32))
        if system.lose_track != getattr(main, "_was_lost", False):
            main._was_lost = system.lose_track
            print(f"frame {fid}: lose_track -> {system.lose_track} "
                  f"(fail_code {getattr(system, 'last_fail_code', '?')})",
                  file=sys.stderr)
        if fid % 50 == 0:
            el = time.time() - t0
            print(f"frame {fid}/{len(seq)} ({el / (fid + 1) * 1e3:.0f} "
                  f"ms/frame, map {int(system.state.count)}/"
                  f"{cfg.map_capacity}, loops {loop_mgr.pgo_count}, "
                  f"lost {system.lose_track})", file=sys.stderr)

    n = len(seq)
    # deskew anchors each estimate at the MID-SCAN pose (ts_mid_pose=0.5,
    # slam_dataset.deskew) — compare against the mid-sweep GT, not the
    # sweep-start pose (a half-frame tangential bias otherwise)
    gt_eval = (np.stack([seq._pose_at(i, 0.5) for i in range(n)])
               if cfg.deskew else seq.poses[:n])
    A0 = gt_eval[0]
    slam_poses = A0 @ system.pgo_poses[:n]
    odom_poses = A0 @ system.odom_poses[:n]
    ate_s, are_s = absolute_error(gt_eval, slam_poses, False)
    ate_o, are_o = absolute_error(gt_eval, odom_poses, False)
    lengths = (20, 40, 60, 80, 100)
    dt_s, dr_s = relative_error(gt_eval, slam_poses, lengths, step=5)
    dt_o, dr_o = relative_error(gt_eval, odom_poses, lengths, step=5)

    # floor-height probe (the grazing-incidence bias check): SDF zero
    # crossing along vertical columns under the track vs the analytic
    # scene's own crossing — the long-range failure mode was the floor
    # learned ~0.5 m low EVEN WITH GT POSES (ARCHITECTURE.md)
    probe_mesher = Mesher(system.qp, MeshConfig(
        mc_res_m=0.15, mesh_min_nn=10, infer_bs=1 << 13, skip_top_voxel=0))
    A0i = np.linalg.inv(A0)
    zs = np.linspace(-7.0, -3.0, 201)
    # dense grid of floor columns (2 m pitch) across the hall, keeping
    # only columns whose ANALYTIC crossing is a clean open floor (SDF
    # straddles zero in [-7,-3] and the crossing sits near the z=-5
    # plane — this drops pillar/island columns without hardcoding the
    # scene layout). A column contributes only where the learned map has
    # neighbors (nn gate), so coverage holes self-exclude; the summary is
    # then a mean over O(100) observed columns instead of 1-2 hand-picked
    # points.
    gx, gy = np.meshgrid(np.arange(-22.0, 22.1, 2.0),
                         np.arange(-22.0, 22.1, 2.0))
    cand_xy = np.stack([gx.ravel(), gy.ravel()], -1)
    lo = np.full(len(cand_xy), -7.0)
    hi = np.full(len(cand_xy), -3.0)
    top = static_scene(np.c_[cand_xy, hi])
    bot = static_scene(np.c_[cand_xy, lo])
    clean = (top > 0.2) & (bot < -0.2)
    for _ in range(40):               # vectorized bisection, clean cols
        mid = 0.5 * (lo + hi)
        pos = static_scene(np.c_[cand_xy, mid]) > 0
        hi = np.where(pos, mid, hi)
        lo = np.where(pos, lo, mid)
    gt_z_all = 0.5 * (lo + hi)
    clean &= np.abs(gt_z_all - (-5.0)) < 0.6
    probe_xy = cand_xy[clean]
    gt_z_all = gt_z_all[clean]
    n_cols = len(probe_xy)
    col_w = np.concatenate([
        np.stack([np.full_like(zs, x), np.full_like(zs, y), zs], -1)
        for (x, y) in probe_xy]).astype(np.float32)     # [n_cols*201, 3]
    col_m = col_w @ A0i[:3, :3].T.astype(np.float32) + \
        A0i[:3, 3].astype(np.float32)
    bs_q = 1 << 13
    n_pad = ((col_m.shape[0] + bs_q - 1) // bs_q) * bs_q
    batch = np.zeros((n_pad, 3), np.float32)
    batch[: col_m.shape[0]] = col_m
    sdf_l, nn_l = [], []
    for k0 in range(0, n_pad, bs_q):
        s_, n_ = probe_mesher._query_batch(
            system.state, system.params["geo_features"],
            system.params["geo_mlp"], jnp.asarray(batch[k0:k0 + bs_q]))
        sdf_l.append(np.asarray(s_))
        nn_l.append(np.asarray(n_))
    sdf_col = np.concatenate(sdf_l)[: col_m.shape[0]].reshape(n_cols, -1)
    nn_col = np.concatenate(nn_l)[: col_m.shape[0]].reshape(n_cols, -1)
    floor_probe = []
    for k in range(n_cols):
        x, y = probe_xy[k]
        gt_z = gt_z_all[k]
        s, nnk = sdf_col[k], nn_col[k]
        entry = {"xy": [float(x), float(y)], "gt_z": float(gt_z),
                 "est_z": None, "err_m": None, "max_nn": int(nnk.max())}
        for gate in (6, 3):          # well-observed first; sparse fallback
            cross = np.where((s[:-1] <= 0) & (s[1:] > 0)
                             & (nnk[:-1] >= gate) & (nnk[1:] >= gate))[0]
            if len(cross):
                i0 = cross[np.argmin(np.abs(zs[cross] - gt_z))]
                z_est = zs[i0] + (zs[i0 + 1] - zs[i0]) * (
                    -s[i0] / max(s[i0 + 1] - s[i0], 1e-9))
                entry.update(est_z=float(z_est),
                             err_m=float(z_est - gt_z), nn_gate=gate)
                break
        floor_probe.append(entry)
    probe_errs = [p_["err_m"] for p_ in floor_probe if p_["err_m"] is not None]

    exact = {}
    v = np.zeros((0, 3))
    if not a.skip_mesh:
        mesher = Mesher(system.qp, MeshConfig(
            mc_res_m=0.15, mesh_min_nn=10, min_cluster_vertices=300,
            infer_bs=1 << 15, skip_top_voxel=0))
        v, f = mesher.recon_map_mesh(
            system.state, system.params["geo_features"],
            system.params["geo_mlp"])
        v = v @ A0[:3, :3].T + A0[:3, 3]
        gt = np.concatenate(gt_points)
        perm = np.random.RandomState(0).permutation(len(gt))[:300_000]
        pred = sample_mesh_points(v, f, 1_000_000)
        pred_obs = crop_points_to_region(pred, gt[perm])
        d_prec = np.abs(static_scene(pred_obs.astype(np.float64)))
        d_rec = point_to_mesh_distance(gt[perm], v, f)
        for thr in (0.05, 0.1, 0.2):
            P = 100.0 * float((d_prec < thr).mean())
            R = 100.0 * float((d_rec < thr).mean())
            exact[f"@{int(thr*100)}cm"] = {
                "Precision [Accuracy] (%)": P,
                "Recall [Completeness] (%)": R,
                "F-score (%)": 2 * P * R / max(P + R, 1e-9),
            }

    results = {
        "mode": "long+dynamic" if a.dynamic else "long",
        # run parameters, so the JSON self-describes what produced it
        # (ranges/caps changed between rounds; committed evidence must be
        # comparable without reading git history)
        "params": {
            "frames_requested": a.frames, "laps": a.laps,
            "max_range_m": a.rng, "noise_m": a.noise,
            "start_capacity_log2": a.cap, "dynamic": a.dynamic,
            "no_sweep": a.no_sweep, "no_deskew": a.no_deskew,
            "incidence": a.incidence, "gt_poses": a.gt_poses,
        },
        "frames": n,
        "deskew": cfg.deskew,
        "vertical_motion_amp_m": 1.2,
        "loop_closures": int(loop_mgr.pgo_count),
        "capacity_growth_events": [
            {"frame": int(f_), "new_capacity": int(c_)}
            for f_, c_ in growth_events],
        "final_map_points": int(system.state.count),
        "slam": {"ATE_RMSE_m": ate_s, "ARE_deg": are_s,
                 "drift_t_pct": dt_s, "drift_r_deg_per_100m": dr_s},
        "odom": {"ATE_RMSE_m": ate_o, "ARE_deg": are_o,
                 "drift_t_pct": dt_o, "drift_r_deg_per_100m": dr_o},
        # per-closure edge quality vs GT: is post-closure rotation error
        # coming from the refined edges themselves or the solver pricing?
        "loop_edges": [
            _edge_errors(dg, gt_eval) for dg in loop_mgr.pgm.loop_diags],
        # compact per-column rows [x, y, err_m] for the estimated columns
        "floor_probe": [[p_["xy"][0], p_["xy"][1], round(p_["err_m"], 4)]
                        for p_ in floor_probe if p_["err_m"] is not None],
        "floor_columns_clean": n_cols,
        "floor_columns_estimated": len(probe_errs),
        "floor_err_mean_m": (float(np.mean(probe_errs))
                             if probe_errs else None),
        "floor_err_median_m": (float(np.median(probe_errs))
                               if probe_errs else None),
        "floor_err_p90_abs_m": (float(np.percentile(
            np.abs(probe_errs), 90)) if probe_errs else None),
        "floor_err_max_abs_m": (float(np.max(np.abs(probe_errs)))
                                if probe_errs else None),
        "mesh_exact": exact,
        "mesh_vertices": int(v.shape[0]),
    }
    if a.dynamic:
        total = dyn_stats["n_dyn"] + dyn_stats["n_static"]
        results["dynamic"] = {
            "movers": 3,
            "dynamic_measurement_fraction":
                dyn_stats["n_dyn"] / max(total, 1),
            "filter_rejection_fraction":
                dyn_stats["n_static_rejected"]
                / max(dyn_stats.get("n_checked", 0), 1),
            # per-measurement confusion vs mover GT, sampled every 20
            # frames: the filter's actual operating point
            "filter_precision": dyn_stats["tp"]
                / max(dyn_stats["tp"] + dyn_stats["fp"], 1),
            "filter_recall": dyn_stats["tp"]
                / max(dyn_stats["tp"] + dyn_stats["fn"], 1),
            "filter_scored_measurements":
                dyn_stats.get("n_checked", 0),
        }
        if not a.skip_mesh:
            # ghost check: predicted-mesh samples near any mover PATH are
            # map contamination the dynamic filter failed to reject
            results["dynamic"]["mesh_ghost_fraction"] = float(np.mean(
                np.min(np.linalg.norm(
                    pred_obs[:, None, :]
                    - movers.reshape(-1, 3)[None, ::37], axis=-1),
                    axis=1) < 0.8))
    out = a.out or ("eval/gauntlet_long_dynamic_results.json" if a.dynamic
                    else "eval/gauntlet_long_results.json")
    with open(out, "w") as fp:
        json.dump(results, fp, indent=2)
    # pose arrays for offline analysis (per-frame error attribution)
    np.savez_compressed(out.rsplit(".", 1)[0] + "_poses.npz",
                        gt=gt_eval, slam=slam_poses, odom=odom_poses)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
