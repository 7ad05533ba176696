#!/usr/bin/env python3
"""Quality gauntlet: a multi-hundred-frame noisy synthetic sequence with
genuine revisits, driving the FULL pgo_on path (loop detection -> scan-to-
map refinement -> pose-graph GN -> elastic deformation -> pool transform),
scored with the reference's protocols:

  * ATE/ARE + segment drift (reference: eval/eval_traj_utils.py:14-174,
    segment lengths scaled to the scene)
  * mesh precision/recall/F-score at the reference's 5 cm threshold
    (reference: eval/eval_mesh_utils.py:75-90)

Runs entirely in this environment (no dataset downloads):

    python eval/eval_gauntlet.py [--frames 240] [--laps 2.15] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=240)
    p.add_argument("--laps", type=float, default=2.15)
    p.add_argument("--noise", type=float, default=0.01,
                   help="range noise sigma [m]")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="eval/gauntlet_results.json")
    p.add_argument("--no-pgo", action="store_true")
    p.add_argument("--pgo-freq", type=int, default=10,
                   help="min frames between closures; the revisit-to-"
                   "closure gap is the window where drift-offset duplicate"
                   " geometry trains blur into the map, so on this small-"
                   "loop course a tight cadence keeps the map sharp")
    p.add_argument("--boost", type=int, default=None,
                   help="post-closure extra training iterations")
    p.add_argument("--pool", type=float, default=24e6,
                   help="replay pool capacity; sized to hold the WHOLE "
                   "run (the reference default is 2e7): the post-closure "
                   "pool transform then realigns every region's samples, "
                   "so continued training sharpens geometry everywhere "
                   "instead of only inside the last ring-buffer window")
    p.add_argument("--final-refine", action="store_true",
                   help="end-of-run map-consistency pass: re-register "
                   "every frame against the finished map, elastic-deform "
                   "map+pool by the corrections, boost-train, then mesh "
                   "(slam/loop.py final_refine)")
    p.add_argument("--gt-poses", action="store_true",
                   help="mapping-mode: feed GT poses (no tracking/PGO) — "
                   "isolates mapping+meshing fidelity from SLAM drift")
    p.add_argument("--no-mid-ts", action="store_true",
                   help="window by creation ts only (sharper map under "
                   "residual drift, but geometry ages out while in view)")
    p.add_argument("--color", action="store_true",
                   help="RGB-D-style colored gauntlet: procedural color "
                   "ground truth, photometric tracking term, color-decoder "
                   "training; reports mean color error at GT surface")
    p.add_argument("--semantic", action="store_true",
                   help="semantic mapping-mode: per-point class labels "
                   "from the labeled scene; reports class accuracy/IoU "
                   "at GT surface points")
    p.add_argument("--localize", metavar="PIN_MAP_NPZ",
                   help="localization mode: load this saved map, freeze "
                   "it, track against it (reference: pin_slam.py:157-177)")
    a = p.parse_args()

    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pin_slam_tpu.config import Config
    from pin_slam_tpu.dataset.synthetic import (
        SyntheticSequence, circle_trajectory, default_scene,
        lidar_directions)
    from pin_slam_tpu.slam.system import PinSLAMSystem
    from pin_slam_tpu.slam.loop import LoopPgoManager
    from pin_slam_tpu.slam.mesher import Mesher, MeshConfig
    from pin_slam_tpu.utils.eval_traj import (absolute_error,
                                              relative_error)
    from pin_slam_tpu.utils.eval_mesh import (
        crop_points_to_region, eval_mesh, point_to_mesh_distance,
        sample_mesh_points)
    from pin_slam_tpu.ops.transforms import transform_points
    import jax.numpy as jnp

    if a.semantic:
        a.gt_poses = True
    cfg = Config()
    cfg.track_on = not a.gt_poses
    cfg.pgo_on = (not a.no_pgo) and (not a.gt_poses)
    cfg.max_range = 60.0
    cfg.min_range = 0.5
    cfg.vox_down_m = 0.08
    cfg.source_vox_down_m = 0.4
    cfg.voxel_size_m = 0.3
    cfg.sigma_sigmoid_m = 0.05
    cfg.surface_sample_range_m = 0.25
    # 2 behind-surface samples: balances the front/behind supervision and
    # removes the measured systematic z-sink on grazing-incidence floors
    cfg.free_behind_n = 2
    cfg.loss_weight_on = True
    cfg.bs = 8192
    cfg.iters = 12
    cfg.init_iter_ratio = 25
    cfg.bs_new_sample = 1024
    cfg.reg_iter_n = 50
    cfg.map_capacity = 1 << 19
    cfg.buffer_size = 1 << 22
    cfg.frame_point_cap = 1 << 14
    cfg.source_point_cap = 1 << 12
    cfg.max_frames = 1 << int(np.ceil(np.log2(a.frames + 1)))
    cfg.local_map_context = False      # scan-context descriptors
    cfg.pgo_freq = a.pgo_freq
    if a.boost is not None:
        cfg.post_loop_iter_boost = a.boost
    cfg.silence = True
    cfg.finalize()
    cfg.pool_capacity = int(a.pool)
    # Scene-scaled loop/PGO geometry. finalize() sets local_map_radius =
    # max_range+2 = 62 m, which must STAY that large (it is also the
    # query-radius filter; the walls are ~25 m out). Scale the derived
    # quantities via the ratios instead: travel-dist window 0.4*62 ~ 25 m
    # (half a lap — old geometry cleanly ages out of the local map well
    # before the revisit, the reference's KITTI regime, so loop closure
    # has genuine work) and loop-candidate travel gate 0.65*62 ~ 40 m
    # (< the 50 m lap, so lap-2 revisits become candidates).
    cfg.local_map_travel_dist_ratio = 0.4
    cfg.min_loop_travel_dist_ratio = 0.65
    # NCD-style mid-timestamp window (reference run_ncd.yaml:21): the
    # course re-observes the same walls every lap, and windowing by
    # creation ts alone would age out geometry that is still in view
    cfg.use_mid_ts = not a.no_mid_ts
    if a.color:
        cfg.color_on = True
        cfg.color_map_on = True
        cfg.color_channel = 3
        cfg.photometric_loss_on = True
    label_fn = None
    if a.semantic:
        from pin_slam_tpu.dataset.synthetic import default_scene_semantic
        cfg.semantic_on = True
        cfg.sem_class_count = 4
        scene, label_fn = default_scene_semantic(
            half_extent=(22.0, 16.0, 4.0))
    else:
        scene = default_scene(half_extent=(22.0, 16.0, 4.0))

    from pin_slam_tpu.dataset.synthetic import procedural_color
    seq = SyntheticSequence(
        scene_sdf=scene,
        poses=circle_trajectory(a.frames, radius=8.0,
                                revolutions=a.laps, ease_in_frames=6),
        dirs=lidar_directions(512, 32), max_range=60.0,
        color_fn=procedural_color if a.color else None)

    system = PinSLAMSystem(cfg)
    if a.localize:
        # track against a frozen prebuilt map (world frame); only the
        # frame-0 pose seeds the tracker
        system.load_map(a.localize)
        system.set_gt_poses(seq.poses)
        cfg.pgo_on = False
    elif a.gt_poses:
        # mapping-mode: system anchors at gt_poses[0] (world frame)
        system.set_gt_poses(seq.poses)
    # SLAM evaluation otherwise: no gt handed to the system at all
    loop_mgr = LoopPgoManager(cfg, system) if cfg.pgo_on else None

    rng = np.random.RandomState(7)
    gt_points = []
    kept_clouds = [] if a.final_refine else None
    t0 = time.time()
    for fid in range(len(seq)):
        pts_clean = seq.frame(fid)
        pts = pts_clean
        # range-proportional measurement noise
        if a.noise > 0:
            d = np.linalg.norm(pts[:, :3], axis=1, keepdims=True)
            pts = pts.copy()
            pts[:, :3] *= 1.0 + (a.noise * rng.randn(pts.shape[0], 1)
                                 / np.maximum(d, 1.0))
        hook = (None if loop_mgr is None else
                (lambda f, _p=pts: loop_mgr.after_frame(f, _p)))
        sem = None
        if label_fn is not None:
            w = pts[:, :3] @ seq.poses[fid][:3, :3].T.astype(np.float32) \
                + seq.poses[fid][:3, 3].astype(np.float32)
            sem = label_fn(w)
        if kept_clouds is not None:
            kept_clouds.append(pts[:, :3].astype(np.float32))
        system.process_frame(fid, pts, loop_hook=hook, sem_labels=sem)
        # accumulate the FULL noise-free scan as GT surface samples: the
        # sampled mesh protocol (reference eval/eval_mesh_utils.py:8-91)
        # carries the GT sample spacing as a distance floor, so density
        # is accuracy — every frame, undecimated (~4M points)
        w = (pts_clean[:, :3] @ seq.poses[fid][:3, :3].T
             + seq.poses[fid][:3, 3])
        gt_points.append(w.astype(np.float32))
        if fid % 20 == 0:
            el = time.time() - t0
            print(f"frame {fid}/{len(seq)} ({el / (fid + 1) * 1e3:.0f} "
                  f"ms/frame, map {int(system.state.count)}, "
                  f"loops {0 if loop_mgr is None else loop_mgr.pgo_count}, "
                  f"lost {system.lose_track})", file=sys.stderr)

    n = len(seq)
    n_refined = 0
    if a.final_refine and loop_mgr is not None:
        t_r = time.time()
        n_refined = loop_mgr.final_refine(
            lambda fid: kept_clouds[fid], n)
        print(f"final refine: {n_refined} frames corrected "
              f"({time.time() - t_r:.1f} s)", file=sys.stderr)
    lengths = (10, 20, 30, 40, 50)   # scene-scaled drift segments
    # In SLAM mode the system is anchored at the frame-0 body frame
    # (identity); GT starts on the circle with arbitrary heading.
    # Re-anchor the estimates into the GT world frame so the strict
    # (no-Umeyama) ATE is meaningful. In gt-poses mode the system is
    # already world-anchored.
    A0 = np.eye(4) if (a.gt_poses or a.localize) else seq.poses[0]
    slam_poses = A0 @ system.pgo_poses[:n]
    odom_poses = A0 @ system.odom_poses[:n]
    ate_s, are_s = absolute_error(seq.poses[:n], slam_poses, False)
    ate_o, are_o = absolute_error(seq.poses[:n], odom_poses, False)
    dt_s, dr_s = relative_error(seq.poses[:n], slam_poses, lengths, step=5)
    dt_o, dr_o = relative_error(seq.poses[:n], odom_poses, lengths, step=5)

    if a.localize:
        if a.out == "eval/gauntlet_results.json":
            a.out = "eval/gauntlet_localization_results.json"
        results = {
            "mode": "localization(frozen map)",
            "frames": n,
            "trajectory_length_m": float(2 * np.pi * 8.0 * a.laps),
            "odom": {"ATE_RMSE_m": ate_o, "ARE_deg": are_o,
                     "drift_t_pct": dt_o, "drift_r_deg_per_100m": dr_o},
        }
        os.makedirs(os.path.dirname(a.out), exist_ok=True)
        with open(a.out, "w") as fp:
            json.dump(results, fp, indent=2)
        print(json.dumps(results, indent=2))
        return

    mesher = Mesher(system.qp, MeshConfig(
        mc_res_m=0.1, mesh_min_nn=10, min_cluster_vertices=300,
        infer_bs=1 << 15, skip_top_voxel=0))
    v, f = mesher.recon_map_mesh(
        system.state, system.params["geo_features"],
        system.params["geo_mlp"])
    # the map (hence mesh) lives in the system's anchor frame — re-anchor
    # into the GT world frame like the poses above
    v = v @ A0[:3, :3].T + A0[:3, 3]
    gt = np.concatenate(gt_points)
    perm = np.random.RandomState(0).permutation(len(gt))[:300_000]
    # ----- reference sampled protocol (eval/eval_mesh_utils.py:8-91),
    # DENSIFIED: ~4M GT scan points + 5M mesh samples push the sampling-
    # spacing distance floor well under the 5 cm threshold (the old 300k
    # sampling floored every correct surface at ~3.5 cm)
    pred = sample_mesh_points(v, f, 5_000_000)
    mesh5 = eval_mesh(pred, gt, threshold=0.05, crop_pred_to_gt=True)
    mesh10 = eval_mesh(pred, gt, threshold=0.1, crop_pred_to_gt=True)
    # 20 cm is the reference's LiDAR-SLAM mesh threshold scale (5 cm is
    # the RGB-D/Replica protocol; a PGO-corrected map is globally
    # consistent only to the residual drift)
    mesh20 = eval_mesh(pred, gt, threshold=0.2, crop_pred_to_gt=True)
    mesh5_uncropped = eval_mesh(pred, gt, threshold=0.05)
    # GT sampling-density diagnostic: median nearest-OTHER-sample distance
    from scipy.spatial import cKDTree
    sub = gt[np.random.RandomState(1).permutation(len(gt))[:20_000]]
    dspace, _ = cKDTree(gt).query(sub, k=2)
    gt_spacing = float(np.median(dspace[:, 1]))

    # EXACT metrics: point-sampled chamfer adds the sample spacing
    # (~3.5 cm median here) as a distance floor — an exactly correct
    # surface fails the 5 cm threshold ~1/3 of the time. Precision is
    # measured analytically (|scene sdf| at pred samples, cropped to the
    # observed region); recall as exact point-to-triangle distance from
    # the GT scan points to the predicted mesh.
    pred_obs = crop_points_to_region(pred, gt[perm])
    d_prec = np.abs(seq.scene_sdf(pred_obs.astype(np.float64)))
    d_rec = point_to_mesh_distance(gt[perm], v, f)
    exact = {}
    for thr in (0.05, 0.1, 0.2):
        P = 100.0 * float((d_prec < thr).mean())
        R = 100.0 * float((d_rec < thr).mean())
        exact[f"@{int(thr*100)}cm"] = {
            "Precision [Accuracy] (%)": P,
            "Recall [Completeness] (%)": R,
            "F-score (%)": 2 * P * R / max(P + R, 1e-9),
        }
    exact["Chamfer_L1 (m)"] = float(
        0.5 * (np.minimum(d_prec, 0.5).mean()
               + np.minimum(d_rec, 0.5).mean()))

    if a.color and a.out == "eval/gauntlet_results.json":
        a.out = "eval/gauntlet_color_results.json"
    elif a.semantic and a.out == "eval/gauntlet_results.json":
        a.out = "eval/gauntlet_semantic_results.json"
    elif a.gt_poses and a.out == "eval/gauntlet_results.json":
        a.out = "eval/gauntlet_mapping_results.json"
    results = {
        "mode": "mapping(gt-poses)" if a.gt_poses else "slam",
        "frames": n,
        "trajectory_length_m": float(2 * np.pi * 8.0 * a.laps),
        "loop_closures": 0 if loop_mgr is None else int(loop_mgr.pgo_count),
        "final_refine_frames": int(n_refined),
        "slam": {"ATE_RMSE_m": ate_s, "ARE_deg": are_s,
                 "drift_t_pct": dt_s, "drift_r_deg_per_100m": dr_s},
        "odom": {"ATE_RMSE_m": ate_o, "ARE_deg": are_o,
                 "drift_t_pct": dt_o, "drift_r_deg_per_100m": dr_o},
        "mesh@5cm": {k: mesh5[k] for k in
                     ("Precision [Accuracy] (%)",
                      "Recall [Completeness] (%)", "F-score (%)",
                      "Chamfer_L1 (m)")},
        "mesh@10cm": {k: mesh10[k] for k in
                      ("Precision [Accuracy] (%)",
                       "Recall [Completeness] (%)", "F-score (%)")},
        "mesh@20cm": {k: mesh20[k] for k in
                      ("Precision [Accuracy] (%)",
                       "Recall [Completeness] (%)", "F-score (%)")},
        "mesh@5cm_uncropped": {k: mesh5_uncropped[k] for k in
                               ("Precision [Accuracy] (%)",
                                "F-score (%)")},
        "gt_sample_spacing_m": gt_spacing,
        "mesh_exact": exact,
        "map_points": int(system.state.count),
        "mesh_vertices": int(v.shape[0]),
    }
    if a.color:
        # predicted color at GT surface points vs the procedural GT color;
        # the map lives in the anchor frame — map_probe = inv(A0) @ world
        from pin_slam_tpu.slam import map_query as mq
        probe_w = gt[perm][:100_000]
        probe = ((probe_w - A0[:3, 3]) @ A0[:3, :3]).astype(np.float32)
        pc = np.zeros((len(probe), 3), np.float32)
        nnv = np.zeros(len(probe), np.int32)
        bq = 1 << 14
        cqf = jax.jit(lambda q: (
            mq.query_decode(
                system.state, system.params["geo_features"],
                system.params["geo_mlp"], q, system.qp,
                color_features=system.params["color_features"],
                color_mlp=system.params["color_mlp"],
                color_channel=3).color,
            mq.query_decode(
                system.state, system.params["geo_features"],
                system.params["geo_mlp"], q, system.qp).nn_count))
        for b0 in range(0, len(probe), bq):
            blk = np.zeros((bq, 3), np.float32)
            nblk = min(bq, len(probe) - b0)
            blk[:nblk] = probe[b0: b0 + nblk]
            cd, nc = cqf(jnp.asarray(blk))
            pc[b0: b0 + nblk] = np.asarray(cd)[:nblk]
            nnv[b0: b0 + nblk] = np.asarray(nc)[:nblk]
        gt_c = procedural_color(probe_w.astype(np.float64)).astype(np.float32)
        vmask = nnv >= 6
        err = np.abs(pc[vmask] - gt_c[vmask])
        results["color"] = {
            "mean_abs_error": float(err.mean()),
            "p90_abs_error": float(np.percentile(err, 90)),
            "coverage": float(vmask.mean()),
        }
    if a.semantic:
        # predicted class at GT surface points vs the geometric GT label
        # (semantic mode is world-anchored, A0 = I, but stay general)
        from pin_slam_tpu.slam import map_query as mq
        probe_w = gt[perm][:100_000]
        probe = ((probe_w - A0[:3, 3]) @ A0[:3, :3]).astype(np.float32)
        pr = np.zeros(len(probe), np.int32)
        nnv = np.zeros(len(probe), np.int32)
        bq = 1 << 14
        qf = jax.jit(lambda q: (
            jnp.argmax(mq.query_decode(
                system.state, system.params["geo_features"],
                system.params["geo_mlp"], q, system.qp,
                sem_mlp=system.params["sem_mlp"]).sem_log_prob, -1),
            mq.query_decode(
                system.state, system.params["geo_features"],
                system.params["geo_mlp"], q, system.qp).nn_count))
        for b0 in range(0, len(probe), bq):
            blk = np.zeros((bq, 3), np.float32)
            nblk = min(bq, len(probe) - b0)
            blk[:nblk] = probe[b0: b0 + nblk]
            pd, nc = qf(jnp.asarray(blk))
            pr[b0: b0 + nblk] = np.asarray(pd)[:nblk]
            nnv[b0: b0 + nblk] = np.asarray(nc)[:nblk]
        gt_lab = label_fn(probe_w.astype(np.float64))
        vmask = nnv >= 6
        acc = float((pr[vmask] == gt_lab[vmask]).mean())
        ious = {}
        for cls in (1, 2, 3):
            inter = float(((pr == cls) & (gt_lab == cls) & vmask).sum())
            union = float((((pr == cls) | (gt_lab == cls)) & vmask).sum())
            ious[f"class_{cls}"] = inter / max(union, 1.0)
        results["semantics"] = {
            "accuracy_at_gt_surface": acc,
            "mIoU": float(np.mean(list(ious.values()))),
            **ious,
            "coverage": float(vmask.mean()),
        }
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as fp:
        json.dump(results, fp, indent=2)
    print(json.dumps(results, indent=2))

    # Post-hoc artifacts: trajectories + implicit map, so analysis/remesh
    # doesn't need a re-run.
    art = os.path.join(os.path.dirname(a.out),
                       "gauntlet_mapping_out" if a.gt_poses
                       else "gauntlet_out")
    os.makedirs(art, exist_ok=True)
    np.save(os.path.join(art, "gt_poses.npy"), seq.poses[:n])
    # frame the saved map lives in (identity for gt-poses mode): the
    # transform rescore_gauntlet_mesh.py must apply to mesh vertices
    np.save(os.path.join(art, "map_anchor.npy"), A0)
    np.save(os.path.join(art, "slam_poses.npy"), slam_poses)
    np.save(os.path.join(art, "odom_poses.npy"), odom_poses)
    from pin_slam_tpu.utils.map_io import save_implicit_map
    save_implicit_map(os.path.join(art, "pin_map.npz"), system.state,
                      system.params, cfg)


if __name__ == "__main__":
    main()
