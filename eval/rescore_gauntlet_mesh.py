#!/usr/bin/env python3
"""Re-score the gauntlet mesh metrics offline from saved artifacts
(eval/gauntlet_out/): load pin_map.npz, remesh, re-anchor into the GT
world frame, and evaluate against freshly ray-cast GT surface points.
Lets mesh-eval fixes run without repeating the 240-frame TPU run.

    python eval/rescore_gauntlet_mesh.py [--art eval/gauntlet_out] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--art", default="eval/gauntlet_out")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--frames", type=int, default=240)
    p.add_argument("--laps", type=float, default=2.15)
    p.add_argument("--mc-res", type=float, default=0.1)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp  # noqa: E402

    from pin_slam_tpu.config import Config
    from pin_slam_tpu.dataset.synthetic import (
        SyntheticSequence, circle_trajectory, default_scene,
        lidar_directions)
    from pin_slam_tpu.slam.mesher import Mesher, MeshConfig
    from pin_slam_tpu.slam import map_query as mq
    from pin_slam_tpu.utils.map_io import load_implicit_map
    from pin_slam_tpu.utils.eval_mesh import (
        crop_points_to_region, eval_mesh, point_to_mesh_distance,
        sample_mesh_points)
    from pin_slam_tpu.ops.transforms import transform_points

    state, mlps, meta = load_implicit_map(
        os.path.join(args.art, "pin_map.npz"))
    gt_poses = np.load(os.path.join(args.art, "gt_poses.npy"))
    anchor_path = os.path.join(args.art, "map_anchor.npy")
    # fallback for artifacts predating map_anchor.npy (slam-mode runs)
    A0 = (np.load(anchor_path) if os.path.exists(anchor_path)
          else gt_poses[0])

    cfg = Config()
    cfg.voxel_size_m = meta["voxel_size_m"]
    cfg.feature_dim = meta["feature_dim"]
    cfg.finalize()
    qp = mq.make_query_params(cfg)

    seq = SyntheticSequence(
        scene_sdf=default_scene(half_extent=(22.0, 16.0, 4.0)),
        poses=circle_trajectory(args.frames, radius=8.0,
                                revolutions=args.laps, ease_in_frames=6),
        dirs=lidar_directions(512, 32), max_range=60.0)
    gt_points = []
    for fid in range(0, args.frames, 3):
        w = np.asarray(transform_points(
            jnp.asarray(seq.frame(fid)[:, :3]),
            jnp.asarray(seq.poses[fid], jnp.float32)))
        gt_points.append(w[::3])
    gt = np.concatenate(gt_points)

    mesher = Mesher(qp, MeshConfig(
        mc_res_m=args.mc_res, mesh_min_nn=10, min_cluster_vertices=300,
        infer_bs=1 << 15, skip_top_voxel=0))
    v, f = mesher.recon_map_mesh(
        state, state.geo_features, mlps["geo_mlp"])
    v = v @ A0[:3, :3].T + A0[:3, 3]

    perm = np.random.RandomState(0).permutation(len(gt))[:300_000]
    pred = sample_mesh_points(v, f, 300_000)
    out = {"mesh_vertices": int(v.shape[0])}
    for thr in (0.05, 0.1, 0.2):
        m = eval_mesh(pred, gt[perm], threshold=thr, crop_pred_to_gt=True)
        out[f"mesh@{int(thr*100)}cm"] = {
            k: m[k] for k in ("Precision [Accuracy] (%)",
                              "Recall [Completeness] (%)", "F-score (%)",
                              "Chamfer_L1 (m)")}

    # exact metrics (see eval_gauntlet.py): analytic precision + exact
    # point-to-triangle recall — no point-sampling distance floor
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
            "F-score (%)": 2 * P * R / max(P + R, 1e-9)}
    exact["Chamfer_L1 (m)"] = float(
        0.5 * (np.minimum(d_prec, 0.5).mean()
               + np.minimum(d_rec, 0.5).mean()))
    out["mesh_exact"] = exact
    print(json.dumps(out, indent=2))
    with open(os.path.join(args.art, "mesh_rescore.json"), "w") as fp:
        json.dump(out, fp, indent=2)


if __name__ == "__main__":
    main()
