#!/usr/bin/env python3
"""Synthetic-scene benchmark driver — runs entirely in this environment
(no dataset downloads): ray-cast sequences with exact ground truth, full
SLAM, odometry + mesh metrics.

    python eval/eval_synthetic.py [--frames 20] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="eval/synthetic_results.json")
    a = p.parse_args()

    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from pin_slam_tpu.config import Config
    from pin_slam_tpu.dataset.synthetic import (
        SyntheticSequence, circle_trajectory, default_scene,
        lidar_directions)
    from pin_slam_tpu.slam.system import PinSLAMSystem
    from pin_slam_tpu.slam.mesher import Mesher, MeshConfig
    from pin_slam_tpu.utils.eval_traj import get_metrics
    from pin_slam_tpu.utils.eval_mesh import eval_mesh, sample_mesh_points
    from pin_slam_tpu.ops.transforms import transform_points
    import jax.numpy as jnp

    cfg = Config()
    cfg.track_on = True
    cfg.max_range = 60.0
    cfg.min_range = 0.5
    cfg.vox_down_m = 0.08
    cfg.source_vox_down_m = 0.4
    cfg.voxel_size_m = 0.3
    cfg.sigma_sigmoid_m = 0.1
    cfg.surface_sample_range_m = 0.25
    cfg.loss_weight_on = True
    cfg.bs = 8192
    cfg.iters = 15
    cfg.init_iter_ratio = 25
    cfg.bs_new_sample = 1024
    cfg.reg_iter_n = 50
    cfg.map_capacity = 1 << 18
    cfg.buffer_size = 1 << 21
    cfg.frame_point_cap = 1 << 14
    cfg.source_point_cap = 1 << 12
    cfg.max_frames = 256
    cfg.finalize()
    cfg.pool_capacity = 2_000_000

    seq = SyntheticSequence(
        scene_sdf=default_scene(),
        poses=circle_trajectory(a.frames, radius=6.0,
                                revolutions=0.011 * a.frames,
                                ease_in_frames=4),
        dirs=lidar_directions(512, 32), max_range=60.0)
    system = PinSLAMSystem(cfg)
    system.set_gt_poses(seq.poses)
    gt_points = []
    for fid in range(len(seq)):
        pts = seq.frame(fid)
        system.process_frame(fid, pts)
        gt_points.append(np.asarray(transform_points(
            jnp.asarray(pts[:, :3]), jnp.asarray(seq.poses[fid],
                                                 jnp.float32))))

    n = len(seq)
    traj = get_metrics(seq.poses[:n], system.odom_poses[:n], align_on=False)

    mesher = Mesher(system.qp, MeshConfig(
        mc_res_m=0.15, mesh_min_nn=10, min_cluster_vertices=100,
        infer_bs=1 << 15, skip_top_voxel=0))
    v, f = mesher.recon_map_mesh(
        system.state, system.params["geo_features"],
        system.params["geo_mlp"])
    gt = np.concatenate(gt_points)
    pred = sample_mesh_points(v, f, 200_000)
    mesh = eval_mesh(
        pred, gt[np.random.RandomState(0).permutation(len(gt))[:200_000]],
        threshold=0.1)

    results = {"trajectory": traj, "mesh": mesh,
               "frames": n, "map_points": int(system.state.count)}
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as fp:
        json.dump(results, fp, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
