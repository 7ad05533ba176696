"""CLI end-to-end: dataset on disk -> run_pin_slam -> artifacts -> offline
remeshing -> localization mode. This drives the same surface a user of the
reference drives (pin_slam.py CLI + vis_pin_map.py)."""

import os

import numpy as np
import pytest
import yaml

from pin_slam_tpu.dataset.io import (
    read_kitti_format_poses,
    write_kitti_format_poses,
    write_ply_points,
)
from pin_slam_tpu.dataset.synthetic import (
    SyntheticSequence,
    circle_trajectory,
    default_scene,
    lidar_directions,
)


@pytest.fixture(scope="module")
def disk_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    pc_dir = root / "ply"
    pc_dir.mkdir()
    seq = SyntheticSequence(
        scene_sdf=default_scene(),
        poses=circle_trajectory(6, radius=6.0, revolutions=0.05,
                                ease_in_frames=3),
        dirs=lidar_directions(256, 16),
        max_range=60.0)
    for i in range(len(seq)):
        write_ply_points(str(pc_dir / f"{i:06d}.ply"), seq.frame(i))
    write_kitti_format_poses(str(root / "poses.txt"), seq.poses)

    cfg = {
        "setting": {"name": "cli_e2e", "output_root": str(root / "out"),
                    "pc_path": str(pc_dir), "pose_path": str(root / "poses.txt")},
        "process": {"min_range_m": 0.5, "max_range_m": 60.0,
                    "vox_down_m": 0.08},
        "sampler": {"surface_sample_range_m": 0.25},
        "neuralpoints": {"voxel_size_m": 0.3},
        "loss": {"sigma_sigmoid_m": 0.1, "loss_weight_on": True},
        "optimizer": {"iters": 12, "init_iter_ratio": 20,
                      "batch_size": 4096},
        "tracker": {"source_vox_down_m": 0.4, "iter_n": 30},
        "eval": {"mesh_min_nn": 6, "mc_res_m": 0.3},
        "tpu": {"map_capacity": 1 << 16, "hash_table_size": 1 << 19,
                "frame_point_cap": 1 << 13, "source_point_cap": 1 << 12,
                "max_frames": 64},
        "continual": {"pool_capacity": 1_000_000,
                      "batch_size_new_sample": 1024},
    }
    cfg_path = root / "run_synth.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return root, cfg_path, seq


@pytest.fixture(scope="module")
def cli_run(disk_dataset):
    root, cfg_path, seq = disk_dataset
    from pin_slam_tpu.run import run_pin_slam

    metrics = run_pin_slam(str(cfg_path), save_map=True, save_mesh=True)
    out_root = root / "out"
    runs = sorted(out_root.iterdir())
    assert len(runs) == 1
    return runs[0], metrics, seq


class TestCliEndToEnd:
    def test_metrics_reasonable(self, cli_run):
        run_dir, metrics, seq = cli_run
        assert metrics, "gt poses provided, metrics must be computed"
        assert metrics["Absoulte Trajectory Error [m]"] < 0.3

    def test_artifacts_written(self, cli_run):
        run_dir, _, _ = cli_run
        assert (run_dir / "odom_poses_kitti.txt").exists()
        assert (run_dir / "odom_poses_tum.txt").exists()
        assert (run_dir / "pose_eval.csv").exists()
        assert (run_dir / "time_table.npy").exists()
        assert (run_dir / "model" / "pin_map.npz").exists()
        assert (run_dir / "map" / "neural_points.ply").exists()
        assert (run_dir / "meta" / "config_all.yaml").exists()
        meshes = list((run_dir / "mesh").iterdir())
        assert meshes, "mesh not written"

    def test_written_poses_roundtrip(self, cli_run):
        run_dir, _, seq = cli_run
        poses = read_kitti_format_poses(str(run_dir / "odom_poses_kitti.txt"))
        assert len(poses) == len(seq)
        err = np.linalg.norm(poses[-1][:3, 3] - seq.poses[-1][:3, 3])
        assert err < 0.3

    def test_offline_vis_map(self, cli_run):
        run_dir, _, _ = cli_run
        from pin_slam_tpu.vis_map import vis_pin_map

        verts, faces = vis_pin_map(str(run_dir), mc_res_m=0.3,
                                   export_points=True, mesh_min_nn=6)
        assert verts.shape[0] > 1000
        assert (run_dir / "mesh" / "mesh_30cm_offline.ply").exists()

    def test_localization_mode(self, cli_run, disk_dataset):
        """Reload the saved map and track against it without mapping
        (reference: pin_slam.py:157-177)."""
        run_dir, _, seq = cli_run
        root, cfg_path, _ = disk_dataset
        from pin_slam_tpu.config import Config
        from pin_slam_tpu.slam.system import PinSLAMSystem

        config = Config().load(str(cfg_path))
        config.track_on = True
        system = PinSLAMSystem(config)
        system.set_gt_poses(seq.poses)
        system.load_map(str(run_dir / "model" / "pin_map.npz"))
        assert system.localization_mode
        count_before = int(system.state.count)
        for fid in range(3):
            pose = system.process_frame(fid, seq.frame(fid))
        assert int(system.state.count) == count_before  # map untouched
        err = np.linalg.norm(pose[:3, 3] - seq.poses[2][:3, 3])
        assert err < 0.2, f"localization error {err}"
