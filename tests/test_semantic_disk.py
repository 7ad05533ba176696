"""Semantics end-to-end FROM DISK: .bin scans + SemanticKITTI .label files
-> run_pin_slam with semantic_on + filter_moving_object -> semantically
colored mesh (reference: dataset/slam_dataset.py:1063-1092 label reading +
filter_sem_kitti :1273-1290 + semantic mesh, utils/mesher.py:399-441)."""

import os

import numpy as np
import pytest
import yaml

from pin_slam_tpu.dataset.synthetic import (
    SyntheticSequence,
    circle_trajectory,
    default_scene,
    lidar_directions,
)


@pytest.fixture(scope="module")
def sem_disk_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("semsynth")
    pc_dir = root / "bin"
    label_dir = root / "labels"
    pc_dir.mkdir()
    label_dir.mkdir()
    seq = SyntheticSequence(
        scene_sdf=default_scene(),
        poses=circle_trajectory(5, radius=6.0, revolutions=0.05,
                                ease_in_frames=3),
        dirs=lidar_directions(256, 16),
        max_range=60.0)
    n_moving = 500
    for i in range(len(seq)):
        pts = seq.frame(i)[:, :3].astype(np.float32)
        # raw semantic-kitti labels by height: road (40) vs building (50)
        raw = np.where(pts[:, 2] < 0.5, 40, 50).astype(np.uint32)
        # inject a moving-car cluster (raw 252 -> learning 1, moving)
        mv = (np.random.RandomState(i).randn(n_moving, 3) * 0.5
              + np.array([3.0, 0.0, 1.0])).astype(np.float32)
        pts = np.concatenate([pts, mv])
        raw = np.concatenate([raw, np.full(n_moving, 252, np.uint32)])
        arr = np.zeros((pts.shape[0], 4), np.float32)
        arr[:, :3] = pts
        arr.tofile(str(pc_dir / f"{i:06d}.bin"))
        raw.astype(np.uint32).tofile(str(label_dir / f"{i:06d}.label"))
    from pin_slam_tpu.dataset.io import write_kitti_format_poses
    write_kitti_format_poses(str(root / "poses.txt"), seq.poses)

    cfg = {
        "setting": {"name": "sem_e2e", "output_root": str(root / "out"),
                    "pc_path": str(pc_dir),
                    "pose_path": str(root / "poses.txt"),
                    "label_path": str(label_dir),
                    "semantic_on": True},
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
    cfg_path = root / "run_sem.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return root, cfg_path, seq


class TestSemanticFromDisk:
    def test_label_reading_and_moving_filter(self, sem_disk_dataset):
        root, cfg_path, seq = sem_disk_dataset
        from pin_slam_tpu.config import Config
        from pin_slam_tpu.dataset.slam_dataset import SLAMDataset

        cfg = Config()
        cfg.load(str(cfg_path))
        cfg.finalize()
        assert cfg.semantic_on and cfg.filter_moving_object
        ds = SLAMDataset(cfg)
        assert len(ds.label_filenames) == ds.total_pc_count
        pts, _, sem = ds.read_frame_sem(0)
        assert sem is not None
        # moving points were dropped by the filter
        n_total = seq.frame(0).shape[0] + 500
        assert pts.shape[0] == n_total - 500
        assert set(np.unique(sem)) <= {9, 13}  # road / building
        assert pts.shape[0] == sem.shape[0]

    def test_cli_semantic_mesh(self, sem_disk_dataset):
        root, cfg_path, seq = sem_disk_dataset
        from pin_slam_tpu.run import run_pin_slam

        metrics = run_pin_slam(str(cfg_path), save_mesh=True)
        runs = sorted((root / "out").iterdir())
        run_path = runs[-1]
        meshes = list((run_path / "mesh").iterdir())
        assert meshes, "no mesh written"
        # semantically colored mesh: the ply must carry colors
        data = meshes[0].read_bytes()
        assert b"red" in data and b"green" in data
        assert metrics["Absoulte Trajectory Error [m]"] < 1.0
