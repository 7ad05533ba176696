"""RGB-D (color) and semantic mapping paths on synthetic data.

Mirrors the reference's Replica RGB-D configuration (color decoder +
photometric labels, reference: config/rgbd_slam/run_replica.yaml) and
SemanticKITTI semantic mapping (sem decoder, reference:
utils/mapper.py:783-800) with exact synthetic ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pin_slam_tpu.config import Config
from pin_slam_tpu.dataset.synthetic import (
    SyntheticSequence,
    circle_trajectory,
    default_scene,
    lidar_directions,
    procedural_color,
)
from pin_slam_tpu.ops.transforms import transform_points
from pin_slam_tpu.slam import map_query as mq
from pin_slam_tpu.slam.system import PinSLAMSystem


def _base_config():
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
    cfg.bs = 4096
    cfg.iters = 15
    cfg.init_iter_ratio = 25
    cfg.bs_new_sample = 1024
    cfg.reg_iter_n = 50
    cfg.map_capacity = 1 << 16
    cfg.buffer_size = 1 << 19
    cfg.frame_point_cap = 1 << 13
    cfg.source_point_cap = 1 << 12
    cfg.max_frames = 64
    return cfg


class TestColorMapping:
    def test_color_regression(self):
        cfg = _base_config()
        cfg.color_map_on = True
        cfg.color_channel = 3
        cfg.color_on = True
        cfg.finalize()
        cfg.pool_capacity = 1_000_000

        seq = SyntheticSequence(
            scene_sdf=default_scene(),
            poses=circle_trajectory(5, radius=6.0, revolutions=0.05,
                                    ease_in_frames=3),
            dirs=lidar_directions(256, 16), max_range=60.0,
            color_fn=procedural_color)
        s = PinSLAMSystem(cfg)
        s.set_gt_poses(seq.poses)
        for fid in range(5):
            s.process_frame(fid, seq.frame(fid))

        pts = seq.frame(4)
        w = transform_points(jnp.asarray(pts[::5, :3]),
                             jnp.asarray(seq.poses[4], jnp.float32))
        out = mq.query_decode(
            s.state, s.params["geo_features"], s.params["geo_mlp"], w, s.qp,
            lf=s._lf(4), color_features=s.params["color_features"],
            color_mlp=s.params["color_mlp"], color_channel=3)
        pred = np.asarray(out.color)
        gt = pts[::5, 3:6]
        v = np.asarray(out.nn_count) >= 6
        corr = np.corrcoef(pred[v].ravel(), gt[v].ravel())[0, 1]
        mae = np.abs(pred[v] - gt[v]).mean()
        assert corr > 0.9, f"color corr {corr}"
        assert mae < 0.08, f"color mae {mae}"


class TestSemanticMapping:
    def test_semantic_classification(self):
        """Labels by height band — the decoder must classify regions."""
        cfg = _base_config()
        cfg.semantic_on = True
        cfg.sem_class_count = 4
        cfg.finalize()
        cfg.pool_capacity = 1_000_000

        seq = SyntheticSequence(
            scene_sdf=default_scene(),
            poses=circle_trajectory(4, radius=6.0, revolutions=0.04,
                                    ease_in_frames=2),
            dirs=lidar_directions(256, 16), max_range=60.0)
        s = PinSLAMSystem(cfg)
        s.set_gt_poses(seq.poses)

        def labels_of(world_z):
            # classes 1..3 by height band; 0 is reserved for unlabeled/free
            # (label 0 is excluded from the NLL, reference mapper.py:788-793)
            return (np.digitize(world_z, [-2.0, 1.0]) + 1).astype(np.int32)

        for fid in range(4):
            pts = seq.frame(fid)
            world = pts @ seq.poses[fid][:3, :3].T.astype(np.float32) + \
                seq.poses[fid][:3, 3].astype(np.float32)
            s.process_frame(fid, pts, sem_labels=labels_of(world[:, 2]))

        pts = seq.frame(3)
        world = transform_points(jnp.asarray(pts[::5]),
                                 jnp.asarray(seq.poses[3], jnp.float32))
        out = mq.query_decode(
            s.state, s.params["geo_features"], s.params["geo_mlp"], world,
            s.qp, lf=s._lf(3), sem_mlp=s.params["sem_mlp"])
        pred = np.asarray(jnp.argmax(out.sem_log_prob, axis=-1))
        gt = labels_of(np.asarray(world)[:, 2])
        v = np.asarray(out.nn_count) >= 6
        acc = (pred[v] == gt[v]).mean()
        assert acc > 0.8, f"semantic acc {acc}"
