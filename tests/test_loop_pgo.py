"""Unit tests: scan-context retrieval, local loop detection, pose-graph GN."""

import numpy as np
import pytest

from pin_slam_tpu.config import Config
from pin_slam_tpu.dataset.synthetic import (
    SyntheticSequence,
    default_scene,
    lidar_directions,
)
from pin_slam_tpu.slam.loop_detector import (
    ScanContextManager,
    detect_local_loop,
    distance_sc,
    ptcloud2sc,
)
from pin_slam_tpu.slam.pgo import PoseGraphManager, so3_log_batch


def _scan_at(pose_t, yaw=0.0):
    T = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    T[:2, :2] = [[c, -s], [s, c]]
    T[:3, 3] = pose_t
    seq = SyntheticSequence(scene_sdf=default_scene(), poses=np.stack([T]),
                            dirs=lidar_directions(256, 16))
    return seq.frame(0)


@pytest.fixture(scope="module")
def scans():
    return {
        "a": _scan_at([6, 0, 0]),
        "a_rot": _scan_at([6, 0, 0], yaw=np.radians(60)),
        "b": _scan_at([-8, -5, 0]),
    }


class TestScanContext:
    def test_rotation_invariant_retrieval(self, scans):
        sc_a = ptcloud2sc(scans["a"], (20, 60), 40.0)
        sc_rot = ptcloud2sc(scans["a_rot"], (20, 60), 40.0)
        d, yaw = distance_sc(sc_a, sc_rot)
        assert d < 0.1
        # yaw estimate within one sector (6 deg) of +-60 (direction
        # convention gives 60 or 300 depending on argument order)
        yaw_deg = (yaw * 6) % 360
        assert min(abs(yaw_deg - 60), abs(yaw_deg - 300)) <= 6

    def test_different_place_rejected(self, scans):
        sc_a = ptcloud2sc(scans["a"], (20, 60), 40.0)
        sc_b = ptcloud2sc(scans["b"], (20, 60), 40.0)
        d, _ = distance_sc(sc_a, sc_b)
        assert d > 0.3

    def test_manager_retrieval(self, scans):
        cfg = Config()
        cfg.max_range = 60.0
        cfg.finalize()
        cfg.npmc_max_dist = 40.0
        mgr = ScanContextManager(cfg)
        mgr.add_node(0, scans["a"])
        rng = np.random.RandomState(0)
        for i in range(1, 20):
            mgr.add_node(i, scans["b"] + rng.randn(*scans["b"].shape) * 0.05)
        mgr.add_node(20, scans["a_rot"])
        poses = np.stack([np.eye(4)] * 21)
        cand = np.zeros(21, bool)
        cand[:5] = True
        lid, cd, T = mgr.detect_global_loop(poses, 100.0, cand)
        assert lid == 0
        yaw_est = np.degrees(np.arctan2(T[1, 0], T[0, 0])) % 360
        assert min(abs(yaw_est - 60), abs(yaw_est - 300)) <= 7

    def test_save_load_context(self, scans, tmp_path):
        cfg = Config()
        cfg.finalize()
        cfg.npmc_max_dist = 40.0
        mgr = ScanContextManager(cfg)
        mgr.add_node(0, scans["a"])
        p = str(tmp_path / "ctx.npz")
        mgr.save_context_dict(p, np.stack([np.eye(4)]))
        mgr2 = ScanContextManager(cfg)
        poses = mgr2.load_context_dict(p)
        assert 0 in mgr2.contexts
        np.testing.assert_allclose(mgr2.contexts[0], mgr.contexts[0])


class TestLocalLoop:
    def test_detects_nearby_revisit(self):
        poses = np.stack([np.eye(4)] * 30)
        for i in range(30):
            poses[i, 0, 3] = 15.0 - abs(i - 15)  # out and back to start
        cand = np.zeros(30, bool)
        cand[:8] = True
        lid, dist, T = detect_local_loop(
            poses, cand, cur_drift=0.5, cur_frame_id=29,
            dist_thre=2.0, drift_thre=3.0)
        assert lid is not None
        assert dist < 2.0

    def test_rejects_when_drifted(self):
        poses = np.stack([np.eye(4)] * 10)
        cand = np.ones(10, bool)
        lid, _, _ = detect_local_loop(
            poses, cand, cur_drift=10.0, cur_frame_id=9,
            dist_thre=2.0, drift_thre=3.0)
        assert lid is None


class TestPoseGraph:
    def _square_with_drift(self, n=40, yaw_bias=0.004):
        gt = [np.eye(4)]
        for i in range(n):
            yaw = np.pi / 2 * ((i + 1) // 10)
            T = np.eye(4)
            c, s = np.cos(yaw), np.sin(yaw)
            T[:2, :2] = [[c, -s], [s, c]]
            T[:3, 3] = gt[-1][:3, 3] + gt[-1][:3, :3] @ [1, 0, 0]
            gt.append(T)
        gt = np.stack(gt)
        drift = [np.eye(4)]
        Rz = np.eye(4)
        c, s = np.cos(yaw_bias), np.sin(yaw_bias)
        Rz[:2, :2] = [[c, -s], [s, c]]
        for i in range(n):
            rel = np.linalg.inv(gt[i]) @ gt[i + 1] @ Rz
            drift.append(drift[-1] @ rel)
        return gt, np.stack(drift)

    def test_loop_correction(self):
        cfg = Config()
        cfg.finalize()
        gt, drift = self._square_with_drift()
        pgm = PoseGraphManager(cfg)
        for i in range(41):
            pgm.add_frame_node(i, drift[i])
        for i in range(1, 41):
            pgm.add_odometry_factor(
                i, i - 1, np.linalg.inv(drift[i - 1]) @ drift[i])
        pgm.add_loop_factor(40, 0, np.linalg.inv(gt[0]) @ gt[40])
        assert pgm.optimize_pose_graph()
        ate_before = np.sqrt(
            ((drift[:, :3, 3] - gt[:, :3, 3]) ** 2).sum(-1).mean())
        ate_after = np.sqrt(
            ((pgm.pgo_poses[:, :3, 3] - gt[:, :3, 3]) ** 2).sum(-1).mean())
        assert ate_after < ate_before * 0.1
        diff = pgm.get_pose_diff()
        np.testing.assert_allclose(diff[0], np.eye(4), atol=1e-4)

    def test_drift_estimate(self):
        cfg = Config()
        cfg.finalize()
        pgm = PoseGraphManager(cfg)
        td = np.arange(100, dtype=float)
        d = pgm.estimate_drift(td, 50)
        assert d == pytest.approx(0.5)

    def test_g2o_output(self, tmp_path):
        cfg = Config()
        cfg.finalize()
        pgm = PoseGraphManager(cfg)
        for i in range(3):
            T = np.eye(4)
            T[0, 3] = i
            pgm.add_frame_node(i, T)
        pgm.add_odometry_factor(1, 0, np.eye(4))
        pgm.add_odometry_factor(2, 1, np.eye(4))
        p = str(tmp_path / "g.g2o")
        pgm.write_g2o(p)
        lines = open(p).read().splitlines()
        assert sum(1 for l in lines if l.startswith("VERTEX_SE3")) == 3
        assert sum(1 for l in lines if l.startswith("EDGE_SE3")) == 2

    def test_so3_log_roundtrip(self):
        from pin_slam_tpu.slam.pgo import _so3_exp

        w = np.array([0.3, -0.2, 0.5])
        R = _so3_exp(w)
        np.testing.assert_allclose(so3_log_batch(R[None])[0], w, atol=1e-6)
