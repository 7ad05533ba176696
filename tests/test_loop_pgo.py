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
        # the synthetic drift here (9 deg accumulated yaw over 40 frames)
        # is far beyond the reference's per-frame error budget — raise it
        # so the pre-optimization outlier rejection (reference
        # utils/pgo.py:174-188) admits this deliberately-extreme edge and
        # the solver math itself is what's under test
        cfg.pgo_error_thre_frame = 20000.0
        # price the odometry HONESTLY for this scenario: the synthetic
        # odometry carries a 0.225 deg/frame yaw bias, so the default
        # 0.01 deg claim would (correctly, under the loop-edge pricing of
        # slam/pgo.py) leave rotations pinned to the biased chain. Loop
        # closures fix rotation drift exactly when the odometry's claimed
        # rotation noise reflects its actual error.
        cfg.pgo_rot_std = 0.3
        cfg.finalize()
        gt, drift = self._square_with_drift()
        pgm = PoseGraphManager(cfg)
        for i in range(41):
            pgm.add_frame_node(i, drift[i])
        for i in range(1, 41):
            pgm.add_odometry_factor(
                i, i - 1, np.linalg.inv(drift[i - 1]) @ drift[i])
        assert pgm.add_loop_factor(40, 0, np.linalg.inv(gt[0]) @ gt[40])
        assert pgm.optimize_pose_graph()
        ate_before = np.sqrt(
            ((drift[:, :3, 3] - gt[:, :3, 3]) ** 2).sum(-1).mean())
        ate_after = np.sqrt(
            ((pgm.pgo_poses[:, :3, 3] - gt[:, :3, 3]) ** 2).sum(-1).mean())
        assert ate_after < ate_before * 0.1
        diff = pgm.get_pose_diff()
        np.testing.assert_allclose(diff[0], np.eye(4), atol=1e-4)

    def test_wrong_loop_edge_rejected(self):
        """A loop edge contradicting the trajectory by meters must be
        rejected BEFORE optimization (reference utils/pgo.py:174-188):
        after the solve, a wrong edge is absorbed by warping the whole
        trajectory with low residual, so only the pre-solve graph error
        is discriminative."""
        cfg = Config()
        cfg.finalize()
        gt, drift = self._square_with_drift(yaw_bias=0.0)  # perfect odom
        pgm = PoseGraphManager(cfg)
        for i in range(41):
            pgm.add_frame_node(i, drift[i])
        for i in range(1, 41):
            pgm.add_odometry_factor(
                i, i - 1, np.linalg.inv(drift[i - 1]) @ drift[i])
        bad = np.linalg.inv(gt[0]) @ gt[40]
        yaw = 0.175                           # 10 deg rotational error:
        c_, s_ = np.cos(yaw), np.sin(yaw)     # rot_std 0.01 deg makes the
        Rz = np.eye(4)                        # budget rotation-dominated,
        Rz[:2, :2] = [[c_, -s_], [s_, c_]]    # same as the reference's
        bad = bad @ Rz                        # GTSAM noise model
        bad[:3, 3] += [2.3, 0.0, 0.0]
        assert not pgm.add_loop_factor(40, 0, bad)
        # the bad edge must be gone: poses unchanged by a later solve
        assert not any(e["is_loop"] for e in pgm.edges)
        good = np.linalg.inv(gt[0]) @ gt[40]
        assert pgm.add_loop_factor(40, 0, good)
        assert pgm.optimize_pose_graph()

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


class TestFeatureContext:
    """Feature-enhanced map context (reference: utils/loop_detector.py
    feature mode: mean neural-point feature per bin, cosine retrieval)."""

    def _make(self, loop_with_feature=True):
        cfg = Config()
        cfg.local_map_context = True
        cfg.loop_with_feature = loop_with_feature
        cfg.npmc_max_dist = 60.0
        return ScanContextManager(cfg)

    def test_feature_descriptor_shapes(self, scans):
        from pin_slam_tpu.slam.loop_detector import ptcloud2sc_feature
        rng = np.random.RandomState(0)
        feats = rng.randn(len(scans["a"]), 8).astype(np.float32)
        scf = ptcloud2sc_feature(scans["a"], feats, (20, 60), 60.0)
        assert scf.shape == (20, 60, 8)
        assert np.isfinite(scf).all()

    def test_feature_rotation_invariant_retrieval(self, scans):
        from pin_slam_tpu.slam.loop_detector import (
            ptcloud2sc_feature, distance_sc_feature, sc2rk)
        rng = np.random.RandomState(1)
        W = rng.randn(2, 8)

        # features keyed on WORLD position (like neural point features),
        # so a sensor yaw only permutes sectors
        def world_feats(pc, yaw, t):
            c, s = np.cos(yaw), np.sin(yaw)
            R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
            w = pc[:, :3] @ R.T + t
            return np.tanh(w[:, :2] @ W).astype(np.float32)

        sc1 = ptcloud2sc_feature(
            scans["a"], world_feats(scans["a"], 0.0, [6, 0, 0]),
            (20, 60), 60.0)
        sc2 = ptcloud2sc_feature(
            scans["a_rot"],
            world_feats(scans["a_rot"], np.radians(60), [6, 0, 0]),
            (20, 60), 60.0)
        dist, yaw = distance_sc_feature(sc1, sc2)
        assert dist < 0.25
        # ring keys similar (rotation invariance of ring mean)
        rk1, rk2 = sc2rk(sc1).reshape(-1), sc2rk(sc2).reshape(-1)
        cos = rk1 @ rk2 / (np.linalg.norm(rk1) * np.linalg.norm(rk2))
        assert cos > 0.9

    def test_manager_feature_mode_retrieval(self, scans):
        mgr = self._make()
        assert mgr.ringkey_dist_thre == 0.25  # cosine threshold in use
        rng = np.random.RandomState(2)
        W = rng.randn(2, 8)

        def world_feats(pc, yaw, t):
            c, s = np.cos(yaw), np.sin(yaw)
            R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
            w = pc[:, :3] @ R.T + t
            return np.tanh(w[:, :2] @ W).astype(np.float32)

        yaws = {"a": 0.0, "b": 0.0, "a_rot": np.radians(60)}
        poses = np.stack([np.eye(4)] * 6)
        for fid, k in enumerate(["a", "b", "b", "b", "b", "a_rot"]):
            t = [6, 0, 0] if "a" in k else [-8, -5, 0]
            poses[fid, :3, 3] = t
            mgr.add_node(fid, scans[k], world_feats(scans[k], yaws[k], t))
        cand = np.zeros(6, bool)
        cand[:2] = True
        loop_id, cosdist, T = mgr.detect_global_loop(
            poses, 1e5, cand,
            context_pc_global=None,
            context_features=world_feats(
                scans["a_rot"], yaws["a_rot"], [6, 0, 0]))
        assert loop_id == 0           # revisit of place "a"
        yaw = np.degrees(np.arctan2(T[0, 1], T[0, 0]))
        assert abs(abs(yaw) - 60.0) < 12.0

    def test_save_load_with_features(self, scans, tmp_path):
        mgr = self._make()
        feats = np.random.RandomState(3).randn(
            len(scans["a"]), 8).astype(np.float32)
        mgr.add_node(0, scans["a"], feats)
        p = str(tmp_path / "ctx.npz")
        mgr.save_context_dict(p, np.stack([np.eye(4)]))
        mgr2 = self._make()
        mgr2.load_context_dict(p)
        assert 0 in mgr2.contexts_feature
        np.testing.assert_allclose(mgr2.ringkeys_feature[0],
                                   mgr.ringkeys_feature[0])


class TestLocalMapMask:
    def test_mask_criteria(self):
        import jax.numpy as jnp
        from pin_slam_tpu.models import neural_points as npm
        state = npm.init_map_state(1 << 10, 1 << 14, 8, False)
        pts = np.zeros((100, 3), np.float32)
        pts[:, 0] = np.linspace(0, 99, 100)
        state = state.replace(
            positions=state.positions.at[:100].set(jnp.asarray(pts)),
            ts_create=state.ts_create.at[:100].set(
                jnp.asarray(np.arange(100), jnp.int32) // 10),
            count=jnp.int32(100))
        travel = jnp.asarray(np.arange(16, dtype=np.float32) * 5.0)
        m = np.asarray(npm.local_map_mask(
            state, travel, 9, 20.0,
            sensor_pos=jnp.zeros(3), local_map_radius=50.0))
        # travel window: |travel[9]-travel[ts]| < 20 -> ts >= 6 (rows 60+)
        # radius: x < 50 -> rows < 50 ... disjoint, so nothing survives both
        assert m.sum() == 0
        m2 = np.asarray(npm.local_map_mask(
            state, travel, 2, 20.0,
            sensor_pos=jnp.zeros(3), local_map_radius=50.0))
        # ts window: ts in (travel diff < 20) -> ts <= 5 (rows < 60);
        # radius keeps rows < 50
        assert m2.sum() == 50
        m3 = np.asarray(npm.local_map_mask(
            state, travel, 2, 20.0, by_travel_dist=False, time_window=3,
            sensor_pos=None))
        # |2 - ts| < 3 -> ts in {0..4} -> rows 0..49
        assert m3.sum() == 50


@pytest.mark.slow
def test_local_map_feature_context_integration():
    """8-frame run with local_map_context + loop_with_feature on: the
    descriptor path builds feature contexts from the live neural-point map
    (reference: pin_slam.py:284-292) without error."""
    import jax
    from pin_slam_tpu.dataset.synthetic import circle_trajectory
    from pin_slam_tpu.slam.system import PinSLAMSystem
    from pin_slam_tpu.slam.loop import LoopPgoManager

    cfg = Config()
    cfg.track_on = True
    cfg.pgo_on = True
    cfg.global_loop_on = True
    cfg.local_map_context = True
    cfg.loop_with_feature = True
    cfg.local_map_context_latency = 2
    cfg.max_range = 60.0
    cfg.vox_down_m = 0.12
    cfg.source_vox_down_m = 0.6
    cfg.voxel_size_m = 0.3
    cfg.bs = 2048
    cfg.iters = 4
    cfg.init_iter_ratio = 4
    cfg.reg_iter_n = 12
    cfg.map_capacity = 1 << 16
    cfg.buffer_size = 1 << 18
    cfg.frame_point_cap = 1 << 12
    cfg.source_point_cap = 1 << 10
    cfg.max_frames = 32
    cfg.finalize()
    cfg.pool_capacity = 200_000

    seq = SyntheticSequence(
        scene_sdf=default_scene(),
        poses=circle_trajectory(8, radius=5.0, revolutions=0.03,
                                ease_in_frames=3),
        dirs=lidar_directions(128, 12), max_range=60.0)
    system = PinSLAMSystem(cfg)
    system.set_gt_poses(seq.poses)
    mgr = LoopPgoManager(cfg, system)
    for fid in range(len(seq)):
        pts = seq.frame(fid)
        system.process_frame(fid, pts,
                             loop_hook=lambda f: mgr.after_frame(
                                 f, seq.frame(f)))
    # nodes exist for the lagged frames, with feature contexts
    assert (len(seq) - 1 - cfg.local_map_context_latency) \
        in mgr.detector.contexts_feature
    for k, v in mgr.detector.contexts_feature.items():
        assert v.shape == (20, 60, cfg.feature_dim)
        assert np.isfinite(v).all()


@pytest.mark.slow
class TestClosureConsequences:
    """The loop-closure consequence pipeline, end-to-end and deterministic.

    Scenario physics: the sensor truly moves on `gt` (scans are ray-cast
    from the TRUE poses), while the system is fed `drifted` poses (mapping
    mode stands in for drifting odometry — no tracking feedback loop, so
    the scenario can't diverge and the run is reproducible). The map it
    builds is the scene warped by the injected drift; the closure must
    detect the revisit, refine the loop transform against the (near-true)
    early map, optimize the graph, elastically deform map + pool, schedule
    the post_loop_iter_boost, and the next mapped frame must consume it
    (system.process_frame's run_training; reference: pin_slam.py:281-348,
    model/neural_points.py:791-817)."""

    N = 60

    def _setup(self):
        from pin_slam_tpu.dataset.synthetic import circle_trajectory

        cfg = Config()
        cfg.track_on = False
        cfg.pgo_on = True
        cfg.max_range = 60.0
        cfg.min_range = 0.5
        cfg.vox_down_m = 0.12
        cfg.voxel_size_m = 0.3
        cfg.sigma_sigmoid_m = 0.05
        cfg.surface_sample_range_m = 0.25
        cfg.bs = 2048
        cfg.iters = 5
        cfg.init_iter_ratio = 10
        cfg.bs_new_sample = 512
        cfg.reg_iter_n = 30
        cfg.map_capacity = 1 << 16
        cfg.buffer_size = 1 << 19
        cfg.frame_point_cap = 1 << 13
        cfg.source_point_cap = 1 << 11
        cfg.max_frames = 64
        cfg.pgo_freq = 8
        cfg.post_loop_iter_boost = 12
        cfg.silence = True
        cfg.finalize()
        cfg.pool_capacity = 1_000_000
        cfg.local_map_travel_dist_ratio = 0.4
        cfg.min_loop_travel_dist_ratio = 0.45
        cfg.use_mid_ts = True

        n = self.N
        scene = default_scene(half_extent=(16.0, 12.0, 4.0))
        gt = circle_trajectory(n, radius=6.0, revolutions=1.3,
                               ease_in_frames=4)
        drifted = gt.copy()
        for i in range(1, n):
            # body-frame odometry drift (right-multiplied): ~0.12 m /
            # 2 deg at the revisit — the cm-to-dm regime a loop cadence
            # actually produces and the GM-kernel refinement is built for
            # (dm-to-m initial error throws the registration outside its
            # robust-kernel basin: measured under-correction 0.095 of
            # 0.29 m at 14 deg — that regime is a lost tracker's, handled
            # by reboot, not by loop closure)
            th = 0.0008 * i
            D = np.eye(4)
            D[:2, :2] = [[np.cos(th), -np.sin(th)],
                         [np.sin(th), np.cos(th)]]
            D[0, 3] = 0.0028 * i
            drifted[i] = gt[i] @ D
        # physical truth: scans ray-cast from the TRUE poses
        seq = SyntheticSequence(scene_sdf=scene, poses=gt,
                                dirs=lidar_directions(256, 16),
                                max_range=60.0)
        return cfg, scene, gt, drifted, seq

    def test_closure_detects_corrects_and_consumes_boost(self):
        import jax.numpy as jnp
        from pin_slam_tpu.slam import map_query as mq
        from pin_slam_tpu.slam.loop import LoopPgoManager
        from pin_slam_tpu.slam.system import PinSLAMSystem
        from pin_slam_tpu.utils.eval_traj import absolute_error

        cfg, scene, gt, drifted, seq = self._setup()
        n = self.N
        system = PinSLAMSystem(cfg)
        system.set_gt_poses(drifted)
        loop_mgr = LoopPgoManager(cfg, system)

        closure_frame = None
        pending_seen = 0
        for fid in range(n):
            pts = seq.frame(fid)
            hook = (lambda f, _p=pts: loop_mgr.after_frame(f, _p))
            if closure_frame is not None and fid == closure_frame + 1:
                # post-PGO the trajectory estimate is the corrected chain
                # (+ ~the true poses for the remainder)
                corrected = gt.copy()
                pg = loop_mgr.pgm.pgo_poses
                corrected[: min(len(pg), fid)] = pg[: min(len(pg), fid)]
                system.gt_poses = corrected
                hook = None                        # one clean train frame
            system.process_frame(fid, pts, loop_hook=hook)
            if system.post_loop_iter_boost_pending > 0:
                pending_seen = system.post_loop_iter_boost_pending
                closure_frame = fid
            if closure_frame is not None and fid > closure_frame:
                break

        assert loop_mgr.pgo_count >= 1, "no closure on the 1.3-lap revisit"
        assert pending_seen == 12, "closure did not schedule the boost"
        assert closure_frame < n - 1
        # consumed by the next mapped frame's training
        assert system.post_loop_iter_boost_pending == 0

        # Mechanics-level pose sanity only. Registration ACCURACY is not
        # asserted at this scan density: the loop-frame map here is one
        # sparse 256x16 scan, whose IDW-interpolated SDF is too soft to
        # recover the last ~2 deg of rotation (measured: refined rel
        # consistently under-rotates by ~the injected drift). The
        # accuracy evidence lives in the committed TPU gauntlet artifacts
        # (eval/gauntlet_results.json: 12/12 closures, ATE 3.6 cm on
        # 512x32 scans); this test pins the PIPELINE: detection fired,
        # refinement+budget gates passed, the graph solved, and the
        # elastic consequences below are consistent.
        m = closure_frame + 1
        ate_drift, _ = absolute_error(gt[:m], drifted[:m], False)
        ate_pgo, _ = absolute_error(gt[:m], loop_mgr.pgm.pgo_poses[:m],
                                    False)
        assert np.isfinite(ate_pgo) and ate_pgo < 2.0 * ate_drift + 0.05

        # ... and the deformed map must sit on the true scene: |scene sdf|
        # at the alive map points collapses vs the pre-closure warp scale
        mp = np.asarray(system.state.positions[: int(system.state.count)])
        med = float(np.median(np.abs(scene(mp[::5].astype(np.float64)))))
        assert med < 0.06, med


@pytest.mark.slow
def test_deform_pool_transform_continued_training_fix_drifted_map():
    """The closure-consequence ops in isolation (hand-built exact PGO
    correction, no detector): mapping with drifted believed poses over
    scans rendered from TRUE poses -> production deform_map + rehash +
    ts-indexed pool transform -> one more mapped frame whose training
    consumes the scheduled boost. The SDF error at the TRUE surface in the
    strongly-drifted region must collapse (reference:
    model/neural_points.py:791-817, utils/mapper.py:600-844)."""
    import jax
    import jax.numpy as jnp
    from pin_slam_tpu.dataset.synthetic import circle_trajectory
    from pin_slam_tpu.models import neural_points as npm
    from pin_slam_tpu.ops.transforms import transform_points_by_ts
    from pin_slam_tpu.slam import map_query as mq
    from pin_slam_tpu.slam.system import PinSLAMSystem

    cfg = Config()
    cfg.track_on = False
    cfg.max_range = 60.0
    cfg.min_range = 0.5
    cfg.vox_down_m = 0.12
    cfg.voxel_size_m = 0.3
    cfg.sigma_sigmoid_m = 0.05
    cfg.surface_sample_range_m = 0.25
    cfg.bs = 2048
    cfg.iters = 5
    cfg.init_iter_ratio = 10
    cfg.bs_new_sample = 512
    cfg.map_capacity = 1 << 16
    cfg.buffer_size = 1 << 19
    cfg.frame_point_cap = 1 << 13
    cfg.source_point_cap = 1 << 11
    cfg.max_frames = 64
    cfg.post_loop_iter_boost = 10
    cfg.silence = True
    cfg.finalize()
    cfg.pool_capacity = 1_000_000
    cfg.use_mid_ts = True

    n = 40
    scene = default_scene(half_extent=(16.0, 12.0, 4.0))
    gt = circle_trajectory(n, radius=6.0, revolutions=1.05,
                           ease_in_frames=4)
    drifted = gt.copy()
    for i in range(1, n):
        th = 0.005 * i
        D = np.eye(4)
        D[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
        D[0, 3] = 0.015 * i
        drifted[i] = D @ gt[i]
    # scans from the TRUE poses; the system believes the drifted chain,
    # so its map is the scene warped by up to ~11 deg / 0.6 m
    seq = SyntheticSequence(scene_sdf=scene, poses=gt,
                            dirs=lidar_directions(256, 16), max_range=60.0)

    system = PinSLAMSystem(cfg)
    system.set_gt_poses(drifted)
    for fid in range(n - 1):
        system.process_frame(fid, seq.frame(fid))

    # probes: TRUE surface points seen by the strongly-drifted frames
    # (raw world frame — mapping mode builds the map in the same frame
    # as the poses it is fed)
    rs = np.random.RandomState(3)
    probes = []
    for fid in (33, 35, 37):
        pts = seq.frame(fid)[:, :3]
        w = pts @ gt[fid][:3, :3].T + gt[fid][:3, 3]
        probes.append(w[rs.permutation(len(w))[:2000]])
    probes = np.concatenate(probes).astype(np.float32)

    def sdf_err(s):
        out = mq.query_decode(
            s.state, s.params["geo_features"], s.params["geo_mlp"],
            jnp.asarray(probes), s.qp)
        sdf = np.asarray(out.sdf)
        ok = np.asarray(out.nn_count) >= 6
        return (float(np.abs(sdf[ok]).mean()) if ok.any() else np.inf,
                float(ok.mean()))

    err_pre, cov_pre = sdf_err(system)

    # exact correction: what PGO outputs for a perfect loop edge
    diffs_np = np.stack(
        [gt[i] @ np.linalg.inv(drifted[i]) for i in range(n)]
        + [np.eye(4)] * (cfg.max_frames - n))
    diffs = jnp.asarray(diffs_np, jnp.float32)
    system.state = jax.jit(
        lambda s, d: npm.rehash(
            npm.deform_map(s, d, use_mid_ts=cfg.use_mid_ts),
            jnp.int32(n - 1), resolution=cfg.voxel_size_m,
            use_mid_ts=cfg.use_mid_ts))(system.state, diffs)
    system.pool = system.pool.replace(coord=transform_points_by_ts(
        system.pool.coord, system.pool.ts, diffs))
    system.params["geo_features"] = system.state.geo_features
    system._cur_lset = None
    system._map_deformed = True
    system.post_loop_iter_boost_pending = cfg.post_loop_iter_boost
    system.gt_poses = gt            # corrected trajectory

    system.process_frame(n - 1, seq.frame(n - 1))
    assert system.post_loop_iter_boost_pending == 0

    err_post, cov_post = sdf_err(system)
    # pre-closure the map near these probes is offset by ~0.5 m (low
    # coverage / large |sdf|); the correction must put geometry back
    assert cov_post > 0.8, (cov_pre, cov_post)
    assert err_post < 0.06, (err_pre, err_post)
    assert (err_post < 0.7 * err_pre) or cov_pre < 0.5, (err_pre, err_post)


def test_final_refine_improves_or_preserves_trajectory():
    """End-of-run map-consistency pass (slam/loop.py final_refine):
    re-registering every frame against the finished map must correct a
    meaningful share of frames, keep the trajectory valid, and not
    degrade ATE (on a short low-drift run it should tighten it)."""
    import jax.numpy as jnp  # noqa: F401

    from pin_slam_tpu.dataset.synthetic import circle_trajectory
    from pin_slam_tpu.slam.loop import LoopPgoManager
    from pin_slam_tpu.slam.system import PinSLAMSystem
    from pin_slam_tpu.utils.eval_traj import absolute_error
    from tests.test_slam_e2e import small_config

    cfg = small_config()
    cfg.pgo_on = True
    seq = SyntheticSequence(
        scene_sdf=default_scene(),
        poses=circle_trajectory(12, radius=6.0, revolutions=0.13),
        dirs=lidar_directions(512, 32), max_range=60.0)
    system = PinSLAMSystem(cfg)
    loop_mgr = LoopPgoManager(cfg, system)
    clouds = [seq.frame(fid) for fid in range(len(seq))]
    for fid in range(len(seq)):
        system.process_frame(
            fid, clouds[fid],
            loop_hook=lambda f, _p=clouds[fid]: loop_mgr.after_frame(f, _p))
    n = len(seq)
    A0 = seq.poses[0]
    ate_pre, _ = absolute_error(
        seq.poses[:n], A0 @ system.pgo_poses[:n], align_on=False)

    n_ok = loop_mgr.final_refine(lambda f: clouds[f], n)
    assert n_ok >= (n - 1) // 2, f"only {n_ok} frames refined"
    ate_post, are_post = absolute_error(
        seq.poses[:n], A0 @ system.pgo_poses[:n], align_on=False)
    assert np.isfinite(ate_post) and np.isfinite(are_post)
    assert ate_post <= ate_pre * 1.2 + 0.01, (ate_pre, ate_post)
    assert not system.lose_track
