"""Integration test: point-to-SDF registration recovers a perturbed pose
on a synthetic ray-cast scene (ground-truth poses known exactly)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pin_slam_tpu.config import Config
from pin_slam_tpu.dataset.synthetic import make_default_sequence
from pin_slam_tpu.models import neural_points as npm
from pin_slam_tpu.models.decoder import init_mlp_params
from pin_slam_tpu.models.sampler import sample_training_points
from pin_slam_tpu.ops.transforms import transform_points
from pin_slam_tpu.slam import map_query as mq
from pin_slam_tpu.slam import mapper as mp
from pin_slam_tpu.slam import tracker as tk


def _rot_xyz(deg):
    a = np.radians(deg)
    c, s = np.cos(a), np.sin(a)
    rx = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    ry = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    return rz @ ry @ rx


@pytest.fixture(scope="module")
def trained_scene():
    cfg = Config()
    cfg.voxel_size_m = 0.3
    cfg.finalize()
    qp = mq.make_query_params(cfg)
    seq = make_default_sequence(n_frames=2, n_az=512, n_el=32, radius=4.0)

    state = npm.init_map_state(1 << 16, 1 << 19, 8, color_on=False)
    pool = mp.init_pool(600_000, 1 << 15, False, 0)
    geo_mlp = init_mlp_params(jax.random.PRNGKey(7), 11, 64, 1, 1)
    params = {"geo_features": state.geo_features, "geo_mlp": geo_mlp}
    opt = optax.adam(0.01, eps=1e-15)
    lk = dict(
        sigma_sigmoid_m=0.1, loss_weight_on=True, ekional_loss_on=True,
        weight_e=0.5, numerical_grad_eps=cfg.voxel_size_m * 0.2,
        gradient_decimation=10, surface_sample_range_m=0.25)
    step = mp.make_train_step(qp, opt, bs=4096, bs_new=0,
                              train_decoder=True, loss_kwargs=lk)
    td = jnp.zeros(64, jnp.float32)
    key = jax.random.PRNGKey(0)

    cap = 1 << 14
    pts0 = seq.frame(0)
    pad = np.zeros((cap, 3), np.float32)
    m = min(len(pts0), cap)
    sel = np.random.RandomState(0).permutation(len(pts0))[:m]
    pad[:m] = pts0[sel]
    mask = jnp.arange(cap) < m
    key, ks = jax.random.split(key)
    smp = sample_training_points(
        ks, jnp.asarray(pad), mask,
        surface_sample_range_m=0.25, surface_sample_n=3, free_front_n=2,
        free_behind_n=1, free_sample_begin_ratio=0.3,
        free_sample_end_dist_m=1.0, max_range=60.0,
        dist_weight_on=True, dist_weight_scale=0.8)
    T0 = jnp.asarray(seq.poses[0], jnp.float32)
    world = transform_points(smp.points, T0)
    upd = smp.mask & (jnp.abs(smp.sdf_label) < 0.125)
    state, _ = npm.insert_points(state, world, upd, 0, td,
                                 resolution=0.3, local_window_dist=200.0)
    params["geo_features"] = state.geo_features
    pool = mp.append_samples(pool, world, smp.sdf_label, smp.weight,
                             smp.mask, 0)
    ostate = opt.init(params)
    lf = mq.LocalFilter(travel_dist=td, cur_ts=jnp.int32(0),
                        local_window_dist=200.0)
    for _ in range(400):
        params, ostate, state, key, _ = step(
            params, ostate, state, pool, key, lf, jnp.bool_(False))
    return dict(cfg=cfg, qp=qp, seq=seq, state=state, params=params, lf=lf)


class TestTracking:
    @pytest.fixture(scope="class")
    def tracker_setup(self, trained_scene):
        w = trained_scene
        tp = tk.TrackerParams(
            reg_iter_n=40, max_sdf_std=0.25, max_valid_residual_cm=15.0,
            weighted_first=True, mask_min_nn_count=6)
        track = jax.jit(tk.make_tracker(w["qp"], tp))
        pts1 = w["seq"].frame(1)
        cap = 2048
        sel = np.random.RandomState(1).permutation(len(pts1))[:cap]
        src = np.zeros((cap, 3), np.float32)
        src[: len(sel)] = pts1[sel]
        src_mask = jnp.arange(cap) < len(sel)
        return track, jnp.asarray(src), src_mask, w

    def _track_from(self, setup, rot_deg, tran_m):
        track, src, src_mask, w = setup
        T1 = w["seq"].poses[1]
        Tp = T1.copy()
        Tp[:3, :3] = T1[:3, :3] @ _rot_xyz(rot_deg)
        Tp[:3, 3] += np.array([tran_m, -tran_m * 0.6, tran_m * 0.3])
        res = track(
            w["state"], w["params"]["geo_features"], w["params"]["geo_mlp"],
            src, src_mask, jnp.asarray(Tp, jnp.float32), w["lf"],
            jnp.zeros(3, jnp.float32))
        T_est = np.asarray(res.pose, np.float64)
        rot_err = np.degrees(np.arccos(np.clip(
            (np.trace(T_est[:3, :3].T @ T1[:3, :3]) - 1) / 2, -1, 1)))
        tran_err = np.linalg.norm(T_est[:3, 3] - T1[:3, 3])
        return res, rot_err, tran_err

    def test_recovers_small_perturbation(self, tracker_setup):
        res, rot_err, tran_err = self._track_from(tracker_setup, 0.5, 0.08)
        assert bool(res.valid)
        assert rot_err < 0.5, f"rot error {rot_err} deg"
        assert tran_err < 0.08, f"tran error {tran_err} m"

    def test_recovers_moderate_perturbation(self, tracker_setup):
        res, rot_err, tran_err = self._track_from(tracker_setup, 1.0, 0.15)
        assert bool(res.valid)
        assert rot_err < 0.4
        assert tran_err < 0.08

    def test_converges_in_few_iterations(self, tracker_setup):
        res, _, _ = self._track_from(tracker_setup, 0.2, 0.03)
        assert int(res.iterations) < 40

    def test_covariance_and_eigenvalues(self, tracker_setup):
        res, _, _ = self._track_from(tracker_setup, 0.5, 0.08)
        cov = np.asarray(res.cov)
        assert cov.shape == (6, 6)
        assert np.all(np.isfinite(cov))
        assert np.all(np.asarray(res.eigenvalues) > 0)

    def test_failure_flag_on_garbage_map(self, trained_scene):
        """Tracking against an empty map must raise the failure flag
        (reference failure checks utils/tracker.py:161-169)."""
        w = trained_scene
        tp = tk.TrackerParams(reg_iter_n=10, weighted_first=True)
        track = jax.jit(tk.make_tracker(w["qp"], tp))
        empty = npm.init_map_state(1 << 10, 1 << 12, 8, color_on=False)
        src = jnp.asarray(np.random.RandomState(0).randn(256, 3),
                          jnp.float32)
        res = track(
            empty, empty.geo_features, w["params"]["geo_mlp"], src,
            jnp.ones(256, bool), jnp.eye(4), w["lf"],
            jnp.zeros(3, jnp.float32))
        assert not bool(res.valid)


def test_init_guess_motion_models():
    """motion_model="translation" extrapolates translation rate only —
    the stability fix for sustained turning (see config.motion_model)."""
    import numpy as np
    from pin_slam_tpu.slam.system import compute_init_guess

    th = 0.2
    last_tran = np.eye(4)
    last_tran[:2, :2] = [[np.cos(th), -np.sin(th)],
                         [np.sin(th), np.cos(th)]]
    last_tran[0, 3] = 0.5
    pose = np.eye(4)
    pose[:3, 3] = [3.0, 1.0, 0.2]

    full = compute_init_guess(True, "full", pose, last_tran)
    np.testing.assert_allclose(full, pose @ last_tran)

    tr = compute_init_guess(True, "translation", pose, last_tran)
    # same predicted position, NO extrapolated rotation
    np.testing.assert_allclose(tr[:3, 3], (pose @ last_tran)[:3, 3])
    np.testing.assert_allclose(tr[:3, :3], pose[:3, :3])

    still = compute_init_guess(False, "translation", pose, last_tran)
    np.testing.assert_allclose(still, pose)

    # damped: full translation, half the rotation angle
    dm = compute_init_guess(True, "damped", pose, last_tran, damping=0.5)
    np.testing.assert_allclose(dm[:3, 3], (pose @ last_tran)[:3, 3])
    rel = np.linalg.inv(pose[:3, :3]) @ dm[:3, :3]
    ang = np.arccos(np.clip((np.trace(rel) - 1) / 2, -1, 1))
    np.testing.assert_allclose(ang, th / 2, atol=1e-9)

    # default is the stable damped model
    from pin_slam_tpu.config import Config
    assert Config().motion_model == "damped"


def test_color_tracker_geometric_call(trained_scene):
    """A tracker built with color_mode>0 must also serve geometry-only
    calls (the loop-closure registration passes no color args) — this
    crashed with 'NoneType not subscriptable' at the first closure of a
    colored SLAM run."""
    w = trained_scene
    tp = tk.TrackerParams(
        reg_iter_n=40, max_sdf_std=0.25, max_valid_residual_cm=15.0,
        weighted_first=True, mask_min_nn_count=6,
        color_mode=2, color_channel=3)
    track = jax.jit(tk.make_tracker(w["qp"], tp))
    pts1 = w["seq"].frame(1)
    cap = 2048
    sel = np.random.RandomState(1).permutation(len(pts1))[:cap]
    src = np.zeros((cap, 3), np.float32)
    src[: len(sel)] = pts1[sel]
    src_mask = jnp.arange(cap) < len(sel)
    T1 = w["seq"].poses[1].copy()
    T1[:3, 3] += np.array([0.05, -0.03, 0.02])
    res = track(w["state"], w["params"]["geo_features"],
                w["params"]["geo_mlp"], src, src_mask,
                jnp.asarray(T1, jnp.float32), w["lf"],
                jnp.zeros(3, jnp.float32))
    assert bool(res.valid)
