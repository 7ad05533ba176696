"""Integration tests: online mapping learns a usable SDF.

Mirrors the reference's implicit test strategy (end-to-end behavior, SURVEY
§4) but on analytic scenes with exact ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pin_slam_tpu.config import Config
from pin_slam_tpu.models import neural_points as npm
from pin_slam_tpu.models.decoder import init_mlp_params
from pin_slam_tpu.slam import map_query as mq
from pin_slam_tpu.slam import mapper as mp


@pytest.fixture(scope="module")
def plane_world():
    """A flat plane z=0 with samples labeled by true SDF (=z)."""
    cfg = Config()
    cfg.voxel_size_m = 0.4
    cfg.finalize()
    qp = mq.make_query_params(cfg)

    state = npm.init_map_state(1 << 12, 1 << 14, 8, color_on=False)
    g = np.stack(
        np.meshgrid(np.arange(-10, 10), np.arange(-10, 10), indexing="ij"), -1
    ).reshape(-1, 2) * 0.4
    pts = np.concatenate([g, np.zeros((g.shape[0], 1))], 1).astype(np.float32)
    td = jnp.zeros(8, jnp.float32)
    state, _ = npm.insert_points(
        state, jnp.asarray(pts), jnp.ones(len(pts), bool), 0, td,
        resolution=0.4, local_window_dist=100.0)

    pool = mp.init_pool(50_000, 1 << 12, False, 0)
    rng = np.random.RandomState(0)
    sp = pts[rng.randint(0, len(pts), 4096)] + rng.randn(4096, 3).astype(
        np.float32) * np.array([0.1, 0.1, 0.3], np.float32)
    pool = mp.append_samples(
        pool, jnp.asarray(sp), jnp.asarray(sp[:, 2].copy()),
        jnp.ones(4096), jnp.ones(4096, bool), 0)

    geo_mlp = init_mlp_params(jax.random.PRNGKey(7), 11, 64, 1, 1)
    params = {"geo_features": state.geo_features, "geo_mlp": geo_mlp}
    lf = mq.LocalFilter(travel_dist=td, cur_ts=jnp.int32(0),
                        local_window_dist=100.0)
    lk = dict(
        sigma_sigmoid_m=0.1, loss_weight_on=False, ekional_loss_on=True,
        weight_e=0.5, numerical_grad_eps=0.08, gradient_decimation=10,
        surface_sample_range_m=0.25)
    opt = optax.adam(0.01, eps=1e-15)
    ostate = opt.init(params)
    step = mp.make_train_step(qp, opt, bs=1024, bs_new=0,
                              train_decoder=True, loss_kwargs=lk)
    key = jax.random.PRNGKey(3)
    losses = []
    for _ in range(150):
        params, ostate, state, key, met = step(
            params, ostate, state, pool, key, lf, jnp.bool_(False))
        losses.append(float(met["sdf_loss"]))
    return dict(cfg=cfg, qp=qp, state=state, params=params, lf=lf,
                losses=losses)


class TestOnlineMapping:
    def test_loss_decreases(self, plane_world):
        losses = plane_world["losses"]
        assert losses[-1] < losses[0] * 0.75

    def test_sdf_accuracy_near_surface(self, plane_world):
        w = plane_world
        probe = np.zeros((200, 3), np.float32)
        probe[:, 0] = np.linspace(-3, 3, 200)
        probe[:, 1] = 0.7
        probe[:, 2] = np.linspace(-0.25, 0.25, 200)[
            np.random.RandomState(2).permutation(200)]
        out = mq.query_decode(
            w["state"], w["params"]["geo_features"], w["params"]["geo_mlp"],
            jnp.asarray(probe), w["qp"], lf=w["lf"])
        pred = np.asarray(out.sdf)
        gt = probe[:, 2]
        v = np.asarray(out.nn_count) >= 6
        assert v.mean() > 0.9
        corr = np.corrcoef(pred[v], gt[v])[0, 1]
        mae = np.abs(pred[v] - gt[v]).mean()
        assert corr > 0.97, f"corr={corr}"
        assert mae < 0.03, f"mae={mae}"

    def test_certainty_accumulates(self, plane_world):
        state = plane_world["state"]
        cnt = int(state.count)
        cert = np.asarray(state.certainty[:cnt])
        assert (cert > 0).mean() > 0.5
        # dump row must stay clean
        assert float(state.certainty[-1]) == 0.0

    def test_new_sample_detection(self, plane_world):
        w = plane_world
        state = w["state"]
        pool = mp.init_pool(10_000, 1 << 10, False, 0)
        # half near the trained plane (old), half far away (new)
        old_pts = np.zeros((64, 3), np.float32)
        old_pts[:, 0] = np.linspace(-2, 2, 64)
        new_pts = old_pts + np.array([100.0, 0, 0], np.float32)
        coords = jnp.asarray(np.concatenate([old_pts, new_pts]))
        sdf = jnp.zeros(128)
        pool = mp.append_samples(pool, coords, sdf, jnp.ones(128),
                                 jnp.ones(128, bool), 1)
        pool = mp.detect_new_samples(
            state, pool, coords, sdf, jnp.ones(128, bool), jnp.int32(0),
            resolution=0.4, new_certainty_thre=1.0,
            surface_sample_range_m=0.25)
        n_new = int(pool.new_count)
        new_idx = np.asarray(pool.new_idx[:n_new])
        # all far-away points flagged, most near-plane not
        assert (new_idx >= 64).sum() == 64
        assert n_new < 128


class TestPoolManagement:
    def test_append_and_ring_wrap(self):
        pool = mp.init_pool(100, 16, False, 0)
        c = jnp.ones((80, 3))
        pool = mp.append_samples(pool, c, jnp.zeros(80), jnp.ones(80),
                                 jnp.ones(80, bool), 0)
        assert int(pool.count) == 80
        assert int(pool.write_pos) == 80
        # second block doesn't fit -> ring wraps, overwriting the oldest
        pool = mp.append_samples(pool, 2 * c, jnp.zeros(80), jnp.ones(80),
                                 jnp.ones(80, bool), 1)
        assert int(pool.count) == 80
        assert int(pool.write_pos) == 80
        np.testing.assert_allclose(np.asarray(pool.coord[:80]), 2.0)

    def test_window_filter_marks_dead(self):
        pool = mp.init_pool(1000, 16, False, 0)
        near = np.zeros((50, 3), np.float32)
        far = np.full((50, 3), 100.0, np.float32)
        pool = mp.append_samples(
            pool, jnp.asarray(np.concatenate([near, far])), jnp.zeros(100),
            jnp.ones(100), jnp.ones(100, bool), 0)
        pool = mp.filter_pool(pool, jnp.zeros(3), 50.0, jax.random.PRNGKey(0))
        # out-of-window samples are dead (weight 0), in-window alive
        assert int(mp.pool_alive_count(pool)) == 50
        w = np.asarray(pool.weight[:100])
        assert (w[:50] > 0).all() and (w[50:] == 0).all()

    def test_capacity_eviction_by_ring(self):
        pool = mp.init_pool(64, 16, False, 0)
        rs = np.random.RandomState(0)
        for ts in range(3):
            pts = rs.randn(48, 3).astype(np.float32)
            pool = mp.append_samples(pool, jnp.asarray(pts), jnp.zeros(48),
                                     jnp.ones(48), jnp.ones(48, bool), ts)
        assert int(pool.count) <= 64
        # the newest block survives
        assert int(jnp.max(pool.ts[:48])) == 2


class TestCapacityGrowth:
    def test_grow_capacity_preserves_map(self):
        from pin_slam_tpu.models import neural_points as npm

        state = npm.init_map_state(1 << 10, 1 << 13, 8, False)
        rs = np.random.RandomState(0)
        pts = jnp.asarray(rs.rand(900, 3) * 20, jnp.float32)
        state, _ = npm.insert_points(
            state, pts, jnp.ones(900, bool), 0,
            jnp.zeros(16, jnp.float32), resolution=0.3,
            local_window_dist=100.0)
        n0 = int(state.count)
        pos0 = np.asarray(state.positions[:n0])
        grown = npm.grow_capacity(state, 1 << 12)
        assert grown.capacity == 1 << 12
        assert int(grown.count) == n0
        np.testing.assert_array_equal(np.asarray(grown.positions[:n0]), pos0)
        # grown map keeps accepting inserts past the old capacity
        more = jnp.asarray(rs.rand(3000, 3) * 20 + 40, jnp.float32)
        grown, _ = npm.insert_points(
            grown, more, jnp.ones(3000, bool), 1,
            jnp.zeros(16, jnp.float32), resolution=0.3,
            local_window_dist=100.0)
        assert int(grown.count) > 1 << 10

    def test_system_growth_end_to_end(self):
        """A run whose map exceeds the initial capacity must keep mapping
        (r1 VERDICT weak #5: silent truncation)."""
        from pin_slam_tpu.config import Config
        from pin_slam_tpu.dataset.synthetic import (
            SyntheticSequence, circle_trajectory, default_scene,
            lidar_directions)
        from pin_slam_tpu.slam.system import PinSLAMSystem

        cfg = Config()
        cfg.track_on = False
        cfg.max_range = 60.0
        cfg.min_range = 0.5
        cfg.vox_down_m = 0.08
        cfg.source_vox_down_m = 0.4
        cfg.voxel_size_m = 0.15     # fine voxels -> many points
        cfg.sigma_sigmoid_m = 0.1
        cfg.bs = 2048
        cfg.iters = 2
        cfg.init_iter_ratio = 2
        cfg.bs_new_sample = 512
        cfg.map_capacity = 1 << 12  # deliberately tiny
        cfg.buffer_size = 1 << 18
        cfg.frame_point_cap = 1 << 12
        cfg.source_point_cap = 1 << 11
        cfg.max_frames = 16
        cfg.pool_filter_freq = 1    # watchdog every frame
        cfg.finalize()
        cfg.pool_capacity = 300_000

        seq = SyntheticSequence(
            scene_sdf=default_scene(),
            poses=circle_trajectory(4, radius=6.0, revolutions=0.1,
                                    ease_in_frames=2),
            dirs=lidar_directions(256, 16), max_range=60.0)
        s = PinSLAMSystem(cfg)
        s.set_gt_poses(seq.poses)
        for fid in range(4):
            s.process_frame(fid, seq.frame(fid))
        assert s.config.map_capacity > 1 << 12, "capacity did not grow"
        assert int(s.state.count) > 1 << 12, \
            "map stopped at the original capacity"


class TestSortedCertainty:
    def test_matches_scatter(self):
        """accumulate_certainty_sorted == naive per-element scatter."""
        rng = np.random.RandomState(0)
        cap = 500
        m = 4096
        idx = rng.randint(0, cap + 1, m)  # cap = dump row
        w = rng.rand(m).astype(np.float32)
        w[idx == cap] = 0.0
        ts = rng.randint(0, 40, m)
        cert0 = rng.rand(cap + 1).astype(np.float32)
        cert0[cap] = 0.0
        ts0 = rng.randint(0, 10, cap + 1)
        ts0[cap] = 0

        cert, tsu = mp.accumulate_certainty_sorted(
            jnp.asarray(cert0), jnp.asarray(ts0),
            jnp.asarray(idx), jnp.asarray(w), jnp.asarray(ts), cap)

        ref_c = cert0.copy()
        ref_t = ts0.copy()
        for i in range(m):
            ref_c[idx[i]] += w[i]
            ref_t[idx[i]] = max(ref_t[idx[i]], ts[i])
        ref_c[cap] = 0.0
        ref_t[cap] = 0
        # csum-difference accumulation carries O(eps * total_weight)
        # absolute error (documented in accumulate_certainty_sorted);
        # certainty thresholds live at O(1)
        np.testing.assert_allclose(np.asarray(cert), ref_c, rtol=2e-4,
                                   atol=2e-3)
        assert np.array_equal(np.asarray(tsu), ref_t)


class TestSubsetCertaintyEquality:
    """The subset-mode training loop accumulates certainty/ts from ONE
    multiplicity-weighted pass over the per-frame subset instead of
    stacking every iteration's contributions (a 1.2M-row double sort at
    the bench shapes). The two must be numerically equal: a subset row's
    neighbors and IDW weights are frame-constant, so its run total is
    multiplicity x weight. This test runs the SAME loop with the legacy
    per-iteration emission (subset_cert_periter=True) and compares."""

    def _world(self, seed=0):
        import optax
        cfg = Config()
        cfg.voxel_size_m = 0.4
        cfg.finalize()
        qp = mq.make_query_params(cfg)
        state = npm.init_map_state(1 << 12, 1 << 14, 8, color_on=False)
        g = np.stack(np.meshgrid(np.arange(-8, 8), np.arange(-8, 8),
                                 indexing="ij"), -1).reshape(-1, 2) * 0.4
        pts = np.concatenate(
            [g, np.zeros((g.shape[0], 1))], 1).astype(np.float32)
        td = jnp.zeros(8, jnp.float32)
        state, _ = npm.insert_points(
            state, jnp.asarray(pts), jnp.ones(len(pts), bool), 0, td,
            resolution=0.4, local_window_dist=100.0)
        pool = mp.init_pool(20_000, 1 << 10, False, 0)
        rng = np.random.RandomState(seed)
        sp = pts[rng.randint(0, len(pts), 2000)] + rng.randn(
            2000, 3).astype(np.float32) * np.array(
            [0.1, 0.1, 0.3], np.float32)
        pool = mp.append_samples(
            pool, jnp.asarray(sp), jnp.asarray(sp[:, 2].copy()),
            jnp.ones(2000), jnp.ones(2000, bool), 0)
        # mark some rows "new" so the per-iteration new-sample tail (and
        # its multiplicity correction) is exercised, with new_count NOT a
        # multiple of bs_new
        n_new = 37
        pool = pool.replace(
            new_idx=pool.new_idx.at[:n_new].set(
                jnp.arange(100, 100 + n_new, dtype=jnp.int32)),
            new_count=jnp.int32(n_new))
        from pin_slam_tpu.ops.knn_join import build_local_set
        lset = build_local_set(
            state.positions, np.ones(state.capacity, bool), 0.4, 1 << 10,
            certainty=state.certainty, ts_update=state.ts_update)
        geo_mlp = init_mlp_params(jax.random.PRNGKey(7), 11, 64, 1, 1)
        params = {"geo_features": state.geo_features, "geo_mlp": geo_mlp}
        lf = mq.LocalFilter(travel_dist=td, cur_ts=jnp.int32(0),
                            local_window_dist=100.0)
        lk = dict(sigma_sigmoid_m=0.1, loss_weight_on=False,
                  ekional_loss_on=True, weight_e=0.5,
                  numerical_grad_eps=0.08, gradient_decimation=10,
                  surface_sample_range_m=0.25)
        opt = optax.adam(0.01, eps=1e-15)
        return dict(cfg=cfg, qp=qp, state=state, pool=pool, lset=lset,
                    params=params, lf=lf, lk=lk, opt=opt)

    @pytest.mark.parametrize("use_new,bs_new", [(True, 64), (False, 64),
                                                (True, 0)])
    def test_matches_periter(self, use_new, bs_new):
        w = self._world()
        outs = []
        for periter in (False, True):
            loop = mp.make_train_loop(
                w["qp"], w["opt"], n_iters=6, bs=256, bs_new=bs_new,
                train_decoder=True, loss_kwargs=w["lk"],
                subset_hist=512, subset_cert_periter=periter)
            params0 = jax.tree.map(jnp.copy, w["params"])
            ostate = w["opt"].init(params0)
            outs.append(loop(params0, ostate, w["state"], w["pool"],
                             jax.random.PRNGKey(5), w["lf"],
                             jnp.bool_(use_new), w["lset"]))
        (p_new, _, s_new, _, l_new), (p_old, _, s_old, _, l_old) = outs
        np.testing.assert_allclose(np.asarray(l_new), np.asarray(l_old),
                                   rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(p_new["geo_features"]),
            np.asarray(p_old["geo_features"]), atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(s_new.certainty), np.asarray(s_old.certainty),
            rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(s_new.ts_update), np.asarray(s_old.ts_update))
