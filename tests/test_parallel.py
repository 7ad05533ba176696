"""Multi-chip data parallelism tests (8 virtual CPU devices via conftest).

The reference is single-GPU (SURVEY §2.2); the DP mapping loop and sharded
mesher are the TPU-native scaling axes. These tests assert the PRODUCTION
code paths (mapper.make_train_loop(mesh=...), Mesher(mesh=...),
PinSLAMSystem with cfg.dp_on) are numerically faithful:

* the DP loop's update equals the average of the 8 per-device gradients a
  sequential single-device run computes with the same folded keys,
* the sharded mesher returns the same SDF grid as the unsharded one,
* a full PinSLAMSystem runs end-to-end with dp_on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pin_slam_tpu.config import Config
from pin_slam_tpu.models import neural_points as npm
from pin_slam_tpu.models.decoder import init_mlp_params
from pin_slam_tpu.parallel import dp
from pin_slam_tpu.slam import map_query as mq
from pin_slam_tpu.slam import mapper as mp

NDEV = 8


@pytest.fixture(scope="module")
def sphere_setup():
    """Small map + replay pool around an analytic sphere."""
    cfg = Config()
    cfg.voxel_size_m = 0.3
    cfg.finalize()
    qp = mq.make_query_params(cfg)

    rng = np.random.RandomState(0)
    d = rng.randn(3000, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = (d * 5.0).astype(np.float32)
    state = npm.init_map_state(1 << 13, 1 << 15, cfg.feature_dim, False)
    td = jnp.zeros(16, jnp.float32)
    state, _ = npm.insert_points(
        state, jnp.asarray(pts), jnp.ones(len(pts), bool), 0, td,
        resolution=cfg.voxel_size_m, local_window_dist=100.0)

    pool = mp.init_pool(20_000, 1 << 10, False, 0)
    sp = pts[rng.randint(0, len(pts), 8192)] \
        + rng.randn(8192, 3).astype(np.float32) * 0.15
    sdf = np.linalg.norm(sp, axis=1) - 5.0
    pool = mp.append_samples(
        pool, jnp.asarray(sp), jnp.asarray(sdf.astype(np.float32)),
        jnp.ones(8192), jnp.ones(8192, bool), 0)

    geo_mlp = init_mlp_params(
        jax.random.PRNGKey(7), cfg.feature_dim + 3, 64, 1, 1)
    params = {"geo_features": state.geo_features, "geo_mlp": geo_mlp}
    lf = mq.LocalFilter(travel_dist=td, cur_ts=jnp.int32(0),
                        local_window_dist=100.0)
    lk = dict(
        sigma_sigmoid_m=0.1, loss_weight_on=False, ekional_loss_on=True,
        weight_e=0.5, numerical_grad_eps=0.06, gradient_decimation=10,
        surface_sample_range_m=0.25)
    return dict(cfg=cfg, qp=qp, state=state, params=params, pool=pool,
                lf=lf, lk=lk)


class TestDPTrainLoop:
    N_ITERS = 3
    BS = 512

    def _sequential_reference(self, s, key):
        """Single-device mimic of the DP loop: average the NDEV per-device
        gradients drawn with the same folded keys, apply one shared Adam
        update, sum the certainty deltas."""
        qp, lf, lk = s["qp"], s["lf"], s["lk"]
        optimizer = optax.adam(Config().lr, eps=Config().adam_eps)
        params = jax.tree.map(jnp.copy, s["params"])
        state = s["state"]
        opt_state = optimizer.init(params)
        grad_fn = jax.jit(
            lambda p, st, bidx, kc: jax.value_and_grad(
                mp.mapping_loss, has_aux=True)(
                p, st, s["pool"], bidx, qp, lf, key=kc, **lk),
            static_argnames=())

        keys = jax.random.split(key, self.N_ITERS + 1)
        losses = []
        for it_key in keys[1:]:
            kb, kc = jax.random.split(it_key)
            gsum = None
            lsum = 0.0
            cert = state.certainty
            tsu = state.ts_update
            C = state.capacity
            for dev in range(NDEV):
                bidx = mp.draw_batch_indices(
                    jax.random.fold_in(kb, dev), s["pool"], self.BS, 0,
                    jnp.bool_(False))
                (loss, aux), grads = grad_fn(
                    params, state, bidx, jax.random.fold_in(kc, dev))
                lsum += float(loss)
                gsum = grads if gsum is None else jax.tree.map(
                    jnp.add, gsum, grads)
                qn, w = aux["qn"], aux["w"]
                idx = jnp.where(qn.valid, qn.idx, C).reshape(-1)
                cert = cert.at[idx].add(
                    jnp.where(qn.valid, w, 0.0).reshape(-1)).at[C].set(0.0)
                tsb = jnp.broadcast_to(
                    aux["ts"][:, None], qn.idx.shape).reshape(-1)
                tsu = tsu.at[idx].max(
                    jnp.where(qn.valid.reshape(-1), tsb, 0)).at[C].set(0)
            grads = jax.tree.map(lambda g: g / NDEV, gsum)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            state = state.replace(certainty=cert, ts_update=tsu)
            losses.append(lsum / NDEV)
        return params, state, np.asarray(losses)

    def test_matches_sequential_average(self, sphere_setup):
        s = sphere_setup
        mesh = dp.make_mesh(NDEV)
        optimizer = optax.adam(Config().lr, eps=Config().adam_eps)
        loop = mp.make_train_loop(
            s["qp"], optimizer, n_iters=self.N_ITERS, bs=self.BS, bs_new=0,
            train_decoder=True, loss_kwargs=s["lk"], mesh=mesh)
        key = jax.random.PRNGKey(11)
        params0 = jax.tree.map(jnp.copy, s["params"])
        opt_state = optimizer.init(params0)
        params_dp, _, state_dp, _, losses_dp = loop(
            params0, opt_state, s["state"], s["pool"], key, s["lf"],
            jnp.bool_(False), None)

        params_ref, state_ref, losses_ref = self._sequential_reference(
            s, key)

        np.testing.assert_allclose(
            np.asarray(losses_dp), losses_ref, rtol=1e-4, atol=1e-5)
        for k in ("geo_features",):
            np.testing.assert_allclose(
                np.asarray(params_dp[k]), np.asarray(params_ref[k]),
                rtol=1e-4, atol=1e-5)
        for la, lb in zip(jax.tree.leaves(params_dp["geo_mlp"]),
                          jax.tree.leaves(params_ref["geo_mlp"])):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(state_dp.certainty), np.asarray(state_ref.certainty),
            rtol=1e-4, atol=1e-4)
        assert np.array_equal(np.asarray(state_dp.ts_update),
                              np.asarray(state_ref.ts_update))

    def test_dp_loss_decreases(self, sphere_setup):
        s = sphere_setup
        mesh = dp.make_mesh(NDEV)
        optimizer = optax.adam(1e-2, eps=1e-15)
        loop = mp.make_train_loop(
            s["qp"], optimizer, n_iters=25, bs=self.BS, bs_new=0,
            train_decoder=True, loss_kwargs=s["lk"], mesh=mesh)
        params0 = jax.tree.map(jnp.copy, s["params"])
        opt_state = optimizer.init(params0)
        _, _, _, _, losses = loop(
            params0, opt_state, s["state"], s["pool"],
            jax.random.PRNGKey(0), s["lf"], jnp.bool_(False), None)
        losses = np.asarray(losses)
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.8


class TestShardedMesher:
    def test_matches_unsharded(self, sphere_setup):
        from pin_slam_tpu.slam.mesher import Mesher, MeshConfig

        s = sphere_setup
        mc = MeshConfig(mc_res_m=0.5, infer_bs=1 << 12, mesh_min_nn=1)
        plain = Mesher(s["qp"], mc)
        sharded = Mesher(s["qp"], mc, mesh=dp.make_mesh(NDEV))
        origin = np.array([-6.5, -6.5, -6.5])
        dims = (27, 27, 27)
        args = (s["state"], s["params"]["geo_features"],
                s["params"]["geo_mlp"], origin, dims)
        sdf_a, nn_a = plain.query_sdf_grid(*args)
        sdf_b, nn_b = sharded.query_sdf_grid(*args)
        assert np.array_equal(nn_a, nn_b)
        np.testing.assert_allclose(sdf_a, sdf_b, rtol=1e-5, atol=1e-6)


class TestSystemDP:
    def test_system_runs_with_dp(self):
        """Full production path: PinSLAMSystem with cfg.dp_on trains the
        map through the shard_map DP loop on the 8-device mesh."""
        from pin_slam_tpu.slam.system import PinSLAMSystem

        cfg = Config()
        cfg.track_on = True
        cfg.max_range = 30.0
        cfg.min_range = 0.3
        cfg.vox_down_m = 0.1
        cfg.source_vox_down_m = 0.5
        cfg.voxel_size_m = 0.3
        cfg.map_capacity = 1 << 13
        cfg.buffer_size = 1 << 15
        cfg.frame_point_cap = 1 << 11
        cfg.source_point_cap = 1 << 9
        cfg.max_frames = 16
        cfg.iters = 3
        cfg.init_iter_ratio = 2
        cfg.bs = 1024
        cfg.bs_new_sample = 128
        cfg.pool_capacity = 60_000
        cfg.dp_on = True
        cfg.finalize()

        system = PinSLAMSystem(cfg)
        assert system.mesh is not None
        assert len(system.mesh.devices.ravel()) == NDEV

        rng = np.random.RandomState(3)
        poses = [np.eye(4) for _ in range(3)]
        for i, T in enumerate(poses):
            T[0, 3] = 0.3 * i
        system.set_gt_poses(np.stack(poses))
        for fid in range(3):
            # a box room around the sensor
            d = rng.randn(2500, 3).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            t = np.min(
                np.abs(np.array([8.0, 6.0, 3.0]) / (np.abs(d) + 1e-6)),
                axis=1)
            pts = d * t[:, None]
            pose = system.process_frame(fid, pts)
            assert np.isfinite(pose).all()
        assert np.isfinite(
            np.asarray(system.params["geo_features"])).all()
        assert float(system.last_train_metrics["loss"]) < 1e3
