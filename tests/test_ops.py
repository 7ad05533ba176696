"""Unit tests for foundational ops: transforms, voxel downsample, hashing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pin_slam_tpu.ops import hash3d, transforms
from pin_slam_tpu.ops.voxel import (
    voxel_down_sample_mask,
    voxel_down_sample_min_value_mask,
)


class TestTransforms:
    def test_so3_exp_identity(self):
        R = transforms.so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_so3_exp_known_rotation(self):
        # 90 deg about z
        R = transforms.so3_exp(jnp.array([0.0, 0.0, np.pi / 2]))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_so3_exp_orthonormal_batch(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (32, 3))
        R = transforms.so3_exp(w)
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)),
                                   atol=1e-5)

    def test_rotation_angle(self):
        w = jnp.array([0.3, -0.2, 0.1])
        R = transforms.so3_exp(w)
        assert abs(float(transforms.rotation_angle(R)) -
                   float(jnp.linalg.norm(w))) < 1e-5

    def test_quat_rotmat_roundtrip(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
        R = transforms.so3_exp(w)
        q = transforms.rotmat_to_quat(R)
        v = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
        rv = jnp.einsum("nij,nj->ni", R, v)
        qv = transforms.quat_rotate(q, v)
        np.testing.assert_allclose(rv, qv, atol=1e-4)

    def test_quat_multiply_matches_matrix_product(self):
        wa = jnp.array([0.2, 0.1, -0.4])
        wb = jnp.array([-0.1, 0.5, 0.3])
        Ra, Rb = transforms.so3_exp(wa), transforms.so3_exp(wb)
        qa = transforms.rotmat_to_quat(Ra)
        qb = transforms.rotmat_to_quat(Rb)
        qab = transforms.quat_multiply(qa, qb)
        v = jnp.array([1.0, -2.0, 0.5])
        np.testing.assert_allclose(
            transforms.quat_rotate(qab, v), Ra @ (Rb @ v), atol=1e-5)

    def test_transform_points(self):
        T = np.eye(4)
        T[:3, :3] = np.asarray(transforms.so3_exp(jnp.array([0.1, 0.2, 0.3])))
        T[:3, 3] = [1.0, 2.0, 3.0]
        pts = np.random.RandomState(0).randn(10, 3).astype(np.float32)
        got = transforms.transform_points(jnp.asarray(pts), jnp.asarray(T))
        want = pts @ T[:3, :3].T + T[:3, 3]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_np_slerp_endpoints(self):
        R = np.asarray(transforms.so3_exp(jnp.array([0.0, 0.0, 0.6])),
                       dtype=np.float64)
        out = transforms.np_slerp_rotmats(R, np.array([0.0, 1.0]))
        np.testing.assert_allclose(out[0], np.eye(3), atol=1e-9)
        np.testing.assert_allclose(out[1], R, atol=1e-7)


class TestVoxelDownsample:
    def test_one_point_per_voxel(self):
        rng = np.random.RandomState(42)
        pts = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
        mask = jnp.ones(2000, dtype=bool)
        keep = voxel_down_sample_mask(jnp.asarray(pts), mask, 0.5)
        kept = pts[np.asarray(keep)]
        vox = np.floor(kept / 0.5).astype(int)
        uniq = np.unique(vox, axis=0)
        assert uniq.shape[0] == kept.shape[0]  # exactly one per voxel
        # every occupied voxel is represented
        all_vox = np.unique(np.floor(pts / 0.5).astype(int), axis=0)
        assert uniq.shape[0] == all_vox.shape[0]

    def test_closest_to_center_wins(self):
        pts = jnp.array([[0.45, 0.45, 0.45], [0.26, 0.26, 0.26],
                         [0.05, 0.05, 0.05]])
        keep = voxel_down_sample_mask(pts, jnp.ones(3, bool), 1.0)
        # voxel center is (0.5,0.5,0.5): first point is closest
        assert np.asarray(keep).tolist() == [True, False, False]

    def test_mask_respected(self):
        pts = jnp.array([[0.45, 0.45, 0.45], [0.4, 0.4, 0.4]])
        keep = voxel_down_sample_mask(pts, jnp.array([False, True]), 1.0)
        assert np.asarray(keep).tolist() == [False, True]

    def test_min_value_selection(self):
        pts = jnp.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [3.0, 3.0, 3.0]])
        val = jnp.array([5.0, 1.0, 2.0])
        keep = voxel_down_sample_min_value_mask(pts, jnp.ones(3, bool), 1.0, val)
        assert np.asarray(keep).tolist() == [False, True, True]

    def test_negative_coords(self):
        pts = jnp.array([[-0.9, -0.9, -0.9], [-0.1, -0.1, -0.1]])
        keep = voxel_down_sample_mask(pts, jnp.ones(2, bool), 1.0)
        assert int(np.sum(np.asarray(keep))) == 1


class TestHash:
    def test_hash_range(self):
        g = jnp.array([[0, 0, 0], [-5, 3, 100], [1000, -1000, 7]], jnp.int32)
        h = hash3d.hash_grid(g, 1 << 16)
        assert np.all(np.asarray(h) >= 0)
        assert np.all(np.asarray(h) < (1 << 16))

    def test_hash_deterministic(self):
        g = jnp.array([[1, 2, 3]], jnp.int32)
        assert int(hash3d.hash_grid(g, 1024)[0]) == int(
            hash3d.hash_grid(g, 1024)[0])

    def test_neighbor_offsets_count(self):
        # reference comment: cells=2, alpha=0.5 -> K=81; alpha=0.2 -> K=33
        # (reference: model/neural_points.py:939-943)
        assert hash3d.neighbor_offsets(2, 0.5).shape[0] == 81
        assert hash3d.neighbor_offsets(2, 0.2).shape[0] == 33
        assert hash3d.neighbor_offsets(2, 1.0).shape[0] == 93
        assert hash3d.neighbor_offsets(3, 0.2).shape[0] == 147


class TestProbeModes:
    """Brick (TPU layout) and cells probes must agree: same candidates, same
    top-k sets (ranking may tie-break differently at ~mm quantization)."""

    def _build(self, n_pts=3000, seed=0):
        import jax
        import jax.numpy as jnp
        from pin_slam_tpu.models import neural_points as npm
        rng = np.random.RandomState(seed)
        pts = rng.randn(n_pts, 3).astype(np.float32) * 8.0
        state = npm.init_map_state(1 << 13, 1 << 17, 8, False)
        state, _ = jax.jit(lambda s, p: npm.insert_points(
            s, p, jnp.ones(n_pts, bool), 3,
            jnp.arange(16, dtype=jnp.float32),
            resolution=0.3, local_window_dist=100.0))(state, jnp.asarray(pts))
        return state, pts

    def test_brick_matches_cells(self):
        import jax.numpy as jnp
        from pin_slam_tpu.models import neural_points as npm
        from pin_slam_tpu.ops import hash3d
        state, pts = self._build()
        rng = np.random.RandomState(1)
        q = jnp.asarray(pts[rng.randint(0, len(pts), 256)]
                        + rng.randn(256, 3).astype(np.float32) * 0.1)
        kw = dict(offsets=hash3d.neighbor_offsets(2, 0.2), resolution=0.3,
                  nn_k=6, max_dist2=hash3d.max_valid_dist2(2, 0.3))
        qa = npm.query_neighbors(state, q, probe_mode="cells", **kw)
        qb = npm.query_neighbors(state, q, probe_mode="brick", **kw)
        # nn_count may differ on cell-table hash aliases: the brick cache
        # keeps one slot per cell, so it still finds occupants whose
        # cell-table entry was overwritten by a colliding cell (the brick
        # path is strictly closer to the true neighborhood)
        na, nb = np.asarray(qa.nn_count), np.asarray(qb.nn_count)
        assert (na != nb).mean() < 0.15
        # same neighbor SETS per query (order may differ on quantized ties)
        ia = np.sort(np.where(np.asarray(qa.valid), np.asarray(qa.idx), -1))
        ib = np.sort(np.where(np.asarray(qb.valid), np.asarray(qb.idx), -1))
        agree = (ia == ib).all(axis=1).mean()
        assert agree > 0.9, agree

    def test_brick_time_filter(self):
        import jax.numpy as jnp
        from pin_slam_tpu.models import neural_points as npm
        from pin_slam_tpu.ops import hash3d
        state, pts = self._build()
        q = jnp.asarray(pts[:128])
        kw = dict(offsets=hash3d.neighbor_offsets(2, 0.2), resolution=0.3,
                  nn_k=6, max_dist2=hash3d.max_valid_dist2(2, 0.3),
                  time_filter=True,
                  travel_dist=jnp.arange(16, dtype=jnp.float32),
                  cur_ts=jnp.int32(10), local_window_dist=2.0)
        # all points were created at ts=3, travel diff 7 >= 2 -> all masked
        for mode in ("cells", "brick"):
            qn = npm.query_neighbors(state, q, probe_mode=mode, **kw)
            assert int(qn.nn_count.max()) == 0, mode


class TestMidTsWindow:
    """use_mid_ts windows by (create+update)/2 (reference reset_local_map,
    model/neural_points.py:449-452) so re-observed geometry stays in the
    local map."""

    def test_reobserved_points_stay_local(self):
        import jax.numpy as jnp
        from pin_slam_tpu.models import neural_points as npm
        from pin_slam_tpu.ops import hash3d

        rng = np.random.RandomState(0)
        pts = rng.randn(500, 3).astype(np.float32) * 5.0
        state = npm.init_map_state(1 << 11, 1 << 15, 8, False)
        td = jnp.arange(32, dtype=jnp.float32)  # 1 m of travel per frame
        ins = lambda s, ts: npm.insert_points(
            s, jnp.asarray(pts), jnp.ones(len(pts), bool), ts, td,
            resolution=0.3, local_window_dist=100.0)[0]
        state = ins(state, 0)       # created at ts 0
        # re-observation refreshes ts_update during training (reference
        # assign_local_to_global, model/neural_points.py:526; here
        # accumulate_certainty) — simulate a trained re-observation at 20
        state = state.replace(ts_update=jnp.where(
            jnp.arange(state.capacity + 1) < state.count, 20,
            state.ts_update))       # mid ts = (0+20)/2 = 10

        kw = dict(offsets=hash3d.neighbor_offsets(2, 0.2), resolution=0.3,
                  nn_k=6, max_dist2=hash3d.max_valid_dist2(2, 0.3),
                  time_filter=True, travel_dist=td, cur_ts=jnp.int32(20),
                  local_window_dist=15.0)  # window excludes ts<5
        q = jnp.asarray(pts[:64])
        for mode in ("cells", "brick"):
            strict = npm.query_neighbors(state, q, probe_mode=mode,
                                         use_mid_ts=False, **kw)
            mid = npm.query_neighbors(state, q, probe_mode=mode,
                                      use_mid_ts=True, **kw)
            assert int(strict.nn_count.max()) == 0, mode
            # >95%: the remainder are insert-time hash-collision dedups
            # with no other point inside the search ball
            assert (np.asarray(mid.nn_count) >= 1).mean() > 0.95, mode

        m_strict = npm.local_map_mask(state, td, jnp.int32(20), 15.0)
        m_mid = npm.local_map_mask(state, td, jnp.int32(20), 15.0,
                                   use_mid_ts=True)
        assert int(m_strict.sum()) == 0
        assert int(m_mid.sum()) == int(state.count)


class TestTopkSelectMask:
    def test_matches_argmin_rounds(self):
        """topk_select_mask == k rounds of argmin+mask (incl. exact ties
        and BIG_DIST2 sentinel rows, which the caller's valid-mask
        removes)."""
        import jax
        import jax.numpy as jnp
        from pin_slam_tpu.models import neural_points as npm
        from pin_slam_tpu.slam.map_query import topk_select_mask
        rng = np.random.RandomState(3)
        d = rng.rand(257, 12).astype(np.float32)
        # inject ties and BIG sentinels
        d[::5, 3] = d[::5, 7]
        d[::3, 10:] = npm.BIG_DIST2
        d[7, :] = npm.BIG_DIST2
        d2m = jnp.asarray(d)
        k = 6
        sel_ref = jnp.zeros(d.shape, bool)
        dwork = d2m
        for _ in range(k):
            a = jnp.argmin(dwork, axis=-1)
            hit = jax.nn.one_hot(a, d.shape[-1], dtype=bool)
            ok = jnp.take_along_axis(dwork, a[..., None], -1)[..., 0] \
                < npm.BIG_DIST2
            sel_ref = sel_ref | (hit & ok[..., None])
            dwork = jnp.where(hit, npm.BIG_DIST2, dwork)
        sel = topk_select_mask(d2m, k)
        valid = d2m < npm.BIG_DIST2
        np.testing.assert_array_equal(np.asarray(sel & valid),
                                      np.asarray(sel_ref & valid))
