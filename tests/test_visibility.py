"""Multi-viewpoint visibility dynamic filter (ops/visibility.py).

Analytic cases: a ring "wall" map around an origin; measurements in front
of the wall (previously seen-through space) must be flagged free/dynamic,
wall hits / occluded space / frontier (empty bins) / out-of-range or
out-of-FOV locations must all be kept (conservative-static bias).
System-level: a static scene run must produce ~zero false dynamics.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pin_slam_tpu.ops.visibility import (
    render_min_range_bins, visibility_free_mask)

EL = 0.6


def ring_wall(radius=20.0, n=4000, z_lo=-2.0, z_hi=2.0, seed=0):
    rng = np.random.RandomState(seed)
    az = rng.uniform(-np.pi, np.pi, n)
    z = rng.uniform(z_lo, z_hi, n)
    return np.stack([radius * np.cos(az), radius * np.sin(az), z], 1)


def judge(origins, map_pts, queries, **kw):
    origins = jnp.asarray(origins, jnp.float32)
    pts = jnp.asarray(map_pts, jnp.float32)
    q = jnp.asarray(queries, jnp.float32)
    img = render_min_range_bins(
        origins, pts, jnp.ones(pts.shape[0], bool),
        n_az=256, n_el=32, el_lo=-EL, el_hi=EL)
    kw.setdefault("margin_m", 0.4)
    kw.setdefault("max_judge_range", 22.0)
    return np.asarray(visibility_free_mask(
        origins, img, q, jnp.ones(q.shape[0], bool),
        el_lo=-EL, el_hi=EL, **kw))


class TestVisibilityOp:
    def test_front_of_wall_is_free(self):
        dyn = judge([[0, 0, 0]], ring_wall(),
                    [[12.0, 0, 0], [0, -10.0, 0.5]])
        assert dyn.tolist() == [True, True]

    def test_wall_hit_and_behind_wall_are_static(self):
        dyn = judge([[0, 0, 0]], ring_wall(),
                    [[19.9, 0, 0], [21.5, 0, 0]])
        assert dyn.tolist() == [False, False]

    def test_beyond_judge_range_is_static(self):
        # location in front of mapped geometry but outside what the origin
        # could have observed (range gate) must not be judged
        wall = ring_wall(radius=40.0)
        dyn = judge([[0, 0, 0]], wall, [[25.0, 0, 0]],
                    max_judge_range=22.0)
        assert dyn.tolist() == [False]

    def test_out_of_elevation_fov_is_static(self):
        dyn = judge([[0, 0, 0]], ring_wall(), [[2.0, 0, 5.0]])
        assert dyn.tolist() == [False]

    def test_empty_bins_unjudgeable(self):
        # map covering only one azimuth sector: queries toward the empty
        # sector (frontier) are kept even though they are "in front of"
        # nothing
        wall = ring_wall()
        sector = wall[np.arctan2(wall[:, 1], wall[:, 0]) > 2.0]
        dyn = judge([[0, 0, 0]], sector, [[12.0, 0, 0]])
        assert dyn.tolist() == [False]

    def test_second_origin_recovers_occluded_view(self):
        # from origin A the query hides behind a near plate (occluded =
        # static); origin B sees past the plate edge -> judged free
        wall = ring_wall()
        plate = np.stack([np.full(200, 5.0),
                          np.random.RandomState(1).uniform(-1, 1, 200),
                          np.random.RandomState(2).uniform(-1, 1, 200)], 1)
        pts = np.concatenate([wall, plate])
        q = [[12.0, 0.0, 0.0]]
        assert judge([[0, 0, 0]], pts, q).tolist() == [False]
        assert judge([[0, 0, 0], [0, 14.0, 0]], pts, q,
                     min_votes=1).tolist() == [True]
        # default 2-of-H vote: one occluded view withholds the verdict
        assert judge([[0, 0, 0], [0, 14.0, 0]], pts, q,
                     min_votes=2).tolist() == [False]
        # two clear views agree -> dynamic even at min_votes=2
        assert judge([[0, 14.0, 0], [0, -14.0, 0]], pts, q,
                     min_votes=2).tolist() == [True]

    def test_min_dilation_is_conservative_at_holes(self):
        # knock a small azimuth hole into the wall: a wall-range query in
        # the hole direction must still be static (3x3 min-dilation pulls
        # the neighbors' wall range in; without it the bin would render
        # empty->any closer background would misjudge)
        wall = ring_wall(n=20000)
        az = np.arctan2(wall[:, 1], wall[:, 0])
        holed = wall[np.abs(az) > 0.012]          # ~1 bin at n_az=256
        dyn = judge([[0, 0, 0]], holed, [[19.9, 0, 0]])
        assert dyn.tolist() == [False]


class TestSystemVisibilityFilter:
    def test_static_scene_no_false_dynamics(self):
        from pin_slam_tpu.dataset.synthetic import (
            SyntheticSequence, circle_trajectory, default_scene,
            lidar_directions)
        from pin_slam_tpu.slam.system import PinSLAMSystem
        from tests.test_slam_e2e import small_config

        cfg = small_config()
        cfg.dynamic_filter_on = True
        cfg.visibility_filter_on = True
        cfg.visibility_hist_offsets = (3, 6)
        seq = SyntheticSequence(
            scene_sdf=default_scene(),
            poses=circle_trajectory(10, radius=6.0, revolutions=0.11),
            dirs=lidar_directions(512, 32), max_range=60.0)
        system = PinSLAMSystem(cfg)
        rejected = []
        for fid in range(len(seq)):
            system.process_frame(fid, seq.frame(fid))
            if fid >= 6 and system.last_static_mask is not None:
                sm = np.asarray(system.last_static_mask)
                n = int(system.last_train_n)
                rejected.append((~sm[:n]).mean())
        assert not system.lose_track
        assert max(rejected) < 0.01, f"false dynamics: {rejected}"
