"""Tests for marching tetrahedra and the mesher pipeline."""

import numpy as np
import pytest

from pin_slam_tpu.ops.marching import filter_small_clusters, marching_tetrahedra
from pin_slam_tpu.slam.mesher import Mesher, MeshConfig, write_ply
from pin_slam_tpu.utils.eval_mesh import eval_mesh, sample_mesh_points


def _sphere_grid(res=0.1, R=1.0, ext=1.5):
    g = np.arange(-ext, ext, res)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    return np.sqrt(X**2 + Y**2 + Z**2) - R, np.array([-ext] * 3)


class TestMarchingTetrahedra:
    def test_sphere_radius(self):
        sdf, origin = _sphere_grid()
        v, f = marching_tetrahedra(sdf, origin=origin, voxel_size=0.1)
        assert v.shape[0] > 1000
        r = np.linalg.norm(v, axis=1)
        assert abs(r.mean() - 1.0) < 0.005
        assert r.std() < 0.01

    def test_normals_outward(self):
        sdf, origin = _sphere_grid()
        v, f = marching_tetrahedra(sdf, origin=origin, voxel_size=0.1)
        tri = v[f]
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        c = tri.mean(1)
        assert ((n * c).sum(1) > 0).mean() > 0.99

    def test_watertight_euler(self):
        sdf, origin = _sphere_grid()
        v, f = marching_tetrahedra(sdf, origin=origin, voxel_size=0.1)
        edges = np.sort(
            np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [0, 2]]]), axis=1)
        E = np.unique(edges, axis=0).shape[0]
        assert v.shape[0] - E + f.shape[0] == 2  # sphere topology

    def test_mask(self):
        sdf, origin = _sphere_grid()
        mask = np.ones_like(sdf, bool)
        g = np.arange(-1.5, 1.5, 0.1)
        X = np.meshgrid(g, g, g, indexing="ij")[0]
        mask[X > 0] = False
        v, f = marching_tetrahedra(sdf, mask, origin=origin, voxel_size=0.1)
        assert v.shape[0] > 0
        assert v[:, 0].max() < 0.01

    def test_empty_grid(self):
        sdf = np.ones((8, 8, 8))
        v, f = marching_tetrahedra(sdf)
        assert v.shape[0] == 0 and f.shape[0] == 0

    def test_cluster_filter(self):
        sdf, origin = _sphere_grid()
        g = np.arange(-1.5, 1.5, 0.1)
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        sdf2 = np.minimum(sdf, np.sqrt((X - 1.2)**2 + Y**2 + Z**2) - 0.15)
        v, f = marching_tetrahedra(sdf2, origin=origin, voxel_size=0.1)
        f2 = filter_small_clusters(v, f, 300)
        kept = np.unique(f2)
        # only the big sphere remains
        assert np.linalg.norm(v[kept], axis=1).max() < 1.05


class TestMeshEval:
    def test_perfect_mesh_high_fscore(self):
        sdf, origin = _sphere_grid()
        v, f = marching_tetrahedra(sdf, origin=origin, voxel_size=0.1)
        pred = sample_mesh_points(v, f, 20000)
        rng = np.random.RandomState(0)
        d = rng.randn(20000, 3)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        m = eval_mesh(pred, d, threshold=0.05)
        assert m["F-score (%)"] > 99.0
        # chamfer at 20k samples is dominated by sampling spacing (~0.014 m)
        assert m["Chamfer_L1 (m)"] < 0.03

    def test_write_ply(self, tmp_path):
        sdf, origin = _sphere_grid(res=0.25)
        v, f = marching_tetrahedra(sdf, origin=origin, voxel_size=0.25)
        p = tmp_path / "m.ply"
        write_ply(str(p), v, f)
        head = p.read_text().splitlines()[:3]
        assert head[0] == "ply"


class TestChunking:
    def test_split_covers_bbox(self):
        lo = np.array([0.0, 0.0, -2.0])
        hi = np.array([250.0, 90.0, 10.0])
        chunks = Mesher.split_chunks(lo, hi, 100.0)
        assert len(chunks) == 3
        los = np.array([c[0] for c in chunks])
        his = np.array([c[1] for c in chunks])
        assert los.min(0)[0] == 0.0
        assert his.max(0)[0] == 250.0


class TestJoinModeOfflineQuery:
    """With probe_mode="join" the frame loop keeps no brick cache
    (maintain_btable=False) — lset-less queries (mesher grids, BA, dynamic
    filter) must fall back to the cell-table probe instead of reading the
    empty btable (which returns nn_count=0 everywhere and produced an
    empty gauntlet mesh on TPU)."""

    def test_lsetless_query_sees_points(self):
        import jax
        import jax.numpy as jnp
        from pin_slam_tpu.config import Config
        from pin_slam_tpu.models import neural_points as npm
        from pin_slam_tpu.models.decoder import init_mlp_params
        from pin_slam_tpu.slam import map_query as mq

        cfg = Config()
        cfg.voxel_size_m = 0.4
        cfg.probe_mode = "join"
        cfg.finalize()
        qp = mq.make_query_params(cfg)
        assert qp.probe_mode == "join"

        state = npm.init_map_state(1 << 12, 1 << 14, 8, color_on=False)
        g = np.stack(np.meshgrid(np.arange(-8, 8), np.arange(-8, 8),
                                 indexing="ij"), -1).reshape(-1, 2) * 0.4
        pts = np.concatenate(
            [g, np.zeros((g.shape[0], 1))], 1).astype(np.float32)
        # join-mode insert: brick cache NOT maintained
        state, _ = npm.insert_points(
            state, jnp.asarray(pts), jnp.ones(len(pts), bool), 0,
            jnp.zeros(8, jnp.float32), resolution=0.4,
            local_window_dist=100.0, maintain_btable=False)

        geo_mlp = init_mlp_params(jax.random.PRNGKey(0), 11, 64, 1, 1)
        probe = np.zeros((64, 3), np.float32)
        probe[:, 0] = np.linspace(-2, 2, 64)
        probe[:, 2] = 0.1
        out = mq.query_decode(state, state.geo_features, geo_mlp,
                              jnp.asarray(probe), qp)
        assert int(np.asarray(out.nn_count).min()) >= 6


def test_point_to_mesh_distance_exact():
    """Vectorized Ericson closest-point-on-triangle vs hand-computed
    distances for every Voronoi region of a triangle."""
    from pin_slam_tpu.utils.eval_mesh import point_to_mesh_distance
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
    f = np.array([[0, 1, 2]])
    pts = np.array([
        [0.2, 0.2, 0.5],    # above interior -> 0.5
        [2, 0, 0],          # beyond vertex B -> 1.0
        [0.5, -1, 0],       # below edge AB -> 1.0
        [1, 1, 0],          # beyond hypotenuse -> sqrt(2)/2
        [0.1, 0.1, 0.0],    # on the face -> 0
        [-1, -1, 0],        # vertex-A region -> sqrt(2)
    ])
    d = point_to_mesh_distance(pts, v, f)
    exp = [0.5, 1.0, 1.0, np.sqrt(2) / 2, 0.0, np.sqrt(2)]
    np.testing.assert_allclose(d, exp, atol=1e-12)

    # against brute-force sampled distance on a random mesh
    rng = np.random.RandomState(3)
    verts = rng.randn(30, 3)
    faces = rng.randint(0, 30, (40, 3))
    faces = faces[(faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
                  & (faces[:, 0] != faces[:, 2])]
    from pin_slam_tpu.utils.eval_mesh import sample_mesh_points
    dense = sample_mesh_points(verts, faces, 200_000, seed=1)
    q = rng.randn(100, 3) * 2
    d_exact = point_to_mesh_distance(q, verts, faces, k=len(faces))
    from scipy.spatial import cKDTree
    d_sampled, _ = cKDTree(dense).query(q)
    # exact <= sampled, and within the sampling resolution
    assert (d_exact <= d_sampled + 1e-9).all()
    np.testing.assert_allclose(d_exact, d_sampled, atol=0.05)
