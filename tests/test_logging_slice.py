"""Vertical SDF slice (reference: utils/mesher.py:458-504) and the
metrics logger (reference: utils/tools.py:207-222)."""

import json
import os

import numpy as np


def test_metrics_logger_jsonl(tmp_path):
    from pin_slam_tpu.config import Config
    from pin_slam_tpu.utils.logger import MetricsLogger

    c = Config()
    c.wandb_vis_on = False
    lg = MetricsLogger(c, str(tmp_path))
    lg.log({"loss": 0.5, "note": "x"}, step=3)
    lg.log({"loss": np.float32(0.25)}, step=4)
    lg.finish()
    rows = [json.loads(line) for line in
            open(tmp_path / "log" / "metrics.jsonl")]
    assert rows[0]["loss"] == 0.5 and rows[0]["step"] == 3
    assert rows[0]["note"] == "x"
    assert abs(rows[1]["loss"] - 0.25) < 1e-9


def test_sdf_slice_axes():
    """Horizontal and vertical slices share the line x=0, z=0 — the SDF
    values along it must agree exactly."""
    import jax
    import jax.numpy as jnp
    from pin_slam_tpu.config import Config
    from pin_slam_tpu.models import neural_points as npm
    from pin_slam_tpu.models.decoder import init_mlp_params
    from pin_slam_tpu.slam import map_query as mq
    from pin_slam_tpu.slam.mesher import Mesher, MeshConfig

    cfg = Config()
    cfg.voxel_size_m = 0.4
    cfg.finalize()
    qp = mq.make_query_params(cfg)
    state = npm.init_map_state(1 << 12, 1 << 14, 8, color_on=False)
    g = np.stack(np.meshgrid(np.arange(-8, 8), np.arange(-8, 8),
                             indexing="ij"), -1).reshape(-1, 2) * 0.4
    pts = np.concatenate([g, np.zeros((g.shape[0], 1))], 1).astype(
        np.float32)
    state, _ = npm.insert_points(
        state, jnp.asarray(pts), jnp.ones(len(pts), bool), 0,
        jnp.zeros(8, jnp.float32), resolution=0.4, local_window_dist=100.0)
    params = {"geo_features": state.geo_features,
              "geo_mlp": init_mlp_params(jax.random.PRNGKey(7), 11, 64,
                                         1, 1)}
    mesher = Mesher(qp, MeshConfig(mc_res_m=0.25, mesh_min_nn=3,
                                   infer_bs=1 << 12))
    center = np.zeros(3)
    # horizontal slice at z=0
    xs, ys, sdf_h = mesher.sdf_slice(
        state, params["geo_features"], params["geo_mlp"],
        center, extent=2.0, height=0.0, res=0.5)
    # vertical slice at x=0 -> in-plane axes are (y, z)
    us, vs, sdf_v = mesher.sdf_slice(
        state, params["geo_features"], params["geo_mlp"],
        center, extent=2.0, height=0.0, res=0.5, axis="x")
    assert sdf_h.shape == (len(xs), len(ys))
    assert sdf_v.shape == (len(us), len(vs))
    assert np.isfinite(sdf_h).all() and np.isfinite(sdf_v).all()
    # the two slices share the line x=0, z=0: sdf_h[x=0, :] over y must
    # match sdf_v[:, z=0] over y
    ix = int(np.argmin(np.abs(xs)))
    iz = int(np.argmin(np.abs(vs)))
    np.testing.assert_allclose(sdf_h[ix, :], sdf_v[:, iz], atol=1e-4)
