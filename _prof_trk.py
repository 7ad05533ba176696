"""Tracker cost at bench shapes: in-jit reps + iteration counts."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

from pin_slam_tpu.config import Config
from pin_slam_tpu.models import neural_points as npm
from pin_slam_tpu.models.decoder import init_mlp_params
from pin_slam_tpu.slam import map_query as mq
from pin_slam_tpu.slam import tracker as tk

cfg = Config()
cfg.max_range = 80.0
cfg.voxel_size_m = 0.4
cfg.sigma_sigmoid_m = 0.08
cfg.reg_iter_n = 100
cfg.map_capacity = 1 << 20
cfg.buffer_size = 1 << 23
cfg.source_point_cap = 1 << 13
cfg.max_frames = 256
cfg.finalize()
c = cfg

rng = np.random.RandomState(0)
# plane-ish scene so tracking has structure
NPTS = 300_000
pts = np.zeros((NPTS, 3), np.float32)
pts[:, :2] = rng.rand(NPTS, 2) * 80 - 40
pts[:, 2] = 0.1 * np.sin(pts[:, 0]) + 0.1 * np.cos(pts[:, 1])
wall = rng.rand(NPTS // 3, 3).astype(np.float32)
state = npm.init_map_state(c.map_capacity, c.buffer_size, c.feature_dim, False)
state, _ = jax.jit(lambda s, p: npm.insert_points(
    s, p, jnp.ones(NPTS, bool), 0, jnp.zeros(c.max_frames, jnp.float32),
    resolution=c.voxel_size_m, local_window_dist=1e6))(state, jnp.asarray(pts))

qp = mq.make_query_params(c, after_pgo=False)
geo_mlp = init_mlp_params(jax.random.PRNGKey(7), 11, 64, 1, 1)
tp = tk.TrackerParams(
    reg_iter_n=c.reg_iter_n,
    min_grad_norm=c.reg_min_grad_norm,
    max_grad_norm=c.reg_max_grad_norm,
    gm_dist=c.reg_GM_dist_m,
    gm_grad=c.reg_GM_grad,
    lm_lambda=c.reg_lm_lambda,
    term_thre_deg=c.reg_term_thre_deg,
    term_thre_m=c.reg_term_thre_m,
    max_sdf_std=c.surface_sample_range_m * c.max_sdf_std_ratio,
    max_valid_residual_cm=(
        c.surface_sample_range_m * c.final_residual_ratio_thre * 100.0),
    min_valid_ratio=0.2,
    min_valid_points=30,
    mask_min_nn_count=c.track_mask_query_nn_k,
    eigenvalue_check=c.eigenvalue_check,
    eigenvalue_ratio_thre=c.eigenvalue_ratio_thre,
    weighted_first=c.weighted_first,
)
track = jax.jit(tk.make_tracker(qp, tp))

S = c.source_point_cap
src = jnp.asarray(pts[rng.randint(0, NPTS, S)], jnp.float32)
src_mask = jnp.ones(S, bool)
T0 = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.15).at[1, 3].set(-0.1)
anchor = jnp.zeros(3, jnp.float32)

res = track(state, state.geo_features, geo_mlp, src, src_mask, T0, None,
            anchor)
print("iters:", int(res.iterations), "valid:", bool(res.valid), flush=True)

REPS = 5
@jax.jit
def run(state, key):
    def body(i, acc):
        r = track(state, state.geo_features, geo_mlp,
                  src + acc * 1e-6, src_mask, T0, None, anchor)
        return acc + jnp.sum(r.pose[0]) * 1e-6 + r.iterations.astype(
            jnp.float32) * 1e-3
    return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

_ = float(run(state, jax.random.PRNGKey(0)))
t0 = time.time()
_ = float(run(state, jax.random.PRNGKey(1)))
print(f"track: {(time.time()-t0)/REPS*1e3:.2f} ms "
      f"({int(res.iterations)} iters)", flush=True)
