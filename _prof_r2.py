"""Round-2 primitive profiling at bench shapes (in-jit fori_loop reps).

Measures, on the real TPU:
  - scatter/gather row throughput at the shapes the frame uses
  - train-step component costs (query fwd, fwd+bwd, adam, certainty)
  - frame_update (sampler/insert/append/detect) component costs
  - tracker per-iteration cost + iteration count on bench-like data
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

from pin_slam_tpu.config import Config
from pin_slam_tpu.models import neural_points as npm
from pin_slam_tpu.models.decoder import init_mlp_params
from pin_slam_tpu.models.sampler import sample_training_points
from pin_slam_tpu.slam import map_query as mq
from pin_slam_tpu.slam import mapper as mp

cfg = Config()
cfg.max_range = 80.0
cfg.voxel_size_m = 0.4
cfg.sigma_sigmoid_m = 0.08
cfg.surface_sample_range_m = 0.25
cfg.surface_sample_n = 4
cfg.bs = 16384
cfg.bs_new_sample = 1000
cfg.map_capacity = 1 << 20
cfg.buffer_size = 1 << 23
cfg.frame_point_cap = 1 << 16
cfg.source_point_cap = 1 << 13
cfg.max_frames = 256
cfg.finalize()
cfg.pool_capacity = 4_000_000
c = cfg
print("all_sample_n:", c.all_sample_n)

REPS = 20


def timeit(name, fn, *args):
    """fn must be jittable taking args; we loop it in-jit via fori."""
    f = jax.jit(lambda *a: fn(*a))
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS * 1e3
    print(f"{name:44s} {dt:8.2f} ms")
    return dt


rng = np.random.RandomState(0)

# --- build a realistic map: ~600k points on a rough surface
NPTS = 600_000
pts = np.zeros((NPTS, 3), np.float32)
pts[:, :2] = rng.rand(NPTS, 2) * 90 - 45
pts[:, 2] = 0.3 * np.sin(pts[:, 0]) + 0.3 * np.cos(pts[:, 1])
state = npm.init_map_state(c.map_capacity, c.buffer_size, c.feature_dim, False)
state, _ = jax.jit(lambda s, p: npm.insert_points(
    s, p, jnp.ones(NPTS, bool), 0, jnp.zeros(c.max_frames, jnp.float32),
    resolution=c.voxel_size_m, local_window_dist=1e6,
    insert_cap=1 << 17))(state, jnp.asarray(pts))
print("map count:", int(state.count))

qp = mq.make_query_params(c)
geo_mlp = init_mlp_params(jax.random.PRNGKey(7), c.feature_dim + 3, 64, 1, 1)
key = jax.random.PRNGKey(0)

# ---------------------------------------------------------------- primitives
C1 = c.map_capacity + 1
F = c.feature_dim
feats = state.geo_features
for rows in (98304, 196608):
    idx = jnp.asarray(rng.randint(0, 600_000, rows), jnp.int32)
    vals = jnp.asarray(rng.randn(rows, F), jnp.float32)
    vals1 = vals[:, 0]
    timeit(f"scatter-add [{rows}]->[1M,{F}]",
           lambda f, i, v: f.at[i].add(v), feats, idx, vals)
    timeit(f"scatter-add [{rows}]->[1M] width1",
           lambda f, i, v: f.at[i].add(v), state.certainty, idx, vals1)
    timeit(f"gather [{rows}] width{F}",
           lambda f, i: f[i], feats, idx)
    # sort-dedup-segment alternative to scatter-add
    def sort_seg(f, i, v):
        si = jnp.argsort(i)
        return f.at[i[si]].add(v[si])
    timeit(f"argsort+scatter [{rows}]", sort_seg, feats, idx, vals)

# brick probe gather
nb = state.btable.shape[0] - 1
for n in (8192, 16384):
    hb = jnp.asarray(rng.randint(0, nb, (n, 8)), jnp.int32)
    timeit(f"brick gather [{n}x8 rows 768B]",
           lambda bt, h: bt[h], state.btable, hb)

# adam on full feature array
opt = optax.adam(c.lr, eps=c.adam_eps)
params = {"geo_features": state.geo_features, "geo_mlp": geo_mlp}
ost = opt.init(params)
grads = jax.tree.map(jnp.ones_like, params)
timeit("adam update (full params)",
       lambda p, o, g: opt.update(g, o, p), params, ost, grads)

# ---------------------------------------------------------------- train step
pool = mp.init_pool(c.pool_capacity, c.frame_point_cap * c.all_sample_n,
                    False, 0)
smp_pts = jnp.asarray(
    pts[:c.pool_capacity // 4] + rng.randn(c.pool_capacity // 4, 3) * 0.2,
    jnp.float32)
pool = pool.replace(
    coord=pool.coord.at[:smp_pts.shape[0]].set(smp_pts),
    sdf_label=pool.sdf_label.at[:smp_pts.shape[0]].set(0.05),
    weight=pool.weight.at[:smp_pts.shape[0]].set(1.0),
    count=jnp.int32(smp_pts.shape[0]),
    new_count=jnp.int32(1000),
    new_idx=pool.new_idx.at[:1000].set(jnp.arange(1000)))
lf = mq.LocalFilter(travel_dist=jnp.zeros(c.max_frames, jnp.float32),
                    cur_ts=jnp.int32(0), local_window_dist=250.0)

loss_kwargs = dict(
    sigma_sigmoid_m=c.sdf_scale, loss_weight_on=True, ekional_loss_on=True,
    weight_e=c.weight_e, numerical_grad_eps=c.voxel_size_m * 0.2,
    gradient_decimation=10, surface_sample_range_m=0.25)

bidx = mp.draw_batch_indices(key, pool, c.bs, c.bs_new_sample, jnp.bool_(True))
coord = pool.coord[bidx.idx]

timeit("query_decode fwd [16384]",
       lambda s, f, m, q: mq.query_decode(s, f, m, q, qp, lf=lf).sdf,
       state, state.geo_features, geo_mlp, coord)

def fwd_loss(f, s, p, b):
    prm = {"geo_features": f, "geo_mlp": geo_mlp}
    return mp.mapping_loss(prm, s, p, b, qp, lf, **loss_kwargs)[0]

timeit("mapping_loss fwd (incl eikonal)", fwd_loss, state.geo_features,
       state, pool, bidx)
timeit("mapping_loss fwd+bwd",
       lambda f, s, p, b: jax.grad(fwd_loss)(f, s, p, b),
       state.geo_features, state, pool, bidx)

# eikonal piece alone
dec = coord[::10]
timeit("eikonal grad queries fwd [1638x6]",
       lambda s, f, m, d: mq.query_sdf_numerical_grad(
           s, f, m, d, 0.08, qp, lf=lf),
       state, state.geo_features, geo_mlp, dec)

step = mp.make_train_step(qp, opt, bs=c.bs, bs_new=c.bs_new_sample,
                          train_decoder=True, loss_kwargs=loss_kwargs)
timeit("train step (1 iter, full)",
       lambda p, o, s, pl, k: step(p, o, s, pl, k, lf, jnp.bool_(True)),
       params, ost, state, pool, key)

# certainty scatter alone
out = jax.jit(lambda s, f, m, q: mq.query_decode(s, f, m, q, qp, lf=lf))(
    state, state.geo_features, geo_mlp, coord)
timeit("accumulate_certainty [16384x6]",
       lambda s, qn, w: npm.accumulate_certainty(
           s, qn, w, jnp.zeros(c.bs, jnp.int32)),
       state, out.neighbors, out.weights)

# ---------------------------------------------------------------- frame path
train_pts = jnp.asarray(
    np.concatenate([pts[:40000], rng.randn(25536, 3).astype(np.float32) * 20]),
    jnp.float32)
mask = jnp.arange(c.frame_point_cap) < 40000
T = jnp.eye(4, dtype=jnp.float32)
td = jnp.zeros(c.max_frames, jnp.float32)

def do_sample(k, tp, m):
    return sample_training_points(
        k, tp, m, surface_sample_range_m=c.surface_sample_range_m,
        surface_sample_n=c.surface_sample_n, free_front_n=c.free_front_n,
        free_behind_n=c.free_behind_n,
        free_sample_begin_ratio=c.free_sample_begin_ratio,
        free_sample_end_dist_m=c.free_sample_end_dist_m,
        max_range=c.max_range, dist_weight_on=c.dist_weight_on,
        dist_weight_scale=c.dist_weight_scale)

timeit("sampler [65536 rays]", do_sample, key, train_pts, mask)
smp = jax.jit(do_sample)(key, train_pts, mask)

timeit("insert_points [460k cand]",
       lambda s, p, m: npm.insert_points(
           s, p, m, 1, td, resolution=c.voxel_size_m,
           local_window_dist=250.0)[0].count,
       state, smp.points, smp.mask)

timeit("append_samples [460k]",
       lambda p, co, sd, w, m: mp.append_samples(p, co, sd, w, m, 1).count,
       pool, smp.points, smp.sdf_label, smp.weight, smp.mask)

fs = mp.append_start(pool, smp.points.shape[0])
timeit("detect_new_samples [460k]",
       lambda s, p, co, sd, m: mp.detect_new_samples(
           s, p, co, sd, m, fs, resolution=c.voxel_size_m,
           new_certainty_thre=c.new_certainty_thre,
           surface_sample_range_m=c.surface_sample_range_m).new_count,
       state, pool, smp.points, smp.sdf_label, smp.mask)

timeit("filter_pool [4M]",
       lambda p, k: mp.filter_pool(p, jnp.zeros(3), c.window_radius, k).count,
       pool, key)

# ---------------------------------------------------------------- tracker
from pin_slam_tpu.slam import tracker as tk
src = jnp.asarray(pts[rng.randint(0, NPTS, c.source_point_cap)]
                  + rng.randn(c.source_point_cap, 3) * 0.01, jnp.float32)
src_mask = jnp.ones(c.source_point_cap, bool)
tp_ = tk.TrackerParams(reg_iter_n=100, term_thre_deg=c.reg_term_thre_deg,
                       term_thre_m=c.reg_term_thre_m)
trk = jax.jit(tk.make_tracker(qp, tp_))
T0 = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(jnp.array([0.3, 0.2, 0.02]))
anchor = jnp.zeros(3, jnp.float32)
res = trk(state, state.geo_features, geo_mlp, src, src_mask, T0, lf, anchor)
jax.block_until_ready(res.pose)
t0 = time.time()
for _ in range(REPS):
    res = trk(state, state.geo_features, geo_mlp, src, src_mask, T0, lf,
              anchor)
jax.block_until_ready(res.pose)
print(f"{'tracker full (while_loop)':44s} {(time.time()-t0)/REPS*1e3:8.2f} ms"
      f"   iters={int(res.iterations)} valid={bool(res.valid)}")

# single registration iteration cost
tp1 = tp_._replace(reg_iter_n=2)
trk1 = jax.jit(tk.make_tracker(qp, tp1))
r1 = trk1(state, state.geo_features, geo_mlp, src, src_mask, T0, lf, anchor)
jax.block_until_ready(r1.pose)
t0 = time.time()
for _ in range(REPS):
    r1 = trk1(state, state.geo_features, geo_mlp, src, src_mask, T0, lf,
              anchor)
jax.block_until_ready(r1.pose)
print(f"{'tracker 2-iter':44s} {(time.time()-t0)/REPS*1e3:8.2f} ms")
