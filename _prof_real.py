"""Calibrated in-jit profiling: a known-FLOP matmul as control, then the
real train-step / frame-update / tracker programs looped in-jit."""
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
from pin_slam_tpu.slam import tracker as tk

print("devices:", jax.devices())
REPS = 10


def timeit_carry(name, body, init, *args, reps=REPS):
    @jax.jit
    def run(carry, *a):
        return jax.lax.fori_loop(
            0, reps, lambda it, c: body(it, c, *a), carry)

    r = run(init, *args)
    jax.block_until_ready(r)
    t0 = time.time()
    r = run(init, *args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / reps * 1e3
    print(f"{name:52s} {dt:8.3f} ms")
    return dt


# ---- control: 4096^3 matmul f32 ~ 137 GFLOP
a = jnp.ones((4096, 4096), jnp.float32)
timeit_carry("CONTROL matmul 4096^3 f32 (~1.4ms expected)",
             lambda it, c, x: (c @ x) * 0.5, a, a)

cfg = Config()
cfg.max_range = 80.0
cfg.voxel_size_m = 0.4
cfg.sigma_sigmoid_m = 0.08
cfg.surface_sample_range_m = 0.25
cfg.surface_sample_n = 4
cfg.bs = 16384
cfg.bs_new_sample = 1000
cfg.loss_weight_on = True
cfg.map_capacity = 1 << 20
cfg.buffer_size = 1 << 23
cfg.frame_point_cap = 1 << 16
cfg.source_point_cap = 1 << 13
cfg.max_frames = 256
cfg.finalize()
cfg.pool_capacity = 4_000_000
c = cfg

rng = np.random.RandomState(0)
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

pool = mp.init_pool(c.pool_capacity, c.frame_point_cap * c.all_sample_n,
                    False, 0)
NS = 500_000
smp_pts = jnp.asarray(pts[:NS] + rng.randn(NS, 3) * 0.2, jnp.float32)
pool = pool.replace(
    coord=pool.coord.at[:NS].set(smp_pts),
    sdf_label=pool.sdf_label.at[:NS].set(0.05),
    weight=pool.weight.at[:NS].set(1.0),
    count=jnp.int32(NS),
    new_count=jnp.int32(1000),
    new_idx=pool.new_idx.at[:1000].set(jnp.arange(1001)[:1000]))
lf = mq.LocalFilter(travel_dist=jnp.zeros(c.max_frames, jnp.float32),
                    cur_ts=jnp.int32(0), local_window_dist=250.0)

loss_kwargs = dict(
    sigma_sigmoid_m=c.sdf_scale, loss_weight_on=True, ekional_loss_on=True,
    weight_e=c.weight_e, numerical_grad_eps=c.voxel_size_m * 0.2,
    gradient_decimation=10, surface_sample_range_m=0.25)

opt = optax.adam(c.lr, eps=c.adam_eps)
params = {"geo_features": state.geo_features, "geo_mlp": geo_mlp}
ost = opt.init(params)

# ---- the real train iteration, looped with its true sequential deps
def train_body(it, carry, state, pool, lf):
    params, ost, st, k = carry
    k, k1 = jax.random.split(k)
    bidx = mp.draw_batch_indices(k1, pool, c.bs, c.bs_new_sample,
                                 jnp.bool_(True))
    (loss, aux), grads = jax.value_and_grad(
        mp.mapping_loss, has_aux=True)(
            params, st, pool, bidx, qp, lf, **loss_kwargs)
    up, ost = opt.update(grads, ost, params)
    params = jax.tree.map(lambda p, u: p + u, params, up)
    st = mp.apply_certainty_update(st, aux)
    return params, ost, st, k

timeit_carry("train iteration (full)", train_body,
             (params, ost, state, key), state, pool, lf)

# pieces: query only / loss fwd / fwd+bwd / certainty
bidx0 = mp.draw_batch_indices(key, pool, c.bs, c.bs_new_sample,
                              jnp.bool_(True))
coord0 = pool.coord[bidx0.idx]

def q_body(it, carry, st, pool, lf):
    acc, k = carry
    k, k1 = jax.random.split(k)
    bidx = mp.draw_batch_indices(k1, pool, c.bs, c.bs_new_sample,
                                 jnp.bool_(True))
    coord = pool.coord[bidx.idx]
    out = mq.query_decode(st, st.geo_features, geo_mlp, coord, qp, lf=lf)
    return acc + jnp.sum(jnp.square(out.sdf)), k

timeit_carry("  batch draw + query_decode fwd", q_body,
             (jnp.float32(0.0), key), state, pool, lf)

def loss_body(it, carry, st, pool, lf):
    acc, k = carry
    k, k1 = jax.random.split(k)
    bidx = mp.draw_batch_indices(k1, pool, c.bs, c.bs_new_sample,
                                 jnp.bool_(True))
    prm = {"geo_features": st.geo_features, "geo_mlp": geo_mlp}
    loss, _ = mp.mapping_loss(prm, st, pool, bidx, qp, lf, **loss_kwargs)
    return acc + loss, k

timeit_carry("  mapping_loss fwd (incl eikonal)", loss_body,
             (jnp.float32(0.0), key), state, pool, lf)

def grad_body(it, carry, st, pool, lf):
    feats, k = carry
    k, k1 = jax.random.split(k)
    bidx = mp.draw_batch_indices(k1, pool, c.bs, c.bs_new_sample,
                                 jnp.bool_(True))
    def lf_(f):
        prm = {"geo_features": f, "geo_mlp": geo_mlp}
        return mp.mapping_loss(prm, st, pool, bidx, qp, lf, **loss_kwargs)[0]
    g = jax.grad(lf_)(feats)
    return feats - 1e-3 * g, k

timeit_carry("  mapping_loss fwd+bwd (feat grads only)", grad_body,
             (state.geo_features, key), state, pool, lf)

# no-eikonal variant
lk2 = dict(loss_kwargs); lk2["ekional_loss_on"] = False

def grad_body2(it, carry, st, pool, lf):
    feats, k = carry
    k, k1 = jax.random.split(k)
    bidx = mp.draw_batch_indices(k1, pool, c.bs, c.bs_new_sample,
                                 jnp.bool_(True))
    def lf_(f):
        prm = {"geo_features": f, "geo_mlp": geo_mlp}
        return mp.mapping_loss(prm, st, pool, bidx, qp, lf, **lk2)[0]
    g = jax.grad(lf_)(feats)
    return feats - 1e-3 * g, k

timeit_carry("  fwd+bwd WITHOUT eikonal", grad_body2,
             (state.geo_features, key), state, pool, lf)

# ---- frame_update pieces
train_pts = jnp.asarray(
    np.concatenate([pts[:40000],
                    rng.randn(25536, 3).astype(np.float32) * 20]), jnp.float32)
fmask = jnp.arange(c.frame_point_cap) < 40000
td = jnp.zeros(c.max_frames, jnp.float32)

def samp_body(it, carry, tp, m):
    acc, k = carry
    k, k1 = jax.random.split(k)
    smp = sample_training_points(
        k1, tp, m, surface_sample_range_m=c.surface_sample_range_m,
        surface_sample_n=c.surface_sample_n, free_front_n=c.free_front_n,
        free_behind_n=c.free_behind_n,
        free_sample_begin_ratio=c.free_sample_begin_ratio,
        free_sample_end_dist_m=c.free_sample_end_dist_m,
        max_range=c.max_range, dist_weight_on=c.dist_weight_on,
        dist_weight_scale=c.dist_weight_scale)
    return acc + jnp.sum(smp.points[0]), k

timeit_carry("sampler [65536 rays]", samp_body, (jnp.float32(0.0), key),
             train_pts, fmask)

smp = jax.jit(lambda k, tp, m: sample_training_points(
    k, tp, m, surface_sample_range_m=c.surface_sample_range_m,
    surface_sample_n=c.surface_sample_n, free_front_n=c.free_front_n,
    free_behind_n=c.free_behind_n,
    free_sample_begin_ratio=c.free_sample_begin_ratio,
    free_sample_end_dist_m=c.free_sample_end_dist_m,
    max_range=c.max_range, dist_weight_on=c.dist_weight_on,
    dist_weight_scale=c.dist_weight_scale))(key, train_pts, fmask)

def ins_body(it, carry, p, m):
    st = carry
    st2, _ = npm.insert_points(
        st, p + it * 0.001, m, it, td, resolution=c.voxel_size_m,
        local_window_dist=250.0)
    return st2

timeit_carry("insert_points [460k cand]", ins_body, state,
             smp.points, smp.mask)

def app_body(it, carry, co, sd, w, m):
    p = carry
    return mp.append_samples(p, co + it * 0.001, sd, w, m, it)

timeit_carry("append_samples [460k]", app_body, pool,
             smp.points, smp.sdf_label, smp.weight, smp.mask)

def det_body(it, carry, st, co, sd, m):
    p = carry
    return mp.detect_new_samples(
        st, p, co + it * 0.001, sd, m, jnp.int32(0),
        resolution=c.voxel_size_m,
        new_certainty_thre=c.new_certainty_thre,
        surface_sample_range_m=c.surface_sample_range_m)

timeit_carry("detect_new_samples [460k]", det_body, pool,
             state, smp.points, smp.sdf_label, smp.mask)

def filt_body(it, carry, k):
    p = carry
    k1 = jax.random.fold_in(k, it)
    return mp.filter_pool(p, jnp.zeros(3) + it * 0.001, c.window_radius, k1)

timeit_carry("filter_pool [4M]", filt_body, pool, key, reps=5)

# ---- tracker
src = jnp.asarray(pts[rng.randint(0, NPTS, c.source_point_cap)]
                  + rng.randn(c.source_point_cap, 3) * 0.01, jnp.float32)
src_mask = jnp.ones(c.source_point_cap, bool)
tp_ = tk.TrackerParams(reg_iter_n=100, term_thre_deg=c.reg_term_thre_deg,
                       term_thre_m=c.reg_term_thre_m)
track = tk.make_tracker(qp, tp_)
T0 = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(
    jnp.array([0.3, 0.2, 0.02]))
anchor = jnp.zeros(3, jnp.float32)

def trk_body(it, carry, st, src, m):
    acc = carry
    T = T0.at[0, 3].add(it * 1e-4)
    res = track(st, st.geo_features, geo_mlp, src, m, T, lf, anchor)
    return acc + res.pose[0, 3] + res.iterations.astype(jnp.float32)

timeit_carry("tracker full while_loop", trk_body, jnp.float32(0.0),
             state, src, src_mask)
res = jax.jit(track)(state, state.geo_features, geo_mlp, src, src_mask,
                     T0, lf, anchor)
print("   tracker iters:", int(res.iterations), "valid:", bool(res.valid))
