"""TPU benchmark: spatial-join kernel vs brick probe at bench shapes,
plus the full train iteration and tracker in join mode."""
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
from pin_slam_tpu.ops import knn_join as kj
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
    print(f"{name:56s} {dt:8.3f} ms")
    return dt


cfg = Config()
cfg.max_range = 80.0
cfg.voxel_size_m = 0.4
cfg.sigma_sigmoid_m = 0.08
cfg.surface_sample_range_m = 0.25
cfg.bs = 16384
cfg.bs_new_sample = 1000
cfg.loss_weight_on = True
cfg.map_capacity = 1 << 20
cfg.buffer_size = 1 << 23
cfg.frame_point_cap = 1 << 16
cfg.source_point_cap = 1 << 13
cfg.max_frames = 256
cfg.probe_mode = "join"
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
print("probe_mode:", qp.probe_mode)
geo_mlp = init_mlp_params(jax.random.PRNGKey(7), c.feature_dim + 3, 64, 1, 1)
key = jax.random.PRNGKey(0)
td = jnp.zeros(c.max_frames, jnp.float32)

# local set over all alive points
mask = jnp.arange(c.map_capacity) < state.count
lset = jax.jit(lambda s, m: kj.build_local_set(
    s.positions, m, c.voxel_size_m, c.local_set_cap))(state, mask)
print("local set count:", int(lset.count))

N = 16384
q = jnp.asarray(pts[rng.randint(0, NPTS, N)] + rng.randn(N, 3) * 0.1,
                jnp.float32)


def build_body(it, carry, s, m):
    ls = kj.build_local_set(s.positions, m, c.voxel_size_m, c.local_set_cap)
    return carry + jnp.sum(ls.pts[0]) + it * 0.0


timeit_carry("build_local_set [1M->131k]", build_body, jnp.float32(0.0),
             state, mask)


def join_body(it, acc, ls, q):
    li, d2, cnt = kj.knn_join(q + it * 1e-3, ls.pts, k=6,
                              max_dist2=qp.max_dist2,
                              resolution=c.voxel_size_m, interpret=False)
    return acc + jnp.sum(d2) + jnp.sum(cnt.astype(jnp.float32))


timeit_carry("knn_join [16384 q] (brick probe+topk was ~8.2)", join_body,
             jnp.float32(0.0), lset, q)


def decode_join(it, acc, s, ls, q):
    out = mq.query_decode(s, s.geo_features, geo_mlp, q + it * 1e-3, qp,
                          lset=ls)
    return acc + jnp.sum(out.sdf)


timeit_carry("query_decode join [16384] (brick was ~11)", decode_join,
             jnp.float32(0.0), state, lset, q)

# correctness vs cells on TPU
qn_j = jax.jit(lambda s, ls, q: npm.query_neighbors_join(
    s, q, ls, nn_k=6, max_dist2=qp.max_dist2,
    resolution=c.voxel_size_m))(state, lset, q)
from pin_slam_tpu.ops import hash3d
offs = hash3d.neighbor_offsets(c.num_nei_cells, c.search_alpha)
qn_c = jax.jit(lambda s, q: npm.query_neighbors(
    s, q, offsets=offs, resolution=c.voxel_size_m, nn_k=6,
    max_dist2=qp.max_dist2, probe_mode="cells"))(state, q)
dj = np.sort(np.where(np.asarray(qn_j.valid), np.asarray(qn_j.dist2), 9e3), 1)
dc = np.sort(np.where(np.asarray(qn_c.valid), np.asarray(qn_c.dist2), 9e3), 1)
# join is a superset search; it must find neighbors at least as close
worse = (dj - dc > 1e-4).sum()
print(f"queries where join found worse neighbors than cells: {worse}")

# full train iteration
pool = mp.init_pool(c.pool_capacity, c.frame_point_cap * c.all_sample_n,
                    False, 0)
NS = 500_000
smp_pts = jnp.asarray(pts[:NS] + rng.randn(NS, 3) * 0.2, jnp.float32)
pool = pool.replace(
    coord=pool.coord.at[:NS].set(smp_pts),
    sdf_label=pool.sdf_label.at[:NS].set(0.05),
    weight=pool.weight.at[:NS].set(1.0),
    count=jnp.int32(NS), new_count=jnp.int32(1000),
    new_idx=pool.new_idx.at[:1000].set(jnp.arange(1001)[:1000]))
lf = mq.LocalFilter(travel_dist=td, cur_ts=jnp.int32(0),
                    local_window_dist=250.0)
loss_kwargs = dict(
    sigma_sigmoid_m=c.sdf_scale, loss_weight_on=True, ekional_loss_on=True,
    weight_e=c.weight_e, numerical_grad_eps=c.voxel_size_m * 0.2,
    gradient_decimation=10, surface_sample_range_m=0.25)
opt = optax.adam(c.lr, eps=c.adam_eps)
params = {"geo_features": state.geo_features, "geo_mlp": geo_mlp}
ost = opt.init(params)


def train_body(it, carry, state, pool, lf, ls):
    params, ost_, k = carry
    k, k1, kc = jax.random.split(k, 3)
    bidx = mp.draw_batch_indices(k1, pool, c.bs, c.bs_new_sample,
                                 jnp.bool_(True))
    (loss, aux), grads = jax.value_and_grad(
        mp.mapping_loss, has_aux=True)(
            params, state, pool, bidx, qp, lf, key=kc, lset=ls,
            **loss_kwargs)
    up, ost2 = opt.update(grads, ost_, params)
    params = jax.tree.map(lambda p, u: p + u, params, up)
    return params, ost2, k


timeit_carry("train iteration JOIN (brick was 26.4)", train_body,
             (params, ost, key), state, pool, lf, lset)

# tracker in join mode
src = jnp.asarray(pts[rng.randint(0, NPTS, c.source_point_cap)]
                  + rng.randn(c.source_point_cap, 3) * 0.01, jnp.float32)
src_mask = jnp.ones(c.source_point_cap, bool)
tp_ = tk.TrackerParams(reg_iter_n=100, term_thre_deg=c.reg_term_thre_deg,
                       term_thre_m=c.reg_term_thre_m)
track = tk.make_tracker(qp, tp_)
T0 = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(jnp.array([0.3, 0.2, 0.02]))
anchor = jnp.zeros(3, jnp.float32)


def trk_body(it, carry, st, src, m, ls):
    acc = carry
    T = T0.at[0, 3].add(it * 1e-4)
    res = track(st, st.geo_features, geo_mlp, src, m, T, lf, anchor,
                lset=ls)
    return acc + res.pose[0, 3] + res.iterations.astype(jnp.float32)


timeit_carry("tracker JOIN full while_loop (brick was 7.8/iter)", trk_body,
             jnp.float32(0.0), state, src, src_mask, lset)
