"""Measure the rewritten insert_points + detect_new + filter_pool on TPU
(same carry harness that reproduced the old 102/26/302 ms)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

from pin_slam_tpu.config import Config
from pin_slam_tpu.models import neural_points as npm
from pin_slam_tpu.slam import mapper as mp

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
cfg.map_capacity = 1 << 20
cfg.buffer_size = 1 << 23
cfg.max_frames = 256
cfg.finalize()
c = cfg
res = c.voxel_size_m

rng = np.random.RandomState(0)
NPTS = 600_000
pts = np.zeros((NPTS, 3), np.float32)
pts[:, :2] = rng.rand(NPTS, 2) * 90 - 45
pts[:, 2] = 0.3 * np.sin(pts[:, 0]) + 0.3 * np.cos(pts[:, 1])
state = npm.init_map_state(c.map_capacity, c.buffer_size, c.feature_dim, False)
state, _ = jax.jit(lambda s, p: npm.insert_points(
    s, p, jnp.ones(NPTS, bool), 0, jnp.zeros(c.max_frames, jnp.float32),
    resolution=res, local_window_dist=1e6,
    insert_cap=1 << 17))(state, jnp.asarray(pts))
print("map count:", int(state.count))
td = jnp.zeros(c.max_frames, jnp.float32)

# surface-block candidate size (65536 rays x 5)
M = 65536 * 5
cand = jnp.asarray(pts[rng.randint(0, NPTS, M)] + rng.randn(M, 3) * 0.1,
                   jnp.float32)
cmask = jnp.ones(M, bool)


def ins_body(it, carry, p, m):
    st = carry
    st2, _ = npm.insert_points(
        st, p + it * 1e-3, m, it, td, resolution=res,
        local_window_dist=250.0)
    return st2


timeit_carry(f"insert_points v2 [{M} cand] (old ~102@460k)", ins_body,
             state, cand, cmask)

# detect_new at full sample width
S = 65536 * 8
fc = jnp.asarray(pts[rng.randint(0, NPTS, S)] + rng.randn(S, 3) * 0.4,
                 jnp.float32)
fsdf = jnp.asarray(rng.randn(S) * 0.5, jnp.float32)
fm = jnp.ones(S, bool)
pool = mp.init_pool(4_000_000, S, False, 0)


def det_body(it, carry, st, co, sd, m):
    p = carry
    return mp.detect_new_samples(
        st, p, co + it * 1e-3, sd, m, jnp.int32(0),
        resolution=res,
        new_certainty_thre=c.new_certainty_thre,
        surface_sample_range_m=c.surface_sample_range_m)


timeit_carry("detect_new v2 [524k] (old ~26)", det_body, pool,
             state, fc, fsdf, fm)


def filt_body(it, carry):
    p = carry
    return mp.filter_pool(p, jnp.zeros(3) + it * 0.001, c.window_radius,
                          jax.random.PRNGKey(0))


timeit_carry("filter_pool mark-dead [4M] (old ~302)", filt_body, pool)
