"""Ablate insert v2 pieces via monkeypatching to find the remaining 54ms."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pin_slam_tpu.config import Config
from pin_slam_tpu.models import neural_points as npm

REPS = 10

def timeit_carry(name, body, init, *args, reps=REPS):
    @jax.jit
    def run(carry, *a):
        return jax.lax.fori_loop(0, reps, lambda it, c: body(it, c, *a), carry)
    r = run(init, *args)
    jax.block_until_ready(r)
    t0 = time.time()
    r = run(init, *args)
    jax.block_until_ready(r)
    print(f"{name:56s} {(time.time()-t0)/reps*1e3:8.3f} ms")

cfg = Config(); cfg.max_range = 80.0; cfg.voxel_size_m = 0.4
cfg.map_capacity = 1 << 20; cfg.buffer_size = 1 << 23; cfg.max_frames = 256
cfg.finalize(); c = cfg; res = c.voxel_size_m
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
td = jnp.zeros(c.max_frames, jnp.float32)
M = 65536 * 5
cand = jnp.asarray(pts[rng.randint(0, NPTS, M)] + rng.randn(M, 3) * 0.1,
                   jnp.float32)
cmask = jnp.ones(M, bool)

orig_bw = npm._brick_write
orig_vds = npm.voxel_down_sample_hash_mask

def body(it, carry, p, m):
    st = carry
    st2, _ = npm.insert_points(st, p + it * 1e-3, m, it, td, resolution=res,
                               local_window_dist=250.0)
    return st2

timeit_carry("v2 FULL", body, state, cand, cmask)

npm._brick_write = lambda bt, g, i, t, p, r, w: bt
timeit_carry("v2 without brick_write", body, state, cand, cmask)
npm._brick_write = orig_bw

npm.voxel_down_sample_hash_mask = lambda p, m, r, t: m
timeit_carry("v2 without vds", body, state, cand, cmask)
npm.voxel_down_sample_hash_mask = orig_vds
