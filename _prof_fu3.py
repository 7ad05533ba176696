"""In-jit-reps profiler for the frame-update path at bench (KITTI) shapes.
The only trustworthy timing method through the TPU tunnel: N reps inside one
jitted lax.fori_loop, idle TPU, measure wall-clock of a forced scalar pull.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

from pin_slam_tpu.config import Config
from pin_slam_tpu.models import neural_points as npm
from pin_slam_tpu.slam import mapper as mp
from pin_slam_tpu.models.sampler import sample_training_points

cfg = Config()
cfg.max_range = 80.0
cfg.voxel_size_m = 0.4
cfg.surface_sample_n = 4
cfg.map_capacity = 1 << 20
cfg.buffer_size = 1 << 23
cfg.frame_point_cap = 1 << 16
cfg.max_frames = 256
cfg.finalize()
cfg.pool_capacity = 4_000_000
c = cfg

rng = np.random.RandomState(0)
P = cfg.frame_point_cap
pts = jnp.asarray(rng.randn(P, 3) * 25, jnp.float32)
mask = jnp.ones(P, bool)
td = jnp.zeros(cfg.max_frames, jnp.float32)
key0 = jax.random.PRNGKey(0)

state0 = npm.init_map_state(cfg.map_capacity, cfg.buffer_size,
                            cfg.feature_dim, False)
pool0 = mp.init_pool(cfg.pool_capacity, 1 << 15, False, 0)

SAMP_KW = dict(
    surface_sample_range_m=c.surface_sample_range_m,
    surface_sample_n=c.surface_sample_n,
    free_front_n=c.free_front_n,
    free_behind_n=c.free_behind_n,
    free_sample_begin_ratio=c.free_sample_begin_ratio,
    free_sample_end_dist_m=c.free_sample_end_dist_m,
    max_range=c.max_range,
    dist_weight_on=c.dist_weight_on,
    dist_weight_scale=c.dist_weight_scale,
)


def stage_sample(state, pool, key, i):
    key, ks = jax.random.split(key)
    smp = sample_training_points(ks, pts, mask, **SAMP_KW)
    return state, pool, key, jnp.sum(smp.points)


def stage_insert(state, pool, key, i):
    key, ks = jax.random.split(key)
    smp = sample_training_points(ks, pts, mask, **SAMP_KW)
    state, new_ratio = npm.insert_points(
        state, smp.points, smp.mask, i, td,
        resolution=c.voxel_size_m, local_window_dist=400.0,
        force_all_new=jnp.bool_(False))
    return state, pool, key, new_ratio


def stage_append(state, pool, key, i):
    key, ks = jax.random.split(key)
    smp = sample_training_points(ks, pts, mask, **SAMP_KW)
    state, new_ratio = npm.insert_points(
        state, smp.points, smp.mask, i, td,
        resolution=c.voxel_size_m, local_window_dist=400.0,
        force_all_new=jnp.bool_(False))
    pool = mp.append_samples(pool, smp.points, smp.sdf_label, smp.weight,
                             smp.mask, i)
    return state, pool, key, new_ratio


def stage_detect(state, pool, key, i):
    key, ks = jax.random.split(key)
    smp = sample_training_points(ks, pts, mask, **SAMP_KW)
    state, new_ratio = npm.insert_points(
        state, smp.points, smp.mask, i, td,
        resolution=c.voxel_size_m, local_window_dist=400.0,
        force_all_new=jnp.bool_(False))
    frame_start = pool.count
    pool = mp.append_samples(pool, smp.points, smp.sdf_label, smp.weight,
                             smp.mask, i)
    pool = mp.detect_new_samples(
        state, pool, smp.points, smp.sdf_label, smp.mask, frame_start,
        resolution=c.voxel_size_m,
        new_certainty_thre=c.new_certainty_thre,
        surface_sample_range_m=c.surface_sample_range_m)
    return state, pool, key, new_ratio


def bench_stage(name, fn, reps=8):
    @jax.jit
    def run(state, pool, key):
        def body(i, carry):
            state, pool, key, acc = carry
            state, pool, key, x = fn(state, pool, key, i)
            return state, pool, key, acc + jnp.sum(x)
        return jax.lax.fori_loop(
            0, reps, body, (state, pool, key, jnp.float32(0)))

    out = run(state0, pool0, key0)
    _ = float(out[3])          # warm compile + forced exec
    t0 = time.time()
    out = run(state0, pool0, key0)
    _ = float(out[3])
    dt = (time.time() - t0) / reps * 1e3
    print(f"{name:16s}: {dt:7.2f} ms/frame", flush=True)


bench_stage("sample", stage_sample)
bench_stage("(+)insert", stage_insert)
bench_stage("(+)append", stage_append)
bench_stage("(+)detect_new", stage_detect)
