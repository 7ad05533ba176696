"""Bisect insert_points cost at bench shapes (in-jit reps)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pin_slam_tpu.ops import hash3d
from pin_slam_tpu.ops.voxel import voxel_down_sample_hash_mask

S = 458752            # samples per frame at bench shapes
C = 1 << 20
B = 1 << 23
res = 0.4

rng = np.random.RandomState(0)
pts = jnp.asarray(rng.randn(S, 3) * 25, jnp.float32)
mask = jnp.ones(S, bool)
table = jnp.full((B + 1,), -1, jnp.int32)
table_rec = jnp.zeros((B + 1, 8), jnp.float32)
positions = jnp.zeros((C + 1, 3), jnp.float32)
feats = jnp.zeros((C + 1, 8), jnp.float32)
key0 = jax.random.PRNGKey(0)


def timed(name, fn, reps=8):
    @jax.jit
    def run(key):
        def body(i, carry):
            key, acc = carry
            key, ks = jax.random.split(key)
            # jitter points so each rep differs (prevents CSE across reps)
            p = pts + jax.random.normal(ks, (1, 3)) * 0.01
            return key, acc + fn(p, i)
        return jax.lax.fori_loop(0, reps, body, (key, jnp.float32(0)))
    out = run(key0)
    _ = float(out[1])
    t0 = time.time()
    _ = float(run(key0)[1])
    print(f"{name:28s}: {(time.time()-t0)/reps*1e3:7.2f} ms", flush=True)


def f_vmask(p, i):
    vm = voxel_down_sample_hash_mask(p, mask, res, B)
    return jnp.sum(vm.astype(jnp.float32))


def f_probe(p, i):
    grid = hash3d.grid_coords(p, res)
    h = hash3d.hash_grid(grid, B)
    ex = table[h]
    epos = positions[jnp.where(ex >= 0, ex, C)]
    return jnp.sum(epos) + jnp.sum(ex.astype(jnp.float32))


def f_scatter_small(p, i):
    dest = (jnp.arange(S) % C).astype(jnp.int32)
    pos2 = positions.at[dest].set(p)
    return jnp.sum(pos2[0])


def f_scatter_feats(p, i):
    dest = (jnp.arange(S) % C).astype(jnp.int32)
    f2 = feats.at[dest].set(jnp.zeros((S, 8), jnp.float32) + p[:, :1])
    return jnp.sum(f2[0])


def f_scatter_table(p, i):
    grid = hash3d.grid_coords(p, res)
    h = hash3d.hash_grid(grid, B)
    t2 = table.at[h].set(jnp.arange(S, dtype=jnp.int32) % C)
    return jnp.sum(t2[0].astype(jnp.float32))


def f_scatter_rec(p, i):
    grid = hash3d.grid_coords(p, res)
    h = hash3d.hash_grid(grid, B)
    rec = jnp.concatenate(
        [p, jnp.zeros((S, 5), jnp.float32)], axis=1)
    r2 = table_rec.at[h].set(rec)
    return jnp.sum(r2[0])


def f_cumsum(p, i):
    s = jnp.cumsum((p[:, 0] > 0).astype(jnp.int32))
    return jnp.sum(s[-1].astype(jnp.float32))


timed("voxel_hash_mask", f_vmask)
timed("probe(gathers)", f_probe)
timed("scatter pos[1M,3]", f_scatter_small)
timed("scatter feats[1M,8]", f_scatter_feats)
timed("scatter table[8M]", f_scatter_table)
timed("scatter table_rec[8M,8]", f_scatter_rec)
timed("cumsum", f_cumsum)
