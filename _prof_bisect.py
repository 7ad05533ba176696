"""Bisect insert_points cost by ablating pieces of the REAL function,
measured in the same carry-loop that reproduced the real 102ms."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

from pin_slam_tpu.config import Config
from pin_slam_tpu.models import neural_points as npm
from pin_slam_tpu.ops import hash3d
from pin_slam_tpu.ops.voxel import voxel_down_sample_hash_mask

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

M = 458752
cand = jnp.asarray(pts[rng.randint(0, NPTS, M)] + rng.randn(M, 3) * 0.2,
                   jnp.float32)
cmask = jnp.ones(M, bool)
td = jnp.zeros(c.max_frames, jnp.float32)


def insert_ablate(st, points, mask, cur_ts, *, do_vds=True, do_probe=True,
                  do_compact=True, do_state_writes=True, do_table=True,
                  do_btable=True, icap=1 << 16):
    """insert_points with pieces switchable (mirrors the real code path)."""
    C = st.capacity
    B = st.table_size
    if do_vds:
        vmask = voxel_down_sample_hash_mask(points, mask, res, B) & mask
    else:
        vmask = mask & (jnp.sum(points * points, -1) < 1e9)
    grid = hash3d.grid_coords(points, res)
    h = hash3d.hash_grid(grid, B)
    if do_probe:
        existing = st.table[jnp.where(vmask, h, B)]
        exist_valid = existing >= 0
        existing_c = jnp.where(exist_valid, existing, C)
        epos = st.positions[existing_c]
        d2 = jnp.sum((epos - points) ** 2, axis=-1)
        collide = d2 > 3.0 * res * res
        is_new = vmask & (~exist_valid | collide)
        t = jnp.arange(td.shape[0])
        ts_lo = jnp.sum(((td < td[cur_ts] - 250.0) & (t <= cur_ts))
                        .astype(jnp.int32))
        is_new = is_new | (vmask & exist_valid
                           & (st.ts_update[existing_c] < ts_lo))
    else:
        is_new = vmask

    if do_compact:
        order = jnp.cumsum(is_new.astype(jnp.int32)) - 1
        cdest = jnp.where(is_new & (order < icap), order, icap)
        candv = jnp.full((icap + 1,), M, jnp.int32).at[cdest].set(
            jnp.arange(M, dtype=jnp.int32))[:icap]
        cvalid = candv < M
        ci = jnp.where(cvalid, candv, 0)
    else:
        ci = jnp.arange(icap, dtype=jnp.int32)
        cvalid = jnp.ones(icap, bool)

    cpts = points[ci]
    slots = st.count + jnp.arange(icap, dtype=jnp.int32)
    room = cvalid & (slots < C)
    dest = jnp.where(room, slots, C).astype(jnp.int32)
    new_count = jnp.sum(room.astype(jnp.int32))

    upd = {}
    if do_state_writes:
        upd["positions"] = st.positions.at[dest].set(cpts)
        upd["orientations"] = st.orientations.at[dest].set(
            jnp.array([1.0, 0.0, 0.0, 0.0]))
        ts_new = jnp.broadcast_to(jnp.int32(cur_ts), dest.shape)
        upd["ts_create"] = st.ts_create.at[dest].set(ts_new)
        upd["ts_update"] = st.ts_update.at[dest].set(ts_new)
        upd["certainty"] = st.certainty.at[dest].set(0.0)
        upd["geo_features"] = st.geo_features.at[dest].set(
            jnp.zeros((icap, st.geo_features.shape[1])))
    if do_table:
        h_eff = jnp.where(room, h[ci], B)
        table = st.table.at[h_eff].set(jnp.where(room, dest, -1))
        upd["table"] = table.at[B].set(-1)
    if do_btable:
        upd["btable"] = npm._brick_write(
            st.btable, grid[ci], dest,
            jnp.broadcast_to(jnp.int32(cur_ts), dest.shape), cpts,
            res, room)
    return st.replace(count=st.count + new_count, **upd)


def make_body(**kw):
    def body(it, carry, p, m):
        return insert_ablate(carry, p + it * 1e-3, m, it, **kw)
    return body


base = dict(do_vds=True, do_probe=True, do_compact=True,
            do_state_writes=True, do_table=True, do_btable=True)
timeit_carry("insert FULL (ref 102)", make_body(**base), state, cand, cmask)
for drop in ("do_vds", "do_probe", "do_compact", "do_state_writes",
             "do_table", "do_btable"):
    kw = dict(base)
    kw[drop] = False
    timeit_carry(f"insert without {drop}", make_body(**kw), state, cand,
                 cmask)

# only btable / only state writes
only = dict(do_vds=False, do_probe=False, do_compact=False,
            do_state_writes=False, do_table=False, do_btable=False)
for keep in ("do_btable", "do_state_writes", "do_table"):
    kw = dict(only)
    kw[keep] = True
    timeit_carry(f"insert ONLY {keep}", make_body(**kw), state, cand, cmask)
