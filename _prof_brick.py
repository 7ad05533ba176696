"""Prototype: brick-table neighbor query (8 gathers of 4x4x4-cell bricks)
vs current 33-cell per-cell probe. Measures candidate scoring + top-k."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 16384
BB = 1 << 19          # brick rows
CPB = 64              # cells per brick (4^3)
res = 0.4

rng = np.random.RandomState(0)
btable = jnp.asarray(
    rng.randint(-1, 1000, (BB + 1, CPB, 3), dtype=np.int64).astype(np.int32))
q = jnp.asarray(rng.randn(N, 3).astype(np.float32) * 30)

PRIMES = jnp.asarray(np.array([73856093, 19349669, 83492791], np.int64)
                     .astype(np.uint32))


def hash_bc(bc):
    h = (bc[..., 0].astype(jnp.uint32) * PRIMES[0]
         ^ bc[..., 1].astype(jnp.uint32) * PRIMES[1]
         ^ bc[..., 2].astype(jnp.uint32) * PRIMES[2])
    return (h & jnp.uint32(BB - 1)).astype(jnp.int32)


OFF2 = jnp.asarray(np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                        indexing="ij"), -1).reshape(8, 3)
                   .astype(np.int32))
# cell offset within brick for slot s
SLOT = np.stack(np.meshgrid(np.arange(4), np.arange(4), np.arange(4),
                            indexing="ij"), -1).reshape(64, 3)
SLOT_J = jnp.asarray(SLOT.astype(np.int32))


def brick_query(btable, qq):
    grid = jnp.floor(qq / res).astype(jnp.int32)          # [N,3]
    b0 = (grid - 2) >> 2                                   # floor((g-2)/4)
    bcs = b0[:, None, :] + OFF2[None]                      # [N,8,3]
    hb = hash_bc(bcs)                                      # [N,8]
    rows = btable[hb]                                      # [N,8,64,3]
    idx = rows[..., 0]                                     # [N,8,64]
    ts = rows[..., 1]
    pp = rows[..., 2]
    # unpack 3x u8 cell-local offsets
    px = (pp & 0xff).astype(jnp.float32) * (res / 256.0)
    py = ((pp >> 8) & 0xff).astype(jnp.float32) * (res / 256.0)
    pz = ((pp >> 16) & 0xff).astype(jnp.float32) * (res / 256.0)
    base = (bcs[:, :, None, :] * 4 + SLOT_J[None, None]) \
        .astype(jnp.float32) * res                         # [N,8,64,3]
    cx = base[..., 0] + px - qq[:, None, None, 0]
    cy = base[..., 1] + py - qq[:, None, None, 1]
    cz = base[..., 2] + pz - qq[:, None, None, 2]
    d2 = cx * cx + cy * cy + cz * cz                       # [N,8,64]
    valid = (idx >= 0) & (ts >= 3) & (d2 < 27 * res * res)
    d2 = jnp.where(valid, d2, 9e3).reshape(N, 8 * CPB)
    neg, arg = jax.lax.top_k(-d2, 6)
    idx_k = jnp.take_along_axis(idx.reshape(N, -1), arg, axis=1)
    return jnp.sum(-neg) * 1e-9 + jnp.sum(idx_k.astype(jnp.float32)) * 1e-9


def timed(name, fn, reps=20):
    @jax.jit
    def run(tbl, key):
        def body(i, carry):
            k, acc = carry
            k, ks = jax.random.split(k)
            qq = q + jax.random.normal(ks, (1, 3)) * 0.01
            return k, acc + fn(tbl, qq)
        return jax.lax.fori_loop(0, reps, body, (key, jnp.float32(0)))
    out = run(btable, jax.random.PRNGKey(0))
    _ = float(out[1])
    t0 = time.time()
    _ = float(run(btable, jax.random.PRNGKey(1))[1])
    print(f"{name:26s}: {(time.time()-t0)/reps*1e3:7.2f} ms", flush=True)


timed("brick query (8x768B)", brick_query)

# variant: 2 i32/cell (idx, pos|ts8) -> 512B rows
btable2 = jnp.asarray(
    rng.randint(-1, 1000, (BB + 1, CPB, 2), dtype=np.int64).astype(np.int32))


def brick_query2(btable, qq):
    grid = jnp.floor(qq / res).astype(jnp.int32)
    b0 = (grid - 2) >> 2
    bcs = b0[:, None, :] + OFF2[None]
    hb = hash_bc(bcs)
    rows = btable[hb]                                      # [N,8,64,2]
    idx = rows[..., 0]
    pp = rows[..., 1]
    px = (pp & 0xff).astype(jnp.float32) * (res / 256.0)
    py = ((pp >> 8) & 0xff).astype(jnp.float32) * (res / 256.0)
    pz = ((pp >> 16) & 0xff).astype(jnp.float32) * (res / 256.0)
    base = (bcs[:, :, None, :] * 4 + SLOT_J[None, None]) \
        .astype(jnp.float32) * res
    cx = base[..., 0] + px - qq[:, None, None, 0]
    cy = base[..., 1] + py - qq[:, None, None, 1]
    cz = base[..., 2] + pz - qq[:, None, None, 2]
    d2 = cx * cx + cy * cy + cz * cz
    valid = (idx >= 0) & (d2 < 27 * res * res)
    d2 = jnp.where(valid, d2, 9e3).reshape(N, 8 * CPB)
    neg, arg = jax.lax.top_k(-d2, 6)
    idx_k = jnp.take_along_axis(idx.reshape(N, -1), arg, axis=1)
    return jnp.sum(-neg) * 1e-9 + jnp.sum(idx_k.astype(jnp.float32)) * 1e-9


def timed2(name, fn, tbl, reps=20):
    @jax.jit
    def run(tbl, key):
        def body(i, carry):
            k, acc = carry
            k, ks = jax.random.split(k)
            qq = q + jax.random.normal(ks, (1, 3)) * 0.01
            return k, acc + fn(tbl, qq)
        return jax.lax.fori_loop(0, reps, body, (key, jnp.float32(0)))
    out = run(tbl, jax.random.PRNGKey(0))
    _ = float(out[1])
    t0 = time.time()
    _ = float(run(tbl, jax.random.PRNGKey(1))[1])
    print(f"{name:26s}: {(time.time()-t0)/reps*1e3:7.2f} ms", flush=True)


timed2("brick query (8x512B)", brick_query2, btable2)


def brick_gather_only(btable, qq):
    grid = jnp.floor(qq / res).astype(jnp.int32)
    b0 = (grid - 2) >> 2
    bcs = b0[:, None, :] + OFF2[None]
    hb = hash_bc(bcs)
    rows = btable[hb]
    return jnp.sum(rows[..., 0].astype(jnp.float32)) * 1e-9


def brick_no_topk(btable, qq):
    grid = jnp.floor(qq / res).astype(jnp.int32)
    b0 = (grid - 2) >> 2
    bcs = b0[:, None, :] + OFF2[None]
    hb = hash_bc(bcs)
    rows = btable[hb]
    idx = rows[..., 0]
    pp = rows[..., 1]
    px = (pp & 0xff).astype(jnp.float32) * (res / 256.0)
    py = ((pp >> 8) & 0xff).astype(jnp.float32) * (res / 256.0)
    pz = ((pp >> 16) & 0xff).astype(jnp.float32) * (res / 256.0)
    base = (bcs[:, :, None, :] * 4 + SLOT_J[None, None]).astype(
        jnp.float32) * res
    cx = base[..., 0] + px - qq[:, None, None, 0]
    cy = base[..., 1] + py - qq[:, None, None, 1]
    cz = base[..., 2] + pz - qq[:, None, None, 2]
    d2 = cx * cx + cy * cy + cz * cz
    valid = (idx >= 0) & (d2 < 27 * res * res)
    d2 = jnp.where(valid, d2, 9e3)
    return jnp.sum(jnp.min(d2, axis=(1, 2))) * 1e-9


timed2("brick gather only", brick_gather_only, btable2)
timed2("brick no-topk (min)", brick_no_topk, btable2)


def brick_approx(btable, qq):
    grid = jnp.floor(qq / res).astype(jnp.int32)
    b0 = (grid - 2) >> 2
    bcs = b0[:, None, :] + OFF2[None]
    hb = hash_bc(bcs)
    rows = btable[hb]
    idx = rows[..., 0]
    pp = rows[..., 1]
    px = (pp & 0xff).astype(jnp.float32) * (res / 256.0)
    py = ((pp >> 8) & 0xff).astype(jnp.float32) * (res / 256.0)
    pz = ((pp >> 16) & 0xff).astype(jnp.float32) * (res / 256.0)
    base = (bcs[:, :, None, :] * 4 + SLOT_J[None, None]).astype(
        jnp.float32) * res
    cx = base[..., 0] + px - qq[:, None, None, 0]
    cy = base[..., 1] + py - qq[:, None, None, 1]
    cz = base[..., 2] + pz - qq[:, None, None, 2]
    d2 = cx * cx + cy * cy + cz * cz
    valid = (idx >= 0) & (d2 < 27 * res * res)
    d2 = jnp.where(valid, d2, 9e3).reshape(N, 8 * CPB)
    neg, arg = jax.lax.approx_max_k(-d2, 6)
    idx_k = jnp.take_along_axis(idx.reshape(N, -1), arg, axis=1)
    return jnp.sum(-neg) * 1e-9 + jnp.sum(idx_k.astype(jnp.float32)) * 1e-9


def brick_argmin6(btable, qq):
    grid = jnp.floor(qq / res).astype(jnp.int32)
    b0 = (grid - 2) >> 2
    bcs = b0[:, None, :] + OFF2[None]
    hb = hash_bc(bcs)
    rows = btable[hb]
    idx = rows[..., 0]
    pp = rows[..., 1]
    px = (pp & 0xff).astype(jnp.float32) * (res / 256.0)
    py = ((pp >> 8) & 0xff).astype(jnp.float32) * (res / 256.0)
    pz = ((pp >> 16) & 0xff).astype(jnp.float32) * (res / 256.0)
    base = (bcs[:, :, None, :] * 4 + SLOT_J[None, None]).astype(
        jnp.float32) * res
    cx = base[..., 0] + px - qq[:, None, None, 0]
    cy = base[..., 1] + py - qq[:, None, None, 1]
    cz = base[..., 2] + pz - qq[:, None, None, 2]
    d2 = cx * cx + cy * cy + cz * cz
    valid = (idx >= 0) & (d2 < 27 * res * res)
    d2 = jnp.where(valid, d2, 9e3).reshape(N, 8 * CPB)
    tot = jnp.float32(0)
    for _ in range(6):
        a = jnp.argmin(d2, axis=1)
        tot = tot + jnp.sum(jnp.take_along_axis(
            d2, a[:, None], axis=1)) * 1e-9
        d2 = d2.at[jnp.arange(N), a].set(9e3)
    return tot


timed2("brick approx_max_k", brick_approx, btable2)
timed2("brick argmin x6", brick_argmin6, btable2)
