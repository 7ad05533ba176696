"""Brick-table scatter variants: 2D vs flat vs donated vs smaller target.
Carry-based in-jit loops; validated against the known-real 53.7ms 2D case."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPS = 10


def timeit_carry(name, body, init, *args, reps=REPS, donate=False):
    jf = jax.jit(
        (lambda carry, *a: jax.lax.fori_loop(
            0, reps, lambda it, c: body(it, c, *a), carry)),
        donate_argnums=(0,) if donate else ())

    r = jf(init, *args)
    jax.block_until_ready(r)
    t0 = time.time()
    r = jf(r if donate else init, *args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / reps * 1e3
    print(f"{name:56s} {dt:8.3f} ms")
    return dt


rng = np.random.RandomState(0)
ROWS = 1 << 16
NB = 1 << 19          # current brick count for 8M cell table

bt = jnp.full((NB + 1, 64, 3), -1, jnp.int32)
hb = jnp.asarray(rng.randint(0, NB, ROWS), jnp.int32)
slot = jnp.asarray(rng.randint(0, 64, ROWS), jnp.int32)
rec = jnp.asarray(rng.randint(0, 1 << 20, (ROWS, 3)), jnp.int32)


def scat2d(it, c, hb, slot, rec):
    return c.at[(hb + it) % NB, slot].set(rec)


timeit_carry("2D scatter [65k] -> [512k,64,3] (ref: 53.7)", scat2d,
             bt, hb, slot, rec)
timeit_carry("2D scatter DONATED", scat2d, bt, hb, slot, rec, donate=True)

btf = jnp.full(((NB + 1) * 64, 3), -1, jnp.int32)


def scatflat(it, c, hb, slot, rec):
    return c.at[((hb + it) % NB) * 64 + slot].set(rec)


timeit_carry("flat scatter [65k] -> [32M,3]", scatflat, btf, hb, slot, rec)
timeit_carry("flat scatter DONATED", scatflat, btf, hb, slot, rec,
             donate=True)

# fewer rows
for rows in (8192,):
    hbs = hb[:rows]
    slots = slot[:rows]
    recs = rec[:rows]
    timeit_carry(f"flat scatter [{rows}] -> [32M,3]", scatflat, btf,
                 hbs, slots, recs)

# smaller target
NB2 = 1 << 17
btf2 = jnp.full(((NB2 + 1) * 64, 3), -1, jnp.int32)


def scatflat2(it, c, hb, slot, rec):
    return c.at[((hb + it) % NB2) * 64 + slot].set(rec)


timeit_carry("flat scatter [65k] -> [8M,3] (128k bricks)", scatflat2,
             btf2, hb, slot, rec)

# reshape-in-jit roundtrip cost (2D stored, flat scatter inside)
def scat_reshape(it, c, hb, slot, rec):
    f = c.reshape(-1, 3)
    f = f.at[((hb + it) % NB) * 64 + slot].set(rec)
    return f.reshape(c.shape)


timeit_carry("2D stored, flat scatter via reshape", scat_reshape,
             bt, hb, slot, rec)
timeit_carry("2D stored, flat reshape DONATED", scat_reshape,
             bt, hb, slot, rec, donate=True)

# the probe gather from the flat table (sanity: layout change must not
# slow the 8-row reads)
bt3 = jnp.asarray(rng.randint(0, 1 << 20, (NB + 1, 64, 3)), jnp.int32)
hq = jnp.asarray(rng.randint(0, NB, (16384, 8)), jnp.int32)


def probe2d(it, acc, b, h):
    return acc + jnp.sum(jnp.square(b[(h + it) % NB].astype(jnp.float32)))


timeit_carry("probe gather 2D rows [16k x 8] (ref: 5.45)", probe2d,
             jnp.float32(0.0), bt3, hq)


def probe_flat_rows(it, acc, b, h):
    f = b.reshape(NB + 1, 64 * 3)
    return acc + jnp.sum(jnp.square(f[(h + it) % NB].astype(jnp.float32)))


timeit_carry("probe gather reshaped [16k x 8 x 192]", probe_flat_rows,
             jnp.float32(0.0), bt3, hq)
