"""Scatter/gather strategy shootout, measured with in-jit fori_loop reps
where the SCATTER TARGET IS THE LOOP CARRY (so XLA cannot eliminate or
simplify the op chain) and gather results feed a nonlinear reduction."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

REPS = 30


def timeit_carry(name, body, init, *args):
    """body(it, carry, *args) -> carry; carry must absorb the op's result."""
    @jax.jit
    def run(carry, *a):
        return jax.lax.fori_loop(
            0, REPS, lambda it, c: body(it, c, *a), carry)

    r = run(init, *args)
    jax.block_until_ready(r)
    t0 = time.time()
    r = run(init, *args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / REPS * 1e3
    print(f"{name:52s} {dt:8.3f} ms")
    return dt


rng = np.random.RandomState(0)
ROWS = 98304
F = 8

for L in (131072, (1 << 20) + 1):
    idx = jnp.asarray(rng.randint(0, L - 1, ROWS), jnp.int32)
    vals = jnp.asarray(rng.randn(ROWS, F), jnp.float32)
    tgt = jnp.zeros((L, F), jnp.float32)

    timeit_carry(
        f"scatter-add [{ROWS}]->[{L},{F}]",
        lambda it, t, i, v: t.at[(i + it) % (L - 1)].add(v),
        tgt, idx, vals)
    timeit_carry(
        f"scatter-add w1 [{ROWS}]->[{L}]",
        lambda it, t, i, v: t.at[(i + it) % (L - 1)].add(v[:, 0]),
        tgt[:, 0], idx, vals)
    # gather: carry a scalar accumulator through a nonlinear use
    timeit_carry(
        f"gather [{ROWS}] w{F} <- [{L},{F}]",
        lambda it, c, t, i: c + jnp.sum(jnp.square(t[(i + it) % (L - 1)])),
        jnp.float32(0.0), tgt + 1.0, idx)

    def onehot_f32(it, t, i, v):
        out = t
        CH = 8192
        i = (i + it) % (L - 1)
        for s in range(0, ROWS, CH):
            ii = jax.lax.dynamic_slice(i, (s,), (CH,))
            vv = jax.lax.dynamic_slice(v, (s, 0), (CH, F))
            oh = (ii[:, None] == jnp.arange(L)[None, :]).astype(jnp.float32)
            out = out + oh.T @ vv
        return out

    if L == 131072:
        timeit_carry(f"onehot-matmul f32 chunked -> [{L},{F}]", onehot_f32,
                     tgt, idx, vals)
        timeit_carry(
            f"sort+segsum -> [{L},{F}]",
            lambda it, t, i, v: t + jax.ops.segment_sum(
                v[jnp.argsort((i + it) % (L - 1))],
                jnp.sort((i + it) % (L - 1)), num_segments=L,
                indices_are_sorted=True),
            tgt, idx, vals)

# ---- brick probe gather patterns
NB = 1 << 19
N = 16384
bt3 = jnp.asarray(rng.randint(0, 1 << 20, (NB + 1, 64, 3)), jnp.int32)
btflat1 = jnp.reshape(bt3[..., 0], (-1,))
hb = jnp.asarray(rng.randint(0, NB, (N, 8)), jnp.int32)

timeit_carry(
    "brick row gather [16384x8] <- [512k,64,3]",
    lambda it, c, b, h: c + jnp.sum(
        jnp.square(b[(h + it) % NB].astype(jnp.float32))),
    jnp.float32(0.0), bt3, hb)
timeit_carry(
    "flat elem gather [16384x8x64] w1 <- [32M]",
    lambda it, c, b, h: c + jnp.sum(jnp.square(
        b[(((h + it) % NB)[:, :, None] * 64
           + jnp.arange(64)[None, None, :])].astype(jnp.float32))),
    jnp.float32(0.0), btflat1, hb)

# narrow gathers at tracker scale
pos = jnp.asarray(rng.randn((1 << 20) + 1, 3), jnp.float32)
nidx = jnp.asarray(rng.randint(0, 1 << 20, (8192, 6)), jnp.int32)
timeit_carry(
    "pos gather [8192x6] w3 <- [1M,3]",
    lambda it, c, p, i: c + jnp.sum(jnp.square(p[(i + it) % (1 << 20)])),
    jnp.float32(0.0), pos, nidx)

# adam: params are the carry
import optax
opt = optax.adam(2e-3, eps=1e-15)
for L in (131072, (1 << 20) + 1):
    p = {"f": jnp.zeros((L, F)), "m": jnp.zeros((64, 64))}
    ost = opt.init(p)
    g = jax.tree.map(jnp.ones_like, p)

    def adam_step(it, carry, g):
        p, o = carry
        gg = jax.tree.map(lambda x: x * (1.0 + it), g)
        up, o2 = opt.update(gg, o, p)
        return jax.tree.map(lambda a, b: a + b, p, up), o2

    timeit_carry(f"adam update [{L},{F}]", adam_step, (p, ost), g)
