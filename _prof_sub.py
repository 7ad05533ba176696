import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from pin_slam_tpu.ops import hash3d

N, K = 16384, 33
B = 1 << 23
C = 1 << 20
rng = np.random.RandomState(0)
table = jnp.asarray(rng.randint(-1, 1 << 18, B + 1), jnp.int32)
positions = jnp.asarray(rng.randn(C + 1, 3) * 20, jnp.float32)
q0 = jnp.asarray(rng.randn(N, 3) * 20, jnp.float32)
offs = jnp.asarray(hash3d.neighbor_offsets(2, 0.2), jnp.int32)
d2r = jnp.asarray(rng.rand(N, K), jnp.float32)
R = 50


def reps(name, inner):
    def prog(q):
        def body(i, acc):
            return acc + inner(q + acc * 1e-9)
        return jax.lax.fori_loop(0, R, body, jnp.float32(0))
    g = jax.jit(prog)
    r = g(q0)
    jax.block_until_ready(r)
    t0 = time.time()
    r = g(q0)
    jax.block_until_ready(r)
    print(f"{name:34s}: {(time.time()-t0)/R*1e3:7.3f} ms", flush=True)


def s_hash(q):
    grid = hash3d.grid_coords(q, 0.3)
    cells = grid[:, None, :] + offs[None]
    h = hash3d.hash_grid(cells, B)
    return h.sum().astype(jnp.float32)


reps("hash cells [N,33]", s_hash)


def s_tab(q):
    grid = hash3d.grid_coords(q, 0.3)
    cells = grid[:, None, :] + offs[None]
    h = hash3d.hash_grid(cells, B)
    idx = table[h]
    return idx.sum().astype(jnp.float32)


reps("+table gather", s_tab)


def s_pos(q):
    grid = hash3d.grid_coords(q, 0.3)
    cells = grid[:, None, :] + offs[None]
    h = hash3d.hash_grid(cells, B)
    idx = table[h]
    idx_c = jnp.where(idx >= 0, idx, C)
    pos = positions[idx_c]
    d2 = jnp.sum((pos - q[:, None, :]) ** 2, -1)
    return d2.sum()


reps("+pos gather + dist [N,33,3]", s_pos)


def s_topk(q):
    d2 = d2r + q[0, 0] * 1e-9
    v, a = jax.lax.top_k(-d2, 6)
    return v.sum() + a.sum().astype(jnp.float32)


reps("top_k(6) alone on [N,33]", s_topk)


def s_sort(q):
    d2 = d2r + q[0, 0] * 1e-9
    s = jnp.sort(d2, axis=1)
    return s[:, :6].sum()


reps("full sort rows [N,33]", s_sort)


def s_iter_max(q):
    d2 = d2r + q[0, 0] * 1e-9
    neg = -d2
    total = jnp.float32(0)
    cur = neg
    cols = jax.lax.broadcasted_iota(jnp.int32, (N, K), 1)
    for _ in range(6):
        m = jnp.max(cur, axis=1, keepdims=True)
        am = jnp.argmax(cur, axis=1)
        total = total + m.sum()
        cur = jnp.where(cols == am[:, None], -jnp.inf, cur)
    return total


reps("6x argmax+where", s_iter_max)
