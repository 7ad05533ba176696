import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def trial(name, nbytes):
    big = jnp.zeros((nbytes // 4,), jnp.float32)
    f = jax.jit(lambda b, x: (b[0] + x))
    r = f(big, jnp.float32(1.0))
    _ = float(r)
    t0 = time.time()
    for i in range(10):
        r = f(big, jnp.float32(i))
        _ = float(r)
    print(f"{name:28s}: {(time.time()-t0)/10*1e3:7.2f} ms/call", flush=True)


trial("arg 4 KB", 4 << 10)
trial("arg 4 MB", 4 << 20)
trial("arg 64 MB", 64 << 20)
trial("arg 256 MB", 256 << 20)


def trial_scatter(name, nbytes, donate):
    big = jnp.zeros((nbytes // 4,), jnp.float32)
    if donate:
        f = jax.jit(lambda b, i: b.at[i].add(1.0), donate_argnums=0)
    else:
        f = jax.jit(lambda b, i: b.at[i].add(1.0))
    big = f(big, jnp.int32(0))
    _ = float(big[0])
    t0 = time.time()
    for i in range(10):
        big = f(big, jnp.int32(i))
        _ = float(big[i])
    print(f"{name:28s}: {(time.time()-t0)/10*1e3:7.2f} ms/call", flush=True)


trial_scatter("scatter 256MB no-donate", 256 << 20, False)
trial_scatter("scatter 256MB donate", 256 << 20, True)
