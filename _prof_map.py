"""Decompose the map-opt (train loop) cost at bench shapes.

In-jit fori_loop reps only (dispatch timing through the tunnel lies).
Run AFTER the TPU is idle. Pieces:
  lset      build_lset_train (once/frame)
  probe     join probe at [bs]
  fwd       mapping_loss forward
  grad      mapping_loss value_and_grad
  step1     scan loop n_iters=1 (incl. gather/scatter in/out)
  step12    scan loop n_iters=12
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pin_slam_tpu.config import Config
from pin_slam_tpu.slam.system import PinSLAMSystem
from bench import build_frames

REPS = int(os.environ.get("REPS", 20))

cfg = Config()
cfg.track_on = True
cfg.max_range = 80.0
cfg.min_range = 0.5
cfg.vox_down_m = 0.08
cfg.source_vox_down_m = 0.6
cfg.voxel_size_m = 0.4
cfg.sigma_sigmoid_m = 0.08
cfg.surface_sample_range_m = 0.25
cfg.surface_sample_n = 4
cfg.loss_weight_on = True
cfg.bs = 16384
cfg.iters = 12
cfg.init_iter_ratio = 30
cfg.bs_new_sample = 1000
cfg.reg_iter_n = 100
cfg.map_capacity = 1 << 20
cfg.buffer_size = 1 << 23
cfg.frame_point_cap = 1 << 16
cfg.source_point_cap = 1 << 13
cfg.max_frames = 256
cfg.finalize()
cfg.pool_capacity = 4_000_000

frames, poses = build_frames(12, 900, 56, "/root/repo/.bench_frames.npz")
system = PinSLAMSystem(cfg)
system.set_gt_poses(poses)
for fid in range(7):
    system.process_frame(fid, frames[fid])
jax.block_until_ready(system.params["geo_features"])
print("warm state ready", file=sys.stderr)

c = cfg
fid = 6
td = jnp.asarray(system.travel_dist[: system.max_frames], jnp.float32)
lset = system._build_lset_train(
    system.state, td, jnp.int32(fid), jnp.int32(system.reboot_ts))
lf = system._lf(fid)
jax.block_until_ready(lset.pts)


def timeit(name, fn, *args):
    """fn(*args) -> jitted program with internal fori reps."""
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / REPS * 1e3
    print(f"{name:28s} {dt:8.3f} ms")
    return dt


# ---- lset build (repeat by varying cur_ts dependence cheaply)
@jax.jit
def lset_rep(state, td):
    def body(i, acc):
        ls = system._build_lset_train.__wrapped__(
            state, td, jnp.int32(fid), jnp.int32(0))
        return acc + ls.pts[0, 0] + jnp.float32(i) * 0.0
    return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

timeit("build_lset_train", lset_rep, system.state, td)

# ---- join probe at bs
from pin_slam_tpu.models import neural_points as npm
from pin_slam_tpu.slam import mapper as mp
from pin_slam_tpu.slam import map_query as mq

key = jax.random.PRNGKey(0)
bidx = jax.jit(lambda k: mp.draw_batch_indices(
    k, system.pool, c.bs, c.bs_new_sample, jnp.bool_(True)))(key)
qp = system.qp


@jax.jit
def probe_rep(lset, pool, bidx):
    pts = pool.coord[bidx.idx]
    def body(i, acc):
        qn = npm.query_neighbors_join(
            None, pts + acc * 0.0, lset, nn_k=qp.nn_k,
            max_dist2=qp.join_max_dist2, resolution=qp.resolution,
            local_ids=True)
        return acc + qn.dist2[0, 0]
    return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

timeit("join probe [bs]", probe_rep, lset, system.pool, bidx)

# ---- loss forward / grad
lset_c = lset
lparams = dict(system.params)
lparams["geo_features"] = system.params["geo_features"][lset.gidx]
lk = system._loss_kwargs


@jax.jit
def fwd_rep(lparams, pool, bidx, lset):
    def body(i, acc):
        loss, aux = mp.mapping_loss(
            lparams, None, pool, bidx, qp, lf, key=key, lset=lset, **lk)
        return acc + loss
    return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

timeit("mapping_loss fwd", fwd_rep, lparams, system.pool, bidx, lset)


@jax.jit
def grad_rep(lparams, pool, bidx, lset):
    def body(i, carry):
        acc, p = carry
        (loss, aux), g = jax.value_and_grad(
            mp.mapping_loss, has_aux=True)(
            p, None, pool, bidx, qp, lf, key=key, lset=lset, **lk)
        p = jax.tree.map(lambda a, b: a + 0.0 * b, p, g)
        return (acc + loss, p)
    return jax.lax.fori_loop(0, REPS, body, (jnp.float32(0.0), lparams))[0]

timeit("mapping_loss fwd+bwd", grad_rep, lparams, system.pool, bidx, lset)

# ---- full train loops (already-jitted cached programs; time 3 calls)
for iters in (1, 12):
    loop = system._get_train_loop(iters, True)
    out = loop(system.params, system.opt_state, system.state, system.pool,
               system.key, lf, jnp.bool_(True), lset)
    jax.block_until_ready(out[0]["geo_features"])
    t0 = time.time()
    N = 5
    for _ in range(N):
        out = loop(system.params, system.opt_state, system.state,
                   system.pool, system.key, lf, jnp.bool_(True), lset)
    jax.block_until_ready(out[0]["geo_features"])
    print(f"train_loop iters={iters:2d}          "
          f"{(time.time()-t0)/N*1e3:8.3f} ms")
