"""Sliding-window bundle adjustment: joint pose + map refinement.

Rebuilds the reference `Mapper.bundle_adjustment` (reference:
utils/mapper.py:848-937): optimize the last `window` poses (se(3) tangent
deltas) together with the map features against the squared SDF at the
measured surface points, with Adam and separate pose/map learning rates
(reference: utils/tools.py:153-203 optimizer groups).

The reference uses pypose SE(3) autograd; here the pose parameters are
right-multiplied tangent deltas on frozen base poses, optimized by the same
jitted Adam loop as mapping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pin_slam_tpu.models import neural_points as npm
from pin_slam_tpu.ops.transforms import so3_exp
from pin_slam_tpu.slam import map_query as mq
from pin_slam_tpu.slam import mapper as mp


def collect_surface_samples(pool: mp.PoolState, cap: int):
    """Indices of exact-endpoint samples (sdf label == 0; reference
    get_ba_samples utils/mapper.py:506-524). Returns (idx [cap], count)."""
    P = pool.capacity
    row_valid = jnp.arange(P + 1) < pool.count
    is_surf = row_valid & (jnp.abs(pool.sdf_label) < 1e-9)
    order = jnp.cumsum(is_surf.astype(jnp.int32)) - 1
    ok = is_surf & (order < cap)
    dest = jnp.where(ok, order, cap).astype(jnp.int32)
    idx = jnp.zeros((cap + 1,), jnp.int32).at[dest].set(
        jnp.arange(P + 1, dtype=jnp.int32))
    return idx[:cap], jnp.sum(ok.astype(jnp.int32))


def make_ba_loop(qp: mq.QueryParams, *, n_iters: int, bs: int, window: int,
                 lr_pose: float, lr_map: float, adam_eps: float = 1e-15):
    """One jitted BA run. Takes base poses [T,4,4] (f32), optimizes tangent
    deltas for the last `window` of them + the map features."""

    def apply_delta(base_poses, deltas, first_opt):
        # base [T,4,4]; deltas [W,6]; pose_i' = base_i @ Exp(delta_{i-first})
        W = deltas.shape[0]
        R = so3_exp(deltas[:, :3])                     # [W,3,3]
        D = jnp.zeros((W, 4, 4), base_poses.dtype)
        D = D.at[:, :3, :3].set(R)
        D = D.at[:, :3, 3].set(deltas[:, 3:])
        D = D.at[:, 3, 3].set(1.0)
        T = base_poses.shape[0]
        full = jnp.broadcast_to(jnp.eye(4, dtype=base_poses.dtype),
                                (T, 4, 4))
        ids = jnp.clip(jnp.arange(T) - first_opt, 0, W - 1)
        mask = (jnp.arange(T) >= first_opt)[:, None, None]
        full = jnp.where(mask, D[ids], full)
        return jnp.einsum("tab,tbc->tac", base_poses, full)

    def loss_fn(params, state, pool, base_poses, first_opt, sidx, scount,
                key, lf):
        poses = apply_delta(base_poses, params["pose_deltas"], first_opt)
        pick = jax.random.randint(key, (bs,), 0,
                                  jnp.maximum(scount, 1))
        rows = sidx[pick]
        world = pool.coord[rows]
        ts = pool.ts[rows]
        base_T = base_poses[ts]
        # local coords w.r.t. the *base* poses, then re-projected through
        # the optimized poses (reference: coord stays in the frame's local
        # coordinates, utils/mapper.py:893)
        local = jnp.einsum(
            "nab,nb->na",
            jnp.swapaxes(base_T[:, :3, :3], 1, 2),
            world - base_T[:, :3, 3])
        opt_T = poses[ts]
        coord = jnp.einsum("nab,nb->na", opt_T[:, :3, :3], local) \
            + opt_T[:, :3, 3]
        out = mq.query_decode(
            state, params["geo_features"], params["geo_mlp"], coord, qp,
            lf=lf)
        return jnp.mean(out.sdf ** 2)

    def label_fn(params):
        return {
            "pose_deltas": "pose",
            "geo_features": "map",
            "geo_mlp": jax.tree.map(lambda _: "frozen", params["geo_mlp"]),
        }

    optimizer = optax.multi_transform(
        {
            "pose": optax.adam(lr_pose, eps=adam_eps),
            "map": optax.adam(lr_map, eps=adam_eps),
            "frozen": optax.set_to_zero(),
        },
        label_fn,
    )

    def run(state, pool, geo_features, geo_mlp, base_poses, first_opt, key,
            lf):
        sidx, scount = collect_surface_samples(pool, 1 << 18)
        params = {
            "pose_deltas": jnp.zeros((window, 6), jnp.float32),
            "geo_features": geo_features,
            "geo_mlp": geo_mlp,
        }
        opt_state = optimizer.init(params)

        def body(carry, k):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                params, state, pool, base_poses, first_opt, sidx, scount,
                k, lf)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, n_iters)
        (params, _), losses = jax.lax.scan(body, (params, opt_state), keys)
        poses = apply_delta(base_poses, params["pose_deltas"], first_opt)
        return poses, params["geo_features"], losses

    return jax.jit(run)


_TRANSFORM_POOL_JIT = None


def _transform_pool_jit():
    """Module-cached jitted pool re-transform (was re-jitted per BA call)."""
    global _TRANSFORM_POOL_JIT
    if _TRANSFORM_POOL_JIT is None:
        def transform_pool(pool, d):
            from pin_slam_tpu.ops.transforms import transform_points_by_ts
            coord = transform_points_by_ts(pool.coord, pool.ts, d)
            return pool.replace(coord=coord)

        _TRANSFORM_POOL_JIT = jax.jit(transform_pool)
    return _TRANSFORM_POOL_JIT


def run_bundle_adjustment(system, frame_id: int):
    """Host wrapper (reference call site: pin_slam.py:388-389). Updates the
    system pose arrays and map features in place."""
    c = system.config
    n = frame_id + 1
    window = min(c.ba_frame, n)
    first_opt = n - window

    key = f"_ba_loop_{window}"
    if not hasattr(system, key):
        setattr(system, key, make_ba_loop(
            system.qp, n_iters=c.ba_iters, bs=c.ba_bs, window=window,
            lr_pose=c.lr_pose, lr_map=c.lr_ba_map, adam_eps=c.adam_eps))
    loop = getattr(system, key)

    # pad the pose array to the STATIC max_frames shape so the jitted BA
    # program is compiled once, not once per frame count
    base_full = np.tile(np.eye(4), (system.max_frames, 1, 1))
    base = system.pgo_poses[:n] if c.pgo_on else system.odom_poses[:n]
    base_full[:n] = base
    system.key, k = jax.random.split(system.key)
    lf = system._lf(frame_id)
    poses, feats, losses = loop(
        system.state, system.pool, system.params["geo_features"],
        system.params["geo_mlp"], jnp.asarray(base_full, jnp.float32),
        jnp.int32(first_opt), k, lf)

    poses_np = np.asarray(poses[:n], np.float64)
    # re-map the replay pool's world coords through the pose corrections
    # (replaces the reference's ba_done_flag re-transform path,
    # utils/mapper.py:301-312,637-640)
    from pin_slam_tpu.ops.transforms import np_se3_inv

    diffs = np.tile(np.eye(4), (system.max_frames, 1, 1))
    for i in range(n):
        diffs[i] = poses_np[i] @ np_se3_inv(base[i])
    # static [max_frames,4,4] shape -> the cached jit never recompiles
    system.pool = _transform_pool_jit()(
        system.pool, jnp.asarray(diffs, jnp.float32))

    if c.pgo_on:
        system.pgo_poses[:n] = poses_np
    else:
        system.odom_poses[:n] = poses_np
    system.cur_pose_ref = poses_np[-1]
    system.last_pose_ref = poses_np[-1]
    system.params["geo_features"] = feats
    system.state = system.state.replace(geo_features=feats)
    return float(losses[-1])
