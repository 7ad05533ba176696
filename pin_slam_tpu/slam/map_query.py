"""Unified map query + decode path.

This is the single hot primitive shared by tracking, online mapping and
meshing (reference: NeuralPoints.query_feature model/neural_points.py:530-746
+ Decoder heads model/decoder.py:83-114, consumed from utils/tracker.py:227,
utils/mapper.py:645, utils/mesher.py:40). Everything here is pure and
jit-compatible; static parameters are python scalars closed over by the
caller's jitted functions.

Coordinate anchoring: query points may be passed in an *anchored* world frame
(world minus a float64 host-side anchor) for f32 conditioning; the `anchor`
argument is added back only where absolute coordinates are required (voxel
hashing / map-position comparisons).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pin_slam_tpu.models import neural_points as npm
from pin_slam_tpu.models.decoder import (
    color_apply,
    sdf_apply,
    sem_log_prob_apply,
    weighted_reduce,
)


class QueryParams(NamedTuple):
    """Static query configuration (hashable; safe to close over)."""

    offsets: tuple            # neighborhood cell offsets as nested tuples
    resolution: float
    nn_k: int
    max_dist2: float
    sdf_scale: float
    weighted_first: bool
    # offsets are ALWAYS rotated by the stored point orientations: they are
    # identity quaternions until the first PGO deformation, so this is
    # arithmetically identical to the reference's after_pgo gating
    # (model/neural_points.py:645-648) with NO recompile at the first loop
    # closure (the flag used to rebuild every jitted program mid-run)
    after_pgo: bool = True
    layer_norm_on: bool = False
    probe_mode: str = "brick"  # 'brick' (TPU) / 'cells' (CPU) — see
                               # neural_points.query_neighbors
    idw_index: int = 2        # IDW exponent (reference: utils/config.py:99)
    mlp_leaky_relu: bool = False  # decoder activation (ref decoder.py:69-75)
    use_mid_ts: bool = False  # window by (create+update)/2 mid-timestamp
                              # (reference: reset_local_map :449-452)
    # radius bound for the spatial-join probe: the reference's candidate
    # set is points stored in cells of the (num_nei_cells+alpha)-ball, i.e.
    # distances up to ~(ball_r + sqrt(3)/2) cells; the validity bound
    # max_dist2 alone (3*(n+1)^2 cells^2) is far looser and would admit
    # neighbors the reference never sees
    join_max_dist2: float = 0.0

    @property
    def offsets_np(self) -> np.ndarray:
        return np.asarray(self.offsets, np.int32)


def make_query_params(config, after_pgo: bool = True) -> QueryParams:
    from pin_slam_tpu.ops import hash3d

    offs = hash3d.neighbor_offsets(config.num_nei_cells, config.search_alpha)
    ball_r = float(np.sqrt((offs.astype(np.float64) ** 2).sum(-1).max()))
    join_r = (ball_r + np.sqrt(3.0) / 2.0) * config.voxel_size_m
    return QueryParams(
        offsets=tuple(map(tuple, offs.tolist())),
        resolution=config.voxel_size_m,
        nn_k=config.query_nn_k,
        max_dist2=hash3d.max_valid_dist2(config.num_nei_cells, config.voxel_size_m),
        sdf_scale=config.sdf_scale,
        weighted_first=config.weighted_first,
        after_pgo=after_pgo,
        layer_norm_on=config.layer_norm_on,
        probe_mode=_resolve_probe_mode(getattr(config, "probe_mode", "auto")),
        idw_index=config.idw_index,
        mlp_leaky_relu=config.mlp_leaky_relu,
        use_mid_ts=config.use_mid_ts,
        join_max_dist2=float(min(
            hash3d.max_valid_dist2(config.num_nei_cells,
                                   config.voxel_size_m),
            join_r ** 2)),
    )


def _resolve_probe_mode(mode: str) -> str:
    if mode in ("brick", "cells", "join"):
        return mode
    import jax
    return "join" if jax.default_backend() == "tpu" else "cells"


class LocalFilter(NamedTuple):
    """Traced arguments of the query-time local-map masking (replaces the
    reference's materialized local map, model/neural_points.py:424-513)."""

    travel_dist: jnp.ndarray     # [maxT] f32
    cur_ts: jnp.ndarray          # scalar i32
    local_window_dist: float     # python float (static)
    sensor_pos: Optional[jnp.ndarray] = None  # [3] anchored frame
    local_map_radius: float = 0.0
    reboot_ts: int = 0           # traced or python int
    # per-frame sensor origins [maxT, 3] (world), used by the projective
    # SDF-label correction (reference: utils/mapper.py:695-697)
    sensor_origins: Optional[jnp.ndarray] = None


class QueryOut(NamedTuple):
    sdf: jnp.ndarray             # [N]
    sdf_std: Optional[jnp.ndarray]
    nn_count: jnp.ndarray        # [N]
    certainty: jnp.ndarray       # [N]
    neighbors: npm.QueryNeighbors
    weights: jnp.ndarray         # [N, k]
    color: Optional[jnp.ndarray]       # [N, Cc]
    sem_log_prob: Optional[jnp.ndarray]  # [N, S]


def _maybe_layer_norm(x, on: bool):
    if not on:
        return x
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5)


def rerank_candidates(
    lset,
    q_abs: jnp.ndarray,          # [N, 3] absolute world
    cand: jnp.ndarray,           # [N, K] local candidate ids (K >= nn_k)
    cvalid: jnp.ndarray,         # [N, K]
    qp: QueryParams,
) -> npm.QueryNeighbors:
    """Exact top-nn_k from a cached candidate set. The probe kernel
    (ops/knn_join.py) emits candidates SORTED ascending by distance, and
    within a frame's training run the positions do not move — so the true
    top-nn_k is literally the first nn_k columns; no distance recompute,
    no top_k (measured: a lax.top_k re-rank here costs as much as the
    kernel probe it replaces). Downstream query_decode recomputes the
    selected neighbors' distances differentiably anyway."""
    del lset, q_abs
    k = qp.nn_k
    return npm.QueryNeighbors(
        idx=cand[:, :k], dist2=jnp.zeros(cand[:, :k].shape, jnp.float32),
        valid=cvalid[:, :k],
        nn_count=jnp.sum(cvalid, axis=-1).astype(jnp.int32))


def pack_lset_rows(lset, geo_features: jnp.ndarray) -> jnp.ndarray:
    """Pack per-row attributes [pts(3) | quat(4, only when deformed) |
    feats(F)] into one array. TPU random-gather cost is per ROW fetched,
    independent of row width (see MapState.btable notes), so consumers
    gather this ONCE per query instead of 2-3 separate gathers — and the
    backward pass emits ONE scatter-add instead of one per gathered
    array. Positions/quats take no gradient (stop_gradient at the
    consumer), features do."""
    parts = [lset.pts]
    if lset.quat is not None:
        parts.append(lset.quat)
    parts.append(geo_features)
    return jnp.concatenate(parts, axis=1)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gather_splitgrad_impl(nshape, fshape, nodiff_cols, feats, idx):
    nd = nshape[-1]
    g = jnp.concatenate([nodiff_cols, feats], axis=-1)[idx]
    return g[..., :nd], g[..., nd:]


def _gather_splitgrad_fwd(nshape, fshape, nodiff_cols, feats, idx):
    return _gather_splitgrad_impl(nshape, fshape, nodiff_cols, feats,
                                  idx), (idx,)


def _gather_splitgrad_bwd(nshape, fshape, res, cts):
    (idx,) = res
    _, ct_f = cts
    d_feats = jnp.zeros(fshape, ct_f.dtype).at[idx].add(ct_f)
    return (jnp.zeros(nshape, jnp.float32), d_feats,
            np.zeros(idx.shape, jax.dtypes.float0))


_gather_splitgrad_impl.defvjp(_gather_splitgrad_fwd, _gather_splitgrad_bwd)


def gather_rows_splitgrad(nodiff_cols: jnp.ndarray, feats: jnp.ndarray,
                          idx: jnp.ndarray):
    """One packed row gather with a FEATURE-ONLY backward scatter.

    Forward = `concat([nodiff_cols, feats], -1)[idx]` split back into
    (nodiff rows, feat rows): one [rows]-gather for everything (TPU
    random-gather cost is per row). Backward scatters ONLY the feature
    cotangent into a [L+1, F] zero array — the default autodiff of the
    packed gather instead pads the feature cotangent back to the full
    packed width and scatter-adds all 3(+4)+F columns, which measured
    ~27% of the whole train-iteration device time for pure-zero position
    columns (trace: fusion.514, f32[65537,11] scatter of 98304 rows)."""
    return _gather_splitgrad_impl(tuple(nodiff_cols.shape),
                                  tuple(feats.shape), nodiff_cols, feats,
                                  idx)


def topk_select_mask(d2m: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact top-k-smallest selection mask over the last axis, with
    argmin first-index tie semantics, as ONE fused rank computation.

    Equivalent to k rounds of (argmin -> one_hot -> mask-out), which is
    what it replaces: each round is a full pass over the candidate array
    and the k-round loop measured ~1 ms per GN iteration at [16k, 12] on
    v5e (6 separate fusions in the device trace). rank_i = #candidates
    that beat i (strictly smaller distance, or equal at a lower index);
    selected = rank < k. Rows holding BIG_DIST2 sentinels select like any
    other value and are masked by the caller's validity &-mask, exactly
    as the loop's `ok` check was."""
    K = d2m.shape[-1]
    a = d2m[..., :, None]
    b = d2m[..., None, :]
    ii = jnp.arange(K)
    beats = (b < a) | ((b == a) & (ii[..., None, :] < ii[..., :, None]))
    return jnp.sum(beats, axis=-1) < k


def pack_lset_nodiff(lset) -> jnp.ndarray:
    """The non-differentiated row columns [pts(3) | quat(4, when
    deformed)] for gather_rows_splitgrad."""
    if lset.quat is not None:
        return jnp.concatenate([lset.pts, lset.quat], axis=1)
    return lset.pts


def _unpack_rows(g: jnp.ndarray, has_quat: bool):
    """Split a pack_lset_rows gather [..., 3(+4)+F] -> (pos, quat, feats);
    pos/quat are stop_gradient'd (map geometry takes no training grad)."""
    pos = jax.lax.stop_gradient(g[..., :3])
    if has_quat:
        quat = jax.lax.stop_gradient(g[..., 3:7])
        return pos, quat, g[..., 7:]
    return pos, None, g[..., 3:]


def query_decode(
    state: npm.MapState,
    geo_features: jnp.ndarray,       # [C+1, F] (trainable; may differ from state's)
    geo_mlp,                         # decoder param pytree
    qpts: jnp.ndarray,               # [N, 3] anchored world frame
    qp: QueryParams,
    *,
    anchor: Optional[jnp.ndarray] = None,   # [3] f32 world offset of the frame
    lf: Optional[LocalFilter] = None,
    color_features: Optional[jnp.ndarray] = None,
    color_mlp=None,
    sem_mlp=None,
    with_std: bool = False,
    color_channel: int = 0,
    lset=None,                       # ops.knn_join.LocalSet (spatial join)
    cand=None,                       # ([N, K] ids, [N, K] valid) cached
    cand_pack=None,                  # [L+1, 3(+4)+F] pack_lset_rows array
) -> QueryOut:
    """Query k-NN neural points and decode SDF (and optionally color /
    semantics) at the query positions. Differentiable w.r.t. qpts,
    geo_features/color_features, and MLP params.

    When `lset` is given the neighbor search runs through the tiled
    spatial-join kernel (ops/knn_join.py); the local-map filters are baked
    into the set, so `lf` is ignored for the search. LOCAL CONTRACT: with
    lset, `geo_features`/`color_features` must be COMPACT [L+1, F] arrays
    aligned with the set rows (dump row last); positions/certainty/
    orientations come from the set itself. All hot gathers then touch
    [L]-sized arrays instead of the [C]-sized map.

    With `cand` (+ lset), the kernel probe is skipped entirely: the exact
    top-nn_k neighbors are re-ranked from the cached candidate set by true
    distance (identical result when the candidates were probed with
    K >= nn_k at the same radius bound and the map positions have not
    moved — the per-frame training loop's case)."""
    q_abs = qpts if anchor is None else qpts + anchor

    if cand is not None:
        qn = rerank_candidates(lset, q_abs, cand[0], cand[1], qp)
    elif lset is not None:
        qn = npm.query_neighbors_join(
            state, q_abs, lset, nn_k=qp.nn_k,
            max_dist2=qp.join_max_dist2,
            resolution=qp.resolution, local_ids=True)
    else:
        kwargs = {}
        if lf is not None:
            kwargs = dict(
                time_filter=True,
                travel_dist=lf.travel_dist,
                cur_ts=lf.cur_ts,
                local_window_dist=lf.local_window_dist,
                reboot_ts=lf.reboot_ts,
                use_mid_ts=qp.use_mid_ts,
            )
            if lf.sensor_pos is not None:
                kwargs.update(
                    radius_filter=True,
                    sensor_pos=(lf.sensor_pos if anchor is None
                                else lf.sensor_pos + anchor),
                    local_map_radius=lf.local_map_radius,
                )

        # "join" keeps no brick cache (maintain_btable=False in the frame
        # update), so lset-less queries — mesher grids, BA, dynamic filter,
        # vertex attributes — must probe the always-maintained cell table;
        # falling through to the brick probe would read an empty btable and
        # return nn_count=0 everywhere.
        probe = "cells" if qp.probe_mode == "join" else qp.probe_mode
        qn = npm.query_neighbors(
            state, q_abs,
            offsets=qp.offsets_np, resolution=qp.resolution, nn_k=qp.nn_k,
            max_dist2=qp.max_dist2, probe_mode=probe, **kwargs,
        )

    # differentiable distance & offsets computed in the anchored frame.
    # With cand_pack = (nodiff cols, feature array), (pos, quat, feats)
    # come from ONE row gather whose backward scatters features only.
    quat_g = None
    if cand_pack is not None:
        nd_g, feats_raw = gather_rows_splitgrad(
            cand_pack[0], cand_pack[1], qn.idx)          # [N, k, ...]
        pos = jax.lax.stop_gradient(nd_g[..., :3])
        if lset is not None and lset.quat is not None:
            quat_g = jax.lax.stop_gradient(nd_g[..., 3:7])
    else:
        pos_src = state.positions if lset is None else lset.pts
        pos = pos_src[qn.idx]
    pos_a = pos if anchor is None else pos - anchor
    diff = qpts[:, None, :] - pos_a                      # [N, k, 3]
    dist2 = jnp.sum(diff * diff, axis=-1)
    dist2 = jnp.where(qn.valid, dist2, npm.BIG_DIST2)
    qn = qn.replace(dist2=dist2)
    w = npm.idw_weights(qn, idw_index=qp.idw_index)      # [N, k]

    vec = diff
    if qp.after_pgo:
        # offset rotation by stored orientations — semantically always on
        # (reference gates on after_pgo, model/neural_points.py:645-648).
        # Quaternions are identity until the first elastic deformation, so
        # the hot lset paths skip the [N,k,4] gather + rotate STATICALLY:
        # the system builds the local set with quat=None until the first
        # deformation (host-known event) and the post-closure retrace is a
        # one-time cached compile. A traced lax.cond was measured to break
        # XLA's decode fusion and cost as much as the gather it skipped.
        if quat_g is not None:
            vec = npm.quat_rotate(quat_g, vec)
        elif cand_pack is None:
            quat_src = state.orientations if lset is None else lset.quat
            if quat_src is not None:
                vec = npm.quat_rotate(quat_src[qn.idx], vec)
    vec = jnp.where(qn.valid[..., None], vec, 0.0)

    if cand_pack is not None:
        feats = _maybe_layer_norm(feats_raw, qp.layer_norm_on)
    else:
        feats = _maybe_layer_norm(geo_features[qn.idx], qp.layer_norm_on)
    geo_vec = jnp.concatenate([feats, vec], axis=-1)     # [N, k, F+3]

    if lset is None:
        cert = jnp.where(qn.valid, state.certainty[qn.idx], 0.0)
    elif lset.cert is not None:
        cert = jnp.where(qn.valid, lset.cert[qn.idx], 0.0)
    else:
        cert = jnp.zeros_like(dist2)
    certainty = jnp.sum(cert * w, axis=1)

    color = None
    sem_log_prob = None
    if qp.weighted_first:
        fused = jnp.sum(geo_vec * w[..., None], axis=1)  # [N, F+3]
        sdf = sdf_apply(geo_mlp, fused, qp.sdf_scale,
                        qp.mlp_leaky_relu)
        std = jnp.zeros_like(sdf) if with_std else None
        if sem_mlp is not None:
            sem_log_prob = sem_log_prob_apply(sem_mlp, fused,
                                              qp.mlp_leaky_relu)
        if color_mlp is not None and color_features is not None:
            cfeats = _maybe_layer_norm(color_features[qn.idx], qp.layer_norm_on)
            cfused = jnp.sum(
                jnp.concatenate([cfeats, vec], axis=-1) * w[..., None], axis=1)
            color = color_apply(color_mlp, cfused, qp.mlp_leaky_relu)[
                :, :max(color_channel, 1)]
    else:
        per = sdf_apply(geo_mlp, geo_vec, qp.sdf_scale,
                        qp.mlp_leaky_relu)               # [N, k]
        sdf, std = weighted_reduce(per, w, with_std=with_std)
        if sem_mlp is not None:
            per_sem = sem_log_prob_apply(sem_mlp, geo_vec,
                                         qp.mlp_leaky_relu)
            sem_log_prob, _ = weighted_reduce(per_sem, w)
        if color_mlp is not None and color_features is not None:
            cfeats = _maybe_layer_norm(color_features[qn.idx], qp.layer_norm_on)
            per_col = color_apply(
                color_mlp, jnp.concatenate([cfeats, vec], -1),
                qp.mlp_leaky_relu)
            color, _ = weighted_reduce(per_col, w)
            color = color[:, :max(color_channel, 1)]

    return QueryOut(
        sdf=sdf, sdf_std=std, nn_count=qn.nn_count, certainty=certainty,
        neighbors=qn, weights=w, color=color, sem_log_prob=sem_log_prob,
    )


def query_sdf_and_grad(
    state: npm.MapState,
    geo_features: jnp.ndarray,
    geo_mlp,
    qpts: jnp.ndarray,
    qp: QueryParams,
    **kwargs,
):
    """SDF + analytical spatial gradient at qpts (used by tracking; the
    reference uses torch autograd, utils/tools.py:247-260). Returns
    (sdf, grad [N,3], aux QueryOut)."""

    def f(pts):
        out = query_decode(state, geo_features, geo_mlp, pts, qp, **kwargs)
        return jnp.sum(out.sdf), out

    grad, out = jax.grad(f, has_aux=True)(qpts)
    return out.sdf, grad, out


def numerical_grad_from_neighbors(
    state: npm.MapState,
    geo_features: jnp.ndarray,
    geo_mlp,
    qpts: jnp.ndarray,            # [M, 3] base (decimated) points
    qn: npm.QueryNeighbors,       # their neighbors from the main query
    eps: float,
    qp: QueryParams,
):
    """Two-sided numerical SDF gradient reusing the base points' neighbor
    sets for the +-eps shifted queries (eps << voxel size, so the k-NN set
    is unchanged) — skips six full hash probes per training batch. Weights
    and offsets ARE recomputed per shifted position. Returns grad [M, 3]."""
    m = qpts.shape[0]
    k = qn.idx.shape[1]
    pos = state.positions[qn.idx]                     # [M, k, 3]
    feats = _maybe_layer_norm(geo_features[qn.idx], qp.layer_norm_on)

    shifts = jnp.array(
        [[eps, 0, 0], [-eps, 0, 0], [0, eps, 0],
         [0, -eps, 0], [0, 0, eps], [0, 0, -eps]], qpts.dtype)  # [6, 3]
    q6 = qpts[None, :, :] + shifts[:, None, :]        # [6, M, 3]
    diff = q6[:, :, None, :] - pos[None]              # [6, M, k, 3]
    d2 = jnp.sum(diff * diff, axis=-1)                # [6, M, k]
    valid = qn.valid[None] & (d2 <= qp.join_max_dist2)
    d2 = jnp.where(valid, d2, npm.BIG_DIST2)
    if qp.idw_index == 2:
        wraw = 1.0 / (d2 + 1e-15)
    else:
        wraw = 1.0 / (jnp.sqrt(jnp.maximum(d2, 0.0)) ** qp.idw_index + 1e-15)
    w = jnp.where(valid, wraw, 0.0)
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-15)
    vec = jnp.where(valid[..., None], diff, 0.0)
    gv = jnp.concatenate(
        [jnp.broadcast_to(feats[None], (6, m, k, feats.shape[-1])), vec],
        axis=-1)                                      # [6, M, k, F+3]
    if qp.weighted_first:
        fused = jnp.sum(gv * w[..., None], axis=2)    # [6, M, F+3]
        s = sdf_apply(geo_mlp, fused, qp.sdf_scale,
                      qp.mlp_leaky_relu)              # [6, M]
    else:
        per = sdf_apply(geo_mlp, gv, qp.sdf_scale,
                        qp.mlp_leaky_relu)            # [6, M, k]
        s = jnp.sum(per * w, axis=-1)
    gx = (s[0] - s[1]) / (2 * eps)
    gy = (s[2] - s[3]) / (2 * eps)
    gz = (s[4] - s[5]) / (2 * eps)
    return jnp.stack([gx, gy, gz], axis=-1)


def decode_sdf_candidates(
    lset,
    geo_features: jnp.ndarray,   # [L+1, F] compact
    geo_mlp,
    qpts_abs: jnp.ndarray,       # [N, 3] absolute world
    cand: jnp.ndarray,           # [N, K] local candidate ids
    cvalid: jnp.ndarray,         # [N, K]
    qp: QueryParams,
    with_std: bool = False,
    pack=None,                   # [L+1, 3(+4)+F] pack_lset_rows array
    rows=None,                   # [N, K, 3(+4)+F] PRE-GATHERED pack rows
):
    """SDF decode from a CACHED candidate set (exact top-k re-ranking by
    true distance). Used by the tracker to skip re-probing while the pose
    moves less than a fraction of a voxel between GN iterations.
    Differentiable w.r.t. qpts_abs. Returns (sdf [N], nn_count [N],
    std or None). With `pack` (built once per track — features are fixed
    during registration), pos/quat/feats come from one row gather. With
    `rows`, even that gather is skipped: the candidate set is FROZEN
    across the GN while_loop's iterations, so the row gather is
    loop-invariant — the tracker gathers once after the last probe and
    every iteration re-ranks/decodes from the in-VMEM rows (measured
    ~3 ms/iter of gather+layout copies removed)."""
    from pin_slam_tpu.models import neural_points as npm_

    K = cand.shape[1]
    ci = jnp.where(cvalid, cand, lset.cap)
    quat_g = None
    if rows is not None:
        pos, quat_g, feats_raw = _unpack_rows(rows, lset.quat is not None)
    elif pack is not None:
        g = pack[ci]                                    # [N, K, 3(+4)+F]
        pos, quat_g, feats_raw = _unpack_rows(g, lset.quat is not None)
    else:
        pos = lset.pts[ci]                              # [N, K, 3]
    diff = qpts_abs[:, None, :] - pos
    d2 = jnp.sum(diff * diff, axis=-1)
    use = cvalid & (d2 <= qp.join_max_dist2)
    d2m = jnp.where(use, d2, npm.BIG_DIST2)
    nn_count = jnp.sum(use, axis=-1).astype(jnp.int32)

    # exact top-k selection mask (discrete; gradients flow through the
    # distances of the selected neighbors only, as in the full query)
    use = use & topk_select_mask(jax.lax.stop_gradient(d2m), qp.nn_k)

    if qp.idw_index == 2:
        wraw = 1.0 / (d2 + 1e-15)
    else:
        wraw = 1.0 / (jnp.sqrt(jnp.maximum(d2, 0.0)) ** qp.idw_index
                      + 1e-15)
    w = jnp.where(use, wraw, 0.0)
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-15)
    vec = jnp.where(use[..., None], diff, 0.0)
    if qp.after_pgo and lset.quat is not None:
        vec = npm_.quat_rotate(
            quat_g if quat_g is not None else lset.quat[ci], vec)
        vec = jnp.where(use[..., None], vec, 0.0)
    if rows is not None or pack is not None:
        feats = _maybe_layer_norm(feats_raw, qp.layer_norm_on)
    else:
        feats = _maybe_layer_norm(geo_features[ci], qp.layer_norm_on)
    gv = jnp.concatenate([feats, vec], axis=-1)
    if qp.weighted_first:
        fused = jnp.sum(gv * w[..., None], axis=1)
        sdf = sdf_apply(geo_mlp, fused, qp.sdf_scale, qp.mlp_leaky_relu)
        return sdf, nn_count, None
    per = sdf_apply(geo_mlp, gv, qp.sdf_scale, qp.mlp_leaky_relu)
    sdf, std = weighted_reduce(per, w, with_std=with_std)
    return sdf, nn_count, std


def numerical_grad_shared_join(
    lset,
    geo_features: jnp.ndarray,   # [L+1, F] compact
    geo_mlp,
    qpts: jnp.ndarray,           # [M, 3] decimated base points
    eps: float,
    qp: QueryParams,
    cand_k: int = 12,
    cand=None,                   # optional cached ([M, K] ids, [M, K] valid)
    cand_pack=None,              # [L+1, 3(+4)+F] pack_lset_rows array
):
    """Two-sided numerical SDF gradient sharing ONE k=12 candidate join
    across the six +-eps shifted queries (reference semantics:
    utils/mapper.py:986-1036 re-queries the map six times). The shifted
    points re-rank the base candidates exactly (top-6 of 12 by true
    distance with the radius bound), so for eps << voxel size the result
    matches the full re-query while costing one join instead of six.
    With `cand`, even that one join is skipped (the training loop passes
    the batch's cached per-frame candidates); with `cand_pack`,
    (pos, quat, feats) come from one row gather whose backward merges
    with the main decode's feature scatter.

    Returns grad [M, 3]; differentiable w.r.t. geo_features/geo_mlp."""
    from pin_slam_tpu.models import neural_points as npm_

    m = qpts.shape[0]
    if cand is not None:
        cand_k = cand[0].shape[1]
        qn = npm_.QueryNeighbors(
            idx=jnp.where(cand[1], cand[0], lset.cap).astype(jnp.int32),
            dist2=jnp.zeros(cand[0].shape, jnp.float32),
            valid=cand[1], nn_count=jnp.sum(cand[1], -1).astype(jnp.int32))
    else:
        qn = npm_.query_neighbors_join(
            None, jax.lax.stop_gradient(qpts), lset, nn_k=cand_k,
            max_dist2=qp.join_max_dist2, resolution=qp.resolution,
            local_ids=True)
    quat_g = None
    if cand_pack is not None:
        nd_g, feats_raw = gather_rows_splitgrad(
            cand_pack[0], cand_pack[1], qn.idx)
        pos = jax.lax.stop_gradient(nd_g[..., :3])
        if lset.quat is not None:
            quat_g = jax.lax.stop_gradient(nd_g[..., 3:7])
        feats = _maybe_layer_norm(feats_raw, qp.layer_norm_on)
    else:
        pos = lset.pts[qn.idx]                          # [M, 12, 3]
        feats = _maybe_layer_norm(geo_features[qn.idx], qp.layer_norm_on)

    shifts = jnp.array(
        [[eps, 0, 0], [-eps, 0, 0], [0, eps, 0],
         [0, -eps, 0], [0, 0, eps], [0, 0, -eps]], qpts.dtype)
    q6 = qpts[None, :, :] + shifts[:, None, :]          # [6, M, 3]
    diff = q6[:, :, None, :] - pos[None]                # [6, M, 12, 3]
    d2 = jnp.sum(diff * diff, axis=-1)
    valid = qn.valid[None] & (d2 <= qp.join_max_dist2)
    d2m = jnp.where(valid, d2, npm.BIG_DIST2)

    # exact top-nn_k among the candidates per shifted query, as one fused
    # rank computation (see topk_select_mask)
    use = valid & topk_select_mask(jax.lax.stop_gradient(d2m), qp.nn_k)
    if qp.idw_index == 2:
        wraw = 1.0 / (d2 + 1e-15)
    else:
        wraw = 1.0 / (jnp.sqrt(jnp.maximum(d2, 0.0)) ** qp.idw_index
                      + 1e-15)
    w = jnp.where(use, wraw, 0.0)
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-15)
    vec = jnp.where(use[..., None], diff, 0.0)
    if qp.after_pgo and lset.quat is not None:
        q_n = (quat_g if quat_g is not None
               else lset.quat[qn.idx])
        vec = npm_.quat_rotate(q_n[None], vec)
        vec = jnp.where(use[..., None], vec, 0.0)
    gv = jnp.concatenate(
        [jnp.broadcast_to(feats[None], (6, m, cand_k, feats.shape[-1])),
         vec], axis=-1)
    if qp.weighted_first:
        fused = jnp.sum(gv * w[..., None], axis=2)      # [6, M, F+3]
        s = sdf_apply(geo_mlp, fused, qp.sdf_scale, qp.mlp_leaky_relu)
    else:
        per = sdf_apply(geo_mlp, gv, qp.sdf_scale, qp.mlp_leaky_relu)
        s = jnp.sum(per * w, axis=-1)
    gx = (s[0] - s[1]) / (2 * eps)
    gy = (s[2] - s[3]) / (2 * eps)
    gz = (s[4] - s[5]) / (2 * eps)
    return jnp.stack([gx, gy, gz], axis=-1)


def query_sdf_numerical_grad(
    state: npm.MapState,
    geo_features: jnp.ndarray,
    geo_mlp,
    qpts: jnp.ndarray,          # [M, 3] (already decimated)
    eps: float,
    qp: QueryParams,
    **kwargs,
):
    """Two-sided numerical SDF gradient (reference:
    utils/mapper.py:986-1036). Differentiable w.r.t. features/params so it
    can drive the eikonal loss. Returns grad [M, 3]."""
    m = qpts.shape[0]
    shifts = jnp.array(
        [[eps, 0, 0], [-eps, 0, 0], [0, eps, 0],
         [0, -eps, 0], [0, 0, eps], [0, 0, -eps]], qpts.dtype)
    pts6 = (qpts[None, :, :] + shifts[:, None, :]).reshape(-1, 3)
    out = query_decode(state, geo_features, geo_mlp, pts6, qp, **kwargs)
    s = out.sdf.reshape(6, m)
    gx = (s[0] - s[1]) / (2 * eps)
    gy = (s[2] - s[3]) / (2 * eps)
    gz = (s[4] - s[5]) / (2 * eps)
    return jnp.stack([gx, gy, gz], axis=-1)
