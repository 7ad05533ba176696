"""Online mapping: replay data pool + per-frame training of the neural map.

Rebuilds the reference `Mapper` (reference: utils/mapper.py:33-1036) with
static shapes:

* the replay pool is a fixed-capacity RING of sample arrays; a frame's
  samples land as one contiguous dynamic_update_slice block and the ring
  wrap overwrites the oldest blocks (capacity eviction, replacing the
  reference's random eviction, reference :316-360),
* the window filter MARKS out-of-window samples dead (weight=0, one
  elementwise pass) instead of compacting — compaction over a multi-million
  row pool costs ~300 ms on TPU while dead rows only dilute batches until
  the ring reclaims them,
* new-sample detection queries the map certainty with a 1-cell neighborhood
  (reference :373-438 + set_search_neighborhood(1, 0.0) :388-402),
* each mapping iteration draws `bs` samples (history + fresh mix,
  reference get_batch :452-503), queries+decodes, computes BCE-SDF +
  eikonal (+sem/color) losses and takes one Adam step over the *full*
  feature array + decoder params; a fresh optimizer per frame reproduces the
  reference's per-frame optimizer reset (reference mapping() :600-844 creates
  a new Adam each call). Zero-gradient feature rows are untouched by Adam,
  which makes the full-array update equivalent to the reference's
  local-param update.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from pin_slam_tpu.models import losses as L
from pin_slam_tpu.models import neural_points as npm
from pin_slam_tpu.slam import map_query as mq


@struct.dataclass
class PoolState:
    """Replay pool; row `capacity` is the dump row."""

    coord: jnp.ndarray        # [P+1, 3] world-frame sample coords
    sdf_label: jnp.ndarray    # [P+1]
    weight: jnp.ndarray       # [P+1] signed weight
    ts: jnp.ndarray           # [P+1] i32 frame id
    sem_label: Optional[jnp.ndarray]    # [P+1] i32
    color_label: Optional[jnp.ndarray]  # [P+1, Cc]
    count: jnp.ndarray        # [] i32 high-water mark of written rows
    # indices (into the pool) of the current frame's "new" samples
    new_idx: jnp.ndarray      # [NEW_CAP] i32
    new_count: jnp.ndarray    # [] i32
    write_pos: jnp.ndarray    # [] i32 ring position of the next append

    @property
    def capacity(self) -> int:
        return self.coord.shape[0] - 1


def init_pool(
    capacity: int, new_cap: int, semantic_on: bool, color_channel: int
) -> PoolState:
    p1 = capacity + 1
    return PoolState(
        coord=jnp.zeros((p1, 3), jnp.float32),
        sdf_label=jnp.zeros((p1,), jnp.float32),
        weight=jnp.zeros((p1,), jnp.float32),
        ts=jnp.zeros((p1,), jnp.int32),
        sem_label=jnp.zeros((p1,), jnp.int32) if semantic_on else None,
        color_label=(jnp.zeros((p1, color_channel), jnp.float32)
                     if color_channel > 0 else None),
        count=jnp.zeros((), jnp.int32),
        new_idx=jnp.zeros((new_cap + 1,), jnp.int32),  # last row = dump
        new_count=jnp.zeros((), jnp.int32),
        write_pos=jnp.zeros((), jnp.int32),
    )


def append_start(pool: PoolState, block_size: int):
    """Row where `append_samples` will place a block of `block_size`:
    the ring position, wrapped to 0 when the block would overrun."""
    return jnp.where(pool.write_pos + block_size <= pool.capacity,
                     pool.write_pos, 0)


def append_samples(
    pool: PoolState,
    coord: jnp.ndarray,       # [S, 3] world frame
    sdf_label: jnp.ndarray,
    weight: jnp.ndarray,
    mask: jnp.ndarray,        # [S]
    cur_ts,
    sem_label: Optional[jnp.ndarray] = None,
    color_label: Optional[jnp.ndarray] = None,
) -> PoolState:
    """Append this frame's samples as one contiguous block
    (reference: utils/mapper.py:275-293).

    A TPU-scatter of S=450k rows costs ~60 ms; a dynamic_update_slice of the
    same block is ~1 ms, so the samples are written as-is and masked-out rows
    are DEAD ROWS carried with weight=0 (mapping_loss drops weight==0 rows
    from the batch). The ring wrap overwrites the oldest block when the pool
    is full — capacity eviction without any compaction pass."""
    P = pool.capacity
    S = coord.shape[0]
    idxs = jnp.arange(S, dtype=jnp.int32)
    n_rows = jnp.max(jnp.where(mask, idxs + 1, 0))
    start = append_start(pool, S)
    tsv = jnp.full((S,), jnp.int32(cur_ts))
    wts = jnp.where(mask, weight, 0.0)

    def dus(arr, block):
        starts = (start,) + (0,) * (arr.ndim - 1)
        return jax.lax.dynamic_update_slice(arr, block, starts)

    return pool.replace(
        coord=dus(pool.coord, coord),
        sdf_label=dus(pool.sdf_label, sdf_label),
        weight=dus(pool.weight, wts),
        ts=dus(pool.ts, tsv),
        sem_label=(pool.sem_label if sem_label is None or pool.sem_label is None
                   else dus(pool.sem_label, sem_label.astype(jnp.int32))),
        color_label=(pool.color_label
                     if color_label is None or pool.color_label is None
                     else dus(pool.color_label, color_label)),
        count=jnp.where(n_rows > 0,
                        jnp.maximum(pool.count,
                                    jnp.minimum(start + n_rows, P)),
                        pool.count),
        write_pos=jnp.where(n_rows > 0, start + S, pool.write_pos),
    )


def filter_pool(
    pool: PoolState,
    origin: jnp.ndarray,     # [3] current sensor position, world frame
    window_radius: float,
    key: jax.Array,
) -> PoolState:
    """Window filter (reference: utils/mapper.py:316-360): MARK samples
    outside the radius dead (weight=0) in one elementwise pass. No
    compaction: the reference compacts + random-evicts, which on a 4M-row
    pool costs ~300 ms of TPU scatter sweeps; here dead rows merely dilute
    batch draws (dropped by the weight>0 mask) until the ring overwrites
    them. Capacity eviction is the ring wrap in append_samples. `key` is
    kept for API compatibility (the reference's random eviction is
    subsumed by oldest-first ring replacement)."""
    del key
    d2 = jnp.sum((pool.coord - origin) ** 2, axis=-1)
    inside = d2 < window_radius * window_radius
    return pool.replace(weight=jnp.where(inside, pool.weight, 0.0))


def pool_alive_count(pool: PoolState) -> jnp.ndarray:
    """Number of live (weight>0) samples among the written rows."""
    rows = jnp.arange(pool.coord.shape[0]) < pool.count
    return jnp.sum((rows & (pool.weight != 0.0)).astype(jnp.int32))


def compact_near_surface(
    frame_coord: jnp.ndarray,   # [S, 3]
    frame_sdf: jnp.ndarray,     # [S]
    frame_mask: jnp.ndarray,    # [S]
    *,
    surface_sample_range_m: float,
    cap: int,
):
    """Uniformly thin + compact the near-surface samples (|sdf| < 3x
    surface range, reference's new-sample criterion utils/mapper.py:373-438)
    to a `cap`-row buffer. Thinning is stride-uniform over the qualifying
    rows — a prefix cut would keep a contiguous azimuth wedge of the scan.
    Returns (kidx [cap] original row ids, kvalid, kpts, ksdf).

    This single compaction feeds BOTH map-insert candidates and new-sample
    detection, so the multi-ms scatter/gather sweeps downstream run over
    `cap` rows instead of all S = rays x samples rows."""
    S = frame_coord.shape[0]
    near = frame_mask & (jnp.abs(frame_sdf) < surface_sample_range_m * 3.0)
    order = jnp.cumsum(near.astype(jnp.int32)) - 1
    total = jnp.maximum(order[-1] + 1, 1)
    stride = (total + cap - 1) // cap
    keep = near & (jnp.mod(order, stride) == 0)
    order2 = jnp.cumsum(keep.astype(jnp.int32)) - 1
    cdest = jnp.where(keep & (order2 < cap), order2, cap)
    kidx = jnp.full((cap + 1,), S, jnp.int32).at[cdest].set(
        jnp.arange(S, dtype=jnp.int32))[:cap]
    kvalid = kidx < S
    ki = jnp.where(kvalid, kidx, 0)
    return ki, kvalid, frame_coord[ki], frame_sdf[ki]


def detect_new_samples_compact(
    state: npm.MapState,
    pool: PoolState,
    kpts: jnp.ndarray,          # [K, 3] compacted near-surface samples
    kvalid: jnp.ndarray,        # [K]
    pool_pos: jnp.ndarray,      # [K] i32 pool row of each sample
    *,
    resolution: float,
    new_certainty_thre: float,
) -> PoolState:
    """Mark low-certainty samples as "new" given an already-compacted
    near-surface buffer (reference: utils/mapper.py:373-438; the certainty
    probe uses only the center voxel, reference :388-402)."""
    C = state.capacity
    B = state.table_size
    from pin_slam_tpu.ops import hash3d

    grid = hash3d.grid_coords(kpts, resolution)
    h = hash3d.hash_grid(grid, B)
    idx = state.table[jnp.where(kvalid, h, B)]
    valid = idx >= 0
    idx_c = jnp.where(valid, idx, C)
    d2 = jnp.sum((state.positions[idx_c] - kpts) ** 2, axis=-1)
    valid = valid & (d2 <= hash3d.max_valid_dist2(1, resolution))
    cert = jnp.where(valid, state.certainty[idx_c], 0.0)

    is_new = kvalid & (cert < new_certainty_thre)
    new_cap = pool.new_idx.shape[0] - 1
    order2 = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    ok = is_new & (order2 < new_cap)
    dest = jnp.where(ok, order2, new_cap).astype(jnp.int32)
    new_idx = jnp.zeros_like(pool.new_idx).at[dest].set(
        jnp.where(ok, pool_pos, 0))
    return pool.replace(
        new_idx=new_idx, new_count=jnp.sum(ok.astype(jnp.int32)))


def detect_new_samples(
    state: npm.MapState,
    pool: PoolState,
    frame_coord: jnp.ndarray,   # [S, 3] world coords of this frame's samples
    frame_sdf: jnp.ndarray,     # [S]
    frame_mask: jnp.ndarray,    # [S]
    frame_start: jnp.ndarray,   # scalar i32: pool index of this frame's row 0
    *,
    resolution: float,
    new_certainty_thre: float,
    surface_sample_range_m: float,
) -> PoolState:
    """Near-surface pre-filter + compaction + new-sample detection
    (compat wrapper; the production frame update hoists the compaction so
    it is shared with the map-insert candidates)."""
    S = frame_coord.shape[0]
    ki, kvalid, kpts, _ = compact_near_surface(
        frame_coord, frame_sdf, frame_mask,
        surface_sample_range_m=surface_sample_range_m, cap=min(S, 1 << 17))
    return detect_new_samples_compact(
        state, pool, kpts, kvalid, frame_start + ki,
        resolution=resolution, new_certainty_thre=new_certainty_thre)


class BatchIdx(NamedTuple):
    idx: jnp.ndarray    # [bs] pool indices
    mask: jnp.ndarray   # [bs]


def draw_batch_indices(
    key: jax.Array,
    pool: PoolState,
    bs: int,
    bs_new: int,
    use_new: jnp.ndarray,   # scalar bool (lose_track/stop disables new mix)
) -> BatchIdx:
    """History + new-sample batch mix (reference: utils/mapper.py:452-480)."""
    k1, k2 = jax.random.split(key)
    cnt = jnp.maximum(pool.count, 1)
    hist = jax.random.randint(k1, (bs,), 0, cnt)
    if bs_new > 0:
        ncnt = jnp.maximum(pool.new_count, 1)
        sel = jax.random.randint(k2, (bs_new,), 0, ncnt)
        new = pool.new_idx[sel]
        # use min(new_count, bs_new) fresh slots — never OVERsample a small
        # new set (reference: bs_new = min(new_idx_count, bs_new),
        # utils/mapper.py:462-472; oversampling overfits the newest,
        # least-converged region and measurably degrades the map)
        slot_new = use_new & (jnp.arange(bs_new) < pool.new_count)
        tail = jnp.where(slot_new, new, hist[:bs_new])
        idx = jnp.concatenate([hist[: bs - bs_new], tail])
    else:
        idx = hist
    return BatchIdx(idx=idx, mask=idx < pool.count)


def mapping_loss(
    params: dict,
    state: npm.MapState,
    pool: PoolState,
    bidx: BatchIdx,
    qp: mq.QueryParams,
    lf: mq.LocalFilter,
    *,
    sigma_sigmoid_m: float,
    loss_weight_on: bool,
    ekional_loss_on: bool,
    weight_e: float,
    numerical_grad_eps: float,
    gradient_decimation: int,
    surface_sample_range_m: float,
    main_loss_type: str = "bce",
    semantic_on: bool = False,
    weight_s: float = 1.0,
    freespace_label_on: bool = False,
    sem_label_decimation: int = 1,
    color_on: bool = False,
    weight_i: float = 1.0,
    color_channel: int = 0,
    eik_shared_neighbors: bool = False,
    proj_correction_on: bool = False,
    consistency_loss_on: bool = False,
    weight_c: float = 0.5,
    consistency_count: int = 1000,
    consistency_range: float = 0.05,
    key: Optional[jax.Array] = None,
    lset=None,
    cand=None,
    batch=None,
):
    """One training batch's loss (reference: utils/mapper.py:623-812).

    params: {'geo_features': [C+1,F], 'geo_mlp': ..., optional 'color_features',
    'color_mlp', 'sem_mlp'}. Returns (loss, aux) with aux carrying the
    certainty-update neighbor info.

    `batch`, when given, carries the PRE-GATHERED pool rows for this
    iteration (dict with coord/sdf_label/weight/ts [+ sem_label/
    color_label]) — the per-frame training loop gathers all its
    iterations' labels in one pass outside the scan (labels don't change
    during the run), so the scan body does no [pool]-sized random gathers.
    """
    if batch is not None:
        coord = batch["coord"]
        sdf_label = batch["sdf_label"]
        weight = jnp.abs(batch["weight"])
        ts = batch["ts"]
    else:
        coord = pool.coord[bidx.idx]
        sdf_label = pool.sdf_label[bidx.idx]
        weight = jnp.abs(pool.weight[bidx.idx])
        ts = pool.ts[bidx.idx]
    # weight==0 marks dead rows (masked-out samples stored by the
    # block-append fast path) — drop them from the batch
    mask = bidx.mask & (weight > 0.0)

    # one packed row gather serves the main decode AND the eikonal term's
    # shared-candidate queries: pos/quat/feats fetched together, backward
    # = a single FEATURE-ONLY scatter (see mq.gather_rows_splitgrad)
    cand_pack = ((mq.pack_lset_nodiff(lset), params["geo_features"])
                 if (cand is not None and lset is not None) else None)
    out = mq.query_decode(
        state, params["geo_features"], params["geo_mlp"], coord, qp,
        lf=lf, lset=lset, cand=cand, cand_pack=cand_pack,
        color_features=params.get("color_features"),
        color_mlp=params.get("color_mlp") if color_on else None,
        sem_mlp=params.get("sem_mlp") if semantic_on else None,
        color_channel=color_channel,
    )

    if proj_correction_on and lf.sensor_origins is not None:
        # projective-distance correction: scale the projective SDF label by
        # |cos(grad, ray)| (reference: utils/mapper.py:695-697)
        g_all = mq.query_sdf_numerical_grad(
            state, params["geo_features"], params["geo_mlp"], coord,
            numerical_grad_eps, qp, lf=lf, lset=lset)
        ray = coord - lf.sensor_origins[jnp.clip(
            ts, 0, lf.sensor_origins.shape[0] - 1)]
        cos = jnp.abs(jnp.sum(g_all * ray, -1)) / (
            jnp.linalg.norm(g_all, axis=-1) * jnp.linalg.norm(ray, axis=-1)
            + 1e-12)
        sdf_label = sdf_label * cos

    if main_loss_type == "bce":
        sdf_loss = L.sdf_bce_loss(
            out.sdf, sdf_label, sigma_sigmoid_m, weight, mask,
            weighted=loss_weight_on)
    elif main_loss_type == "zhong":
        sdf_loss = L.sdf_zhong_loss(out.sdf, sdf_label, None, weight, mask,
                                    weighted=loss_weight_on)
    elif main_loss_type == "sdf_l1":
        sdf_loss = L.sdf_diff_loss(out.sdf, sdf_label, weight, mask, l2=False)
    else:
        sdf_loss = L.sdf_diff_loss(out.sdf, sdf_label, weight, mask, l2=True)
    total = sdf_loss

    eik_loss = 0.0
    if ekional_loss_on and weight_e > 0:
        dec = coord[::gradient_decimation]
        if eik_shared_neighbors:
            # cheap approximation: reuse base neighbors for the shifted
            # queries. WARNING: this degenerates the numerical gradient
            # toward the analytical one (frozen neighborhood) and measurably
            # degrades the learned SDF (4.3 vs 2.8 cm surface residual on
            # the synthetic benchmark) — off by default.
            qn_dec = jax.tree.map(lambda a: a[::gradient_decimation],
                                  out.neighbors)
            g = mq.numerical_grad_from_neighbors(
                state, params["geo_features"], params["geo_mlp"], dec,
                qn_dec, numerical_grad_eps, qp)
        elif lset is not None:
            # one shared k=12 candidate join re-ranked per shift — exact
            # for eps << voxel (see numerical_grad_shared_join); with a
            # cached per-frame candidate set even that join is skipped
            g = mq.numerical_grad_shared_join(
                lset, params["geo_features"], params["geo_mlp"], dec,
                numerical_grad_eps, qp,
                cand=None if cand is None else (
                    cand[0][::gradient_decimation],
                    cand[1][::gradient_decimation]),
                cand_pack=cand_pack)
        else:
            # full shifted queries (reference semantics,
            # utils/mapper.py:986-1036)
            g = mq.query_sdf_numerical_grad(
                state, params["geo_features"], params["geo_mlp"], dec,
                numerical_grad_eps, qp, lf=lf)
        eik_loss = L.eikonal_loss(g, mask[::gradient_decimation])
        total = total + weight_e * eik_loss

    if consistency_loss_on and key is not None:
        # gradient-consistency (smoothness) regularization (reference:
        # utils/mapper.py:699-719,754-758): compare SDF gradients at a
        # random subset against gradients at nearby shifted positions
        m = min(consistency_count, coord.shape[0])
        base = coord[:m]
        shift = (jax.random.uniform(key, (m, 3)) * 2.0 - 1.0) \
            * consistency_range
        g_base = mq.query_sdf_numerical_grad(
            state, params["geo_features"], params["geo_mlp"], base,
            numerical_grad_eps, qp, lf=lf, lset=lset)
        g_near = mq.query_sdf_numerical_grad(
            state, params["geo_features"], params["geo_mlp"], base + shift,
            numerical_grad_eps, qp, lf=lf, lset=lset)
        cos = jnp.sum(g_base * g_near, -1) / (
            jnp.linalg.norm(g_base, axis=-1)
            * jnp.linalg.norm(g_near, axis=-1) + 1e-12)
        cons = jnp.sum(jnp.where(mask[:m], 1.0 - cos, 0.0)) / jnp.maximum(
            jnp.sum(mask[:m].astype(jnp.float32)), 1.0)
        total = total + weight_c * cons

    sem_loss = 0.0
    if semantic_on and out.sem_log_prob is not None:
        sem_label = (batch["sem_label"] if batch is not None
                     else pool.sem_label[bidx.idx])
        labeled = sem_label >= 0 if freespace_label_on else sem_label > 0
        sem_loss = L.sem_nll_loss(
            out.sem_log_prob[::sem_label_decimation],
            sem_label[::sem_label_decimation],
            (mask & labeled)[::sem_label_decimation])
        total = total + weight_s * sem_loss

    color_loss = 0.0
    if color_on and out.color is not None:
        color_label = (batch["color_label"] if batch is not None
                       else pool.color_label[bidx.idx])
        surface = jnp.abs(sdf_label) < surface_sample_range_m
        color_loss = L.color_l1_loss(
            out.color, color_label, weight, mask & surface,
            weighted=loss_weight_on)
        total = total + weight_i * color_loss

    aux = {
        "qn": out.neighbors,
        "w": out.weights,
        "ts": ts,
        "sdf_loss": sdf_loss,
        "eikonal_loss": eik_loss,
        "sem_loss": sem_loss,
        "color_loss": color_loss,
    }
    return total, aux


def apply_certainty_update(state: npm.MapState, aux) -> npm.MapState:
    """Reproduce the training-mode certainty/ts side effects
    (reference: model/neural_points.py:688-705)."""
    return npm.accumulate_certainty(state, aux["qn"], aux["w"], aux["ts"])


def accumulate_certainty_sorted(cert, ts_upd, idx, w, ts, cap: int):
    """Batched certainty/ts accumulation for MANY iterations at once.

    TPU scatters run at ~14 cycles/element, so the per-iteration
    `.at[].add` side effect costs more than the decode it annotates
    (measured 2.8 ms x 12 iterations). Nothing in the training loss READS
    certainty, so the loop stacks its (neighbor, weight, ts) contributions
    and this one pass applies them all: multi-operand sort by neighbor id,
    segmented sum (cumsum at run ends) / segmented max, then ONE compact
    scatter over the unique ids (~#local points, not #contributions)."""
    m = idx.shape[0]
    # composite (id, ts) sort key: within a run the LAST element then
    # carries the run's max ts (cummax would leak across runs)
    sidx, sts, sw = jax.lax.sort(
        (idx.astype(jnp.int32), ts.astype(jnp.int32), w), num_keys=2)
    csum = jnp.cumsum(sw)          # runs tile csum contiguously, so a
    #                                run's sum = adjacent end differences
    last = jnp.concatenate([sidx[1:] != sidx[:-1], jnp.ones((1,), bool)])
    run_id = jnp.cumsum(last.astype(jnp.int32)) - 1
    # second sort = compaction: bring the run-end rows (in run order) to
    # the front, then slice the STATIC unique-id bound (<= cap + 1)
    key = jnp.where(last, run_id, jnp.int32(m))
    k2, uid, ucsum, umax = jax.lax.sort(
        (key, sidx, csum, sts), num_keys=1)
    U = min(cap + 1, m)
    k2, uid, ucsum, umax = k2[:U], uid[:U], ucsum[:U], umax[:U]
    valid_u = k2 < m
    sums = ucsum - jnp.concatenate(
        [jnp.zeros((1,), ucsum.dtype), ucsum[:-1]])
    cert = cert.at[jnp.where(valid_u, uid, cap)].add(
        jnp.where(valid_u, sums, 0.0)).at[cap].set(0.0)
    ts_upd = ts_upd.at[jnp.where(valid_u, uid, cap)].max(
        jnp.where(valid_u, umax, 0)).at[cap].set(0)
    return cert, ts_upd


def accumulate_certainty_local(cert, ts_upd, aux, cap: int):
    """Certainty/ts side effects against COMPACT local arrays (dump row
    `cap`); scattered back to the global map once per frame."""
    qn = aux["qn"]
    w = aux["w"]
    ts = aux["ts"]
    idx = jnp.where(qn.valid, qn.idx, cap).reshape(-1)
    cert = cert.at[idx].add(jnp.where(qn.valid, w, 0.0).reshape(-1))
    cert = cert.at[cap].set(0.0)
    tsb = jnp.broadcast_to(ts[:, None], qn.idx.shape).reshape(-1)
    ts_upd = ts_upd.at[idx].max(jnp.where(qn.valid.reshape(-1), tsb, 0))
    ts_upd = ts_upd.at[cap].set(0)
    return cert, ts_upd


def make_train_step(
    qp: mq.QueryParams,
    optimizer,
    *,
    bs: int,
    bs_new: int,
    train_decoder: bool,
    loss_kwargs: dict,
):
    """Build one jitted mapping iteration: batch draw -> loss -> Adam step ->
    certainty side-effects (reference: utils/mapper.py:623-844; the
    per-frame optimizer reset happens in the caller by re-initializing
    opt_state each frame)."""

    frozen = {"geo_mlp", "color_mlp", "sem_mlp"}

    def step(params, opt_state, state, pool, key, lf, use_new, lset=None):
        k1, kc, k2 = jax.random.split(key, 3)
        bidx = draw_batch_indices(k1, pool, bs, bs_new, use_new)
        (loss, aux), grads = jax.value_and_grad(mapping_loss, has_aux=True)(
            params, state, pool, bidx, qp, lf, key=kc, lset=lset,
            **loss_kwargs)
        if not train_decoder:
            grads = {
                k: (jax.tree.map(jnp.zeros_like, v) if k in frozen else v)
                for k, v in grads.items()
            }
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        state = apply_certainty_update(state, aux)
        metrics = {
            "loss": loss,
            "sdf_loss": aux["sdf_loss"],
            "eikonal_loss": aux["eikonal_loss"],
            "sem_loss": aux["sem_loss"],
            "color_loss": aux["color_loss"],
        }
        return params, opt_state, state, k2, metrics

    return jax.jit(step)


def make_train_loop(
    qp: mq.QueryParams,
    optimizer,
    *,
    n_iters: int,
    bs: int,
    bs_new: int,
    train_decoder: bool,
    loss_kwargs: dict,
    mesh=None,
    dp_axis: str = "dp",
    subset_hist: int = 0,
    subset_cert_periter: bool = False,
):
    """Whole per-frame training run (`n_iters` mapping iterations) as ONE
    jitted lax.scan program — a single device dispatch per frame instead of
    one per iteration (key for TPU dispatch-latency hiding).

    With `mesh`, the same program runs DATA-PARALLEL over the mesh's
    `dp_axis`: every device draws its OWN `bs`-sized batch (the iteration
    key is folded with the device index), per-device gradients are averaged
    with an ICI all-reduce (`lax.pmean`) and the Adam update is computed
    identically on every device, so params/map state stay replicated.
    Effective batch per iteration = n_devices * bs. Certainty/ts side
    effects are psum/pmax-reduced so the replicated map state sees every
    device's contributions. The reference has no multi-GPU path (SURVEY
    §2.2); this is the TPU-native scaling axis."""

    frozen = {"geo_mlp", "color_mlp", "sem_mlp"}
    dp_on = mesh is not None
    pre_gather = n_iters <= 32
    # subset mode: draw ONE per-frame history subset, probe/pack it once,
    # and let every iteration take a rotating contiguous slice of it —
    # the candidate probe is the dominant fixed cost of the train program
    # (~25 ms at 196k queries on v5e) and shrinks 3x at the default
    # subset size. Per-iteration new-sample mixing keeps the exact
    # reference semantics (utils/mapper.py:452-480).
    use_subset = pre_gather and subset_hist >= bs

    def dp_key(key):
        if not dp_on:
            return key
        return jax.random.fold_in(key, jax.lax.axis_index(dp_axis))

    def dp_mean(tree):
        if not dp_on:
            return tree
        return jax.lax.pmean(tree, dp_axis)

    def freeze(grads):
        if train_decoder:
            return grads
        return {k: (jax.tree.map(jnp.zeros_like, v) if k in frozen else v)
                for k, v in grads.items()}

    def cert_update_global(state, aux):
        if not dp_on:
            return apply_certainty_update(state, aux)
        # delta form so the contributions of all devices' batches can be
        # psum/pmax-reduced before touching the replicated state
        C = state.capacity
        qn, w, ts = aux["qn"], aux["w"], aux["ts"]
        idx = jnp.where(qn.valid, qn.idx, C).reshape(-1)
        delta = jnp.zeros_like(state.certainty).at[idx].add(
            jnp.where(qn.valid, w, 0.0).reshape(-1)).at[C].set(0.0)
        tsb = jnp.broadcast_to(ts[:, None], qn.idx.shape).reshape(-1)
        tsm = jnp.zeros_like(state.ts_update).at[idx].max(
            jnp.where(qn.valid.reshape(-1), tsb, 0)).at[C].set(0)
        delta = jax.lax.psum(delta, dp_axis)
        tsm = jax.lax.pmax(tsm, dp_axis)
        return state.replace(
            certainty=(state.certainty + delta).at[C].set(0.0),
            ts_update=jnp.maximum(state.ts_update, tsm).at[C].set(0))

    def cert_update_local(cert, ts_upd, aux, cap):
        if not dp_on:
            return accumulate_certainty_local(cert, ts_upd, aux, cap)
        qn, w, ts = aux["qn"], aux["w"], aux["ts"]
        idx = jnp.where(qn.valid, qn.idx, cap).reshape(-1)
        delta = jnp.zeros_like(cert).at[idx].add(
            jnp.where(qn.valid, w, 0.0).reshape(-1)).at[cap].set(0.0)
        tsb = jnp.broadcast_to(ts[:, None], qn.idx.shape).reshape(-1)
        tsm = jnp.zeros_like(ts_upd).at[idx].max(
            jnp.where(qn.valid.reshape(-1), tsb, 0)).at[cap].set(0)
        delta = jax.lax.psum(delta, dp_axis)
        tsm = jax.lax.pmax(tsm, dp_axis)
        return ((cert + delta).at[cap].set(0.0),
                jnp.maximum(ts_upd, tsm).at[cap].set(0))

    def one(carry, key):
        params, opt_state, state, pool, lf, use_new, lset = carry
        kb, kc = jax.random.split(key)
        bidx = draw_batch_indices(dp_key(kb), pool, bs, bs_new, use_new)
        (loss, aux), grads = jax.value_and_grad(mapping_loss, has_aux=True)(
            params, state, pool, bidx, qp, lf, key=dp_key(kc), lset=lset,
            **loss_kwargs)
        grads = freeze(grads)
        loss, grads = dp_mean((loss, grads))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        state = cert_update_global(state, aux)
        return (params, opt_state, state, pool, lf, use_new, lset), loss

    def one_local(carry, xs):
        """Local-mode iteration: features live in compact [L+1]-row
        arrays; no [C]-sized scatter anywhere in the loop. The batch
        indices and their neighbor CANDIDATES were precomputed for all
        iterations by one batched kernel probe (map positions do not move
        during the per-frame training run, so candidates stay exact).
        Certainty/ts side effects are NOT applied here: the loss never
        reads them, and a per-iteration scatter costs ~14 cycles/element
        on TPU — the iteration just emits its (neighbor, weight, ts)
        contributions and the loop applies them all in one sort-based
        pass (accumulate_certainty_sorted)."""
        params, opt_state, pool, lf, use_new, lset = carry
        if pre_gather:
            kc, bidx, cnd, cnv, batch = xs
        else:
            kc, bidx, cnd, cnv = xs
            batch = None
        (loss, aux), grads = jax.value_and_grad(mapping_loss, has_aux=True)(
            params, None, pool, bidx, qp, lf, key=kc, lset=lset,
            cand=(cnd, cnv), batch=batch, **loss_kwargs)
        grads = freeze(grads)
        loss, grads = dp_mean((loss, grads))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        qn, w = aux["qn"], aux["w"]
        contrib = (jnp.where(qn.valid, qn.idx, lset.cap),
                   jnp.where(qn.valid, w, 0.0),
                   jnp.where(qn.valid, aux["ts"][:, None], 0))
        return (params, opt_state, pool, lf, use_new, lset), (loss, contrib)

    def loop(params, opt_state, state, pool, key, lf, use_new, lset=None):
        if lset is None:
            keys = jax.random.split(key, n_iters + 1)
            carry, losses = jax.lax.scan(
                one, (params, opt_state, state, pool, lf, use_new, lset),
                keys[1:])
            params, opt_state, state = carry[:3]
            return params, opt_state, state, keys[0], losses
        keys = jax.random.split(key, n_iters + 2)

        # ---- local mode: gather compact params, train, scatter back once
        C = state.capacity
        gidx = lset.gidx
        lparams = dict(params)
        lparams["geo_features"] = params["geo_features"][gidx]
        if "color_features" in params:
            lparams["color_features"] = params["color_features"][gidx]
        lopt = optimizer.init(lparams)   # fresh per-frame optimizer

        # pre-draw every iteration's batch and probe ALL their neighbor
        # candidates in ONE kernel call (measured 3-4x cheaper than
        # n_iters separate probes on v5e); each scan iteration re-ranks
        # its cached candidates to the exact top-k. The same candidates
        # serve the eikonal term's six shifted queries. k = nn_k + 2
        # (not nn_k + 6): the kernel's top-k merge cost is linear in k
        # (measured 24.7 vs 29.1 ms per 196k-query probe for k 8 vs 12);
        # the slack columns only matter to the eikonal re-rank at +-eps
        # shifts, where 2 spares cover any neighbor-order change for
        # eps << voxel
        cand_k = qp.nn_k + 2

        def pack_pool_rows(flat_idx):
            # pool columns packed into one [*, 6+] array so the pre-gather
            # is ONE row gather instead of four (TPU random-gather cost is
            # per row, not per byte)
            parts = [pool.coord, pool.sdf_label[:, None],
                     pool.weight[:, None],
                     pool.ts.astype(jnp.float32)[:, None]]
            if loss_kwargs.get("semantic_on") and pool.sem_label is not None:
                parts.append(pool.sem_label.astype(jnp.float32)[:, None])
            if loss_kwargs.get("color_on") and pool.color_label is not None:
                parts.append(pool.color_label)
            return jnp.concatenate(parts, axis=1)[flat_idx]

        def unpack_batch(packed, lead_shape):
            batch = {
                "coord": packed[..., :3].reshape(*lead_shape, 3),
                "sdf_label": packed[..., 3].reshape(lead_shape),
                "weight": packed[..., 4].reshape(lead_shape),
                "ts": packed[..., 5].astype(jnp.int32).reshape(lead_shape),
            }
            col = 6
            if loss_kwargs.get("semantic_on") and pool.sem_label is not None:
                batch["sem_label"] = packed[..., col].astype(
                    jnp.int32).reshape(lead_shape)
                col += 1
            if loss_kwargs.get("color_on") and pool.color_label is not None:
                cc = pool.color_label.shape[-1]
                batch["color_label"] = packed[..., col:col + cc].reshape(
                    *lead_shape, cc)
            return batch

        def probe_chunked(coords_all):
            # chunk the probe: its ragged pair list lives in SMEM scalar-
            # prefetch (1 MB limit) and scales with the query count — ~200k
            # queries per kernel call is safely inside it (the init frame's
            # iters*init_iter_ratio run would otherwise probe millions)
            nq = coords_all.shape[0]
            idx_parts, val_parts = [], []
            for s in range(0, nq, 196608):
                e = min(s + 196608, nq)
                qn_c = npm.query_neighbors_join(
                    None, coords_all[s:e], lset, nn_k=cand_k,
                    max_dist2=qp.join_max_dist2, resolution=qp.resolution,
                    local_ids=True)
                idx_parts.append(qn_c.idx)
                val_parts.append(qn_c.valid)
            return jnp.concatenate(idx_parts), jnp.concatenate(val_parts)

        if use_subset:
            # never probe more subset rows than the run would draw anyway
            S_h = max(bs, min(subset_hist, n_iters * bs))
            S_n = bs_new * n_iters
            hist_idx = jax.random.randint(
                dp_key(keys[1]), (S_h,), 0, jnp.maximum(pool.count, 1))

            def draw_new(k):
                kb, kc = jax.random.split(k)
                sel = jax.random.randint(
                    dp_key(kb), (bs_new,), 0,
                    jnp.maximum(pool.new_count, 1))
                return pool.new_idx[sel], dp_key(kc)

            if bs_new > 0:
                new_rows, kcs = jax.vmap(draw_new)(keys[2:])
                sub_idx = jnp.concatenate([hist_idx, new_rows.reshape(-1)])
            else:
                kcs = jax.vmap(dp_key)(keys[2:])
                sub_idx = hist_idx
            packed_sub = pack_pool_rows(sub_idx)
            # fold row validity into the weight column: mapping_loss drops
            # weight==0 rows, so invalid pool indices never train
            packed_sub = packed_sub.at[:, 4].set(jnp.where(
                sub_idx < pool.count, packed_sub[:, 4], 0.0))
            cand_sub, cval_sub = probe_chunked(packed_sub[:, :3])
            cols = packed_sub.shape[1]
            # doubled history region: every iteration's batch is a wrap-
            # free CONTIGUOUS slice (dynamic_slice, no gather) at a
            # rotating bs-coprime stride, i.e. epoch-style reuse of the
            # once-probed subset
            ph2 = jnp.concatenate([packed_sub[:S_h], packed_sub[:S_h]])
            ch2 = jnp.concatenate([cand_sub[:S_h], cand_sub[:S_h]])
            cv2 = jnp.concatenate([cval_sub[:S_h], cval_sub[:S_h]])
            stride = bs + max(bs // 4, 1)
            starts = jnp.asarray(
                [(i * stride) % S_h for i in range(n_iters)], jnp.int32)
            if bs_new > 0:
                new_pack = packed_sub[S_h:].reshape(n_iters, bs_new, cols)
                new_cand = cand_sub[S_h:].reshape(n_iters, bs_new, cand_k)
                new_cval = cval_sub[S_h:].reshape(n_iters, bs_new, cand_k)
                xs = (kcs, starts, new_pack, new_cand, new_cval)
            else:
                xs = (kcs, starts)

            def one_subset(carry, xs_i):
                params, opt_state, pool_, lf_, use_new_, lset_ = carry
                if bs_new > 0:
                    kc, st, npk, ncd, ncv = xs_i
                else:
                    kc, st = xs_i
                hp = jax.lax.dynamic_slice(ph2, (st, 0), (bs, cols))
                hc = jax.lax.dynamic_slice(ch2, (st, 0), (bs, cand_k))
                hv = jax.lax.dynamic_slice(cv2, (st, 0), (bs, cand_k))
                if bs_new > 0:
                    # per-iteration new-sample tail, exact reference mix
                    # semantics (min(new_count, bs_new) fresh slots)
                    slot = use_new_ & (jnp.arange(bs_new) < pool_.new_count)
                    pk = jnp.concatenate([
                        hp[: bs - bs_new],
                        jnp.where(slot[:, None], npk, hp[:bs_new])])
                    cnd = jnp.concatenate([
                        hc[: bs - bs_new],
                        jnp.where(slot[:, None], ncd, hc[:bs_new])])
                    cnv = jnp.concatenate([
                        hv[: bs - bs_new],
                        jnp.where(slot[:, None], ncv, hv[:bs_new])])
                else:
                    pk, cnd, cnv = hp, hc, hv
                batch = unpack_batch(pk, (bs,))
                bidx = BatchIdx(idx=jnp.zeros(bs, jnp.int32),
                                mask=jnp.ones(bs, bool))
                (loss, aux), grads = jax.value_and_grad(
                    mapping_loss, has_aux=True)(
                    params, None, pool_, bidx, qp, lf_, key=kc, lset=lset_,
                    cand=(cnd, cnv), batch=batch, **loss_kwargs)
                grads = freeze(grads)
                loss, grads = dp_mean((loss, grads))
                updates, opt_state = optimizer.update(
                    grads, opt_state, params)
                params = jax.tree.map(lambda p, u: p + u, params, updates)
                out_c = (params, opt_state, pool_, lf_, use_new_, lset_)
                if subset_cert_periter:
                    # legacy per-iteration emission (kept for the
                    # equality regression test of the multiplicity-based
                    # accumulation below)
                    qn, w = aux["qn"], aux["w"]
                    contrib = (jnp.where(qn.valid, qn.idx, lset_.cap),
                               jnp.where(qn.valid, w, 0.0),
                               jnp.where(qn.valid, aux["ts"][:, None], 0))
                    return out_c, (loss, contrib)
                return out_c, loss

            if subset_cert_periter:
                carry, (losses, contribs_pi) = jax.lax.scan(
                    one_subset, (lparams, lopt, pool, lf, use_new, lset),
                    xs)
            else:
                carry, losses = jax.lax.scan(
                    one_subset, (lparams, lopt, pool, lf, use_new, lset),
                    xs)
            lparams = carry[0]

            # certainty/ts side effects at the SUBSET level: a subset
            # row's neighbors and IDW weights are FRAME-CONSTANT (map
            # positions do not move during the run; the candidate re-rank
            # is deterministic), so its total contribution over the run
            # is multiplicity x weight — the multiplicity of each history
            # row follows from the STATIC window schedule (starts/stride)
            # plus a traced correction for the tail slots the new-sample
            # mix replaces. Exactly equal to per-iteration accumulation,
            # but the sorted-accumulation pass runs over S+new rows
            # (~78k x k) instead of n_iters x bs x k (~1.2M) rows.
            k_nn = qp.nn_k
            idx6 = cand_sub[:, :k_nn]
            val6 = cval_sub[:, :k_nn]
            pos6 = lset.pts[jnp.where(val6, idx6, lset.cap)]
            diff6 = packed_sub[:, None, :3] - pos6
            d2 = jnp.sum(diff6 * diff6, axis=-1)
            d2 = jnp.where(val6, d2, npm.BIG_DIST2)
            qn6 = npm.QueryNeighbors(
                idx=idx6, dist2=d2, valid=val6,
                nn_count=jnp.sum(val6, -1).astype(jnp.int32))
            w6 = npm.idw_weights(qn6, idw_index=qp.idw_index)

            # history multiplicity from the batch-assembly rule
            # pk = [window head rows 0..bs-bs_new) |
            #       slot-active ? new draw : window row j' (j' < bs_new)]:
            # each window contributes +1 over its first bs-bs_new rows,
            # +1 over its first bs_new rows (the inactive-slot fallback),
            # and a traced -1 on the first `nc` of those when the new mix
            # is active; the window's last bs_new rows are never used.
            starts_np = [(i * stride) % S_h for i in range(n_iters)]
            base_np = np.zeros(S_h, np.float32)
            for st_ in starts_np:
                for e_ in (st_ + bs - bs_new, st_ + min(bs_new, bs)):
                    base_np[st_:min(e_, S_h)] += 1
                    if e_ > S_h:
                        base_np[: e_ - S_h] += 1
            mult_hist = jnp.asarray(base_np)
            if bs_new > 0:
                nc = jnp.where(
                    use_new,
                    jnp.clip(pool.new_count, 0, bs_new), 0)
                tmask = (jnp.arange(bs_new) < nc).astype(jnp.float32)
                heads_np = np.asarray(
                    [[(st_ + j) % S_h for j in range(bs_new)]
                     for st_ in starts_np], np.int32)
                mult_hist = mult_hist.at[jnp.asarray(heads_np)].add(
                    -jnp.broadcast_to(tmask, heads_np.shape))
                mult_new = jnp.broadcast_to(
                    tmask, (n_iters, bs_new)).reshape(-1)
                mult = jnp.concatenate([mult_hist, mult_new])
            else:
                mult = mult_hist
            ts_sub = packed_sub[:, 5].astype(jnp.int32)
            ci = jnp.where(val6, idx6, lset.cap)
            cw = jnp.where(val6, w6, 0.0) * mult[:, None]
            cts = jnp.where((mult[:, None] > 0.5) & val6, ts_sub[:, None], 0)
            contribs = (ci, cw, cts)
            if subset_cert_periter:
                contribs = contribs_pi
        else:
            def draw(k):
                kb, kc = jax.random.split(k)
                return (draw_batch_indices(dp_key(kb), pool, bs, bs_new,
                                           use_new), dp_key(kc))

            bidxs, kcs = jax.vmap(draw)(keys[2:])        # [n_iters, bs]
            flat_idx = bidxs.idx.reshape(-1)
            if pre_gather:
                # pre-gather every iteration's pool rows in one pass
                # (labels are constant during the run; keeps [pool]-sized
                # gathers out of the scan body). Skipped for the long
                # init-frame loop, where n_iters * bs label copies would
                # cost ~150 MB of HBM.
                packed = pack_pool_rows(flat_idx)
                coords_all = packed[:, :3]
                batches = unpack_batch(packed, (n_iters, bs))
            else:
                coords_all = pool.coord[flat_idx]
            cand_flat, cval_flat = probe_chunked(coords_all)
            cand_all = cand_flat.reshape(n_iters, bs, cand_k)
            cvalid_all = cval_flat.reshape(n_iters, bs, cand_k)

            xs = ((kcs, bidxs, cand_all, cvalid_all, batches) if pre_gather
                  else (kcs, bidxs, cand_all, cvalid_all))
            carry, (losses, contribs) = jax.lax.scan(
                one_local,
                (lparams, lopt, pool, lf, use_new, lset), xs)
            lparams = carry[0]

        # one sort-based certainty/ts accumulation for the whole run
        ci, cw, cts = (a.reshape(-1) for a in contribs)
        if dp_on:
            dcert, dts = accumulate_certainty_sorted(
                jnp.zeros_like(lset.cert), jnp.zeros_like(lset.ts_upd),
                ci, cw, cts, lset.cap)
            dcert = jax.lax.psum(dcert, dp_axis)
            dts = jax.lax.pmax(dts, dp_axis)
            cert_l = (lset.cert + dcert).at[lset.cap].set(0.0)
            ts_l = jnp.maximum(lset.ts_upd, dts).at[lset.cap].set(0)
        else:
            cert_l, ts_l = accumulate_certainty_sorted(
                lset.cert, lset.ts_upd, ci, cw, cts, lset.cap)

        new_params = dict(params)
        new_params["geo_features"] = (
            params["geo_features"].at[gidx].set(lparams["geo_features"])
            .at[C].set(0.0))
        if "color_features" in params:
            new_params["color_features"] = (
                params["color_features"].at[gidx]
                .set(lparams["color_features"]).at[C].set(0.0))
        for k in ("geo_mlp", "color_mlp", "sem_mlp"):
            if k in lparams:
                new_params[k] = lparams[k]
        new_state = state.replace(
            geo_features=new_params["geo_features"],
            color_features=new_params.get("color_features",
                                          state.color_features),
            certainty=state.certainty.at[gidx].set(cert_l).at[C].set(0.0),
            ts_update=state.ts_update.at[gidx].set(ts_l).at[C].set(0),
        )
        return new_params, opt_state, new_state, keys[0], losses

    if dp_on:
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        # everything is replicated (P()) in and out: each device holds the
        # full params/map/pool, draws its own batch (dp_key), and the
        # pmean/psum reductions above keep the replicas bit-identical
        inner = shard_map(
            loop, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=False)

        def dp_loop(params, opt_state, state, pool, key, lf, use_new,
                    lset=None):
            return inner(params, opt_state, state, pool, key, lf, use_new,
                         lset)

        return jax.jit(dp_loop)

    # NOTE: donation deferred to the perf pass — params["geo_features"] can
    # alias state.geo_features across the call boundary.
    return jax.jit(loop)
