"""Fixed-capacity neural point map — the TPU-native core state.

Rebuilds the capabilities of the reference's `NeuralPoints` module
(reference: model/neural_points.py:29-1009) as a pure-functional pytree with
static shapes:

* point attribute arrays are preallocated at `capacity` (+1 dump row used as
  the scatter target for masked-out writes),
* a power-of-two voxel hash table stores the latest point index per cell
  (reference semantics of buffer_pt_index, model/neural_points.py:88-90),
* map growth (`torch.cat`, reference :378) becomes masked scatters at a
  running `count` offset,
* the reference's materialized "local map" (reset_local_map,
  model/neural_points.py:424-513) is replaced by *query-time masking* on
  travel-distance window + radius — no dynamic-shape extraction exists at all,
  and "assign_local_to_global" becomes a no-op because training updates the
  global feature arrays in place.

All functions are jit-compatible; python-scalar arguments are compile-time
constants (closed over by the SLAM system when it builds its jitted steps).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from pin_slam_tpu.ops import hash3d
from pin_slam_tpu.ops.transforms import (
    quat_multiply,
    quat_rotate,
    rotmat_to_quat,
    transform_points_by_ts,
)
from pin_slam_tpu.ops.voxel import (
    voxel_down_sample_hash_mask,
    voxel_down_sample_min_value_mask,
)

BIG_DIST2 = jnp.float32(9e3)  # sentinel distance (reference: neural_points.py:583)


@struct.dataclass
class MapState:
    """Global neural point map. Row `capacity` of each per-point array is a
    dump row for masked scatters and invalid gathers."""

    positions: jnp.ndarray       # [C+1, 3] f32 world coords
    orientations: jnp.ndarray    # [C+1, 4] f32 quaternion (w,x,y,z)
    geo_features: jnp.ndarray    # [C+1, F] f32
    color_features: Optional[jnp.ndarray]  # [C+1, F] f32 or None
    ts_create: jnp.ndarray       # [C+1] i32
    ts_update: jnp.ndarray       # [C+1] i32
    certainty: jnp.ndarray       # [C+1] f32
    count: jnp.ndarray           # [] i32 number of valid points
    table: jnp.ndarray           # [B+1] i32 hash table (-1 empty); row B = dump
    # Probe cache: 4x4x4-cell BRICKS hashed by brick coordinate.
    # btable[int32, Bb+1, 64, 3] holds per cell slot (idx, ts_create,
    # packed 3xu8 cell-local position). TPU random-gather cost is per ROW
    # (~73M rows/s, independent of row width or locality — measured), so one
    # 768-byte brick row delivers 64 cells for the price the per-cell layout
    # paid for one: a kNN probe is 8 brick gathers instead of 33 cell
    # gathers. Candidates are re-restricted to the reference's 33-cell ball
    # at query time, keeping exact search semantics.
    btable: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.positions.shape[0] - 1

    @property
    def table_size(self) -> int:
        return self.table.shape[0] - 1


@struct.dataclass
class QueryNeighbors:
    """k nearest neural points per query (reference: query_feature's
    sorted knn, model/neural_points.py:577-595)."""

    idx: jnp.ndarray       # [N, k] i32 point indices (dump row C when invalid)
    dist2: jnp.ndarray     # [N, k] f32
    valid: jnp.ndarray     # [N, k] bool
    nn_count: jnp.ndarray  # [N] i32 valid-neighbor count BEFORE top-k


def init_map_state(
    capacity: int,
    table_size: int,
    feature_dim: int,
    color_on: bool,
    dtype=jnp.float32,
    with_btable: bool = True,
) -> MapState:
    """`with_btable=False` allocates a dump-brick-only cache: the spatial-
    join probe ("join" mode) never reads bricks, and the full cache is
    ~400 MB at a 4M table — dead HBM plus a multi-ms copy in every program
    the state passes through. brick-mode probes require True."""
    c1 = capacity + 1
    return MapState(
        positions=jnp.zeros((c1, 3), dtype),
        orientations=jnp.zeros((c1, 4), dtype).at[:, 0].set(1.0),
        geo_features=jnp.zeros((c1, feature_dim), dtype),
        color_features=jnp.zeros((c1, feature_dim), dtype) if color_on else None,
        ts_create=jnp.zeros((c1,), jnp.int32),
        ts_update=jnp.zeros((c1,), jnp.int32),
        certainty=jnp.zeros((c1,), dtype),
        count=jnp.zeros((), jnp.int32),
        table=jnp.full((table_size + 1,), -1, jnp.int32),
        btable=_empty_btable(_brick_count(table_size) if with_btable else 0),
    )


# Brick layout. Integer storage throughout — an earlier float cache had to
# bias indices because small int32 bit patterns are f32 denormals that the
# TPU flushes to zero in transit.
BRICK_EDGE = 4                   # cells per brick edge
CELLS_PER_BRICK = BRICK_EDGE ** 3
_BRICK_FIELDS = 3                # idx, ts_create, packed local position
# brick-corner offsets covering any 5-cell span (the 33-cell ball)
_BRICK_NEI = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                  indexing="ij"), -1).reshape(8, 3)
_SLOT_XYZ = np.stack(np.meshgrid(np.arange(4), np.arange(4), np.arange(4),
                                 indexing="ij"), -1).reshape(64, 3)
# flat slot id consistent with _SLOT_XYZ ordering (x-major meshgrid 'ij')
_SLOT_OF = _SLOT_XYZ[:, 0] * 16 + _SLOT_XYZ[:, 1] * 4 + _SLOT_XYZ[:, 2]
assert (_SLOT_OF == np.arange(64)).all()


def _brick_count(table_size: int) -> int:
    """Brick rows for a given per-cell table size (4x cell capacity)."""
    return max(table_size >> 4, 1 << 10)


def _empty_btable(n_bricks: int) -> jnp.ndarray:
    return jnp.full((n_bricks + 1, CELLS_PER_BRICK, _BRICK_FIELDS), -1,
                    jnp.int32)


def _pack_local(pos: jnp.ndarray, grid: jnp.ndarray,
                resolution: float) -> jnp.ndarray:
    """Quantize cell-local position to 3xu8 in one i32 (~res/256 ≈ mm
    precision — used only to RANK neighbor candidates; consumers recompute
    exact distances from `positions`)."""
    frac = pos / resolution - grid.astype(jnp.float32)
    q = jnp.clip((frac * 256.0).astype(jnp.int32), 0, 255)
    return q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)


def _brick_write(btable: jnp.ndarray, grid: jnp.ndarray, idx: jnp.ndarray,
                 ts: jnp.ndarray, pos: jnp.ndarray, resolution: float,
                 write_mask: jnp.ndarray) -> jnp.ndarray:
    """Scatter (idx, ts, packed pos) records into brick slots; masked rows
    land in the dump brick. The scatter runs on the FLAT [(Nb+1)*64, 3]
    view — a 1-D row scatter lowers far better on TPU than the 2-D
    [brick, slot] form. The dump brick is never cleared: query hashes are
    always < Nb, so its contents are unreachable."""
    n_bricks = btable.shape[0] - 1
    bc = grid >> 2
    hb = hash3d.hash_grid(bc, n_bricks)
    slot = ((grid[..., 0] & 3) * 16 + (grid[..., 1] & 3) * 4
            + (grid[..., 2] & 3))
    flat_idx = jnp.where(write_mask, hb * CELLS_PER_BRICK + slot,
                         n_bricks * CELLS_PER_BRICK)
    rec = jnp.stack(
        [idx, ts, _pack_local(pos, grid, resolution)], axis=-1)
    flat = btable.reshape(-1, _BRICK_FIELDS)
    flat = flat.at[flat_idx].set(rec)
    return flat.reshape(btable.shape)


def rebuild_probe_cache(state: "MapState", resolution: float) -> "MapState":
    """Recompute the brick cache from (table, positions, ts_create) —
    required after any operation that moves points or rewrites the table
    wholesale (deform, rehash, prune). Only per-cell winners (the points the
    cell table points at) are written, keeping btable consistent with
    `table`. No-op for a dump-brick-only cache (join mode — see
    init_map_state(with_btable=False))."""
    if state.btable.shape[0] <= 1:
        return state
    C = state.capacity
    B = state.table_size
    rows = jnp.arange(C + 1, dtype=jnp.int32)
    alive = rows < state.count
    grid = hash3d.grid_coords(state.positions, resolution)
    h = hash3d.hash_grid(grid, B)
    is_winner = alive & (state.table[h] == rows)
    btable = _empty_btable(state.btable.shape[0] - 1)
    return state.replace(btable=_brick_write(
        btable, grid, rows, state.ts_create, state.positions, resolution,
        is_winner))


# ---------------------------------------------------------------------------
# insertion (reference: NeuralPoints.update, model/neural_points.py:311-422)
# ---------------------------------------------------------------------------


def insert_points(
    state: MapState,
    points: jnp.ndarray,   # [M, 3] candidate new neural points (world frame)
    mask: jnp.ndarray,     # [M] validity
    cur_ts,                # scalar i32 (traced ok)
    travel_dist: jnp.ndarray,  # [maxT] f32 cumulative travel distance
    *,
    resolution: float,
    local_window_dist: float,
    feature_noise: Optional[jnp.ndarray] = None,  # [M, F] optional init noise
    use_reobs_rule: bool = True,
    force_all_new=False,   # traced bool: reboot path (reference :341,357-360)
    insert_cap: int = 1 << 16,  # max new points accepted per call (extras
                                # drop and re-insert next frame via the
                                # novelty probe)
    maintain_btable: bool = True,  # False when the spatial-join probe is
                                   # active (brick cache unused)
):
    """Voxel-downsample candidates, COMPACT the voxel winners to a small
    fixed buffer, probe the hash table on the compacted rows only, and
    append genuinely new points with contiguous-block writes.

    Structure chosen from TPU measurements: per-row scatters against the
    multi-MB state arrays interact catastrophically under XLA (the original
    all-scatter insert ran 102 ms/frame at M=460k); compacting first keeps
    every probe gather small, the state-array writes are blended
    dynamic_update_slice blocks at the append cursor (new rows are
    CONSECUTIVE slots), and the only scatters left are the narrow
    table/brick updates over `insert_cap` rows.
    Returns (state, new_point_ratio)."""
    C = state.capacity
    B = state.table_size
    M = points.shape[0]

    # one candidate per hash slot (same collision structure as the table
    # itself; scatter-based, no sort); scratch table 4M keeps the dedup
    # sweep cheap while holding collisions ~per-mille at frame loads
    vds_size = min(B, 1 << 22)
    vmask = voxel_down_sample_hash_mask(
        points, mask, resolution, vds_size) & mask
    sampled = jnp.maximum(jnp.sum(vmask.astype(jnp.int32)), 1)

    # ---- compact voxel winners to at most `probe_cap` rows
    probe_cap = min(M, insert_cap * 2)
    order = jnp.cumsum(vmask.astype(jnp.int32)) - 1
    cdest = jnp.where(vmask & (order < probe_cap), order, probe_cap)
    cand = jnp.full((probe_cap + 1,), M, jnp.int32).at[cdest].set(
        jnp.arange(M, dtype=jnp.int32))[:probe_cap]
    cvalid = cand < M
    ci = jnp.where(cvalid, cand, 0)
    cpts = points[ci]                                    # [K, 3]

    # ---- probe existing occupants (compacted rows only)
    grid = hash3d.grid_coords(cpts, resolution)
    h = hash3d.hash_grid(grid, B)
    existing = state.table[jnp.where(cvalid, h, B)]
    exist_valid = existing >= 0
    existing_c = jnp.where(exist_valid, existing, C)
    epos = state.positions[existing_c]
    d2 = jnp.sum((epos - cpts) ** 2, axis=-1)
    collide = d2 > 3.0 * resolution * resolution  # (reference :345)

    is_new = cvalid & (~exist_valid | collide)
    if use_reobs_rule:
        # re-add when the occupant was last updated too long (in travel
        # distance) ago (reference :347-356); threshold form avoids a
        # per-candidate travel_dist gather (see _travel_window_ts_lo)
        t = jnp.arange(travel_dist.shape[0])
        ts_lo = jnp.sum(((travel_dist < travel_dist[cur_ts]
                          - local_window_dist) & (t <= cur_ts))
                        .astype(jnp.int32))
        is_new = is_new | (cvalid & exist_valid
                           & (state.ts_update[existing_c] < ts_lo))
    is_new = jnp.where(force_all_new, cvalid, is_new)

    # ---- compact the new rows to `icap` and give them consecutive slots
    icap = min(probe_cap, insert_cap, C)
    order2 = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    sdest = jnp.where(is_new & (order2 < icap), order2, icap)
    sel = jnp.full((icap + 1,), probe_cap, jnp.int32).at[sdest].set(
        jnp.arange(probe_cap, dtype=jnp.int32))[:icap]
    svalid = sel < probe_cap
    si = jnp.where(svalid, sel, 0)

    npts = cpts[si]                                      # [icap, 3]
    ngrid = grid[si]
    nh = h[si]
    j = jnp.arange(icap, dtype=jnp.int32)
    n_avail = C - state.count
    ok = svalid & (j < n_avail)                          # row accepted
    accepted = jnp.sum(ok.astype(jnp.int32))
    new_ratio = accepted.astype(jnp.float32) / sampled.astype(jnp.float32)
    dest = jnp.where(ok, state.count + j, C).astype(jnp.int32)

    # ---- blended dynamic_update_slice block writes: new rows occupy
    # consecutive slots [count, count+accepted); near capacity the block
    # start is clamped and overlapped live rows keep their old values
    start = jnp.clip(state.count, 0, C - icap)
    off = state.count - start                            # 0 except near cap
    gi = jnp.clip(j - off, 0, icap - 1)
    write = (j >= off) & ok[gi]

    def blend(arr, new_block):
        old = jax.lax.dynamic_slice(
            arr, (start,) + (0,) * (arr.ndim - 1),
            (icap,) + arr.shape[1:])
        w = write.reshape((icap,) + (1,) * (arr.ndim - 1))
        blk = jnp.where(w, new_block[gi], old)
        return jax.lax.dynamic_update_slice(
            arr, blk.astype(arr.dtype), (start,) + (0,) * (arr.ndim - 1))

    ts_new = jnp.broadcast_to(jnp.int32(cur_ts), (icap,))
    feat_init = (
        feature_noise[ci][si]
        if feature_noise is not None
        else jnp.zeros((icap, state.geo_features.shape[1]),
                       state.geo_features.dtype)
    )
    ident_q = jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0, 0.0], state.orientations.dtype), (icap, 4))

    positions = blend(state.positions, npts)
    orientations = blend(state.orientations, ident_q)
    ts_create = blend(state.ts_create, ts_new)
    ts_update = blend(state.ts_update, ts_new)
    certainty = blend(state.certainty, jnp.zeros((icap,)))
    geo_features = blend(state.geo_features, feat_init)
    color_features = state.color_features
    if color_features is not None:
        color_features = blend(color_features, feat_init)

    # hash-table updates are only needed for the NEW rows: existing
    # occupants' cells already hold the identical (idx, pos, ts) record
    h_eff = jnp.where(ok, nh, B)
    table = state.table.at[h_eff].set(jnp.where(ok, dest, -1))
    table = table.at[B].set(-1)                 # keep dump row clean
    btable = (_brick_write(
        state.btable, ngrid, dest, ts_new, npts, resolution, ok)
        if maintain_btable and state.btable.shape[0] > 1 else state.btable)

    new_state = state.replace(
        positions=positions,
        orientations=orientations,
        geo_features=geo_features,
        color_features=color_features,
        ts_create=ts_create,
        ts_update=ts_update,
        certainty=certainty,
        count=state.count + accepted,
        table=table,
        btable=btable,
    )
    return new_state, new_ratio


# ---------------------------------------------------------------------------
# neighborhood query
# (reference: radius_neighborhood_search + query_feature knn part,
#  model/neural_points.py:950-1009,577-595)
# ---------------------------------------------------------------------------


def _travel_window_ts_lo(travel_dist: jnp.ndarray, cur_ts,
                         window: float) -> jnp.ndarray:
    """Smallest timestamp still inside the travel-dist window:
    ts valid  <=>  travel[cur] - travel[ts] < window  <=>  ts >= ts_lo,
    valid because travel_dist is a nondecreasing cumsum on [0, cur_ts] and
    map timestamps never exceed cur_ts."""
    t = jnp.arange(travel_dist.shape[0])
    below = (travel_dist <= travel_dist[cur_ts] - window) & (t <= cur_ts)
    return jnp.sum(below.astype(jnp.int32))


def query_neighbors(
    state: MapState,
    qpts: jnp.ndarray,          # [N, 3]
    *,
    offsets: np.ndarray,        # [K, 3] from hash3d.neighbor_offsets
    resolution: float,
    nn_k: int,
    max_dist2: float,
    time_filter: bool = False,  # travel-dist local-map window (reference :982-988)
    travel_dist: Optional[jnp.ndarray] = None,
    cur_ts=0,
    local_window_dist: float = 0.0,
    radius_filter: bool = False,  # local-map radius (reference :475-478)
    sensor_pos: Optional[jnp.ndarray] = None,
    local_map_radius: float = 0.0,
    reboot_ts=0,
    use_mid_ts: bool = False,   # window by (create+update)/2 (reference
                                # reset_local_map, :449-452) so re-observed
                                # geometry stays in the local map
    probe_mode: str = "brick",  # 'brick' (TPU: 8 wide gathers) or 'cells'
                                # (CPU: 33 narrow gather chains — the 512-
                                # candidate scoring that is free on the TPU
                                # VPU dominates on CPU)
) -> QueryNeighbors:
    if probe_mode == "cells":
        return _query_neighbors_cells(
            state, qpts, offsets=offsets, resolution=resolution, nn_k=nn_k,
            max_dist2=max_dist2, time_filter=time_filter,
            travel_dist=travel_dist, cur_ts=cur_ts,
            local_window_dist=local_window_dist, radius_filter=radius_filter,
            sensor_pos=sensor_pos, local_map_radius=local_map_radius,
            reboot_ts=reboot_ts, use_mid_ts=use_mid_ts)
    C = state.capacity
    n = qpts.shape[0]
    n_bricks = state.btable.shape[0] - 1
    # the probe pattern is the ball {o : |o| <= r} that `offsets` encodes;
    # candidates outside it are masked so brick fetches keep the reference's
    # exact 33-cell search semantics (reference :910-948)
    ball_r2_cells = int(np.max((np.asarray(offsets) ** 2).sum(-1)))
    ball_r_cells = int(np.floor(np.sqrt(ball_r2_cells)))

    grid = hash3d.grid_coords(qpts, resolution)            # [N, 3]
    b0 = (grid - ball_r_cells) >> 2
    bcs = b0[:, None, :] + jnp.asarray(_BRICK_NEI, jnp.int32)[None]
    hb = hash3d.hash_grid(bcs, n_bricks)                   # [N, 8]
    rows = state.btable[hb]                                # [N, 8, 64, 3]
    idx = rows[..., 0]                                     # [N, 8, 64]
    tsc = rows[..., 1]
    packed = rows[..., 2]

    cell = (bcs[:, :, None, :] * BRICK_EDGE
            + jnp.asarray(_SLOT_XYZ, jnp.int32)[None, None])  # [N, 8, 64, 3]
    coff = cell - grid[:, None, None, :]
    in_ball = jnp.sum(coff * coff, axis=-1) <= ball_r2_cells

    lx = ((packed & 0xFF).astype(jnp.float32) + 0.5) * (resolution / 256.0)
    ly = (((packed >> 8) & 0xFF).astype(jnp.float32) + 0.5) * (
        resolution / 256.0)
    lz = (((packed >> 16) & 0xFF).astype(jnp.float32) + 0.5) * (
        resolution / 256.0)
    base = cell.astype(jnp.float32) * resolution
    dx = base[..., 0] + lx - qpts[:, None, None, 0]
    dy = base[..., 1] + ly - qpts[:, None, None, 1]
    dz = base[..., 2] + lz - qpts[:, None, None, 2]
    d2 = dx * dx + dy * dy + dz * dz                       # [N, 8, 64]
    valid = (idx >= 0) & in_ball & (d2 <= max_dist2)

    if time_filter:
        # |travel[cur] - travel[ts]| < w with ts <= cur and travel monotone
        # on [0, cur] reduces to a timestamp threshold — computed once here
        # instead of a per-probe travel_dist gather (a [N*K]-row gather from
        # a tiny array costs as much as the main record gather on TPU)
        ts_lo = _travel_window_ts_lo(travel_dist, cur_ts, local_window_dist)
        ts_eff = tsc
        if use_mid_ts:
            ts_eff = (tsc + state.ts_update[
                jnp.where(idx >= 0, idx, C)]) // 2
        valid = valid & (ts_eff >= ts_lo) & (ts_eff >= reboot_ts)
    if radius_filter and sensor_pos is not None:
        sx = base[..., 0] + lx - sensor_pos[0]
        sy = base[..., 1] + ly - sensor_pos[1]
        sz = base[..., 2] + lz - sensor_pos[2]
        d2s = sx * sx + sy * sy + sz * sz
        valid = valid & (d2s < local_map_radius * local_map_radius)

    nn_count = jnp.sum(valid, axis=(1, 2)).astype(jnp.int32)
    K = 8 * CELLS_PER_BRICK
    d2 = jnp.where(valid, d2, BIG_DIST2).reshape(n, K)
    idx_c = jnp.where(valid, idx, C).reshape(n, K)

    # k rounds of masked argmin beat lax.top_k at this width (512)
    rows_n = jnp.arange(n)
    idx_list, d2_list = [], []
    for _ in range(nn_k):
        a = jnp.argmin(d2, axis=1)
        d2_list.append(d2[rows_n, a])
        idx_list.append(idx_c[rows_n, a])
        d2 = d2.at[rows_n, a].set(BIG_DIST2)
    dist2_k = jnp.stack(d2_list, axis=1)
    idx_k = jnp.stack(idx_list, axis=1)
    valid_k = dist2_k < BIG_DIST2
    idx_k = jnp.where(valid_k, idx_k, C)

    return QueryNeighbors(
        idx=idx_k.astype(jnp.int32), dist2=dist2_k, valid=valid_k,
        nn_count=nn_count,
    )


def _query_neighbors_cells(
    state: MapState,
    qpts: jnp.ndarray,
    *,
    offsets: np.ndarray,
    resolution: float,
    nn_k: int,
    max_dist2: float,
    time_filter: bool = False,
    travel_dist: Optional[jnp.ndarray] = None,
    cur_ts=0,
    local_window_dist: float = 0.0,
    radius_filter: bool = False,
    sensor_pos: Optional[jnp.ndarray] = None,
    local_map_radius: float = 0.0,
    reboot_ts=0,
    use_mid_ts: bool = False,
) -> QueryNeighbors:
    """Per-cell probe: table gather then position/ts gathers. Same search
    semantics as the brick path with exact (unquantized) candidate ranking."""
    C = state.capacity
    B = state.table_size
    offs = jnp.asarray(offsets, jnp.int32)

    grid = hash3d.grid_coords(qpts, resolution)           # [N, 3]
    cells = grid[:, None, :] + offs[None, :, :]           # [N, K, 3]
    h = hash3d.hash_grid(cells, B)                        # [N, K]
    idx = state.table[h]
    valid = idx >= 0
    idx_c = jnp.where(valid, idx, C)

    pos = state.positions[idx_c]                          # [N, K, 3]
    d2 = jnp.sum((pos - qpts[:, None, :]) ** 2, axis=-1)  # [N, K]
    valid = valid & (d2 <= max_dist2)

    if time_filter:
        tsc = state.ts_create[idx_c]
        if use_mid_ts:
            tsc = (tsc + state.ts_update[idx_c]) // 2
        ts_lo = _travel_window_ts_lo(travel_dist, cur_ts, local_window_dist)
        valid = valid & (tsc >= ts_lo) & (tsc >= reboot_ts)
    if radius_filter and sensor_pos is not None:
        d2s = jnp.sum((pos - sensor_pos[None, None, :]) ** 2, axis=-1)
        valid = valid & (d2s < local_map_radius * local_map_radius)

    nn_count = jnp.sum(valid, axis=-1).astype(jnp.int32)
    d2 = jnp.where(valid, d2, BIG_DIST2)

    neg_top, arg = jax.lax.top_k(-d2, nn_k)               # [N, k]
    dist2_k = -neg_top
    idx_k = jnp.take_along_axis(idx_c, arg, axis=1)
    valid_k = jnp.take_along_axis(valid, arg, axis=1)
    idx_k = jnp.where(valid_k, idx_k, C)

    return QueryNeighbors(
        idx=idx_k.astype(jnp.int32), dist2=dist2_k, valid=valid_k,
        nn_count=nn_count,
    )


def query_neighbors_join(
    state: MapState,
    qpts: jnp.ndarray,          # [N, 3] absolute world frame
    lset,                       # ops.knn_join.LocalSet (local-map filtered)
    *,
    nn_k: int,
    max_dist2: float,
    resolution: float,
    local_ids: bool = True,
    qperm=None,   # [N(padded)] precomputed query-sort permutation
) -> QueryNeighbors:
    """Neighbor search via the tiled spatial-join kernel over a prebuilt
    LocalSet (ops/knn_join.py). The local-map time/radius filters are baked
    into the set at build time, so no per-candidate filtering happens here.
    Exact radius-kNN: equal or more complete than the hash-ball probe.

    With local_ids=True (the default contract for lset consumers) the
    returned indices are LOCAL rows of the set (dump = lset.cap), so all
    downstream gathers/scatters touch compact [L]-sized arrays."""
    from pin_slam_tpu.ops import knn_join as kj

    n = qpts.shape[0]
    q = jax.lax.stop_gradient(qpts)
    npad = (-n) % kj.TQ
    if npad:
        q = jnp.concatenate(
            [q, jnp.full((npad, 3), kj.PAD, q.dtype)], axis=0)
    li, d2, cnt = kj.knn_join(q, lset.pts[:-1], k=nn_k, max_dist2=max_dist2,
                              resolution=resolution, qperm=qperm)
    li, d2, cnt = li[:n], d2[:n], cnt[:n]
    valid = li >= 0
    if local_ids:
        idx = jnp.where(valid, li, lset.cap)
    else:
        idx = jnp.where(valid, lset.gidx[jnp.clip(li, 0, None)],
                        state.capacity)
    return QueryNeighbors(idx=idx.astype(jnp.int32), dist2=d2, valid=valid,
                          nn_count=cnt)


def local_map_mask(
    state: MapState,
    travel_dist: jnp.ndarray,        # [maxT] f32
    cur_ts,
    local_window_dist: float,
    *,
    by_travel_dist: bool = True,
    time_window: int = 100,
    sensor_pos: Optional[jnp.ndarray] = None,
    local_map_radius: float = 0.0,
    reboot_ts=0,
    use_mid_ts: bool = False,
) -> jnp.ndarray:
    """Row-level [C] mask of the conceptual local map — the same travel-dist
    window / time window / radius criteria the query path applies per
    neighbor (see `query_neighbors`; reference materializes this set in
    model/neural_points.py:424-513 `reset_local_map`). Used where an explicit
    point set is needed (loop-closure map context descriptors)."""
    C = state.capacity
    rows = jnp.arange(C)
    alive = rows < state.count
    tsc = state.ts_create[:C]
    if use_mid_ts:
        tsc = (tsc + state.ts_update[:C]) // 2
    if by_travel_dist:
        ts_lo = _travel_window_ts_lo(travel_dist, cur_ts,
                                     local_window_dist)
        m = alive & (tsc >= ts_lo)
    else:
        m = alive & (jnp.abs(cur_ts - tsc) < time_window)
    m = m & (tsc >= reboot_ts)
    if sensor_pos is not None and local_map_radius > 0.0:
        d2 = jnp.sum((state.positions[:C] - sensor_pos[None, :]) ** 2,
                     axis=-1)
        m = m & (d2 < local_map_radius * local_map_radius)
    return m


def idw_weights(qn: QueryNeighbors, eps: float = 1e-15,
                idw_index: int = 2) -> jnp.ndarray:
    """Normalized inverse-distance weights [N, k] with exponent `idw_index`
    (2 = inverse distance squared, the reference's hardcoded choice); rows
    without any valid neighbor get all-zero weights
    (reference: model/neural_points.py:665-683, exponent knob
    utils/config.py:99)."""
    if idw_index == 2:
        w = 1.0 / (qn.dist2 + eps)
    elif idw_index % 2 == 0:
        w = 1.0 / (qn.dist2 ** (idw_index // 2) + eps)
    else:
        w = 1.0 / (jnp.sqrt(jnp.maximum(qn.dist2, 0.0)) ** idw_index + eps)
    w = jnp.where(qn.valid, w, 0.0)
    return w / (jnp.sum(w, axis=1, keepdims=True) + eps)


def gather_feature_vectors(
    state: MapState,
    qn: QueryNeighbors,
    qpts: jnp.ndarray,
    *,
    color: bool = False,
    rotate_by_orientation: bool = False,  # after PGO (reference :645-648)
):
    """Gather per-neighbor features and geometric offset vectors.

    Returns ([N, k, F+3] geo vectors, [N, k, F+3] color vectors or None).
    The offset is (query - neighbor position), optionally rotated into the
    neighbor's frame after map deformation (reference :633-654).
    """
    feats = state.geo_features[qn.idx]                    # [N, k, F]
    vec = qpts[:, None, :] - state.positions[qn.idx]      # [N, k, 3]
    if rotate_by_orientation:
        quat = state.orientations[qn.idx]
        vec = quat_rotate(quat, vec)
    vec = jnp.where(qn.valid[..., None], vec, 0.0)
    geo_vec = jnp.concatenate([feats, vec], axis=-1)
    color_vec = None
    if color and state.color_features is not None:
        cfeats = state.color_features[qn.idx]
        color_vec = jnp.concatenate([cfeats, vec], axis=-1)
    return geo_vec, color_vec


def queried_certainty(state: MapState, qn: QueryNeighbors, w: jnp.ndarray):
    """IDW-interpolated certainty at the queries (reference :713-718)."""
    cert = jnp.where(qn.valid, state.certainty[qn.idx], 0.0)
    return jnp.sum(cert * w, axis=1)


def accumulate_certainty(
    state: MapState, qn: QueryNeighbors, w: jnp.ndarray, query_ts=None
) -> MapState:
    """Training-mode side effect: add the IDW weights into the neighbors'
    certainty and bump their last-update timestamps
    (reference: model/neural_points.py:688-705)."""
    C = state.capacity
    idx = jnp.where(qn.valid, qn.idx, C).reshape(-1)
    cert = state.certainty.at[idx].add(jnp.where(qn.valid, w, 0.0).reshape(-1))
    cert = cert.at[C].set(0.0)
    ts_update = state.ts_update
    if query_ts is not None:
        ts_b = jnp.broadcast_to(query_ts[:, None], qn.idx.shape).reshape(-1)
        ts_update = ts_update.at[idx].max(
            jnp.where(qn.valid.reshape(-1), ts_b, 0))
        ts_update = ts_update.at[C].set(0)
    return state.replace(certainty=cert, ts_update=ts_update)


# ---------------------------------------------------------------------------
# map maintenance
# ---------------------------------------------------------------------------


def _compact(state: MapState, keep: jnp.ndarray) -> MapState:
    """Pack `keep`-selected rows to the front; rows keep relative order.
    `keep` is [C+1]; the dump row is never kept."""
    C = state.capacity
    keep = keep[:-1]
    order = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest = jnp.where(keep, order, C).astype(jnp.int32)

    new_state = state.replace(
        positions=jnp.zeros_like(state.positions).at[dest].set(
            state.positions[:-1]),
        orientations=jnp.zeros_like(state.orientations)
        .at[:, 0].set(1.0).at[dest].set(state.orientations[:-1]),
        geo_features=jnp.zeros_like(state.geo_features).at[dest].set(
            state.geo_features[:-1]),
        color_features=None if state.color_features is None else
        jnp.zeros_like(state.color_features).at[dest].set(
            state.color_features[:-1]),
        ts_create=jnp.zeros_like(state.ts_create).at[dest].set(
            state.ts_create[:-1]),
        ts_update=jnp.zeros_like(state.ts_update).at[dest].set(
            state.ts_update[:-1]),
        certainty=jnp.zeros_like(state.certainty).at[dest].set(
            state.certainty[:-1]),
        count=jnp.sum(keep.astype(jnp.int32)),
    )
    return new_state


def prune_map(
    state: MapState,
    cur_ts,
    travel_dist: jnp.ndarray,
    *,
    prune_certainty_thre: float,
    local_window_dist: float,
    global_prune: bool = False,
) -> tuple[MapState, jnp.ndarray]:
    """Drop inactive low-certainty points (reference: neural_points.py:748-789).
    Caller must rehash afterwards. Returns (state, prune_count)."""
    C = state.capacity
    row_valid = jnp.arange(C + 1) < state.count
    low_cert = state.certainty < prune_certainty_thre
    if global_prune:
        prune = low_cert
    else:
        t = jnp.arange(travel_dist.shape[0])
        ts_lo = jnp.sum(((travel_dist < travel_dist[cur_ts]
                          - local_window_dist) & (t <= cur_ts))
                        .astype(jnp.int32))
        prune = low_cert & (state.ts_update < ts_lo)
    prune = prune & row_valid
    keep = row_valid & ~prune
    return _compact(state, keep), jnp.sum(prune.astype(jnp.int32))


def rehash(
    state: MapState,
    cur_ts,
    *,
    resolution: float,
    use_mid_ts: bool,
    merge: bool = False,
) -> MapState:
    """Rebuild the hash table, preferring per voxel the point whose timestamp
    is closest to `cur_ts` (reference: recreate_hash,
    model/neural_points.py:819-908). With merge=True, duplicate points in the
    same voxel are dropped entirely."""
    C = state.capacity
    row_valid = jnp.arange(C + 1) < state.count
    ts_used = (
        ((state.ts_create + state.ts_update) // 2) if use_mid_ts
        else state.ts_create
    )
    ts_diff = jnp.abs(ts_used - cur_ts).astype(jnp.float32)
    winner = voxel_down_sample_min_value_mask(
        state.positions, row_valid, resolution, ts_diff
    )
    if merge:
        state = _compact(state, winner & row_valid)
        row_valid = jnp.arange(C + 1) < state.count
        winner = row_valid

    B = state.table_size
    grid = hash3d.grid_coords(state.positions, resolution)
    h = hash3d.hash_grid(grid, B)
    h = jnp.where(winner & row_valid, h, B)
    table = jnp.full_like(state.table, -1)
    table = table.at[h].set(jnp.arange(C + 1, dtype=jnp.int32))
    table = table.at[B].set(-1)
    return rebuild_probe_cache(state.replace(table=table), resolution)


def deform_map(
    state: MapState,
    pose_diff: jnp.ndarray,  # [T, 4, 4] f32 per-frame correction transforms
    *,
    use_mid_ts: bool,
) -> MapState:
    """Elastic PGO deformation: move each neural point by the pose correction
    of its (mid-)timestamp (reference: adjust_map,
    model/neural_points.py:791-817). Caller must rehash afterwards and set
    the after-PGO query flag."""
    T = pose_diff.shape[0]
    ts = (
        ((state.ts_create + state.ts_update) // 2) if use_mid_ts
        else state.ts_create
    )
    ts = jnp.clip(ts, 0, T - 1)
    positions = transform_points_by_ts(state.positions, ts, pose_diff)
    dq = rotmat_to_quat(pose_diff[:, :3, :3])
    # component-wise gathers: [C,4] gathers pad the 4-lane trailing dim to
    # a full 128-lane tile on TPU (see transform_points_by_ts)
    dq_pp = jnp.stack([dq[:, i][ts] for i in range(4)], axis=-1)
    orientations = quat_multiply(dq_pp, state.orientations)
    return state.replace(positions=positions, orientations=orientations)


def grow_capacity(state: MapState, new_capacity: int) -> MapState:
    """Host-side capacity growth (reallocate + copy); triggers recompiles of
    consumers, used rarely when `count` nears capacity."""
    old_c = state.capacity
    pad = new_capacity - old_c

    def grow(arr, fill=0.0):
        tail = jnp.full((pad,) + arr.shape[1:], fill, arr.dtype)
        return jnp.concatenate([arr[:-1], tail, arr[-1:]], axis=0)

    return state.replace(
        positions=grow(state.positions),
        orientations=grow(state.orientations),
        geo_features=grow(state.geo_features),
        color_features=None if state.color_features is None
        else grow(state.color_features),
        ts_create=grow(state.ts_create, 0),
        ts_update=grow(state.ts_update, 0),
        certainty=grow(state.certainty),
    )
