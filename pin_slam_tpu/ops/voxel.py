"""Deterministic, static-shape voxel downsampling.

The reference implements GPU voxel downsampling with a nondeterministic CUDA
`scatter_reduce_(amin)` trick (reference: utils/tools.py:583-668). Here we use
a single multi-key `lax.sort` pass (grid coords, distance-to-center, index),
which is deterministic, mask-friendly, and maps well onto the TPU sort unit.

All functions take and return fixed-shape arrays with validity masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_GRID_SENTINEL = jnp.int32(2**30)


def _first_of_run(gx, gy, gz):
    diff = (gx[1:] != gx[:-1]) | (gy[1:] != gy[:-1]) | (gz[1:] != gz[:-1])
    return jnp.concatenate([jnp.ones((1,), dtype=bool), diff])


def voxel_down_sample_mask(
    points: jnp.ndarray, mask: jnp.ndarray, voxel_size: float
) -> jnp.ndarray:
    """Keep, per occupied voxel, the valid point closest to the voxel center.

    Args:
        points: [N, 3] float array (padded entries allowed).
        mask:   [N] bool validity mask.
        voxel_size: grid resolution in meters.
    Returns:
        keep: [N] bool mask selecting at most one point per voxel
        (semantics of reference utils/tools.py:583-626, deterministic).
    """
    n = points.shape[0]
    grid = jnp.floor(points / voxel_size).astype(jnp.int32)
    grid = jnp.where(mask[:, None], grid, _GRID_SENTINEL)
    center = (grid.astype(points.dtype) + 0.5) * voxel_size
    dist2 = jnp.sum((points - center) ** 2, axis=-1)
    dist2 = jnp.where(mask, dist2, jnp.float32(jnp.inf))
    idx = jnp.arange(n, dtype=jnp.int32)
    sgx, sgy, sgz, _, sidx = jax.lax.sort(
        (grid[:, 0], grid[:, 1], grid[:, 2], dist2, idx), num_keys=5
    )
    keep_sorted = _first_of_run(sgx, sgy, sgz) & (sgx != _GRID_SENTINEL)
    return jnp.zeros(n, dtype=bool).at[sidx].set(keep_sorted)


def voxel_down_sample_min_value_mask(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    voxel_size: float,
    value: jnp.ndarray,
) -> jnp.ndarray:
    """Keep, per occupied voxel, the valid point with the smallest `value`
    (ties broken by index). Semantics of reference utils/tools.py:629-668.
    """
    n = points.shape[0]
    grid = jnp.floor(points / voxel_size).astype(jnp.int32)
    grid = jnp.where(mask[:, None], grid, _GRID_SENTINEL)
    value = jnp.where(mask, value, jnp.float32(jnp.inf))
    idx = jnp.arange(n, dtype=jnp.int32)
    sgx, sgy, sgz, _, sidx = jax.lax.sort(
        (grid[:, 0], grid[:, 1], grid[:, 2], value.astype(jnp.float32), idx),
        num_keys=5,
    )
    keep_sorted = _first_of_run(sgx, sgy, sgz) & (sgx != _GRID_SENTINEL)
    return jnp.zeros(n, dtype=bool).at[sidx].set(keep_sorted)


def voxel_down_sample_hash_mask(
    points: jnp.ndarray, mask: jnp.ndarray, voxel_size: float,
    table_size: int,
) -> jnp.ndarray:
    """Fast voxel dedup: keep one valid point per occupied voxel, selected by
    scatter order (last writer wins), via a hash-slot scratch buffer instead
    of a multi-key sort.

    ~20x cheaper than the sort-based `voxel_down_sample_mask` on TPU for
    large clouds; the trade-offs are (a) hash collisions merge distinct
    voxels (~1e-4 at sane loads) and (b) the surviving point within a voxel
    is scatter-order- rather than distance-selected — the reference's CUDA
    scatter_reduce has the same nondeterministic-winner semantics
    (reference: utils/tools.py:621-623). table_size must be a power of two.
    """
    from pin_slam_tpu.ops import hash3d

    m = points.shape[0]
    h = hash3d.hash_grid(hash3d.grid_coords(points, voxel_size), table_size)
    h = jnp.where(mask, h, table_size)
    rows = jnp.arange(m, dtype=jnp.int32)
    buf = jnp.full((table_size + 1,), -1, jnp.int32).at[h].set(rows)
    return (buf[h] == rows) & mask


def compact_mask(mask: jnp.ndarray, cap: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compute destination slots packing `mask`-selected rows to the front.

    Returns (dest [N] int32 with `cap` for dropped rows, count scalar int32).
    Rows beyond `cap` selected entries are dropped (capacity discipline).
    """
    order = jnp.cumsum(mask.astype(jnp.int32)) - 1
    keep = mask & (order < cap)
    dest = jnp.where(keep, order, cap)
    return dest.astype(jnp.int32), jnp.sum(keep.astype(jnp.int32))
