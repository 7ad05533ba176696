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

# Perf note (measured on v5e): inside the fused query pipeline the three
# u32 multiplies cost ~0.5 ms for 540k hashes, while a lookup-table variant
# (TAB[i] = i*P mod 2^32) costs ~14 ms — the small-table gathers break XLA
# fusion and force materialization. Keep the straight multiply form.


def grid_coords(points: jnp.ndarray, resolution: float) -> jnp.ndarray:
    """[..., 3] float -> [..., 3] int32 voxel coordinates."""
    return jnp.floor(points / resolution).astype(jnp.int32)


def hash_grid(grid: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """[..., 3] int32 grid coords -> [...] int32 slot in [0, table_size).

    table_size must be a power of two.
    """
    u = grid.astype(jnp.uint32)
    h = u[..., 0] * P1 + u[..., 1] * P2 + u[..., 2] * P3
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
