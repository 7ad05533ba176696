"""Range-image scan normals + incidence cosine.

Support for the incidence-weighted projective-SDF label correction (this
repo's replacement for the reference's abandoned `proj_correction_on`,
reference utils/mapper.py:695-697 + utils/config.py:167 "[not used] does
not work well"): the reference scaled labels by |cos(grad, ray)| using the
LEARNED SDF gradient, which destabilizes early training while the gradient
is still noise. Here the incidence angle comes from GEOMETRIC scan-local
normals — a spherical range image built from the scan itself — so the
correction is exact from frame 0 and independent of training state.

All ops are scatter-min + elementwise (no sorts, no kNN): ~2 ms at 128k
points on one v5e.
"""

from __future__ import annotations

import jax.numpy as jnp


def estimate_scan_incidence(
    points: jnp.ndarray,       # [N, 3] sensor-frame points
    mask: jnp.ndarray,         # [N] valid rows
    *,
    n_az: int = 512,
    n_el: int = 64,
    range_gate_m: float = 0.5,
    cos_floor: float = 0.1,
) -> jnp.ndarray:
    """Per-point |cos| of the angle between the ray and the local surface
    normal, in [cos_floor, 1].

    1. bin the scan into an az x el spherical grid keeping the MIN range
       per bin (nearest surface wins at occlusion edges),
    2. reconstruct a representative point per bin from the bin-center
       direction x min range,
    3. normals from the cross product of the azimuth (wrapping) and
       elevation (clamped) central differences,
    4. each point reads its bin's normal; points farther than
       range_gate_m from the bin's surface PLANE (occlusion edges — a
       plane test, not a raw range test, so steep/grazing surfaces whose
       range varies fast within a bin are kept) or whose bin
       neighborhood is incomplete fall back to cos=1 (no correction —
       the conservative, pre-fix behavior).
    """
    N = points.shape[0]
    r = jnp.linalg.norm(points, axis=1)
    safe_r = jnp.maximum(r, 1e-6)
    valid = mask & (r > 1e-6)

    az = jnp.arctan2(points[:, 1], points[:, 0])          # [-pi, pi]
    el = jnp.arcsin(jnp.clip(points[:, 2] / safe_r, -1.0, 1.0))
    big = jnp.float32(1e9)
    el_lo = jnp.min(jnp.where(valid, el, big))
    el_hi = jnp.max(jnp.where(valid, el, -big))
    el_span = jnp.maximum(el_hi - el_lo, 1e-4)

    ia = jnp.clip(((az + jnp.pi) / (2.0 * jnp.pi) * n_az).astype(jnp.int32),
                  0, n_az - 1)
    ie = jnp.clip(((el - el_lo) / el_span * n_el).astype(jnp.int32),
                  0, n_el - 1)
    bins = ie * n_az + ia

    grid_r = jnp.full((n_el * n_az + 1,), big, jnp.float32)
    grid_r = grid_r.at[jnp.where(valid, bins, n_el * n_az)].min(
        jnp.where(valid, r, big).astype(jnp.float32))
    grid_r = grid_r[:-1].reshape(n_el, n_az)
    # inpaint isolated holes (beam dropouts, az-binning collisions) from
    # the azimuth neighbors, else the neighbor differences below would
    # knock out a 3-bin-wide stripe per hole
    r_l, r_rt = jnp.roll(grid_r, 1, 1), jnp.roll(grid_r, -1, 1)
    ok_l, ok_rt = r_l < big, r_rt < big
    fill = jnp.where(ok_l & ok_rt, 0.5 * (r_l + r_rt),
                     jnp.where(ok_l, r_l, r_rt))
    hole = ~(grid_r < big) & (ok_l | ok_rt)
    grid_r = jnp.where(hole, fill, grid_r)

    # bin-center directions
    az_c = (jnp.arange(n_az) + 0.5) / n_az * 2.0 * jnp.pi - jnp.pi
    el_c = el_lo + (jnp.arange(n_el) + 0.5) / n_el * el_span
    ce, se = jnp.cos(el_c), jnp.sin(el_c)
    ca, sa = jnp.cos(az_c), jnp.sin(az_c)
    dirs = jnp.stack([ce[:, None] * ca[None, :],
                      ce[:, None] * sa[None, :],
                      jnp.broadcast_to(se[:, None], (n_el, n_az))], -1)
    grid_ok = grid_r < big
    pgrid = dirs * jnp.where(grid_ok, grid_r, 0.0)[..., None]

    # central differences: azimuth wraps, elevation clamps to the edge
    p_a1 = jnp.roll(pgrid, -1, axis=1)
    p_a0 = jnp.roll(pgrid, 1, axis=1)
    ok_a = jnp.roll(grid_ok, -1, axis=1) & jnp.roll(grid_ok, 1, axis=1)
    idx_up = jnp.minimum(jnp.arange(n_el) + 1, n_el - 1)
    idx_dn = jnp.maximum(jnp.arange(n_el) - 1, 0)
    p_e1, p_e0 = pgrid[idx_up], pgrid[idx_dn]
    ok_e = grid_ok[idx_up] & grid_ok[idx_dn]

    nrm = jnp.cross(p_a1 - p_a0, p_e1 - p_e0)
    nlen = jnp.linalg.norm(nrm, axis=-1)
    n_ok = grid_ok & ok_a & ok_e & (nlen > 1e-9)
    nrm = nrm / jnp.maximum(nlen, 1e-9)[..., None]

    # per-point cosine vs its bin normal
    bin_n = nrm.reshape(-1, 3)[bins]
    bin_ok = n_ok.reshape(-1)[bins]
    bin_p = pgrid.reshape(-1, 3)[bins]
    cos = jnp.abs(jnp.sum(bin_n * (points / safe_r[:, None]), axis=-1))
    # same-surface test: distance to the bin's tangent plane (robust at
    # grazing incidence, where range varies > gate within one bin)
    d_plane = jnp.abs(jnp.sum((points - bin_p) * bin_n, axis=-1))
    use = valid & bin_ok & (d_plane <= range_gate_m)
    cos = jnp.where(use, jnp.maximum(cos, cos_floor), 1.0)
    return cos.astype(jnp.float32)
