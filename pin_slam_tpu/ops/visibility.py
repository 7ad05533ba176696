"""Multi-viewpoint map-visibility test for dynamic-measurement filtering.

The reference's map-based dynamic filter (utils/mapper.py:99-137) flags a
measurement as dynamic when the map decodes CONFIDENT positive SDF at its
location. That only works near mapped surfaces: a mover crossing open space
has no neural points within query radius, so its certainty is 0 and the
filter keeps it. This module adds the complementary, visibility-based test
(the Removert/ERASOR family, adapted to run online on TPU): render the
neural-point map as a min-range spherical image from a few HISTORICAL
sensor origins; a measurement that, seen from one of those origins, lies
well inside the origin's observable range AND clearly in front of every
mapped surface in its direction bin sits in space that past scans saw
through — previously-free space, so the measurement is dynamic.

Safety properties (every quantization bias points toward "static"):
  * scatter-MIN per bin + 3x3 min-dilation: the rendered range is a lower
    bound of the true surface range in the bin neighborhood, so "in front
    of the render" understates "in front of the surface";
  * empty bins render +inf = UNJUDGEABLE (frontier geometry is kept);
  * range and elevation-FOV gates: a location a historic origin could not
    have observed (beyond range, outside the scan's elevation band) is
    never judged from that origin;
  * historical (not current) origins: geometry revealed for the first time
    this frame (rounding an occluder) was occluded from the historic
    viewpoints — it renders BEHIND the occluder's range and is kept.

All ops are scatter-min + elementwise gathers: ~1 ms per origin at a 1M
point map on one v5e. Everything static-shape, vmapped over origins.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = jnp.float32(3.0e38)


def _spherical_bins(d: jnp.ndarray, r: jnp.ndarray, n_az: int, n_el: int,
                    el_lo, el_hi):
    """World-frame direction bins around an origin. Returns (bin ids [N],
    in-FOV mask [N]). `d` = points - origin, `r` = |d|."""
    safe_r = jnp.maximum(r, 1e-6)
    az = jnp.arctan2(d[:, 1], d[:, 0])
    el = jnp.arcsin(jnp.clip(d[:, 2] / safe_r, -1.0, 1.0))
    in_fov = (el >= el_lo) & (el <= el_hi)
    ia = jnp.clip(((az + jnp.pi) / (2.0 * jnp.pi) * n_az).astype(jnp.int32),
                  0, n_az - 1)
    span = jnp.maximum(el_hi - el_lo, 1e-4)
    ie = jnp.clip(((el - el_lo) / span * n_el).astype(jnp.int32),
                  0, n_el - 1)
    return ie * n_az + ia, in_fov


def render_min_range_bins(
    origins: jnp.ndarray,     # [H, 3] world-frame sensor origins
    pts: jnp.ndarray,         # [M, 3] map (neural point) positions, world
    pt_valid: jnp.ndarray,    # [M] bool — active + certainty-gated rows
    *,
    n_az: int = 512,
    n_el: int = 64,
    el_lo: jnp.ndarray | float = -0.7,
    el_hi: jnp.ndarray | float = 0.7,
) -> jnp.ndarray:
    """Min range per direction bin per origin, 3x3 min-dilated.
    Returns [H, n_el, n_az] f32, _BIG where no map point projects."""

    def one(o):
        d = pts - o
        r = jnp.linalg.norm(d, axis=1)
        bins, in_fov = _spherical_bins(d, r, n_az, n_el, el_lo, el_hi)
        ok = pt_valid & in_fov & (r > 1e-3)
        img = jnp.full((n_el * n_az + 1,), _BIG, jnp.float32)
        img = img.at[jnp.where(ok, bins, n_el * n_az)].min(
            jnp.where(ok, r, _BIG).astype(jnp.float32))
        img = img[:-1].reshape(n_el, n_az)
        # 3x3 min-dilation: azimuth wraps, elevation clamps — a query
        # compares against the nearest surface in its bin NEIGHBORHOOD,
        # so bin-edge effects can only make the test more conservative
        img = jnp.minimum(img, jnp.minimum(jnp.roll(img, 1, 1),
                                           jnp.roll(img, -1, 1)))
        up = jnp.minimum(jnp.arange(n_el) + 1, n_el - 1)
        dn = jnp.maximum(jnp.arange(n_el) - 1, 0)
        img = jnp.minimum(img, jnp.minimum(img[up], img[dn]))
        return img

    return jax.vmap(one)(origins)


def visibility_free_mask(
    origins: jnp.ndarray,      # [H, 3]
    range_img: jnp.ndarray,    # [H, n_el, n_az] from render_min_range_bins
    q: jnp.ndarray,            # [N, 3] world-frame measurements
    q_mask: jnp.ndarray,       # [N] rows to judge
    *,
    margin_m: float = 0.4,
    rel_margin: float = 0.05,
    min_judge_range: float = 1.0,
    max_judge_range: float = 22.0,
    el_lo: jnp.ndarray | float = -0.7,
    el_hi: jnp.ndarray | float = 0.7,
    el_slack: float = 0.035,
    min_votes: int = 2,
) -> jnp.ndarray:
    """[N] bool — True where at least `min_votes` origins judge the
    measurement seen-through (free) ⇒ dynamic. Unjudgeable rows never
    vote, so they stay static. The vote suppresses single-viewpoint
    artifacts (grazing surfaces whose bin range varies faster than the
    map's voxel sampling can cover)."""
    H, n_el, n_az = range_img.shape

    def one(o, img):
        d = q - o
        r = jnp.linalg.norm(d, axis=1)
        bins, _ = _spherical_bins(d, r, n_az, n_el, el_lo, el_hi)
        safe_r = jnp.maximum(r, 1e-6)
        el = jnp.arcsin(jnp.clip(d[:, 2] / safe_r, -1.0, 1.0))
        rmap = img.reshape(-1)[bins]
        margin = jnp.maximum(margin_m, rel_margin * r)
        return (q_mask
                & (r > min_judge_range) & (r < max_judge_range)
                & (el > el_lo + el_slack) & (el < el_hi - el_slack)
                & (rmap < _BIG)
                & (r < rmap - margin))

    free = jax.vmap(one)(origins, range_img)   # [H, N]
    return jnp.sum(free, axis=0) >= min(min_votes, H)
