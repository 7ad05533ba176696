"""Per-ray training-sample generation.

Rebuilds the reference `DataSampler.sample` (reference: utils/data_sampler.py:18-260):
for each measured endpoint produce
  1 exact endpoint + `surface_sample_n` Gaussian close-to-surface samples
  + `free_front_n` uniform free-space samples in front
  + `free_behind_n` uniform samples behind the surface,
with projective-SDF labels (sign-flipped so front-of-surface is positive,
reference :220), distance-based weights whose *sign* encodes
surface (+) vs freespace (-) (reference :168), emitted in ray-major order
(reference :211-242 reorders; we generate [N, A] directly).

Static shapes: input [N,3]+mask, output [N*A] arrays + mask.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class Samples(NamedTuple):
    points: jnp.ndarray      # [N*A, 3] sample coords (sensor/local frame)
    sdf_label: jnp.ndarray   # [N*A] projective SDF labels (m)
    weight: jnp.ndarray      # [N*A] signed weights (sign: surface/freespace)
    mask: jnp.ndarray        # [N*A] validity
    sem_label: Optional[jnp.ndarray]   # [N*A] i32 or None
    color_label: Optional[jnp.ndarray]  # [N*A, Cc] or None


def sample_training_points(
    key: jax.Array,
    points: jnp.ndarray,          # [N, 3] in sensor frame
    mask: jnp.ndarray,            # [N]
    *,
    surface_sample_range_m: float,
    surface_sample_n: int,
    free_front_n: int,
    free_behind_n: int,
    free_sample_begin_ratio: float,
    free_sample_end_dist_m: float,
    max_range: float,
    dist_weight_on: bool,
    dist_weight_scale: float,
    behind_dropoff_on: bool = False,
    sem_labels: Optional[jnp.ndarray] = None,    # [N] i32
    colors: Optional[jnp.ndarray] = None,        # [N, Cc]
    cos_inc: Optional[jnp.ndarray] = None,       # [N] |cos(incidence)|
    incidence_mode: str = "label",
) -> Samples:
    n = points.shape[0]
    s_n, f_n, b_n = surface_sample_n, free_front_n, free_behind_n
    a = 1 + s_n + f_n + b_n
    sigma_ratio = 2.0

    dist = jnp.linalg.norm(points, axis=1)                    # [N]
    safe_dist = jnp.maximum(dist, 1e-6)

    k_surf, k_front, k_behind = jax.random.split(key, 3)

    # close-to-surface Gaussian displacements (reference :48-58)
    surf_disp = (
        jax.random.normal(k_surf, (n, s_n)) * surface_sample_range_m
    )
    surf_ratio = surf_disp / safe_dist[:, None] + 1.0

    # free space in front (reference :67-88)
    front_max_ratio = 1.0 - sigma_ratio * surface_sample_range_m / safe_dist
    front_u = jax.random.uniform(k_front, (n, f_n))
    front_ratio = (
        front_u * (front_max_ratio - free_sample_begin_ratio)[:, None]
        + free_sample_begin_ratio
    )
    front_disp = (front_ratio - 1.0) * safe_dist[:, None]

    # free space behind (reference :90-110)
    behind_min_ratio = 1.0 + sigma_ratio * surface_sample_range_m / safe_dist
    behind_max_ratio = free_sample_end_dist_m / safe_dist + 1.0
    behind_u = jax.random.uniform(k_behind, (n, b_n))
    behind_ratio = (
        behind_u * (behind_max_ratio - behind_min_ratio)[:, None]
        + behind_min_ratio[:, None]
    )
    behind_disp = (behind_ratio - 1.0) * safe_dist[:, None]

    ratio = jnp.concatenate(
        [jnp.ones((n, 1)), surf_ratio, front_ratio, behind_ratio], axis=1
    )                                                        # [N, A]
    disp = jnp.concatenate(
        [jnp.zeros((n, 1)), surf_disp, front_disp, behind_disp], axis=1
    )                                                        # [N, A]

    sample_pts = points[:, None, :] * ratio[..., None]       # [N, A, 3]

    # weights (reference :141-168)
    weight = jnp.ones((n, a))
    if dist_weight_on:
        dist_w = (
            1.0 + dist_weight_scale * 0.5
            - (dist / max_range) * dist_weight_scale
        )                                                    # [0.6, 1.4]
        weight = weight.at[:, : 1 + s_n].mul(dist_w[:, None])
    if behind_dropoff_on:
        dropoff_min = 0.2 * free_sample_end_dist_m
        dropoff_max = free_sample_end_dist_m
        dw = (dropoff_max - disp) / (dropoff_max - dropoff_min)
        dw = jnp.clip(dw, 0.0, 1.0) * 0.8 + 0.2
        weight = weight * dw
    # freespace flag: negative weight (reference :168)
    weight = weight.at[:, 1 + s_n:].mul(-1.0)

    sdf_label = -disp                                        # (reference :220)
    if cos_inc is not None and incidence_mode == "weight":
        # keep the projective labels, scale the free columns' LOSS WEIGHT
        # by |cos| instead: the grazing rays' biased free labels (truly
        # only d*cos above the surface) lose pull without ever teaching
        # sdf ~ 0 in free space (the label-mode failure on floor-
        # dominated scenes: free labels -> 0 at grazing run the tracker
        # away upward). The negative sign marking free columns is kept.
        wscale = jnp.ones((n, a))
        wscale = wscale.at[:, 1 + s_n:].set(
            jnp.broadcast_to(cos_inc[:, None], (n, f_n + b_n)))
        weight = weight * wscale
    elif cos_inc is not None:
        # incidence-weighted projective labels, FREE-SPACE columns only.
        # Mechanism of the "floor learned ~0.5 m low" long-range bias: a
        # free-space sample at along-ray offset d from a surface hit at
        # grazing incidence theta is truly only d*cos(theta) above the
        # surface — a ray skimming the floor labels points centimetres
        # above it as "confidently free" (label >> sigma), and the BCE
        # pushes the zero crossing DOWN. Scaling the free labels by the
        # GEOMETRIC |cos| (ops/range_image.py; the reference's abandoned
        # learned-gradient proj_correction, utils/mapper.py:695, was
        # unstable because early SDF gradients are noise) restores the
        # true distance-to-plane and removes the bias.
        # The SURFACE band is deliberately NOT scaled: its +-disp labels
        # are symmetric about the endpoint, so its zero crossing is
        # unbiased either way — and scaling it just compresses the
        # learned function's gradient along the ray by cos, which weakens
        # exactly the grazing-geometry (floor) constraints the tracker
        # needs for z/pitch/roll (measured: drift 7.4 -> 11.5 % with the
        # band scaled; the opposite split keeps the floor fix AND the
        # tracking strength).
        scale = jnp.ones((n, a))
        scale = scale.at[:, 1 + s_n:].set(
            jnp.broadcast_to(cos_inc[:, None], (n, f_n + b_n)))
        sdf_label = sdf_label * scale

    sem_out = None
    if sem_labels is not None:
        sem = jnp.zeros((n, a), jnp.int32)
        sem = sem.at[:, : 1 + s_n].set(sem_labels[:, None].astype(jnp.int32))
        sem_out = sem.reshape(-1)
    color_out = None
    if colors is not None:
        cc = colors.shape[1]
        col = jnp.zeros((n, a, cc), colors.dtype)
        col = col.at[:, : 1 + s_n, :].set(colors[:, None, :])
        color_out = col.reshape(-1, cc)

    mask_out = jnp.broadcast_to(mask[:, None], (n, a)).reshape(-1)
    return Samples(
        points=sample_pts.reshape(-1, 3),
        sdf_label=sdf_label.reshape(-1),
        weight=weight.reshape(-1),
        mask=mask_out,
        sem_label=sem_out,
        color_label=color_out,
    )
