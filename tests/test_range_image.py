"""Tests for ops/range_image.py — geometric scan incidence.

The incidence-weighted projective-label correction (this repo's stable
replacement for the reference's abandoned proj_correction_on, reference
utils/mapper.py:695) relies on |cos(ray, normal)| estimated from a
spherical range image. Analytic scenes make the expected cosine exact:
a floor plane at height -h gives cos = h/r; a sensor-centred sphere is
always perpendicular (cos = 1).
"""

import jax.numpy as jnp
import numpy as np

from pin_slam_tpu.ops.range_image import estimate_scan_incidence


def _lidar_floor(h=1.5, n_az=256, rings=24):
    """Full-sweep scan of an infinite floor at z=-h from the origin."""
    az = np.linspace(-np.pi, np.pi, n_az, endpoint=False)
    el = np.linspace(np.radians(-70.0), np.radians(-12.0), rings)
    aa, ee = np.meshgrid(az, el)
    r = h / np.sin(-ee)                     # range to the floor along the ray
    pts = np.stack([r * np.cos(ee) * np.cos(aa),
                    r * np.cos(ee) * np.sin(aa),
                    -h * np.ones_like(aa)], -1).reshape(-1, 3)
    return pts.astype(np.float32)


def test_floor_incidence_matches_h_over_r():
    h = 1.5
    pts = _lidar_floor(h=h, rings=48)
    r = np.linalg.norm(pts, axis=1)
    mask = jnp.ones(pts.shape[0], bool)
    # n_el must not exceed the scan's ring count (else rows are empty and
    # those bins conservatively fall back to cos=1)
    cos = np.asarray(estimate_scan_incidence(
        jnp.asarray(pts), mask, n_az=256, n_el=24, cos_floor=0.02))
    expected = h / r
    # interior bins (away from the elevation edges) must match analytically
    sel = (expected > 0.25) & (expected < 0.9)
    assert sel.sum() > 1000
    err = np.abs(cos[sel] - expected[sel])
    assert np.median(err) < 0.02, float(np.median(err))
    assert np.percentile(err, 95) < 0.08, float(np.percentile(err, 95))
    # no fallback anywhere on a dense floor scan
    assert float((cos == 1.0).mean()) < 0.01


def test_sphere_incidence_is_one():
    rng = np.random.default_rng(0)
    az = rng.uniform(-np.pi, np.pi, 8192)
    el = rng.uniform(np.radians(-50), np.radians(50), 8192)
    R = 10.0
    pts = np.stack([R * np.cos(el) * np.cos(az),
                    R * np.cos(el) * np.sin(az),
                    R * np.sin(el)], -1).astype(np.float32)
    cos = np.asarray(estimate_scan_incidence(
        jnp.asarray(pts), jnp.ones(8192, bool), n_az=128, n_el=32))
    assert np.median(cos) > 0.97, float(np.median(cos))


def test_cos_floor_clamps_grazing():
    # very far floor points: true cos = h/r < floor -> clamped to floor
    pts = _lidar_floor(h=1.0, rings=24)
    r = np.linalg.norm(pts, axis=1)
    cos = np.asarray(estimate_scan_incidence(
        jnp.asarray(pts), jnp.ones(pts.shape[0], bool),
        n_az=256, n_el=48, cos_floor=0.3))
    grazing = (1.0 / r) < 0.25
    assert grazing.sum() > 50
    assert np.all(cos[grazing] >= 0.3 - 1e-6)


def test_invalid_and_occluded_points_get_no_correction():
    pts = _lidar_floor()
    n = pts.shape[0]
    mask = np.ones(n, bool)
    mask[:100] = False
    # push a few points far behind their bin's min range (occlusion edge)
    pts2 = pts.copy()
    pts2[200:210] *= 3.0
    cos = np.asarray(estimate_scan_incidence(
        jnp.asarray(pts2), jnp.asarray(mask), n_az=256, n_el=48,
        range_gate_m=0.5))
    assert np.all(cos[:100] == 1.0)
    assert np.all(cos[200:210] == 1.0)


def test_sampler_scales_labels_by_incidence():
    import jax

    from pin_slam_tpu.models.sampler import sample_training_points

    pts = jnp.asarray(_lidar_floor()[:512])
    mask = jnp.ones(512, bool)
    ks = jax.random.PRNGKey(0)
    kw = dict(surface_sample_range_m=0.3, surface_sample_n=3,
              free_front_n=2, free_behind_n=1,
              free_sample_begin_ratio=0.3, free_sample_end_dist_m=1.0,
              max_range=80.0, dist_weight_on=False,
              dist_weight_scale=0.8)
    base = sample_training_points(ks, pts, mask, **kw)
    cos = jnp.full((512,), 0.5)
    scaled = sample_training_points(ks, pts, mask, cos_inc=cos, **kw)
    # only the FREE-SPACE columns are scaled (a free sample at along-ray
    # offset d from a grazing hit is truly only d*cos above the surface —
    # the floor-sinking bias); the surface band's +-disp labels are
    # symmetric about the endpoint (unbiased either way) and scaling them
    # would only weaken the learned gradient the tracker relies on
    a = 1 + 3 + 2 + 1          # endpoint + surf + front + behind
    base_l = np.asarray(base.sdf_label).reshape(512, a)
    scaled_l = np.asarray(scaled.sdf_label).reshape(512, a)
    np.testing.assert_allclose(scaled_l[:, :4], base_l[:, :4], rtol=1e-6)
    np.testing.assert_allclose(scaled_l[:, 4:], base_l[:, 4:] * 0.5,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(scaled.points),
                               np.asarray(base.points), rtol=1e-6)
