"""Pallas fused decode kernel vs the XLA reference (interpret mode on CPU;
the compiled path is exercised on TPU by bench/profiling runs)."""

import jax
import jax.numpy as jnp
import numpy as np

from pin_slam_tpu.ops.pallas_decode import (
    decode_weighted_sdf,
    decode_weighted_sdf_reference,
)


def test_matches_reference_interpret():
    rng = np.random.RandomState(0)
    n, k, f, h = 777, 6, 11, 64
    gv = jnp.asarray(rng.randn(n, k, f), jnp.float32)
    w = jnp.asarray(rng.rand(n, k), jnp.float32)
    w = w / w.sum(1, keepdims=True)
    w0 = jnp.asarray(rng.randn(f, h) * 0.3, jnp.float32)
    b0 = jnp.asarray(rng.randn(h) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(h, 1) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.randn(1) * 0.1, jnp.float32)

    ref = decode_weighted_sdf_reference(gv, w, w0, b0, w1, b1, 0.044)
    out = decode_weighted_sdf(gv, w, w0, b0, w1, b1, sdf_scale=0.044,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
