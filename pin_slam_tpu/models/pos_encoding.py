"""Positional encodings for the neighbor offset vectors.

Rebuilds the reference's (default-off, pos_encoding_band=0) encoders
(reference: model/neural_points.py:1076-1143): log-scale sinusoidal bands
and Gaussian Fourier features. When enabled, the decoder input dim becomes
feature_dim + encoded dim (reference: model/decoder.py:31-37).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class PositionalEncoder:
    """Log-scale sinusoidal encoding: out_dim = d * (2*bands + 1)
    (reference: model/neural_points.py:1076-1119)."""

    def __init__(self, freq: float = 200.0, num_bands: int = 0,
                 dimensionality: int = 3, base: float = 2.0):
        self.num_bands = num_bands
        self.dimensionality = dimensionality
        self.out_dim = dimensionality * (2 * num_bands + 1)
        if num_bands > 0:
            exps = np.linspace(0.0, np.log(freq / 2) / np.log(base),
                               num_bands)
            self.scales = np.power(base, exps).astype(np.float32)
        else:
            self.scales = np.zeros((0,), np.float32)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.num_bands == 0:
            return x
        xb = x[..., None] * jnp.asarray(self.scales) * jnp.pi
        enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb), x[..., None]],
                              axis=-1)
        return enc.reshape(*x.shape[:-1], self.out_dim)


class GaussianFourierFeatures:
    """Random Fourier features: out_dim = 2*bands + d
    (reference: model/neural_points.py:1124-1143)."""

    def __init__(self, key: jax.Array, freq: float = 200.0,
                 num_bands: int = 0, dimensionality: int = 3):
        self.num_bands = num_bands
        self.dimensionality = dimensionality
        self.out_dim = 2 * num_bands + dimensionality
        self.B = (jax.random.normal(key, (dimensionality, num_bands))
                  * freq if num_bands > 0 else None)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.num_bands == 0:
            return x
        proj = 2.0 * jnp.pi * x @ self.B
        return jnp.concatenate([x, jnp.sin(proj), jnp.cos(proj)], axis=-1)
