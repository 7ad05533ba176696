"""Tiny shared MLP decoders (SDF / semantics / color).

Rebuilds the reference `Decoder` (reference: model/decoder.py:14-114):
input = neural-point feature (F) + geometric offset (3, raw since the
positional-encoding band is 0 by default), `hidden_level` hidden layers of
`hidden_dim` with ReLU, linear head. The SDF head output is scaled by
`logistic_gaussian_ratio * sigma_sigmoid_m` (reference: model/decoder.py:54-56).

Params are plain pytrees ({'w': [...], 'b': [...]}) applied with jnp.dot so
the decode fuses into the surrounding query kernel under jit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def init_mlp_params(
    key: jax.Array,
    in_dim: int,
    hidden_dim: int,
    hidden_level: int,
    out_dim: int,
    bias_on: bool = True,
):
    """Uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) init (torch.nn.Linear default)."""
    ws, bs = [], []
    dims = [in_dim] + [hidden_dim] * hidden_level + [out_dim]
    for i in range(len(dims) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        bound = 1.0 / jnp.sqrt(dims[i])
        ws.append(jax.random.uniform(
            k1, (dims[i], dims[i + 1]), jnp.float32, -bound, bound))
        bs.append(
            jax.random.uniform(k2, (dims[i + 1],), jnp.float32, -bound, bound)
            if bias_on else jnp.zeros((dims[i + 1],), jnp.float32))
    return {"w": ws, "b": bs}


def mlp_apply(params, x: jnp.ndarray, leaky: bool = False) -> jnp.ndarray:
    """Apply the MLP to [..., in_dim] (reference: model/decoder.py:61-79)."""
    h = x
    n = len(params["w"])
    for i in range(n - 1):
        h = jnp.dot(h, params["w"][i], preferred_element_type=jnp.float32)
        h = h + params["b"][i]
        h = jax.nn.leaky_relu(h) if leaky else jax.nn.relu(h)
    out = jnp.dot(h, params["w"][n - 1], preferred_element_type=jnp.float32)
    return out + params["b"][n - 1]


def sdf_apply(params, feat: jnp.ndarray, sdf_scale: float,
              leaky: bool = False) -> jnp.ndarray:
    """Scaled SDF prediction [..., in] -> [...] (reference: model/decoder.py:83-85)."""
    return mlp_apply(params, feat, leaky)[..., 0] * sdf_scale


def occupancy_apply(params, feat: jnp.ndarray, sdf_scale: float,
                    leaky: bool = False) -> jnp.ndarray:
    """(reference: model/decoder.py:95-97)"""
    return jax.nn.sigmoid(sdf_apply(params, feat, sdf_scale, leaky)
                          / -sdf_scale)


def sem_log_prob_apply(params, feat: jnp.ndarray,
                       leaky: bool = False) -> jnp.ndarray:
    """Log-softmax class probabilities (reference: model/decoder.py:100-106)."""
    return jax.nn.log_softmax(mlp_apply(params, feat, leaky), axis=-1)


def color_apply(params, feat: jnp.ndarray, leaky: bool = False) -> jnp.ndarray:
    """Sigmoid color/intensity regression (reference: model/decoder.py:112-114)."""
    return jax.nn.sigmoid(mlp_apply(params, feat, leaky))


def weighted_reduce(
    per_nn: jnp.ndarray, w: jnp.ndarray, with_std: bool = False
):
    """Combine per-neighbor predictions with IDW weights
    (weighted_first=False path, reference: utils/tracker.py:317-323).

    per_nn: [N, k] or [N, k, D]; w: [N, k]. Returns (mean, std or None).
    """
    if per_nn.ndim == 3:
        mean = jnp.sum(per_nn * w[..., None], axis=1)
        if not with_std:
            return mean, None
        var = jnp.sum(w[..., None] * (per_nn - mean[:, None, :]) ** 2, axis=1)
        return mean, jnp.sqrt(jnp.maximum(var, 0.0) + 1e-12)
    mean = jnp.sum(per_nn * w, axis=1)
    if not with_std:
        return mean, None
    var = jnp.sum(w * (per_nn - mean[:, None]) ** 2, axis=1)
    return mean, jnp.sqrt(jnp.maximum(var, 0.0) + 1e-12)
