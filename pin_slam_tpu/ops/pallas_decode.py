"""Pallas TPU kernel: fused per-neighbor MLP decode + IDW reduction.

In `weighted_first=False` mode (the reference's KITTI configuration,
reference: config/lidar_slam/run_kitti.yaml `weighted_first: False` +
utils/tracker.py:313-323) every query decodes the MLP at each of its k
neighbors and reduces with the IDW weights. Under plain XLA this
materializes the [N, k, hidden] activations in HBM between the two matmuls;
this kernel keeps the whole tile — inputs, both matmuls, ReLU and the
weighted reduction — resident in VMEM.

The hidden layer is padded to the 128-lane width so both contractions run on
the MXU. Gathers stay outside (XLA's native gather is transaction-bound and
Pallas cannot beat it; measured in round 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _decode_kernel(gv_ref, w_ref, w0_ref, b0_ref, w1_ref, b1_ref, out_ref,
                   *, k: int, sdf_scale: float):
    """One block of queries: gv [BN*k, Fp], w [BN, k] -> out [BN]."""
    h = jnp.dot(gv_ref[:], w0_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b0_ref[:], 0.0)
    per = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)
    per = per + b1_ref[:]                      # [BN*k, out_pad]
    bn = w_ref.shape[0]
    per = per[:, 0].reshape(bn, k) * sdf_scale
    out_ref[:] = jnp.sum(per * w_ref[:], axis=1)


@functools.partial(jax.jit, static_argnames=("sdf_scale", "interpret"))
def decode_weighted_sdf(
    geo_vec: jnp.ndarray,   # [N, k, F+3]
    w: jnp.ndarray,         # [N, k] normalized IDW weights
    w0: jnp.ndarray,        # [F+3, H]
    b0: jnp.ndarray,        # [H]
    w1: jnp.ndarray,        # [H, 1]
    b1: jnp.ndarray,        # [1]
    sdf_scale: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused per-neighbor SDF decode + weighted mean -> [N]."""
    n, k, f = geo_vec.shape
    hid = w0.shape[1]
    fp = _round_up(f, 128)
    hp = _round_up(hid, 128)
    op = 128  # padded output width

    bn = 1024  # queries per block (1-D outputs want 1024-multiple blocks)
    n_pad = _round_up(n, bn)

    gv = jnp.zeros((n_pad * k, fp), geo_vec.dtype)
    gv = gv.at[: n * k, :f].set(geo_vec.reshape(n * k, f))
    wp = jnp.zeros((n_pad, k), w.dtype).at[:n].set(w)
    w0p = jnp.zeros((fp, hp), w0.dtype).at[:f, :hid].set(w0)
    b0p = jnp.zeros((hp,), b0.dtype).at[:hid].set(b0)[None, :]
    w1p = jnp.zeros((hp, op), w1.dtype).at[:hid, :1].set(w1)
    b1p = jnp.zeros((op,), b1.dtype).at[:1].set(b1)[None, :]

    grid = (n_pad // bn,)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, k=k, sdf_scale=sdf_scale),
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn * k, fp), lambda i: (i, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((bn, k), lambda i: (i, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((fp, hp), lambda i: (0, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((1, hp), lambda i: (0, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((hp, op), lambda i: (0, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((1, op), lambda i: (0, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn,), lambda i: (i,),
                               memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
        interpret=interpret,
    )(gv, wp, w0p, b0p, w1p, b1p)
    return out[:n]


def decode_weighted_sdf_reference(geo_vec, w, w0, b0, w1, b1,
                                  sdf_scale=1.0):
    """Plain-XLA reference implementation (for testing / CPU fallback)."""
    h = jnp.maximum(jnp.einsum("nkf,fh->nkh", geo_vec, w0) + b0, 0.0)
    per = (jnp.einsum("nkh,ho->nko", h, w1) + b1)[..., 0] * sdf_scale
    return jnp.sum(per * w, axis=1)
