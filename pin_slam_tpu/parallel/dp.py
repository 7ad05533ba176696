"""Multi-chip parallelism for the mapping trainer and mesher.

The reference is strictly single-GPU (SURVEY §2.2); these are the TPU-native
scaling paths that do not exist in the reference:

* data-parallel mapping: the training batch is sharded over the `dp` mesh
  axis, map/decoder parameters are replicated, and XLA inserts the gradient
  all-reduce over ICI (no NCCL analog needed).
* sharded meshing: dense SDF-grid query batches are embarrassingly parallel
  over chunks; shard the query batch over devices the same way.

Used by `__graft_entry__.dryrun_multichip` (virtual CPU mesh) and by real
multi-chip runs unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pin_slam_tpu.slam import map_query as mq
from pin_slam_tpu.models import losses as L


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.array(devs), (axis,))


def make_dp_train_step(mesh: Mesh, qp: mq.QueryParams, optimizer, *,
                       loss_kwargs: dict):
    """Data-parallel mapping train step: batch sharded over `dp`, params and
    map state replicated, gradients all-reduced by XLA.

    Takes explicit batch arrays (coord/sdf/weight/mask) instead of pool +
    indices so the batch itself can be sharded."""

    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("dp"))

    def loss_fn(params, state, coord, sdf_label, weight, mask, lf):
        out = mq.query_decode(
            state, params["geo_features"], params["geo_mlp"], coord, qp,
            lf=lf)
        sdf_loss = L.sdf_bce_loss(
            out.sdf, sdf_label, loss_kwargs["sigma_sigmoid_m"], weight, mask,
            weighted=loss_kwargs.get("loss_weight_on", False))
        total = sdf_loss
        if loss_kwargs.get("ekional_loss_on", True):
            dec = coord[:: loss_kwargs.get("gradient_decimation", 10)]
            g = mq.query_sdf_numerical_grad(
                state, params["geo_features"], params["geo_mlp"], dec,
                loss_kwargs.get("numerical_grad_eps", 0.06), qp, lf=lf)
            total = total + loss_kwargs.get("weight_e", 0.5) * L.eikonal_loss(
                g, mask[:: loss_kwargs.get("gradient_decimation", 10)])
        return total

    def step(params, opt_state, state, coord, sdf_label, weight, mask, lf):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, state, coord, sdf_label, weight, mask, lf)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(
            replicated, replicated, replicated,
            batch_sharded, batch_sharded, batch_sharded, batch_sharded,
            replicated,
        ),
        out_shardings=(replicated, replicated, replicated),
    )


def make_sharded_query(mesh: Mesh, qp: mq.QueryParams):
    """Shard dense SDF-grid queries (meshing) over devices."""
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("dp"))

    def query(state, geo_features, geo_mlp, pts):
        out = mq.query_decode(state, geo_features, geo_mlp, pts, qp)
        return out.sdf, out.nn_count

    return jax.jit(
        query,
        in_shardings=(replicated, replicated, replicated, batch_sharded),
        out_shardings=(batch_sharded, batch_sharded),
    )
