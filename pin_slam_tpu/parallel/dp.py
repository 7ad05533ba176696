"""Multi-chip mesh construction for the data-parallel mapper and mesher.

The reference is strictly single-GPU (SURVEY §2.2). The TPU-native scaling
paths live in the production modules themselves — `Mapper.make_train_loop`
(batch sharded over the `dp` axis, params replicated, XLA all-reduces the
gradients over ICI) and `Mesher` (dense SDF-grid query batches sharded over
chunks). This module only builds the `jax.sharding.Mesh` they share; see
`tests/test_parallel.py` and `__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.array(devs), (axis,))
