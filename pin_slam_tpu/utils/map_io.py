"""Neural point map save / load.

Replaces the reference's pickled `pin_map.pth` (reference:
utils/tools.py:295-329) with a portable .npz holding the compacted map
arrays + decoder params + the key reconstruction hyper-parameters. Reload
rebuilds the hash table, enabling localization-with-prebuilt-map mode and
offline meshing (reference: pin_slam.py:157-169, vis_pin_map.py:87-93).
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from pin_slam_tpu.config import Config
from pin_slam_tpu.models import neural_points as npm


def _flatten_params(params: dict, prefix=""):
    out = {}
    for k, v in params.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten_params(v, key + "."))
        elif isinstance(v, list):
            for i, vi in enumerate(v):
                out[f"{key}.{i}"] = np.asarray(vi)
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten_params(flat: dict):
    params: dict = {}
    for key, v in flat.items():
        parts = key.split(".")
        d = params
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(v)

    def listify(d):
        if isinstance(d, dict):
            if d and all(k.isdigit() for k in d):
                return [listify(d[str(i)]) for i in range(len(d))]
            return {k: listify(v) for k, v in d.items()}
        return d

    return listify(params)


def save_implicit_map(path: str, state: npm.MapState, params: dict,
                      config: Config):
    """Write `pin_map.npz` with the compacted map + decoders."""
    cnt = int(state.count)
    arrays = {
        "positions": np.asarray(state.positions[:cnt]),
        "orientations": np.asarray(state.orientations[:cnt]),
        "geo_features": np.asarray(state.geo_features[: cnt + 1]),
        "ts_create": np.asarray(state.ts_create[:cnt]),
        "ts_update": np.asarray(state.ts_update[:cnt]),
        "certainty": np.asarray(state.certainty[:cnt]),
    }
    if state.color_features is not None:
        arrays["color_features"] = np.asarray(state.color_features[: cnt + 1])
    mlps = {k: v for k, v in params.items() if k.endswith("_mlp")}
    arrays.update(_flatten_params(mlps, "mlp/"))
    meta = {
        "count": cnt,
        "voxel_size_m": config.voxel_size_m,
        "feature_dim": config.feature_dim,
        "buffer_size": config.buffer_size,
        "sigma_sigmoid_m": config.sigma_sigmoid_m,
        "logistic_gaussian_ratio": config.logistic_gaussian_ratio,
        "main_loss_type": config.main_loss_type,
        "color_on": config.color_on,
        "geo_mlp_hidden_dim": config.geo_mlp_hidden_dim,
        "geo_mlp_level": config.geo_mlp_level,
    }
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_implicit_map(path: str,
                      capacity: int = 0,
                      with_btable: bool = True,
                      ) -> Tuple[npm.MapState, dict, dict]:
    """Load a saved map; returns (state with rebuilt hash, mlp params,
    meta dict). `with_btable=False` skips the brick probe cache (join-mode
    consumers never read it — see npm.init_map_state)."""
    z = np.load(path)
    meta = json.loads(bytes(z["meta_json"]).decode())
    cnt = int(meta["count"])
    cap = max(capacity, 1 << int(np.ceil(np.log2(max(cnt + 1, 2)))))
    state = npm.init_map_state(
        cap, int(meta["buffer_size"]), int(meta["feature_dim"]),
        meta.get("color_on", False), with_btable=with_btable)
    state = state.replace(
        positions=state.positions.at[:cnt].set(z["positions"]),
        orientations=state.orientations.at[:cnt].set(z["orientations"]),
        geo_features=state.geo_features.at[:cnt].set(
            z["geo_features"][:cnt]),
        ts_create=state.ts_create.at[:cnt].set(z["ts_create"]),
        ts_update=state.ts_update.at[:cnt].set(z["ts_update"]),
        certainty=state.certainty.at[:cnt].set(z["certainty"]),
        count=jnp.int32(cnt),
    )
    if meta.get("color_on") and "color_features" in z:
        state = state.replace(
            color_features=state.color_features.at[:cnt].set(
                z["color_features"][:cnt]))
    state = npm.rehash(state, 0, resolution=meta["voxel_size_m"],
                       use_mid_ts=False)
    flat = {k[len("mlp/"):]: z[k] for k in z.files if k.startswith("mlp/")}
    mlps = _unflatten_params(flat)
    return state, mlps, meta
