"""Mesh reconstruction: dense SDF-grid queries + marching tetrahedra.

Rebuilds the reference `Mesher` (reference: utils/mesher.py:21-649):
the dense grid coordinates stream in `infer_bs`-sized static batches through
the same jitted query/decode path used by tracking and mapping
(query_points, utils/mesher.py:40-164), the marching-cubes mask keeps only
cells whose corners all saw >= mesh_min_nn neighbors (:156-162), and the
iso-surface is extracted by the in-repo vectorized marching-tetrahedra pass
(ops/marching.py) instead of skimage.

Chunking over the map bounding box (reference split_chunks
utils/tools.py:671-743) keeps peak memory bounded for city-scale maps.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pin_slam_tpu.models import neural_points as npm
from pin_slam_tpu.ops.marching import filter_small_clusters, marching_tetrahedra
from pin_slam_tpu.slam import map_query as mq


@dataclass
class MeshConfig:
    mc_res_m: float = 0.3
    pad_voxel: int = 3
    skip_top_voxel: int = 2
    mc_mask_on: bool = True
    mesh_min_nn: int = 8
    min_cluster_vertices: int = 300
    infer_bs: int = 1 << 16
    chunk_m: float = 100.0


class Mesher:
    def __init__(self, qp: mq.QueryParams, mc: MeshConfig,
                 color_channel: int = 0, semantic_on: bool = False,
                 mesh=None):
        self.qp = qp
        self.mc = mc
        self.color_channel = color_channel
        self.semantic_on = semantic_on
        self.mesh = mesh  # optional jax.sharding.Mesh: shard grid queries

        def query_batch(state, geo_features, geo_mlp, pts):
            out = mq.query_decode(state, geo_features, geo_mlp, pts, qp)
            return out.sdf, out.nn_count

        if mesh is not None:
            # dense grid batches are embarrassingly parallel: shard the
            # query batch over the mesh, replicate map + decoder; XLA
            # partitions the gather+MLP pipeline with no collectives on
            # the forward path (SURVEY §2.2 stretch goal (a))
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(mesh, P())
            shard = NamedSharding(mesh, P(mesh.axis_names[0]))
            self._query_batch = jax.jit(
                query_batch,
                in_shardings=(repl, repl, repl, shard),
                out_shardings=(shard, shard))
        else:
            self._query_batch = jax.jit(query_batch)

    # ---------------------------------------------------------------- query

    def query_sdf_grid(
        self, state: npm.MapState, geo_features, geo_mlp,
        origin: np.ndarray, dims: Tuple[int, int, int],
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Query SDF + nn-count over a dense [X,Y,Z] grid in fixed-size
        batches (reference: utils/mesher.py:40-164)."""
        X, Y, Z = dims
        n = X * Y * Z
        bs = self.mc.infer_bs
        res = self.mc.mc_res_m

        idx = np.arange(n, dtype=np.int64)
        coords = np.stack(
            [idx // (Y * Z), (idx // Z) % Y, idx % Z], -1
        ).astype(np.float32) * res + np.asarray(origin, np.float32)

        sdf = np.zeros(n, np.float32)
        nn = np.zeros(n, np.int32)
        for b in range(math.ceil(n / bs)):
            lo, hi = b * bs, min((b + 1) * bs, n)
            batch = np.zeros((bs, 3), np.float32)
            batch[: hi - lo] = coords[lo:hi]
            s, c = self._query_batch(state, geo_features, geo_mlp,
                                     jnp.asarray(batch))
            sdf[lo:hi] = np.asarray(s)[: hi - lo]
            nn[lo:hi] = np.asarray(c)[: hi - lo]
        return sdf.reshape(dims), nn.reshape(dims)

    # ------------------------------------------------------------- chunking

    @staticmethod
    def split_chunks(min_bound: np.ndarray, max_bound: np.ndarray,
                     chunk_m: float) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Split an AABB into <= chunk_m-sized tiles along the two longest
        horizontal axes (reference: utils/tools.py:671-743)."""
        rng = max_bound - min_bound
        ax0 = 0 if rng[0] > rng[1] else 1
        ax1 = 1 - ax0
        chunks = []
        s0 = np.arange(min_bound[ax0], max_bound[ax0] + 1e-5, chunk_m)
        for a in s0:
            s1 = np.arange(min_bound[ax1], max_bound[ax1] + 1e-5, chunk_m)
            for b in s1:
                lo = min_bound.copy()
                hi = max_bound.copy()
                lo[ax0], hi[ax0] = a, min(a + chunk_m, max_bound[ax0])
                lo[ax1], hi[ax1] = b, min(b + chunk_m, max_bound[ax1])
                if np.all(hi > lo):
                    chunks.append((lo, hi))
        return chunks

    # ------------------------------------------------------------ recon api

    def recon_aabb_mesh(
        self, state: npm.MapState, geo_features, geo_mlp,
        min_bound: np.ndarray, max_bound: np.ndarray,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Mesh one AABB (reference: utils/mesher.py:558-596)."""
        res = self.mc.mc_res_m
        lo = np.asarray(min_bound, np.float64) - self.mc.pad_voxel * res
        hi = np.asarray(max_bound, np.float64) + self.mc.pad_voxel * res
        hi[2] -= self.mc.skip_top_voxel * res
        dims = tuple(
            int(max(np.ceil((hi[i] - lo[i]) / res) + 1, 2)) for i in range(3))
        if np.prod(dims) > 5e8:  # guard (reference: utils/mesher.py:190)
            raise ValueError(f"mc grid too large: {dims}")

        sdf, nn = self.query_sdf_grid(state, geo_features, geo_mlp, lo, dims)
        mask = (nn >= self.mc.mesh_min_nn) if self.mc.mc_mask_on else None
        verts, faces = marching_tetrahedra(
            sdf, mask, origin=lo, voxel_size=res)
        return verts, faces

    def recon_map_mesh(
        self, state: npm.MapState, geo_features, geo_mlp,
        filter_isolated: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Mesh the whole map, chunked (reference: utils/mesher.py:507-556)."""
        cnt = int(state.count)
        if cnt == 0:
            return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
        pos = np.asarray(state.positions[:cnt])
        lo = pos.min(0)
        hi = pos.max(0)
        all_v, all_f = [], []
        voff = 0
        for c_lo, c_hi in self.split_chunks(lo, hi, self.mc.chunk_m):
            v, f = self.recon_aabb_mesh(state, geo_features, geo_mlp,
                                        c_lo, c_hi)
            if v.shape[0] == 0:
                continue
            all_v.append(v)
            all_f.append(f + voff)
            voff += v.shape[0]
        if not all_v:
            return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
        verts = np.concatenate(all_v)
        faces = np.concatenate(all_f)
        if filter_isolated and self.mc.min_cluster_vertices > 0:
            faces = filter_small_clusters(verts, faces,
                                          self.mc.min_cluster_vertices)
        return verts, faces

    # ----------------------------------------------------- vertex attributes

    def vertex_attributes(
        self, state: npm.MapState, geo_features, geo_mlp,
        verts: np.ndarray,
        color_features=None, color_mlp=None, sem_mlp=None,
        color_channel: int = 3,
    ):
        """Query per-vertex color / semantics (reference:
        utils/mesher.py:399-441). Returns (colors [V,3] or None,
        sem_labels [V] or None)."""
        n = verts.shape[0]
        bs = self.mc.infer_bs
        colors = (np.zeros((n, 3), np.float32)
                  if color_mlp is not None else None)
        sems = np.zeros(n, np.int32) if sem_mlp is not None else None

        def batch_fn(state, gf, gm, pts, cf, cm, sm):
            out = mq.query_decode(
                state, gf, gm, pts, self.qp,
                color_features=cf, color_mlp=cm, sem_mlp=sm,
                color_channel=color_channel)
            col = out.color if out.color is not None else jnp.zeros((1,))
            sem = (jnp.argmax(out.sem_log_prob, -1)
                   if out.sem_log_prob is not None else jnp.zeros((1,)))
            return col, sem

        fn = jax.jit(batch_fn)
        for b in range(math.ceil(n / bs)):
            lo, hi = b * bs, min((b + 1) * bs, n)
            batch = np.zeros((bs, 3), np.float32)
            batch[: hi - lo] = verts[lo:hi]
            col, sem = fn(state, geo_features, geo_mlp, jnp.asarray(batch),
                          color_features, color_mlp, sem_mlp)
            if colors is not None:
                c = np.asarray(col)[: hi - lo]
                colors[lo:hi] = c if c.shape[1] == 3 else np.repeat(
                    c[:, :1], 3, 1)
            if sems is not None:
                sems[lo:hi] = np.asarray(sem)[: hi - lo]
        return colors, sems

    # ------------------------------------------------------------ sdf slice

    def sdf_slice(
        self, state: npm.MapState, geo_features, geo_mlp,
        center: np.ndarray, extent: float, height: float,
        res: Optional[float] = None, axis: str = "z",
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """SDF slice for visualization. `axis` is the slice normal: "z"
        gives the horizontal slice at z=`height` (reference:
        utils/mesher.py:211-279 generate_bbx_sdf_hor_slice); "x" or "y"
        give vertical slices at x/y=`height` (reference:
        utils/mesher.py:458-504 generate_bbx_sdf_ver_slice).
        Returns (us, vs, sdf[U,V]) in the two in-plane axes."""
        res = res or self.mc.mc_res_m
        ax = {"x": 0, "y": 1, "z": 2}[axis]
        u_ax, v_ax = [a for a in range(3) if a != ax]
        xs = np.arange(center[u_ax] - extent, center[u_ax] + extent, res)
        ys = np.arange(center[v_ax] - extent, center[v_ax] + extent, res)
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        cols = [None, None, None]
        cols[u_ax], cols[v_ax] = gx, gy
        cols[ax] = np.full_like(gx, height)
        pts = np.stack(cols, -1).reshape(-1, 3)
        bs = self.mc.infer_bs
        n = pts.shape[0]
        sdf = np.zeros(n, np.float32)
        for b in range(math.ceil(n / bs)):
            lo_i, hi_i = b * bs, min((b + 1) * bs, n)
            batch = np.zeros((bs, 3), np.float32)
            batch[: hi_i - lo_i] = pts[lo_i:hi_i]
            s, _ = self._query_batch(state, geo_features, geo_mlp,
                                     jnp.asarray(batch))
            sdf[lo_i:hi_i] = np.asarray(s)[: hi_i - lo_i]
        return xs, ys, sdf.reshape(len(xs), len(ys))


def write_ply(path: str, verts: np.ndarray, faces: np.ndarray,
              colors: Optional[np.ndarray] = None):
    """Minimal binary-less PLY writer (host tooling; replaces Open3D IO)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {verts.shape[0]}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write(f"element face {faces.shape[0]}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        if colors is not None:
            cu = np.clip(colors * 255, 0, 255).astype(np.uint8)
            for v, c in zip(verts, cu):
                f.write(f"{v[0]:.4f} {v[1]:.4f} {v[2]:.4f} "
                        f"{c[0]} {c[1]} {c[2]}\n")
        else:
            for v in verts:
                f.write(f"{v[0]:.4f} {v[1]:.4f} {v[2]:.4f}\n")
        for fc in faces:
            f.write(f"3 {fc[0]} {fc[1]} {fc[2]}\n")
