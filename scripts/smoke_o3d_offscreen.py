#!/usr/bin/env python
"""Offscreen smoke test for the Open3D GUI backend (reference GUI:
gui/slam_gui.py:50-1337).

This container cannot install open3d (no pip, no display), so the
interactive backend is mocked in tests/test_gui_and_replay.py. This script
is the real-open3d burn-down, run inside the Docker image (which installs
open3d + EGL):

    docker build -t pin-slam-tpu -f docker/Dockerfile .
    docker run --rm --entrypoint python pin-slam-tpu \
        scripts/smoke_o3d_offscreen.py

It builds a representative VisPacket (neural points, scan, mesh, SDF
slice, trajectory with a loop edge) and renders it through
OffscreenPacketRenderer — the exact _set_cloud/_set_mesh/_set_traj code
the interactive _O3DViewer runs — asserting the output PNG is a real,
non-uniform render. Exit 0 = pass, 2 = open3d missing, 1 = render failed.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_packet():
    from pin_slam_tpu.gui.gui_utils import VisPacket

    rng = np.random.RandomState(0)
    # a floor + wall corner observed by a ring of neural points
    n = 4000
    floor = np.stack([rng.rand(n) * 10, rng.rand(n) * 10,
                      np.zeros(n)], -1)
    wall = np.stack([np.zeros(n // 2), rng.rand(n // 2) * 10,
                     rng.rand(n // 2) * 3], -1)
    neural_pts = np.concatenate([floor, wall])
    scan = neural_pts[::4] + rng.randn(len(neural_pts[::4]), 3) * 0.02

    # a coarse quad mesh over the floor
    gx, gy = np.meshgrid(np.linspace(0, 10, 8), np.linspace(0, 10, 8))
    verts = np.stack([gx.ravel(), gy.ravel(),
                      np.zeros(gx.size)], -1)
    faces = []
    for i in range(7):
        for j in range(7):
            a = i * 8 + j
            faces += [[a, a + 1, a + 8], [a + 1, a + 9, a + 8]]
    faces = np.asarray(faces, np.int32)
    colors = np.tile([[0.4, 0.6, 0.4]], (verts.shape[0], 1))

    poses = np.stack([np.eye(4)] * 12)
    poses[:, 0, 3] = np.linspace(1, 9, 12)
    poses[:, 1, 3] = 5 + 2 * np.sin(np.linspace(0, 2 * np.pi, 12))
    poses[:, 2, 3] = 1.2

    pkt = VisPacket(frame_id=11, cur_fps=9.9,
                    current_pointcloud_xyz=scan,
                    mesh_verts=verts, mesh_faces=faces,
                    mesh_verts_rgb=colors)
    pkt.add_traj(slam_poses=poses, loop_edges=[(0, 11)])
    pkt.add_neural_points_data(neural_pts, count=len(neural_pts),
                               map_memory_mb=0.5, pca_color_on=False)
    slice_pts = np.stack([rng.rand(500) * 10, rng.rand(500) * 10,
                          np.full(500, 0.5)], -1)
    slice_rgb = np.stack([rng.rand(500), np.zeros(500),
                          1 - rng.rand(500)], -1)
    pkt.add_sdf_slice(slice_pts, slice_rgb)
    return pkt


def main():
    try:
        import open3d  # noqa: F401
    except ImportError:
        print("SKIP: open3d is not installed in this environment "
              "(expected inside docker/Dockerfile image)")
        return 2

    from pin_slam_tpu.gui.o3d_gui import OffscreenPacketRenderer

    out = os.environ.get("SMOKE_OUT", "/tmp/o3d_offscreen_smoke.png")
    r = OffscreenPacketRenderer(1280, 720)
    img = r.render_to_png(build_packet(), out)

    # all six geometry layers must be in the scene
    for name in (r.NP_NAME, r.SCAN_NAME, r.MESH_NAME, r.SDF_NAME,
                 r.TRAJ_NAME, r.LOOP_NAME):
        assert r.scene.has_geometry(name), f"missing geometry {name}"
    # and the render must be a real image: correct size, non-uniform
    assert img.shape[0] == 720 and img.shape[1] == 1280, img.shape
    spread = float(img.astype(np.float64).std())
    assert spread > 1.0, f"render is uniform (std={spread})"
    assert os.path.getsize(out) > 10_000, "PNG suspiciously small"
    print(f"PASS: offscreen render ok -> {out} (pixel std {spread:.1f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
