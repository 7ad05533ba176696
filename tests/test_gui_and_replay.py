"""Viewer process/queue architecture + offline PGO replay + GT loop oracle
(reference: gui/gui_utils.py, pin_slam.py:200-217,412-433,
utils/pgo.py:252-314, utils/loop_detector.py:376-440)."""

import sys
import os
import threading
import time

import numpy as np
import pytest


# --------------------------------------------------------------- gui_utils

def test_get_latest_queue_latest_wins():
    import queue as q_mod
    from pin_slam_tpu.gui import get_latest_queue

    q = q_mod.Queue()
    for i in range(5):
        q.put(i)
    assert get_latest_queue(q) == 4
    assert get_latest_queue(q) is None


def test_vispacket_fields_roundtrip():
    from pin_slam_tpu.gui import VisPacket

    pkt = VisPacket(frame_id=3, travel_dist=12.5, cur_fps=9.0)
    pkt.add_scan(np.random.rand(10, 3))
    pkt.add_mesh(np.random.rand(4, 3), np.array([[0, 1, 2]]))
    pkt.add_traj(np.tile(np.eye(4), (3, 1, 1)))
    pkt.add_neural_points_data(np.random.rand(20, 3), count=20,
                               map_memory_mb=1.0, resolution=0.3,
                               pca_color_on=False)
    assert pkt.slam_poses is not None          # defaults to odom
    assert pkt.has_neural_points
    assert pkt.mesh_faces.dtype == np.int32
    assert not pkt.finish


def test_apply_control_pause_until_resumed():
    import queue as q_mod
    from pin_slam_tpu.gui import ControlPacket, apply_control

    q = q_mod.Queue()
    paused = ControlPacket()
    paused.flag_pause = True
    paused.mesh_freq_frame = 7
    q.put(paused)

    def resume():
        time.sleep(0.3)
        cp = ControlPacket()
        cp.flag_pause = False
        q.put(cp)

    t = threading.Thread(target=resume)
    t.start()
    t0 = time.time()
    state = apply_control(q, {}, sleep_s=0.05, max_pause_s=5.0)
    elapsed = time.time() - t0
    t.join()
    assert 0.2 < elapsed < 3.0                 # actually blocked, then woke
    assert state["mesh_freq_frame"] == 7


def test_viewer_process_end_to_end(tmp_path):
    """Spawn the real viewer process, feed packets, check it renders and
    exits cleanly on the finish packet (the reference's process/queue
    lifecycle, pin_slam.py:200-217,546-563)."""
    from pin_slam_tpu.gui import VisPacket, start_viewer, stop_viewer

    proc, q_m2v, q_v2m = start_viewer(str(tmp_path), render_every=1)
    try:
        for fid in range(2):
            pkt = VisPacket(frame_id=fid, travel_dist=float(fid))
            pkt.add_scan(np.random.rand(50, 3).astype(np.float32))
            pkt.add_traj(np.tile(np.eye(4), (fid + 1, 1, 1)))
            q_m2v.put(pkt)
            time.sleep(0.3)
        # control file -> ControlPacket back on q_vis2main
        gui_dir = tmp_path / "gui"
        gui_dir.mkdir(exist_ok=True)
        (gui_dir / "control.yaml").write_text("mesh_freq_frame: 13\n")
        deadline = time.time() + 20
        cp = None
        while time.time() < deadline and cp is None:
            try:
                cp = q_v2m.get(timeout=0.5)
            except Exception:
                pass
        assert cp is not None and cp.mesh_freq_frame == 13
    finally:
        stop_viewer(proc, q_m2v, timeout_s=20.0)
    assert not proc.is_alive()
    assert (tmp_path / "gui" / "latest.npz").exists()
    pngs = list((tmp_path / "gui").glob("view_*.png"))
    assert len(pngs) >= 1


# ------------------------------------------------------------- pgo replay

def _circle_poses(n, radius=10.0):
    poses = np.tile(np.eye(4), (n, 1, 1))
    ang = np.linspace(0, 2 * np.pi, n)
    for i, a in enumerate(ang):
        poses[i, 0, 0] = np.cos(a)
        poses[i, 0, 1] = -np.sin(a)
        poses[i, 1, 0] = np.sin(a)
        poses[i, 1, 1] = np.cos(a)
        poses[i, :2, 3] = radius * np.array([np.cos(a), np.sin(a)])
    return poses


def test_loop_log_roundtrip_and_offline_pgo(tmp_path):
    from pin_slam_tpu.config import Config
    from pin_slam_tpu.slam.pgo import PoseGraphManager

    c = Config()
    c.silence = True
    n = 60
    gt = _circle_poses(n)
    # drifted odometry: grow a yaw+translation error along the loop
    drift = np.eye(4)
    odom = gt.copy()
    for i in range(1, n):
        rel = np.linalg.inv(gt[i - 1]) @ gt[i]
        eps = np.eye(4)
        th = 0.002
        eps[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
        eps[0, 3] = 0.01
        drift = drift @ rel @ eps
        odom[i] = odom[i - 1] @ rel @ eps
    # a GT loop closure between last and first frame
    pgm = PoseGraphManager(c)
    pgm.loop_edges = [np.array([0, n - 1])]
    pgm.loop_trans = [np.linalg.inv(gt[0]) @ gt[n - 1]]
    log = tmp_path / "loop_log.txt"
    pgm.write_loops(str(log))

    pgm2 = PoseGraphManager(c)
    assert pgm2.read_loops(str(log))
    assert len(pgm2.loop_edges) == 1
    np.testing.assert_allclose(pgm2.loop_trans[0], pgm.loop_trans[0],
                               atol=1e-9)

    err_before = np.linalg.norm(odom[-1, :3, 3] - gt[-1, :3, 3])
    opt = pgm2.offline_pgo(odom)
    err_after = np.linalg.norm(opt[-1, :3, 3] - gt[-1, :3, 3])
    assert err_after < 0.3 * err_before
    assert pgm2.read_loops(str(tmp_path / "missing.txt")) is False


# ---------------------------------------------------------- GT loop oracle

def test_gt_loop_manager_detects_revisit():
    from pin_slam_tpu.slam.loop_detector import GTLoopManager

    mgr = GTLoopManager(exclude_recent_nodes=10, min_travel_dist=20.0)
    gt = _circle_poses(80, radius=8.0)
    found = None
    for i in range(len(gt)):
        mgr.add_node(i, gt[i])
        idx, dist, T = mgr.detect_loop()
        if idx is not None:
            found = (i, idx, dist, T)
    assert found is not None, "no loop found on a closed circle"
    i, idx, dist, T = found
    assert dist < 2.0 and idx < 12
    # returned transform is the exact GT relative pose
    np.testing.assert_allclose(
        T, np.linalg.inv(gt[idx]) @ gt[i], atol=1e-9)
    # early frames: no loop
    mgr2 = GTLoopManager()
    mgr2.add_node(0, gt[0])
    assert mgr2.detect_loop() == (None, None, None)


class TestO3DBackend:
    def test_available_is_false_headless(self):
        """No open3d / no display in this env: the backend must report
        unavailable so viewer_main picks the PNG renderer."""
        from pin_slam_tpu.gui import o3d_gui
        assert o3d_gui.available() is False

    def test_viewer_main_auto_falls_back_to_png(self, tmp_path):
        """backend='auto' without open3d must run the PNG loop end-to-end."""
        import queue as q

        from pin_slam_tpu.gui.gui_utils import ParamsGUI, VisPacket
        from pin_slam_tpu.gui.slam_viewer import viewer_main

        import threading
        import time

        q_m2v, q_v2m = q.Queue(), q.Queue()
        pkt = VisPacket(frame_id=0,
                        current_pointcloud_xyz=np.random.rand(50, 3))
        q_m2v.put(pkt)
        params = ParamsGUI(q_main2vis=q_m2v, q_vis2main=q_v2m,
                           run_path=str(tmp_path))
        params.backend = "auto"
        th = threading.Thread(target=viewer_main, args=(params,))
        th.start()
        png = tmp_path / "gui" / "view_000000.png"
        for _ in range(200):  # wait for the render (latest-wins: the
            if png.exists():  # finish packet must come after it)
                break
            time.sleep(0.05)
        q_m2v.put(VisPacket(finish=True))
        th.join(timeout=10)
        assert not th.is_alive()
        assert png.exists()


class TestO3DViewerMocked:
    """Execute the _O3DViewer widget/render wiring against a fake open3d.

    open3d cannot be installed in this environment (no pip installs, no
    display), so the interactive backend is driven here with a minimal
    in-process stand-in for the open3d.visualization.gui / rendering /
    geometry APIs it touches. This verifies the panel construction, the
    checkbox/slider -> ControlPacket push path, packet rendering (scene
    geometry add/remove by name), the stats line, and the finish protocol.
    """

    def _fake_open3d(self):
        import types

        class _Obj:
            """Permissive attribute bag."""
            def __init__(self, *a, **k):
                self._a, self._k = a, k

            def __call__(self, *a, **k):
                return _Obj(*a, **k)

            def __getattr__(self, name):
                v = _Obj()
                object.__setattr__(self, name, v)
                return v

        class Scene:
            def __init__(self, renderer):
                self.geoms = {}
                self.bg = None
                self.bounding_box = _Obj()
                self.bounding_box.get_center = lambda: (0.0, 0.0, 0.0)

            def set_background(self, c):
                self.bg = c

            def has_geometry(self, name):
                return name in self.geoms

            def remove_geometry(self, name):
                del self.geoms[name]

            def add_geometry(self, name, geom, mat):
                self.geoms[name] = geom

        class Widget:
            def __init__(self, *a, **k):
                self.children = []
                self.frame = None
                self.checked = k.pop("checked", False)

            def add_child(self, c):
                self.children.append(c)

            def setup_camera(self, fov, bounds, center):
                self.camera = (fov, bounds, center)

        class Checkbox(Widget):
            def __init__(self, label):
                super().__init__()
                self.label = label
                self.checked = False

            def set_on_checked(self, fn):
                self.on_checked = fn

        class Slider(Widget):
            INT, DOUBLE = 0, 1

            def __init__(self, kind):
                super().__init__()
                self.kind = kind
                self.int_value = 0
                self.double_value = 0.0

            def set_limits(self, lo, hi):
                self.limits = (lo, hi)

            def set_on_value_changed(self, fn):
                self.on_value = fn

        class Label(Widget):
            def __init__(self, text):
                super().__init__()
                self.text = text

        class Window(Widget):
            def __init__(self):
                super().__init__()
                self.theme = _Obj()
                self.theme.font_size = 14
                self.renderer = _Obj()
                self.content_rect = _Obj()

            def set_on_layout(self, fn):
                self.on_layout = fn

            def set_on_tick_event(self, fn):
                self.on_tick = fn

            def set_on_close(self, fn):
                self.on_close = fn

        class App:
            def __init__(self):
                self.quit_called = False
                self.run_called = False

            def initialize(self):
                pass

            def create_window(self, *a):
                self.window = Window()
                return self.window

            def quit(self):
                self.quit_called = True

            def run(self):
                self.run_called = True

        gui = types.ModuleType("open3d.visualization.gui")
        gui.Application = _Obj()
        gui.Application.instance = App()
        gui.SceneWidget = Widget
        gui.Vert = lambda *a, **k: Widget()
        gui.Margins = lambda *a, **k: None
        gui.Checkbox = Checkbox
        gui.Slider = Slider
        gui.Label = Label
        gui.Rect = lambda *a: a

        rendering = types.ModuleType("open3d.visualization.rendering")
        rendering.Open3DScene = Scene
        rendering.MaterialRecord = _Obj

        def _vec(x):
            return np.asarray(x)

        class _Geom:
            def __init__(self, *a):
                self.args = a
                self.colors = None
                self.vertex_colors = None

            def paint_uniform_color(self, c):
                self.uniform = c

            def compute_vertex_normals(self):
                pass

        geometry = types.ModuleType("open3d.geometry")
        geometry.PointCloud = _Geom
        geometry.TriangleMesh = _Geom
        geometry.LineSet = _Geom
        utility = types.ModuleType("open3d.utility")
        utility.Vector3dVector = _vec
        utility.Vector2iVector = _vec
        utility.Vector3iVector = _vec

        vis = types.ModuleType("open3d.visualization")
        vis.gui, vis.rendering = gui, rendering
        o3d = types.ModuleType("open3d")
        o3d.visualization, o3d.geometry, o3d.utility = vis, geometry, utility
        return {"open3d": o3d, "open3d.visualization": vis,
                "open3d.visualization.gui": gui,
                "open3d.visualization.rendering": rendering}

    def test_panel_render_control_and_finish(self, monkeypatch):
        import queue as q

        for name, mod in self._fake_open3d().items():
            monkeypatch.setitem(sys.modules, name, mod)
        from pin_slam_tpu.gui.gui_utils import ParamsGUI, VisPacket
        from pin_slam_tpu.gui.o3d_gui import _O3DViewer

        q_m2v, q_v2m = q.Queue(), q.Queue()
        params = ParamsGUI(q_main2vis=q_m2v, q_vis2main=q_v2m,
                           mesh_default_on=True)
        v = _O3DViewer(params)

        # panel wiring: 6 checkboxes, 3 sliders (each with a label), stats
        kids = v.panel.children
        n_cb = sum(1 for c in kids if hasattr(c, "on_checked"))
        n_sl = sum(1 for c in kids if hasattr(c, "on_value"))
        assert n_cb == 6 and n_sl == 3
        assert v.cb_mesh.checked is True  # mesh_default_on

        # checkbox callback -> ControlPacket push
        v.cb_pause.on_checked(True)
        cp = q_v2m.get_nowait()
        assert cp.flag_pause is True
        # slider callback -> ControlPacket field
        sliders = [c for c in kids if hasattr(c, "on_value")]
        sliders[0].on_value(0.42)
        cp = q_v2m.get_nowait()
        assert abs(cp.mc_res_m - 0.42) < 1e-9

        # render a full packet through the tick path
        pkt = VisPacket(frame_id=3, cur_fps=7.5,
                        current_pointcloud_xyz=np.random.rand(40, 3),
                        mesh_verts=np.random.rand(9, 3),
                        mesh_faces=np.arange(9).reshape(3, 3),
                        slam_poses=np.stack([np.eye(4)] * 5))
        pkt.add_traj(slam_poses=np.stack([np.eye(4)] * 5),
                     loop_edges=[(0, 4)])
        pkt.add_neural_points_data(np.random.rand(64, 3),
                                   count=64, map_memory_mb=1.5,
                                   pca_color_on=False)
        pkt.add_sdf_slice(np.random.rand(16, 3), np.random.rand(16, 3))
        v.cb_sdf.checked = True
        v.cb_np.checked = True
        q_m2v.put(pkt)
        assert v._on_tick() is True
        geoms = v.widget3d.scene.geoms
        for name in (v.NP_NAME, v.SCAN_NAME, v.MESH_NAME, v.SDF_NAME,
                     v.TRAJ_NAME, v.LOOP_NAME):
            assert name in geoms, name
        assert "frame 3" in v.stats.text and "64 neural points" in v.stats.text

        # unchecking removes the geometry on the next packet
        v.cb_mesh.checked = False
        v.cb_scan.checked = False
        q_m2v.put(pkt)
        assert v._on_tick() is True
        assert v.MESH_NAME not in geoms and v.SCAN_NAME not in geoms

        # finish packet quits the app
        q_m2v.put(VisPacket(finish=True))
        assert v._on_tick() is False
        assert v.gui.Application.instance.quit_called


class TestOffscreenRenderer:
    """OffscreenPacketRenderer wiring (mocked open3d; the real-open3d run
    is scripts/smoke_o3d_offscreen.py inside the Docker image)."""

    def _fake_open3d_offscreen(self, written):
        base = TestO3DViewerMocked()._fake_open3d()
        import types

        rendering = base["open3d.visualization.rendering"]
        Scene = rendering.Open3DScene

        class _BBox:
            def get_center(self):
                return np.array([5.0, 5.0, 1.0])

            def get_extent(self):
                return np.array([10.0, 10.0, 3.0])

        class _Camera:
            def look_at(self, center, eye, up):
                self.args = (center, eye, up)

        class OffscreenRenderer:
            def __init__(self, w, h):
                self.w, self.h = w, h
                self.scene = Scene(None)
                self.scene.bounding_box = _BBox()
                self.scene.camera = _Camera()

            def render_to_image(self):
                img = np.zeros((self.h, self.w, 3), np.uint8)
                img[::2] = 200   # non-uniform
                return img

        rendering.OffscreenRenderer = OffscreenRenderer
        io_mod = types.ModuleType("open3d.io")

        def write_image(path, img):
            written.append((path, np.asarray(img)))
        io_mod.write_image = write_image
        base["open3d"].io = io_mod
        base["open3d.io"] = io_mod
        return base

    def test_offscreen_populate_and_render(self, monkeypatch, tmp_path):
        written = []
        for name, mod in self._fake_open3d_offscreen(written).items():
            monkeypatch.setitem(sys.modules, name, mod)
        import importlib
        import scripts.smoke_o3d_offscreen as smoke
        from pin_slam_tpu.gui.o3d_gui import OffscreenPacketRenderer

        pkt = smoke.build_packet()
        r = OffscreenPacketRenderer(320, 200)
        out = str(tmp_path / "render.png")
        img = r.render_to_png(pkt, out)
        for name in (r.NP_NAME, r.SCAN_NAME, r.MESH_NAME, r.SDF_NAME,
                     r.TRAJ_NAME, r.LOOP_NAME):
            assert r.scene.has_geometry(name), name
        assert written and written[0][0] == out
        assert img.shape == (200, 320, 3)
        # camera was aimed at the scene bbox center
        c, eye, up = r.scene.camera.args
        np.testing.assert_allclose(c, [5.0, 5.0, 1.0])
        assert up == [0.0, 0.0, 1.0]

    def test_real_open3d_smoke(self, tmp_path, monkeypatch):
        """Runs only where open3d is genuinely installed (Docker image)."""
        pytest.importorskip("open3d")
        import scripts.smoke_o3d_offscreen as smoke
        monkeypatch.setenv("SMOKE_OUT", str(tmp_path / "smoke.png"))
        assert smoke.main() == 0
