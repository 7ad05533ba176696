"""New-loader tests on synthetic on-disk fixtures (kitti360, kitti_mot,
nuscenes, KITTI colorization) — loaders are pure NumPy host code."""

import json
import os

import numpy as np
import pytest


def _scan(n=300, seed=0):
    r = np.random.RandomState(seed)
    pts = r.randn(n, 3).astype(np.float32) * 5 + np.array([8, 0, 0])
    return np.hstack([pts, r.rand(n, 1).astype(np.float32)])


class TestKitti360:
    def test_load(self, tmp_path):
        seq = "2013_05_28_drive_0000_sync"
        lidar = tmp_path / "data_3d_raw" / seq / "velodyne_points" / "data"
        lidar.mkdir(parents=True)
        for i in range(3):
            _scan(seed=i).tofile(str(lidar / f"{i:010d}.bin"))
        calib = tmp_path / "calibration"
        calib.mkdir()
        np.savetxt(str(calib / "calib_cam_to_velo.txt"),
                   np.hstack([np.eye(3), np.array([[0.3], [0], [0.1]])])
                   .reshape(1, -1))
        (calib / "perspective.txt").write_text(
            "P_rect_00: 552.554261 0 682.049453 0 0 552.554261 238.769549 0"
            " 0 0 1 0\n"
            "R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        oxts = tmp_path / "data_poses" / seq / "oxts" / "data"
        oxts.mkdir(parents=True)
        for i in range(3):
            row = np.zeros(30)
            row[0] = 48.9 + i * 1e-6   # lat
            row[1] = 8.4               # lon
            row[2] = 110.0             # alt
            np.savetxt(str(oxts / f"{i:010d}.txt"), row.reshape(1, -1))

        from pin_slam_tpu.dataset.dataloaders.kitti360 import KITTI360Dataset
        ds = KITTI360Dataset(tmp_path, "0")
        assert len(ds) == 3
        d = ds[0]
        assert d["points"].shape[1] == 3
        assert d["point_ts"].shape[0] == d["points"].shape[0]
        assert ds.gt_poses is not None and ds.gt_poses.shape == (3, 4, 4)
        # northward lat increase -> nonzero translation between frames
        assert np.linalg.norm(ds.gt_poses[2][:3, 3]
                              - ds.gt_poses[0][:3, 3]) > 0.01


class TestKittiMot:
    def test_load(self, tmp_path):
        seq = "0003"
        vel = tmp_path / "data_tracking_velodyne" / "training" / "velodyne" \
            / seq
        vel.mkdir(parents=True)
        for i in range(2):
            _scan(seed=i).tofile(str(vel / f"{i:06d}.bin"))
        calib_dir = tmp_path / "data_tracking_calib" / "training" / "calib"
        calib_dir.mkdir(parents=True)
        (calib_dir / f"{seq}.txt").write_text(
            "P2: 721.5 0 609.5 44.85 0 721.5 172.8 0.21 0 0 1 0.002\n"
            "R_rect 1 0 0 0 1 0 0 0 1\n"
            "Tr_velo_cam 0 -1 0 0 0 0 -1 0 1 0 0 0\n"
            "Tr_imu_velo 1 0 0 -0.8 0 1 0 0.3 0 0 1 -0.65\n")
        oxts_dir = tmp_path / "data_tracking_oxts" / "training" / "oxts"
        oxts_dir.mkdir(parents=True)
        rows = np.zeros((2, 30))
        rows[:, 0] = [49.01, 49.0100001]
        rows[:, 1] = 8.43
        np.savetxt(str(oxts_dir / f"{seq}.txt"), rows)

        from pin_slam_tpu.dataset.dataloaders.kitti_mot import KITTIMOTDataset
        ds = KITTIMOTDataset(tmp_path, "3")
        assert len(ds) == 2
        d = ds[0]
        assert d["points"].shape[1] == 3
        assert ds.gt_poses is not None and ds.gt_poses.shape == (2, 4, 4)


class TestNuScenes:
    def test_load(self, tmp_path):
        meta = tmp_path / "v1.0-mini"
        meta.mkdir()
        lid_dir = tmp_path / "samples" / "LIDAR_TOP"
        lid_dir.mkdir(parents=True)
        n_frames = 3
        samples, sdata, egop, calibs = [], [], [], []
        for i in range(n_frames):
            fn = f"samples/LIDAR_TOP/frame{i}.pcd.bin"
            r = np.random.RandomState(i)
            arr = r.randn(200, 5).astype(np.float32)
            arr.tofile(str(tmp_path / fn))
            samples.append({
                "token": f"s{i}",
                "next": f"s{i + 1}" if i + 1 < n_frames else "",
                "prev": f"s{i - 1}" if i else "",
            })
            sdata.append({
                "token": f"d{i}", "sample_token": f"s{i}",
                "is_key_frame": True, "filename": fn,
                "ego_pose_token": f"e{i}",
                "calibrated_sensor_token": "c0",
            })
            egop.append({"token": f"e{i}",
                         "rotation": [1.0, 0.0, 0.0, 0.0],
                         "translation": [float(i), 0.0, 0.0]})
        calibs.append({"token": "c0", "rotation": [1.0, 0.0, 0.0, 0.0],
                       "translation": [0.9, 0.0, 1.8]})
        scene = [{"token": "sc0", "name": "scene-0001",
                  "first_sample_token": "s0"}]
        for name, obj in (("scene", scene), ("sample", samples),
                          ("sample_data", sdata), ("ego_pose", egop),
                          ("calibrated_sensor", calibs)):
            (meta / f"{name}.json").write_text(json.dumps(obj))

        from pin_slam_tpu.dataset.dataloaders.nuscenes import NuScenesDataset
        ds = NuScenesDataset(tmp_path, "0")
        assert len(ds) == 3
        d = ds[1]
        assert d["points"].shape == (200, 3)
        # ego moved 1m in x per frame; poses are lidar-frame relative
        assert abs(np.linalg.norm(
            ds.gt_poses[1][:3, 3] - ds.gt_poses[0][:3, 3]) - 1.0) < 1e-6
        # by name too
        ds2 = NuScenesDataset(tmp_path, "scene-0001")
        assert len(ds2) == 3


class TestKittiColorize:
    def test_projection(self, tmp_path):
        from pin_slam_tpu.dataset.dataloaders.colorize import (
            project_points_to_cam, project_points_with_P)

        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        img = np.zeros((480, 640, 3))
        img[:, :, 0] = 1.0  # red
        T = np.eye(4)  # camera == lidar, z forward
        pts = np.array([[0.0, 0.0, 5.0],      # center, in front
                        [0.0, 0.0, -5.0]])    # behind
        colors, has = project_points_to_cam(pts, img, T, K)
        assert has[0] and not has[1]
        np.testing.assert_allclose(colors[0], [1.0, 0.0, 0.0])
        P = np.hstack([K, np.zeros((3, 1))])
        colors2, has2 = project_points_with_P(pts, img, P)
        assert has2[0] and not has2[1]


class TestRosbag1:
    """Pure-Python ROS1 bag reader/writer round-trip + the rosbag
    dataloader (reference surface: dataset/dataloaders/rosbag.py)."""

    def _clouds(self, n_frames=4, n=500, seed=0):
        rng = np.random.RandomState(seed)
        out = []
        for k in range(n_frames):
            pts = rng.randn(n, 3).astype(np.float32) * 5 + k
            ts = np.linspace(0, 0.1, n).astype(np.float32)
            out.append((pts, ts))
        return out

    @pytest.mark.parametrize("comp", ["none", "bz2"])
    def test_roundtrip(self, tmp_path, comp):
        from pin_slam_tpu.dataset.rosbag1 import Bag1Reader, write_bag1
        from pin_slam_tpu.dataset.dataloaders.rosbag import RosbagDataset
        clouds = self._clouds()
        path = str(tmp_path / f"seq_{comp}.bag")
        write_bag1(path, clouds, topic="/os/points", compression=comp)

        r = Bag1Reader(path)
        assert r.topics() == {"/os/points": ("sensor_msgs/PointCloud2", 4)}

        ds = RosbagDataset(path)
        assert len(ds) == 4
        for k in range(4):
            fd = ds[k]
            np.testing.assert_allclose(fd["points"], clouds[k][0],
                                       atol=1e-6)
            assert fd["point_ts"] is not None
            np.testing.assert_allclose(
                fd["point_ts"], np.linspace(0, 1, 500), atol=1e-4)
        assert ds.get_frames_timestamps() == [0.0, 0.1, 0.2,
                                              pytest.approx(0.3)]

    def test_split_bags_merged_in_time_order(self, tmp_path):
        from pin_slam_tpu.dataset.rosbag1 import write_bag1
        from pin_slam_tpu.dataset.dataloaders.rosbag import RosbagDataset
        clouds = self._clouds(6)
        # interleave frames across two bags; hz encodes time = k/10
        import pin_slam_tpu.dataset.rosbag1 as rb
        import struct

        def write_subset(path, idxs):
            # write with explicit times by monkey-free custom loop
            write_bag1(path, [clouds[i] for i in idxs], hz=10.0)

        # write_bag1 stamps sequentially; emulate split by even/odd with
        # correct global order via filenames (merged by timestamp within
        # each bag, then across)
        write_subset(str(tmp_path / "a.bag"), [0, 1, 2])
        write_subset(str(tmp_path / "b.bag"), [3, 4, 5])
        ds = RosbagDataset(str(tmp_path))
        assert len(ds) == 6

    def test_topic_selection_errors(self, tmp_path):
        from pin_slam_tpu.dataset.rosbag1 import write_bag1
        from pin_slam_tpu.dataset.dataloaders.rosbag import RosbagDataset
        write_bag1(str(tmp_path / "x.bag"), self._clouds(2),
                   topic="/lidar")
        with pytest.raises(ValueError, match="not found"):
            RosbagDataset(str(tmp_path / "x.bag"), topic="/nope")
        ds = RosbagDataset(str(tmp_path / "x.bag"), topic="/lidar")
        assert len(ds) == 2

    def test_factory(self, tmp_path):
        from pin_slam_tpu.dataset.rosbag1 import write_bag1
        from pin_slam_tpu.dataset.dataloaders import dataset_factory
        write_bag1(str(tmp_path / "f.bag"), self._clouds(2))
        ds = dataset_factory("rosbag", tmp_path / "f.bag")
        assert len(ds) == 2


class TestMcap:
    """Pure-Python MCAP reader round-trip in both channel encodings."""

    def _clouds(self, n_frames=3, n=400):
        rng = np.random.RandomState(2)
        return [(rng.randn(n, 3).astype(np.float32) * 4 + k,
                 np.linspace(0, 0.1, n).astype(np.float32))
                for k in range(n_frames)]

    @pytest.mark.parametrize("enc", ["cdr", "ros1"])
    def test_roundtrip(self, tmp_path, enc):
        from pin_slam_tpu.dataset.mcap1 import McapReader, write_mcap
        from pin_slam_tpu.dataset.dataloaders.mcap import McapDataloader
        clouds = self._clouds()
        path = str(tmp_path / f"seq_{enc}.mcap")
        write_mcap(path, clouds, topic="/os/points", encoding=enc)

        r = McapReader(path)
        tps = r.topics()
        assert "/os/points" in tps and tps["/os/points"][2] == 3

        ds = McapDataloader(path)
        assert len(ds) == 3
        for k in range(3):
            fd = ds[k]
            np.testing.assert_allclose(fd["points"], clouds[k][0],
                                       atol=1e-6)
            np.testing.assert_allclose(
                fd["point_ts"], np.linspace(0, 1, 400), atol=1e-4)

    def test_factory_and_topic_error(self, tmp_path):
        from pin_slam_tpu.dataset.mcap1 import write_mcap
        from pin_slam_tpu.dataset.dataloaders import dataset_factory
        path = str(tmp_path / "f.mcap")
        write_mcap(path, self._clouds(2))
        ds = dataset_factory("mcap", path)
        assert len(ds) == 2
        with pytest.raises(ValueError, match="not found"):
            dataset_factory("mcap", path, "/wrong")


# --------------------------------------------------------------------- ouster


def _write_pcap(path, datagrams, fragment_mtu=None, pcapng=False,
                dport=7502):
    """Encode UDP datagrams into a classic pcap (or minimal pcapng) file.
    With `fragment_mtu`, IPv4-fragment each datagram at that payload size."""
    import struct

    def eth_ip_udp_frames(payload, ident):
        udp = struct.pack(">HHHH", 12345, dport, 8 + len(payload), 0) \
            + payload
        if fragment_mtu is None or len(udp) <= fragment_mtu:
            chunks = [(0, udp, False)]
        else:
            chunks = []
            off = 0
            while off < len(udp):
                n = min(fragment_mtu, len(udp) - off)
                n = n if off + n >= len(udp) else (n // 8) * 8
                chunks.append((off, udp[off: off + n],
                               off + n < len(udp)))
                off += n
        frames = []
        for off, chunk, more in chunks:
            flags_frag = (0x2000 if more else 0) | (off // 8)
            ip = struct.pack(">BBHHHBBH4s4s", 0x45, 0, 20 + len(chunk),
                             ident, flags_frag, 64, 17, 0,
                             b"\x0a\x00\x00\x01", b"\x0a\x00\x00\x02")
            frames.append(b"\x02" * 6 + b"\x04" * 6 +
                          struct.pack(">H", 0x0800) + ip + chunk)
        return frames

    frames = []
    for i, payload in enumerate(datagrams):
        frames.extend(eth_ip_udp_frames(payload, ident=i + 1))

    with open(path, "wb") as f:
        if not pcapng:
            f.write(struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0,
                                1 << 22, 1))
            for fr in frames:
                f.write(struct.pack("<IIII", 0, 0, len(fr), len(fr)))
                f.write(fr)
        else:
            shb = struct.pack("<IIIHHq", 0x0A0D0D0A, 28, 0x1A2B3C4D,
                              1, 0, -1)
            f.write(shb + struct.pack("<I", 28))
            idb = struct.pack("<IIHHI", 1, 20, 1, 0, 1 << 22)
            f.write(idb + struct.pack("<I", 20))
            for fr in frames:
                pad = (4 - len(fr) % 4) % 4
                blen = 32 + len(fr) + pad
                f.write(struct.pack("<IIIIII", 6, blen, 0, 0, 0,
                                    len(fr))[:24])
                f.write(struct.pack("<I", len(fr)))
                f.write(fr + b"\x00" * pad)
                f.write(struct.pack("<I", blen))


class TestOuster:
    H, W, CPP = 16, 64, 16

    def _ranges(self, seed=0):
        rng = np.random.RandomState(seed)
        # mm-exact ranges 5..25 m
        return np.round(
            (5.0 + 20.0 * rng.rand(self.H, self.W)) * 1000.0) / 1000.0

    def _metadata(self, tmp_path, profile):
        alt = np.linspace(15.0, -15.0, self.H)
        az = np.linspace(-1.5, 1.5, self.H)
        if profile == "LEGACY":
            meta = {
                "beam_altitude_angles": alt.tolist(),
                "beam_azimuth_angles": az.tolist(),
                "lidar_origin_to_beam_origin_mm": 0.0,
                "lidar_to_sensor_transform":
                    np.eye(4).reshape(-1).tolist(),
                "data_format": {
                    "pixels_per_column": self.H,
                    "columns_per_frame": self.W,
                    "columns_per_packet": self.CPP,
                    "udp_profile_lidar": "LEGACY",
                },
                "udp_port_lidar": 7502,
            }
        else:
            meta = {
                "beam_intrinsics": {
                    "beam_altitude_angles": alt.tolist(),
                    "beam_azimuth_angles": az.tolist(),
                    "lidar_origin_to_beam_origin_mm": 0.0,
                },
                "lidar_intrinsics": {
                    "lidar_to_sensor_transform":
                        np.eye(4).reshape(-1).tolist()},
                "lidar_data_format": {
                    "pixels_per_column": self.H,
                    "columns_per_frame": self.W,
                    "columns_per_packet": self.CPP,
                    "udp_profile_lidar": "RNG19_RFL8_SIG16_NIR16",
                },
                "config_params": {"udp_port_lidar": 7502},
            }
        p = str(tmp_path / "rec.json")
        with open(p, "w") as fp:
            json.dump(meta, fp)
        return p

    def _encode_frames(self, ranges_per_frame, profile):
        import struct
        pkts = []
        for fid, ranges in enumerate(ranges_per_frame, start=1):
            mm = np.round(ranges * 1000.0).astype(np.uint32)
            for p0 in range(0, self.W, self.CPP):
                cols = b""
                for c in range(p0, p0 + self.CPP):
                    px = np.zeros((self.H, 3), "<u4")
                    px[:, 0] = mm[:, c]
                    if profile == "LEGACY":
                        cols += struct.pack("<QHHI", 1000 + c, c, fid, 0) \
                            + px.tobytes() \
                            + struct.pack("<I", 0xFFFFFFFF)
                    else:
                        cols += struct.pack("<QHH", 1000 + c, c, 1) \
                            + px.tobytes()
                if profile == "LEGACY":
                    pkts.append(cols)
                else:
                    hdr = struct.pack("<HH", 1, fid) + b"\x00" * 28
                    pkts.append(hdr + cols)
        return pkts

    @pytest.mark.parametrize("profile", ["LEGACY", "RNG19"])
    def test_roundtrip_projection(self, tmp_path, profile):
        from pin_slam_tpu.dataset.dataloaders.ouster import OusterDataloader

        frames = [self._ranges(0), self._ranges(1)]
        pcap = str(tmp_path / "rec.pcap")
        _write_pcap(pcap, self._encode_frames(frames, profile))
        meta = self._metadata(tmp_path, profile)

        ds = OusterDataloader(pcap, meta=meta)
        assert len(ds) == 2
        alt = np.linspace(15.0, -15.0, self.H)
        for k in range(2):
            fd = ds[k]
            pts, ts = fd["points"], fd["point_ts"]
            assert pts.shape == (self.H * self.W, 3)
            # identity lidar_to_sensor + n=0: |p| == encoded range (mm exact)
            r = np.linalg.norm(pts, axis=1).reshape(self.H, self.W)
            np.testing.assert_allclose(r, frames[k], atol=2e-3)
            # altitude angle rows: z = r*sin(phi)
            z = pts[:, 2].reshape(self.H, self.W)
            np.testing.assert_allclose(
                z, frames[k] * np.sin(np.radians(alt))[:, None], atol=5e-3)
            assert ts.min() >= 0.0 and ts.max() < 1.0

    def test_fragmented_and_pcapng(self, tmp_path):
        from pin_slam_tpu.dataset.dataloaders.ouster import OusterDataloader

        frames = [self._ranges(2)]
        pkts = self._encode_frames(frames, "LEGACY")
        meta = self._metadata(tmp_path, "LEGACY")

        frag = str(tmp_path / "frag.pcap")
        _write_pcap(frag, pkts, fragment_mtu=1400)
        ds = OusterDataloader(frag, meta=meta)
        assert len(ds) == 1
        r = np.linalg.norm(ds[0]["points"], axis=1).reshape(self.H, self.W)
        np.testing.assert_allclose(r, frames[0], atol=2e-3)

        ng = str(tmp_path / "rec.pcapng")
        _write_pcap(ng, pkts, pcapng=True)
        ds2 = OusterDataloader(ng, meta=meta)
        assert len(ds2) == 1
        r2 = np.linalg.norm(ds2[0]["points"], axis=1).reshape(self.H, self.W)
        np.testing.assert_allclose(r2, frames[0], atol=2e-3)

    def test_factory_and_meta_discovery(self, tmp_path):
        from pin_slam_tpu.dataset.dataloaders import dataset_factory

        frames = [self._ranges(3)]
        pcap = str(tmp_path / "rec.pcap")
        _write_pcap(pcap, self._encode_frames(frames, "LEGACY"))
        self._metadata(tmp_path, "LEGACY")  # rec.json next to rec.pcap
        ds = dataset_factory("ouster", pcap)
        assert len(ds) == 1
        assert ds.get_frames_timestamps().shape == (1,)


class TestKittiRaw:
    def _fixture(self, tmp_path, n=3):
        date = "2011_09_30"
        drive = f"{date}_drive_0016_sync"          # odometry seq 04
        vel = tmp_path / date / drive / "velodyne_points" / "data"
        vel.mkdir(parents=True)
        for i in range(n):
            _scan(seed=i).tofile(str(vel / f"{i:010d}.bin"))
        oxts = tmp_path / date / drive / "oxts" / "data"
        oxts.mkdir(parents=True)
        for i in range(n):
            row = np.zeros(30)
            row[0] = 49.0 + i * 1e-5       # lat: drive north ~1.1 m/frame
            row[1] = 8.43                  # lon
            row[2] = 110.0                 # alt
            row[5] = 0.3                   # yaw
            row[8:11] = [5.0, 0.1, 0.0]    # vf, vl, vu
            row[20:23] = [0.0, 0.0, 0.02]  # wf, wl, wu
            np.savetxt(str(oxts / f"{i:010d}.txt"), row.reshape(1, -1))
        # imu->velo calib: 90deg yaw + offset
        (tmp_path / date / "calib_imu_to_velo.txt").write_text(
            "calib_time: 01-Jan-2000 00:00:00\n"
            "R: 0 -1 0 1 0 0 0 0 1\n"
            "T: -0.8 0.3 0.8\n")
        return tmp_path

    def test_load(self, tmp_path):
        from pin_slam_tpu.dataset.dataloaders.kitti_raw import KITTIRawDataset
        root = self._fixture(tmp_path)
        ds = KITTIRawDataset(root, "4")
        assert len(ds) == 3
        d = ds[0]
        assert d["points"].shape[1] == 3
        assert d["point_ts"].shape[0] == d["points"].shape[0]
        assert (d["point_ts"] >= 0).all() and (d["point_ts"] <= 1).all()
        # gt: identity first pose, ~1.1 m/frame northward motion expressed in
        # the velodyne frame
        assert ds.gt_poses.shape == (3, 4, 4)
        np.testing.assert_allclose(ds.gt_poses[0], np.eye(4), atol=1e-9)
        step = np.linalg.norm(ds.gt_poses[1][:3, 3])
        assert 0.9 < step < 1.4
        # oxts velocities surface
        lin, ang = ds.get_velocities(1)
        np.testing.assert_allclose(lin, [5.0, 0.1, 0.0])
        np.testing.assert_allclose(ang, [0.0, 0.0, 0.02])

    def test_gt_consistent_with_imu_track(self, tmp_path):
        # velodyne-frame inter-pose distance must equal imu-frame distance
        # (rigid conjugation preserves step length)
        from pin_slam_tpu.dataset.dataloaders.colorize import oxts_to_poses
        from pin_slam_tpu.dataset.dataloaders.kitti_raw import KITTIRawDataset
        root = self._fixture(tmp_path)
        ds = KITTIRawDataset(root, "04")
        rows = ds.oxts[:, :6]
        imu = oxts_to_poses(rows)
        d_imu = np.linalg.norm(imu[2][:3, 3] - imu[1][:3, 3])
        d_velo = np.linalg.norm(ds.gt_poses[2][:3, 3] - ds.gt_poses[1][:3, 3])
        np.testing.assert_allclose(d_velo, d_imu, rtol=1e-9)

    def test_unknown_sequence(self, tmp_path):
        from pin_slam_tpu.dataset.dataloaders.kitti_raw import KITTIRawDataset
        with pytest.raises(ValueError):
            KITTIRawDataset(tmp_path, "03")

    def test_factory(self, tmp_path):
        from pin_slam_tpu.dataset.dataloaders import dataset_factory
        ds = dataset_factory("kitti_raw", self._fixture(tmp_path), "04")
        assert len(ds) == 3


class TestApollo:
    def _fixture(self, tmp_path, n=3):
        pcds = tmp_path / "pcds"
        pcds.mkdir()
        rng = np.random.RandomState(0)
        # names 1..10 etc. exercise natural sorting (2.pcd before 10.pcd)
        names = ["1.pcd", "2.pcd", "10.pcd"][:n]
        self.first_pts = None
        for i, name in enumerate(names):
            pts = rng.randn(50, 3) + i * 10.0
            if i == 0:
                self.first_pts = pts.copy()
            hdr = ("# .PCD v0.7\nVERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\n"
                   "TYPE F F F\nCOUNT 1 1 1\nWIDTH 50\nHEIGHT 1\n"
                   "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS 50\nDATA binary\n")
            with open(pcds / name, "wb") as f:
                f.write(hdr.encode())
                f.write(pts.astype("<f4").tobytes())
        poses = tmp_path / "poses"
        poses.mkdir()
        rows = []
        for i in range(n):
            # idx ts x y z qx qy qz qw ; 90deg yaw at i=1
            q = [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)] if i == 1 \
                else [0, 0, 0, 1]
            rows.append([i, 1e9 + i * 0.1, 2.0 * i, 1.0, 0.5] + q)
        np.savetxt(str(poses / "gt_poses.txt"), np.array(rows))
        return tmp_path

    def test_load(self, tmp_path):
        from pin_slam_tpu.dataset.dataloaders.apollo import ApolloDataset
        ds = ApolloDataset(self._fixture(tmp_path))
        assert len(ds) == 3
        # natural order: 1.pcd, 2.pcd, 10.pcd — frame 0 holds first_pts
        np.testing.assert_allclose(ds[0]["points"], self.first_pts, atol=1e-6)
        # mean offset by +10/frame confirms order (2.pcd, not 10.pcd, second)
        assert abs(ds[1]["points"].mean() - 10.0) < 1.0
        assert abs(ds[2]["points"].mean() - 20.0) < 1.0
        d = ds[1]
        assert (d["point_ts"] >= 0).all() and (d["point_ts"] <= 1).all()
        # poses: first normalized to identity; quaternion yaw survives
        np.testing.assert_allclose(ds.gt_poses[0], np.eye(4), atol=1e-12)
        np.testing.assert_allclose(ds.gt_poses[1][:3, 3], [2.0, 0.0, 0.0],
                                   atol=1e-12)
        R1 = ds.gt_poses[1][:3, :3]
        np.testing.assert_allclose(R1 @ np.array([1, 0, 0]), [0, 1, 0],
                                   atol=1e-9)

    def test_factory(self, tmp_path):
        from pin_slam_tpu.dataset.dataloaders import dataset_factory
        ds = dataset_factory("apollo", self._fixture(tmp_path))
        assert len(ds) == 3


class TestParisLuco:
    def _fixture(self, tmp_path, n=2):
        frames = tmp_path / "frames"
        frames.mkdir()
        rng = np.random.RandomState(3)
        for i in range(n):
            pts = rng.randn(40, 3).astype("<f4")
            ts = np.linspace(0.0, 0.099, 40).astype("<f8")
            hdr = ("ply\nformat binary_little_endian 1.0\n"
                   "element vertex 40\n"
                   "property float x\nproperty float y\nproperty float z\n"
                   "property double timestamp\nend_header\n")
            rec = np.zeros(40, dtype=[("x", "<f4"), ("y", "<f4"),
                                      ("z", "<f4"), ("timestamp", "<f8")])
            rec["x"], rec["y"], rec["z"] = pts[:, 0], pts[:, 1], pts[:, 2]
            rec["timestamp"] = ts
            with open(frames / f"frame_{i:04d}.ply", "wb") as f:
                f.write(hdr.encode())
                f.write(rec.tobytes())
        np.savetxt(str(tmp_path / "gt_traj_lidar.txt"),
                   np.array([[0.0, 0.0, 0.0], [1.5, 0.5, 0.0]][:n]))
        return tmp_path

    def test_load(self, tmp_path):
        from pin_slam_tpu.dataset.dataloaders.paris_luco import (
            ParisLucoDataset)
        ds = ParisLucoDataset(self._fixture(tmp_path))
        assert len(ds) == 2
        d = ds[0]
        assert d["points"].shape == (40, 3)
        # timestamps normalized by their max -> last point = 1.0
        assert abs(d["point_ts"].max() - 1.0) < 1e-12
        assert d["point_ts"].min() == 0.0
        # xyz-only GT -> identity rotations
        assert ds.gt_poses.shape == (2, 4, 4)
        np.testing.assert_allclose(ds.gt_poses[1][:3, :3], np.eye(3))
        np.testing.assert_allclose(ds.gt_poses[1][:3, 3], [1.5, 0.5, 0.0])

    def test_factory(self, tmp_path):
        from pin_slam_tpu.dataset.dataloaders import dataset_factory
        ds = dataset_factory("paris_luco", self._fixture(tmp_path))
        assert len(ds) == 2
