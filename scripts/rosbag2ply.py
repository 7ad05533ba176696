#!/usr/bin/env python3
"""Convert a ROS1 bag's PointCloud2 topic to per-frame PLY files using the
in-repo pure-Python bag reader (reference: scripts/rosbag2ply.py, which
needs rosbag/rospy — this version has no ROS dependency).

    python scripts/rosbag2ply.py <input.bag> <out_dir> [topic]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from pin_slam_tpu.dataset.dataloaders.rosbag import RosbagDataset  # noqa: E402
from pin_slam_tpu.dataset.io import write_ply_points  # noqa: E402


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(1)
    bag, out = sys.argv[1], sys.argv[2]
    topic = sys.argv[3] if len(sys.argv) > 3 else ""
    ds = RosbagDataset(bag, topic=topic)
    os.makedirs(out, exist_ok=True)
    for i in range(len(ds)):
        fd = ds[i]
        pts = fd["points"].astype(np.float32)
        write_ply_points(os.path.join(out, f"{i:06d}.ply"), pts)
    ts = ds.get_frames_timestamps()
    np.savetxt(os.path.join(out, "timestamps.txt"), np.asarray(ts))
    print(f"wrote {len(ds)} frames to {out}")


if __name__ == "__main__":
    main()
