#!/usr/bin/env python3
"""KITTI odometry benchmark driver.

Mirrors the reference eval notebook (reference: eval/eval_kitti.ipynb driver
cell): run the full SLAM pipeline per sequence via the library entry point
and aggregate the pose metrics.

    python eval/eval_kitti.py --root <kitti-root> [--seqs 00 01 ...]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pin_slam_tpu.run import run_pin_slam  # noqa: E402
from pin_slam_tpu.utils.eval_traj import mean_metrics  # noqa: E402

DEFAULT_SEQS = ["00", "01", "02", "03", "04", "05", "06", "07", "08",
                "09", "10"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="KITTI odometry root")
    p.add_argument("--config", default="config/lidar_slam/run_kitti.yaml")
    p.add_argument("--seqs", nargs="*", default=DEFAULT_SEQS)
    p.add_argument("--out", default="eval/kitti_results.json")
    a = p.parse_args()

    results = {}
    for seq in a.seqs:
        print(f"=== KITTI {seq} ===")
        metrics = run_pin_slam(
            a.config, "kitti", seq,
            input_path=os.path.join(a.root, "sequences", seq, "velodyne"))
        results[seq] = metrics
        print(seq, metrics)

    results["mean"] = mean_metrics([m for m in results.values() if m])
    with open(a.out, "w") as f:
        json.dump(results, f, indent=2)
    print("mean:", results["mean"])


if __name__ == "__main__":
    main()
