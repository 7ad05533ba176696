#!/usr/bin/env python3
"""Replica RGB-D benchmark driver (reference: eval/eval_replica.ipynb).

    python eval/eval_replica.py --root <replica-root>
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pin_slam_tpu.run import run_pin_slam  # noqa: E402
from pin_slam_tpu.utils.eval_traj import mean_metrics  # noqa: E402

SEQS = ["room0", "room1", "room2", "office0", "office1", "office2",
        "office3", "office4"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--config", default="config/rgbd_slam/run_replica.yaml")
    p.add_argument("--seqs", nargs="*", default=SEQS)
    p.add_argument("--out", default="eval/replica_results.json")
    a = p.parse_args()

    results = {}
    for seq in a.seqs:
        print(f"=== Replica {seq} ===")
        metrics = run_pin_slam(a.config, "replica", seq, input_path=a.root)
        results[seq] = metrics
        if metrics:
            print(seq, "ATE RMSE (cm):",
                  metrics["Absoulte Trajectory Error [m]"] * 100)

    results["mean"] = mean_metrics([m for m in results.values() if m])
    with open(a.out, "w") as f:
        json.dump(results, f, indent=2)
    print("mean:", results["mean"])


if __name__ == "__main__":
    main()
