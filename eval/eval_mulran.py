#!/usr/bin/env python3
"""MulRan benchmark driver (reference: eval/eval_mulran.ipynb driver cell):
run the full SLAM pipeline per sequence via the library entry point and
aggregate the pose metrics over kaist/dcc/riverside 01-03.

    python eval/eval_mulran.py --root <mulran-root> [--seqs kaist01 ...]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pin_slam_tpu.run import run_pin_slam  # noqa: E402
from pin_slam_tpu.utils.eval_traj import mean_metrics  # noqa: E402

DEFAULT_SEQS = ["kaist01", "kaist02", "kaist03", "dcc01", "dcc02", "dcc03",
                "riverside01", "riverside02", "riverside03"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default=None,
                   help="MulRan root (overrides the config shortcut path)")
    p.add_argument("--config", default="config/lidar_slam/run_mulran.yaml")
    p.add_argument("--seqs", nargs="*", default=DEFAULT_SEQS)
    p.add_argument("--out", default="eval/mulran_results.json")
    a = p.parse_args()

    results = {}
    for seq in a.seqs:
        print(f"=== MulRan {seq} ===")
        kwargs = {}
        if a.root:
            kwargs["input_path"] = os.path.join(a.root, seq, "Ouster")
        metrics = run_pin_slam(a.config, "mulran", seq, **kwargs)
        results[seq] = metrics
        print(seq, metrics)

    results["mean"] = mean_metrics([m for m in results.values() if m])
    with open(a.out, "w") as f:
        json.dump(results, f, indent=2)
    print("mean:", results["mean"])


if __name__ == "__main__":
    main()
