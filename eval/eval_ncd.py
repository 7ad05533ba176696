#!/usr/bin/env python3
"""Newer College benchmark driver (reference: eval/eval_ncd.ipynb driver
cell): sequences 01-02 with run_ncd.yaml, aggregated pose metrics.

    python eval/eval_ncd.py --root <ncd-root> [--seqs 01 02]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pin_slam_tpu.run import run_pin_slam  # noqa: E402
from pin_slam_tpu.utils.eval_traj import mean_metrics  # noqa: E402

DEFAULT_SEQS = ["01", "02"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default=None,
                   help="NCD root (overrides the config shortcut path)")
    p.add_argument("--config", default="config/lidar_slam/run_ncd.yaml")
    p.add_argument("--seqs", nargs="*", default=DEFAULT_SEQS)
    p.add_argument("--out", default="eval/ncd_results.json")
    a = p.parse_args()

    results = {}
    for seq in a.seqs:
        print(f"=== NCD {seq} ===")
        kwargs = {}
        if a.root:
            kwargs["input_path"] = os.path.join(a.root, seq, "ply")
        metrics = run_pin_slam(a.config, "ncd", seq, **kwargs)
        results[seq] = metrics
        print(seq, metrics)

    results["mean"] = mean_metrics([m for m in results.values() if m])
    with open(a.out, "w") as f:
        json.dump(results, f, indent=2)
    print("mean:", results["mean"])


if __name__ == "__main__":
    main()
