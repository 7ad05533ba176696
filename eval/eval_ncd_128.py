#!/usr/bin/env python3
"""Newer College 2021 extension (NCD-128) benchmark driver (reference:
eval/eval_ncd_128.ipynb driver cell): the five sequences with their
per-sequence configs (run_ncd_128 / _m for cloister / _s for stairs),
aggregated pose metrics.

    python eval/eval_ncd_128.py --root <ncd128-root> [--seqs quad_e ...]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pin_slam_tpu.run import run_pin_slam  # noqa: E402
from pin_slam_tpu.utils.eval_traj import mean_metrics  # noqa: E402

SEQ_CONFIG = {
    "quad_e": "run_ncd_128",
    "math_e": "run_ncd_128",
    "underground_e": "run_ncd_128",
    "cloister": "run_ncd_128_m",
    "stairs": "run_ncd_128_s",
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default=None,
                   help="NCD-128 root (overrides the config shortcut path)")
    p.add_argument("--seqs", nargs="*", default=list(SEQ_CONFIG))
    p.add_argument("--out", default="eval/ncd_128_results.json")
    a = p.parse_args()

    results = {}
    for seq in a.seqs:
        cfg = os.path.join("config/lidar_slam",
                           SEQ_CONFIG.get(seq, "run_ncd_128") + ".yaml")
        print(f"=== NCD-128 {seq} ({cfg}) ===")
        kwargs = {}
        if a.root:
            kwargs["input_path"] = os.path.join(a.root, seq, "ply")
        metrics = run_pin_slam(cfg, "ncd128", seq, **kwargs)
        results[seq] = metrics
        print(seq, metrics)

    results["mean"] = mean_metrics([m for m in results.values() if m])
    with open(a.out, "w") as f:
        json.dump(results, f, indent=2)
    print("mean:", results["mean"])


if __name__ == "__main__":
    main()
