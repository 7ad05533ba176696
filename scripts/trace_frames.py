#!/usr/bin/env python3
"""Device-timeline trace of the bench workload: run a few steady-state
frames under jax.profiler.trace and print per-program device time.

    python scripts/trace_frames.py [--frames 16] [--trace-from 12]

Parses the xplane proto directly (tensorboard_plugin_profile) so no
TensorBoard UI is needed; prints the median device-time per dispatched
program across the traced frames. This is the ground truth the in-jit
fori_loop timings understate (XLA DCE's side outputs) — see CLAUDE.md.
"""

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def run(n_frames: int, trace_from: int, trace_dir: str):
    import jax
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_frames
    from pin_slam_tpu.config import Config
    from pin_slam_tpu.slam.system import PinSLAMSystem

    frames, poses = build_frames(
        max(n_frames, 40), n_az=1800, n_el=64,
        cache=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".bench_frames.npz"))

    cfg = Config()
    cfg.track_on = True
    cfg.max_range = 80.0
    cfg.min_range = 0.5
    cfg.vox_down_m = 0.08
    cfg.source_vox_down_m = 0.6
    cfg.voxel_size_m = 0.4
    cfg.sigma_sigmoid_m = 0.08
    cfg.surface_sample_range_m = 0.25
    cfg.surface_sample_n = 4
    cfg.loss_weight_on = True
    cfg.bs = 16384
    cfg.iters = 12
    cfg.init_iter_ratio = 30
    cfg.bs_new_sample = 1000
    cfg.reg_iter_n = 100
    cfg.map_capacity = 1 << 20
    cfg.buffer_size = 1 << 23
    cfg.frame_point_cap = 1 << 17
    cfg.source_point_cap = 1 << 14
    cfg.max_frames = 256
    cfg.local_set_cap = 1 << 16
    cfg.finalize()
    cfg.pool_capacity = 12_000_000

    system = PinSLAMSystem(cfg)
    system.set_gt_poses(poses)

    for fid in range(n_frames):
        if fid == trace_from:
            jax.block_until_ready(system.params["geo_features"])
            jax.profiler.start_trace(trace_dir)
        system.process_frame(fid, frames[fid])
        print(f"frame {fid} done", file=sys.stderr)
    jax.block_until_ready(system.params["geo_features"])
    jax.profiler.stop_trace()


def parse(trace_dir: str, ops_of: str = ""):
    """Parse the trace-events JSON (vm.trace.json.gz): aggregate device
    time per jitted program (XLA Modules row), and optionally per-op
    within one program (--ops <program-prefix>)."""
    import gzip
    import json

    paths = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace json found", file=sys.stderr)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # map (pid, tid) -> thread name
    tnames = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tnames[(ev["pid"], ev["tid"])] = ev["args"]["name"]

    per_prog = defaultdict(list)
    per_op = defaultdict(float)
    t_lo = t_hi = None
    prog_windows = []   # (t0, t1) of every instance of the --ops program
    op_events = []      # (t0, name, dur) of XLA Ops rows, matched after
    for ev in events:
        if ev.get("ph") != "X":
            continue
        tn = tnames.get((ev.get("pid"), ev.get("tid")), "")
        dur_ms = ev.get("dur", 0) / 1e3
        if "XLA Modules" in tn:
            name = ev["name"].split(".")[0].split("(")[0]
            per_prog[name].append(dur_ms)
            t0 = ev["ts"]
            t_lo = t0 if t_lo is None else min(t_lo, t0)
            t_hi = t0 + ev.get("dur", 0) if t_hi is None else max(
                t_hi, t0 + ev.get("dur", 0))
            if ops_of and name.startswith(ops_of):
                prog_windows.append((t0, t0 + ev.get("dur", 0)))
        elif ops_of and "XLA Ops" in tn:
            op_events.append((ev["ts"], ev["name"], dur_ms))
    per_op_in_while = defaultdict(float)
    if ops_of:
        # attribute ops to the target program by timestamp containment,
        # and further split by containment in a `while` op (the scan/GN
        # loop body) vs the program's fixed prolog/epilog
        prog_windows.sort()
        import bisect
        starts = [w[0] for w in prog_windows]
        while_windows = sorted(
            (ts, ts + dur_ms * 1e3) for ts, name, dur_ms in op_events
            if name.split(".")[0] == "while")
        wstarts = [w[0] for w in while_windows]

        def inside(ts, ws, wins):
            i = bisect.bisect_right(ws, ts) - 1
            return i >= 0 and ts < wins[i][1]

        for ts, name, dur_ms in op_events:
            if not inside(ts, starts, prog_windows):
                continue
            if name.split(".")[0] != "while" and inside(
                    ts, wstarts, while_windows):
                per_op_in_while[name.split(".")[0]] += dur_ms
            else:
                per_op[name.split(".")[0]] += dur_ms
    total = sum(sum(v) for v in per_prog.values())
    span = ((t_hi - t_lo) / 1e3) if t_hi else 0.0
    print(f"window {span:.1f} ms, device busy {total:.1f} ms "
          f"({100*total/max(span, 1e-9):.0f}%)")
    rows = sorted(((sum(d), len(d), float(np.median(d)), n)
                   for n, d in per_prog.items()), reverse=True)
    for s, n, med, name in rows:
        print(f"  {s:8.1f} ms total  n={n:3d}  med={med:7.2f} ms  {name}")
    if ops_of:
        print(f"== op aggregate inside '{ops_of}*' OUTSIDE while, top 40")
        for name, s in sorted(per_op.items(), key=lambda kv: -kv[1])[:40]:
            print(f"  {s:8.1f} ms  {name}")
        print(f"== op aggregate inside '{ops_of}*' INSIDE while, top 40")
        for name, s in sorted(per_op_in_while.items(),
                              key=lambda kv: -kv[1])[:40]:
            print(f"  {s:8.1f} ms  {name}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--trace-from", type=int, default=12)
    p.add_argument("--dir", default="/tmp/pin_trace")
    p.add_argument("--parse-only", action="store_true")
    p.add_argument("--ops", default="")
    a = p.parse_args()
    if not a.parse_only:
        run(a.frames, a.trace_from, a.dir)
    parse(a.dir, a.ops)
