#!/usr/bin/env python3
"""Headline benchmark: tracking+mapping frames/sec on a KITTI-scale synthetic
LiDAR workload, run on whatever accelerator jax selects (TPU in CI).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference PIN-SLAM claims sensor-rate (10 Hz) tracking+mapping
on "a moderate GPU" (reference README.md:112-114, 100 ms/frame budget in
utils/tools.py:881). vs_baseline = ours_fps / 10.
"""

import json
import os
import sys
import time

import numpy as np


def build_frames(n_frames: int, n_az: int, n_el: int, cache: str):
    """Ray-cast (and cache) a KITTI-scale synthetic sequence."""
    from pin_slam_tpu.dataset.synthetic import (
        SyntheticSequence, circle_trajectory, default_scene,
        lidar_directions)

    if os.path.exists(cache):
        z = np.load(cache, allow_pickle=True)
        if f"f{n_frames - 1}" in z.files:
            return [z[f"f{i}"] for i in range(n_frames)], z["poses"]
        os.remove(cache)  # stale cache from a shorter BENCH_FRAMES run
    seq = SyntheticSequence(
        scene_sdf=default_scene(half_extent=(40.0, 30.0, 6.0)),
        poses=circle_trajectory(n_frames, radius=6.0,
                                revolutions=0.008 * n_frames,
                                ease_in_frames=4),
        dirs=lidar_directions(n_az, n_el),
        max_range=80.0,
    )
    frames = [seq.frame(i) for i in range(n_frames)]
    np.savez_compressed(cache, poses=seq.poses,
                        **{f"f{i}": f for i, f in enumerate(frames)})
    return frames, seq.poses


def main():
    t_start = time.time()
    from pin_slam_tpu.config import Config
    from pin_slam_tpu.slam.system import PinSLAMSystem

    import jax
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"[bench] devices: {jax.devices()}", file=sys.stderr)

    # warmup must cover every cadence program's first hit (pool filter at
    # frame 4, prune+rehash at frame 9): their cold compiles through the
    # tunnel would otherwise land inside the measured window
    # >= 3 pool-filter periods (freq 10) inside the measured window so
    # cadence programs are averaged, not sampled once
    n_frames = int(os.environ.get("BENCH_FRAMES", 40))
    warmup = 10
    # real HDL-64 density: 64 beams x 1800 azimuth steps = ~115k returns
    # per scan (a KITTI frame's raw size; the previous 900x56 bench was
    # ~50k and undersized the static caps)
    frames, poses = build_frames(
        n_frames, n_az=1800, n_el=64,
        cache=os.path.join(os.path.dirname(__file__), ".bench_frames.npz"))
    print(f"[bench] frames ready ({frames[0].shape[0]} pts/frame, "
          f"{time.time()-t_start:.0f}s)", file=sys.stderr)

    # KITTI-like configuration (reference config/lidar_slam/run_kitti.yaml)
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
    # sweepable knobs (BENCH_* env) so perf/quality trades are measurable
    # without code edits; defaults = the committed configuration
    cfg.bs = int(os.environ.get("BENCH_BS", 16384))
    cfg.iters = int(os.environ.get("BENCH_ITERS", 12))  # reference default
    cfg.init_iter_ratio = 30
    cfg.bs_new_sample = 1000
    cfg.reg_iter_n = 100
    cfg.map_capacity = 1 << 20
    cfg.buffer_size = 1 << 23
    # static capacities sized to the workload (train cloud ~90k pts after
    # the 8 cm voxel downsample at HDL-64 density, source ~13k): capacity
    # slack is pure padding work on a static-shape machine, undersizing
    # thins the scan (counted by system.cap_overflow_frames and reported
    # below — never silent)
    cfg.frame_point_cap = 1 << 17
    cfg.source_point_cap = 1 << 14
    cfg.max_frames = 256
    # local-map set capacity sized to the workload like the caps above:
    # the [cap]-sized local ops (Adam, feature gather/scatter-back,
    # certainty merge) are pure padding work beyond the actual count
    cfg.local_set_cap = 1 << 16
    cfg.finalize()
    cfg.pool_capacity = 12_000_000

    system = PinSLAMSystem(cfg)
    system.set_gt_poses(poses)

    times = []
    mapped = []
    t_steady = None
    for fid in range(n_frames):
        t0 = time.time()
        system.process_frame(
            fid, frames[fid],
            next_points=frames[fid + 1] if fid + 1 < n_frames else None)
        if fid == warmup - 1 or fid == n_frames - 1:
            # sync only at the measurement boundaries: production has ONE
            # device sync per frame (the batched pull inside the loop);
            # forcing completion every frame adds a second ~34 ms tunnel
            # completion-notification that the real pipeline never pays
            import jax as _jax
            _jax.block_until_ready(system.params["geo_features"])
            if fid == warmup - 1:
                t_steady = time.time()
        dt = time.time() - t0
        times.append(dt)
        mapped.append(system.last_did_map)
        print(f"[bench] frame {fid}: {dt*1e3:.1f} ms "
              f"(mapped={system.last_did_map}, "
              f"tracked={not system.lose_track}, "
              f"pull={getattr(system, 'last_pull_block', 0)*1e3:.0f}ms, "
              f"gn_iters={getattr(system, 'last_track_iters', -1)})",
              file=sys.stderr)
    t_end = time.time()

    # pipelined steady-state throughput over the full-work frames after
    # warmup (the first frames absorb any stray recompiles; the
    # persistent compilation cache absorbs them across runs)
    n_steady = n_frames - warmup
    ms = float((t_end - t_steady) / max(n_steady, 1) * 1e3)
    fps = 1e3 / ms
    steady = np.asarray(times[warmup:]) * 1e3
    result = {
        "metric": "synthetic KITTI-density (115k pts) frames/sec "
                  "(track+map, steady state)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 10.0, 3),
        "mean_ms": round(ms, 1),
        "median_ms": round(float(np.median(steady)), 1),
        "p95_ms": round(float(np.percentile(steady, 95)), 1),
        "overflow_frames": int(system.cap_overflow_frames),
    }
    print(f"[bench] steady-state {ms:.1f} ms/frame "
          f"(median {result['median_ms']}, p95 {result['p95_ms']}, "
          f"cap-overflow frames {system.cap_overflow_frames}, "
          f"max ratio {system.cap_overflow_max_ratio:.2f})",
          file=sys.stderr)
    # structured per-frame artifact for round-over-round variance analysis
    with open(os.path.join(os.path.dirname(__file__),
                           "bench_detail.json"), "w") as fp:
        json.dump({"frame_ms": [round(float(t) * 1e3, 1) for t in times],
                   "warmup": warmup, "result": result}, fp)
    t = np.asarray(system.timings)[warmup:]
    labels = ["preprocess", "odometry", "pgo", "map-prep", "map-opt"]
    breakdown = " ".join(
        f"{l}={v*1e3:.0f}ms" for l, v in zip(labels, np.median(t, 0)))
    print(f"[bench] stage medians: {breakdown}", file=sys.stderr)

    # tracked kernel metric (BASELINE.md north star): mesher-style dense
    # SDF queries/sec against the built map
    import jax.numpy as jnp
    from pin_slam_tpu.slam import map_query as mq
    bs_q = 1 << 15
    rng = np.random.RandomState(0)
    qpts = jnp.asarray(rng.rand(bs_q, 3).astype(np.float32) * 80 - 40)
    qf = jax.jit(lambda s, gf, m, q: mq.query_decode(
        s, gf, m, q, system.qp).sdf)
    args = (system.state, system.params["geo_features"],
            system.params["geo_mlp"], qpts)
    jax.block_until_ready(qf(*args))
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        out = qf(*args)
    jax.block_until_ready(out)
    qps = bs_q * reps / (time.time() - t0)
    print(f"[bench] mesher SDF queries: {qps/1e6:.2f} M/s", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
