"""Command-line entry points — the launch-layer equivalent.

The reference ships three launch XMLs (camera_rviz / yolo_slam /
bag_playback, SURVEY.md §1); here each maps to a preset of `run`:

    python -m dynamic_visual_slam_tpu.cli run --source synthetic --frames 120
    python -m dynamic_visual_slam_tpu.cli run --source /data/tum_fr3 \
        --preset tum_fr3 --detector none
    python -m dynamic_visual_slam_tpu.cli run --preset yolo_slam \
        --detector yolov8 --weights yolov8n.npz
    python -m dynamic_visual_slam_tpu.cli bench
    python -m dynamic_visual_slam_tpu.cli info --preset tum_fr3

Outputs (--out-dir): frontend/keyframe trajectories (TUM format), landmark
and trajectory PLYs, stats JSON, optional chrome trace.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Optional

import numpy as np


def _build_config(args):
    from dynamic_visual_slam_tpu.config import SLAMConfig
    cfg = SLAMConfig.preset(args.preset) if args.preset else SLAMConfig()
    if args.width and args.height:
        cfg = cfg.replace(camera=cfg.camera.scaled(args.width, args.height))
    return cfg


def cmd_run(args) -> int:
    from dynamic_visual_slam_tpu.io import synthetic, trajectory, tum
    from dynamic_visual_slam_tpu.pipeline.slam import SLAMSystem
    from dynamic_visual_slam_tpu.utils import profiling, viz

    cfg = _build_config(args)
    os.makedirs(args.out_dir, exist_ok=True)

    detector = None
    if args.detector == "yolov8":
        from dynamic_visual_slam_tpu.semantic.detector import YoloDetector
        detector = YoloDetector(cfg, weights_path=args.weights)
        if not (args.weights and os.path.exists(args.weights)):
            print("warning: no detector weights found — random init "
                  "(detections will be meaningless)", file=sys.stderr)

    slam = SLAMSystem(cfg)
    timer = profiling.StageTimer()
    tracer = profiling.make_tracer() if args.trace else None

    if args.source == "synthetic":
        frames = synthetic.generate_sequence(cfg.camera, args.frames,
                                             seed=args.seed,
                                             depth_noise=0.004)
        gt = []
    else:
        if not os.path.exists(os.path.join(args.source, "rgb.txt")):
            print(f"error: '{args.source}' is not a TUM RGB-D directory "
                  "(rgb.txt not found); use --source synthetic or a dataset "
                  "root containing rgb.txt/depth.txt", file=sys.stderr)
            return 2
        ds = tum.TUMDataset(args.source)
        frames = ((g, d, None, None, ts) for g, d, ts in
                  ds.frames(limit=args.frames or None))
        gt = ds

    gt_list = []
    t_start = time.perf_counter()
    n = 0
    if getattr(args, "batch", 0) and not getattr(args, "threaded", False) \
            and detector is None:
        # offline throughput mode: microbatch frames through one device
        # dispatch per batch (pipeline/slam.process_batch)
        b = args.batch
        buf = []
        for item in frames:
            gray, depth, r_gt, t_gt, ts = item
            if t_gt is not None:
                gt_list.append(t_gt)
            buf.append((np.asarray(gray), np.asarray(depth), float(ts)))
            n += 1
            if len(buf) == b:
                with timer.stage("batch"):
                    slam.process_batch(
                        np.stack([x[0] for x in buf]),
                        np.stack([x[1] for x in buf]),
                        np.asarray([x[2] for x in buf]))
                buf = []
        for gray, depth, ts in buf:   # tail smaller than one batch
            slam.process(gray, depth, ts)
        slam.finalize()
        wall = time.perf_counter() - t_start
    elif getattr(args, "threaded", False):
        # middleware transport: IO thread → bounded queue →
        # ApproximateTime → device loop (pipeline/runner.py)
        from dynamic_visual_slam_tpu.pipeline.runner import ThreadedPipeline

        def gen():
            nonlocal n
            for gray, depth, r_gt, t_gt, ts in frames:
                if t_gt is not None:
                    gt_list.append(t_gt)
                n += 1
                yield gray, depth, ts

        runner = ThreadedPipeline(slam, detector=detector)
        runner.run(gen())
        wall = time.perf_counter() - t_start
    else:
        debug_every = getattr(args, "debug_images", 0)
        if debug_every:
            os.makedirs(os.path.join(args.out_dir, "debug"), exist_ok=True)
        for item in frames:
            gray, depth, r_gt, t_gt, ts = item
            det = None
            if detector is not None:
                rgb = np.stack([gray] * 3, axis=-1)
                with timer.stage("detector"):
                    det = detector(rgb)
            if tracer:
                tracer.begin("frame")
            with timer.stage("frame"):
                slam.process(gray, depth, ts, detections=det)
            if tracer:
                tracer.end("frame")
            if debug_every and n % debug_every == 0:
                # annotated feature image, the reference's per-frame
                # /feature_detector/features_image (frontend.cpp:1229-1232)
                kp = slam.tracker_state.prev
                m = np.asarray(kp.mask)
                img = viz.annotate_features(np.asarray(gray),
                                            np.asarray(kp.uv)[m])
                path = os.path.join(args.out_dir, "debug",
                                    f"frame_{n:05d}.png")
                try:
                    import cv2
                    cv2.imwrite(path, img)
                except Exception:
                    np.save(path.replace(".png", ".npy"), img)
            if t_gt is not None:
                gt_list.append(t_gt)
            n += 1
        slam.finalize()
        wall = time.perf_counter() - t_start

    # exports
    stamps, rs, ts_arr = slam.frontend_trajectory()
    trajectory.write_tum(os.path.join(args.out_dir, "frontend.tum"),
                         stamps, list(zip(rs, ts_arr)))
    kf_stamps, kf_rs, kf_ts = slam.keyframe_trajectory()
    trajectory.write_tum(os.path.join(args.out_dir, "keyframes.tum"),
                         kf_stamps, list(zip(kf_rs, kf_ts)))
    lms = slam.landmarks_world()
    viz.landmarks_to_ply(os.path.join(args.out_dir, "landmarks.ply"),
                         lms["xyz"], lms["n_obs"])
    viz.trajectory_to_ply(os.path.join(args.out_dir, "trajectory.ply"),
                          ts_arr)
    if tracer:
        tracer.dump_chrome_trace(os.path.join(args.out_dir, "trace.json"))

    stats = dict(slam.stats, fps=round(n / wall, 2),
                 wall_s=round(wall, 2), landmarks=int(len(lms["xyz"])),
                 stages=timer.summary())
    if args.source == "synthetic" and gt_list:
        ate = trajectory.ate_rmse(ts_arr, np.stack(gt_list))
        stats["ate_rmse_m"] = round(float(ate), 5)
    elif args.source != "synthetic":
        gt_pos = gt.gt_positions_at(stamps) if hasattr(gt, "gt_positions_at") \
            else None
        if gt_pos is not None:
            stats["ate_rmse_m"] = round(
                float(trajectory.ate_rmse(ts_arr, gt_pos)), 5)
    with open(os.path.join(args.out_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats, indent=2))
    return 0


def cmd_parity(args) -> int:
    """Trajectory-parity harness (BASELINE configs 1-2): run the TPU
    pipeline AND the CPU oracle pipeline (cv2 ORB + BFMatcher +
    solvePnPRansac + f64 scipy BA — the reference algorithm on the
    reference's own libraries) on the SAME frames; report ATE of each
    against ground truth and against each other."""
    from dynamic_visual_slam_tpu.io import synthetic, trajectory, tum
    from dynamic_visual_slam_tpu.oracle.pipeline_cpu import OracleSLAM
    from dynamic_visual_slam_tpu.pipeline.slam import SLAMSystem

    cfg = _build_config(args)
    os.makedirs(args.out_dir, exist_ok=True)

    if args.source == "synthetic":
        frames = list(synthetic.generate_sequence(
            cfg.camera, args.frames, seed=args.seed, depth_noise=0.004))
        gt_t = np.stack([f[3] for f in frames])
    else:
        if not os.path.exists(os.path.join(args.source, "rgb.txt")):
            print(f"error: '{args.source}' is not a TUM RGB-D directory",
                  file=sys.stderr)
            return 2
        ds = tum.TUMDataset(args.source)
        frames = [(g, d, None, None, ts)
                  for g, d, ts in ds.frames(limit=args.frames or None)]
        gt_t = None

    slam = SLAMSystem(cfg, enable_place_recognition=False)
    for gray, depth, _, _, ts in frames:
        slam.process(gray, depth, ts)
    slam.finalize()
    _, _, tpu_t = slam.frontend_trajectory()

    orc = OracleSLAM(cfg, run_ba=True)
    for gray, depth, _, _, ts in frames:
        orc.process(gray, depth, ts)
    _, _, orc_t = orc.frontend_trajectory()

    report = dict(
        source=args.source, frames=len(frames),
        tpu_keyframes=slam.stats["keyframes"],
        oracle_keyframes=len(orc.keyframes),
        oracle_ba_rounds=orc.ba_rounds,
        tpu_vs_oracle_ate_m=round(
            float(trajectory.ate_rmse(tpu_t, orc_t)), 5))
    if gt_t is None and hasattr(ds, "gt_positions_at"):
        stamps = np.asarray([f[4] for f in frames])
        gt_t = ds.gt_positions_at(stamps)
    if gt_t is not None:
        tpu_ate = float(trajectory.ate_rmse(tpu_t, gt_t))
        orc_ate = float(trajectory.ate_rmse(orc_t, gt_t))
        report.update(
            tpu_ate_m=round(tpu_ate, 5), oracle_ate_m=round(orc_ate, 5),
            ate_ratio=round(tpu_ate / max(orc_ate, 1e-9), 4))
    with open(os.path.join(args.out_dir, "parity.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return 0


def cmd_bench(args) -> int:
    import bench
    bench.main()
    return 0


def cmd_info(args) -> int:
    cfg = _build_config(args)
    print(cfg.to_json())
    return 0


def main(argv: Optional[list] = None) -> int:
    p = argparse.ArgumentParser(prog="dynamic_visual_slam_tpu",
                                description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="run the SLAM pipeline")
    pr.add_argument("--source", default="synthetic",
                    help="'synthetic' or a TUM RGB-D directory")
    pr.add_argument("--preset", default=None,
                    choices=[None, "camera", "camera_rviz", "yolo_slam",
                             "bag_playback", "tum_fr3"],
                    help="launch-file-equivalent preset")
    pr.add_argument("--frames", type=int, default=90)
    pr.add_argument("--seed", type=int, default=0)
    pr.add_argument("--width", type=int, default=424)
    pr.add_argument("--height", type=int, default=240)
    pr.add_argument("--detector", default="none", choices=["none", "yolov8"])
    pr.add_argument("--weights", default=None,
                    help="YOLO weights (.pt or converted .npz)")
    pr.add_argument("--out-dir", default="slam_out")
    pr.add_argument("--trace", action="store_true",
                    help="dump a chrome trace of host stages")
    pr.add_argument("--batch", type=int, default=0, metavar="B",
                    help="offline throughput mode: run frames through the "
                         "device in lax.scan microbatches of B (detector "
                         "must be off)")
    pr.add_argument("--debug-images", type=int, default=0, metavar="N",
                    help="write an annotated feature image every N frames "
                         "to OUT_DIR/debug/ (the reference's "
                         "/feature_detector/features_image stream)")
    pr.add_argument("--threaded", action="store_true",
                    help="route frames through the bounded-queue/"
                         "ApproximateTime middleware (IO thread + device "
                         "loop) — the reference's DDS transport topology")
    pr.set_defaults(fn=cmd_run)

    pb = sub.add_parser("bench", help="run the headline benchmark")
    pb.set_defaults(fn=cmd_bench)

    pp = sub.add_parser("parity", help="TPU-vs-CPU-oracle trajectory parity")
    pp.add_argument("--source", default="synthetic",
                    help="'synthetic' or a TUM RGB-D directory")
    pp.add_argument("--preset", default=None)
    pp.add_argument("--frames", type=int, default=240)
    pp.add_argument("--seed", type=int, default=0)
    pp.add_argument("--width", type=int, default=424)
    pp.add_argument("--height", type=int, default=240)
    pp.add_argument("--out-dir", default="parity_out")
    pp.set_defaults(fn=cmd_parity)

    pi = sub.add_parser("info", help="print the resolved config")
    pi.add_argument("--preset", default=None)
    pi.add_argument("--width", type=int, default=None)
    pi.add_argument("--height", type=int, default=None)
    pi.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
