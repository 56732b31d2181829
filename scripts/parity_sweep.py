"""Single-provenance parity sweep (VERDICT r3 next #5): EVERY cell of the
accuracy table rerun at HEAD in one command, oracle and TPU both, on
whatever platform jax selects (the round-4 run of record executes on the
real TPU chip; PARITY_RESULTS.md quotes the artifact this writes).

Grid: seeds x frame-counts x resolutions x {frame-to-frame, anchored},
including the previously-missing 480-frame x 640x480 cell.  Artifacts:
  parity_sweep/cell_f{frames}_{W}x{H}_{mode}.json   (per-cell seed runs)
  parity_sweep/sweep.json                           (everything + summary)

Run: python scripts/parity_sweep.py [--seeds 5] [--out parity_sweep]
     [--quick]  (2 seeds x {120,240} x 424x240 — CI smoke)
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--out", default="parity_sweep")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--frames-list", type=int, nargs="*", default=None,
                    help="restrict the frame-count axis (resume/fill runs)")
    ap.add_argument("--res-list", nargs="*", default=None,
                    help="restrict resolutions, e.g. 640x480")
    args = ap.parse_args()

    import dataclasses as dc

    from dynamic_visual_slam_tpu.config import SLAMConfig
    from dynamic_visual_slam_tpu.io import synthetic, trajectory
    from dynamic_visual_slam_tpu.oracle.pipeline_cpu import OracleSLAM
    from dynamic_visual_slam_tpu.pipeline.slam import SLAMSystem

    import jax
    platform = jax.devices()[0].platform

    def run_tpu(cfg, frames):
        slam = SLAMSystem(cfg, enable_place_recognition=False)
        for gray, depth, _, _, ts in frames:
            slam.process(gray, depth, ts)
        slam.finalize()
        _, _, t = slam.frontend_trajectory()
        return t, slam.stats["keyframes"]

    def run_oracle(cfg, frames):
        orc = OracleSLAM(cfg, run_ba=True)
        for gray, depth, _, _, ts in frames:
            orc.process(gray, depth, ts)
        _, _, t = orc.frontend_trajectory()
        return t, len(orc.keyframes), orc.ba_rounds

    frame_counts = [120, 240] if args.quick else [120, 240, 480]
    resolutions = [(424, 240)] if args.quick else [(424, 240), (640, 480)]
    if args.frames_list:
        frame_counts = args.frames_list
    if args.res_list:
        resolutions = [tuple(int(v) for v in r.split("x"))
                       for r in args.res_list]
    modes = ["anchored", "frame2frame"]
    seeds = list(range(2 if args.quick else args.seeds))

    os.makedirs(args.out, exist_ok=True)
    all_cells = []
    t_start = time.time()
    for w, h in resolutions:
        base = SLAMConfig()
        cam = base.camera.scaled(w, h)
        for n_frames in frame_counts:
            # render once per (res, frames, seed); the ORACLE is the
            # reference frame-to-frame algorithm and does not depend on
            # the TPU-side tracking mode, so it runs ONCE per seed and is
            # shared by both mode cells (it dominates the sweep cost)
            cell_runs = {m: [] for m in modes}
            for seed in seeds:
                frames = list(synthetic.generate_sequence(
                    cam, n_frames, seed=seed, depth_noise=0.004))
                gt_t = np.stack([f[3] for f in frames])
                cfg0 = base.replace(camera=cam)
                orc_t, orc_kf, orc_ba = run_oracle(cfg0, frames)
                orc_ate = float(trajectory.ate_rmse(orc_t, gt_t))
                for mode in modes:
                    cfg = cfg0.replace(tracking=dc.replace(
                        base.tracking,
                        anchor_to_keyframe=(mode == "anchored")))
                    tpu_t, tpu_kf = run_tpu(cfg, frames)
                    tpu_ate = float(trajectory.ate_rmse(tpu_t, gt_t))
                    rep = dict(
                        seed=seed, source=f"synthetic(seed={seed})",
                        frames=n_frames, tpu_keyframes=tpu_kf,
                        oracle_keyframes=orc_kf, oracle_ba_rounds=orc_ba,
                        tpu_vs_oracle_ate_m=round(float(
                            trajectory.ate_rmse(tpu_t, orc_t)), 5),
                        tpu_ate_m=round(tpu_ate, 5),
                        oracle_ate_m=round(orc_ate, 5),
                        ate_ratio=round(tpu_ate / max(orc_ate, 1e-9), 4))
                    cell_runs[mode].append(rep)
                    print(f"[{time.time() - t_start:7.1f}s] {w}x{h} "
                          f"f={n_frames} {mode} seed={seed}: "
                          f"tpu={rep['tpu_ate_m']} orc={rep['oracle_ate_m']} "
                          f"ratio={rep['ate_ratio']}", flush=True)
                del frames
            for mode in modes:
                runs = cell_runs[mode]
                ratios = [r["ate_ratio"] for r in runs]
                cell = dict(
                    platform=platform, mode=mode, frames=n_frames,
                    resolution=f"{w}x{h}", seeds=len(seeds), runs=runs,
                    ate_ratio_mean=round(float(np.mean(ratios)), 4),
                    ate_ratio_median=round(float(np.median(ratios)), 4),
                    ate_ratio_worst=round(float(np.max(ratios)), 4),
                    tpu_ate_mean_m=round(float(np.mean(
                        [r["tpu_ate_m"] for r in runs])), 5),
                    oracle_ate_mean_m=round(float(np.mean(
                        [r["oracle_ate_m"] for r in runs])), 5))
                all_cells.append(cell)
                path = os.path.join(
                    args.out, f"cell_f{n_frames}_{w}x{h}_{mode}.json")
                with open(path, "w") as f:
                    json.dump(cell, f, indent=2)

    summary = dict(
        platform=platform,
        elapsed_s=round(time.time() - t_start, 1),
        cells=[{k: v for k, v in c.items() if k != "runs"}
               for c in all_cells],
        tpu_beats_oracle_mean_everywhere=all(
            c["tpu_ate_mean_m"] <= c["oracle_ate_mean_m"]
            for c in all_cells if c["mode"] == "anchored"))
    with open(os.path.join(args.out, "sweep.json"), "w") as f:
        json.dump(dict(summary=summary, cells=all_cells), f, indent=2)
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
