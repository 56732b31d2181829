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
    args = ap.parse_args()

    from dynamic_visual_slam_tpu.cli import _parity_once
    from dynamic_visual_slam_tpu.config import SLAMConfig
    from dynamic_visual_slam_tpu.io import synthetic

    import jax
    platform = jax.devices()[0].platform

    frame_counts = [120, 240] if args.quick else [120, 240, 480]
    resolutions = [(424, 240)] if args.quick else [(424, 240), (640, 480)]
    modes = ["anchored", "frame2frame"]
    seeds = list(range(2 if args.quick else args.seeds))

    os.makedirs(args.out, exist_ok=True)
    all_cells = []
    t_start = time.time()
    for w, h in resolutions:
        base = SLAMConfig()
        cam = base.camera.scaled(w, h)
        for n_frames in frame_counts:
            # render once per (res, frames, seed); share across both modes
            frames_by_seed = {}
            for seed in seeds:
                frames_by_seed[seed] = list(synthetic.generate_sequence(
                    cam, n_frames, seed=seed, depth_noise=0.004))
            for mode in modes:
                cfg = base.replace(
                    camera=cam,
                    tracking=dataclasses.replace(
                        base.tracking,
                        anchor_to_keyframe=(mode == "anchored")))
                runs = []
                for seed in seeds:
                    frames = frames_by_seed[seed]
                    gt_t = np.stack([f[3] for f in frames])
                    rep = _parity_once(cfg, frames, gt_t,
                                       f"synthetic(seed={seed})")
                    rep["seed"] = seed
                    runs.append(rep)
                    print(f"[{time.time() - t_start:7.1f}s] {w}x{h} "
                          f"f={n_frames} {mode} seed={seed}: "
                          f"tpu={rep.get('tpu_ate_m')} "
                          f"orc={rep.get('oracle_ate_m')} "
                          f"ratio={rep.get('ate_ratio')}", flush=True)
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
            del frames_by_seed

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
