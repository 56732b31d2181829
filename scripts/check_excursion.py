"""TPU-side-only rerun of the recorded parity configurations.

The oracle side of PARITY_RESULTS.md is unchanged by tracker-side fixes, so
this reruns only the SLAMSystem on the recorded configs; ratios are formed
against the oracle ATEs already on record (/tmp/p3_*/parity.json, quoted in
PARITY_RESULTS.md).

Usage: python scripts/check_excursion.py [--res 640x480] [--frames 240] [seed ...]
       (default: tum_fr3 640x480, 240 frames, seeds 0..4)
"""
import argparse
import json

import numpy as np

from dynamic_visual_slam_tpu.config import SLAMConfig
from dynamic_visual_slam_tpu.io import synthetic, trajectory
from dynamic_visual_slam_tpu.pipeline.slam import SLAMSystem


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("seeds", nargs="*", type=int, default=None)
    ap.add_argument("--res", default="640x480")
    ap.add_argument("--frames", type=int, default=240)
    args = ap.parse_args()
    seeds = args.seeds or [0, 1, 2, 3, 4]
    if args.res == "640x480":
        cfg = SLAMConfig.preset("tum_fr3")
    else:
        # replicate `cli parity --width W --height H` on the default config
        w, h = (int(v) for v in args.res.split("x"))
        base = SLAMConfig()
        cfg = base.replace(camera=base.camera.scaled(w, h))
    out = []
    for seed in seeds:
        frames = list(synthetic.generate_sequence(
            cfg.camera, args.frames, seed=seed, depth_noise=0.004))
        gt_t = np.stack([f[3] for f in frames])
        slam = SLAMSystem(cfg, enable_place_recognition=False)
        for gray, depth, _, _, ts in frames:
            slam.process(gray, depth, ts)
        slam.finalize()
        _, _, tpu_t = slam.frontend_trajectory()
        ate = float(trajectory.ate_rmse(tpu_t, gt_t))
        rec = dict(seed=seed, tpu_ate_m=round(ate, 5))
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps(dict(runs=out)))


if __name__ == "__main__":
    main()
