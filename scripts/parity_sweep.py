"""Single-provenance parity sweep (VERDICT r3 next #5, r4 next #3): EVERY
cell of the accuracy table rerun at HEAD in one command, oracle and TPU
both, on whatever platform jax selects (the round run of record executes on
the real TPU chip; PARITY_RESULTS.md quotes the artifacts this writes).

Grid: seeds x frame-counts x resolutions x {frame-to-frame, anchored},
including the 480-frame x 640x480 cell.  Artifacts:
  parity_sweep/cell_f{frames}_{W}x{H}_{mode}.json   (per-cell seed runs)
  parity_sweep/sweep.json                           (everything + summary)

Cost model (what makes the full 12-cell matrix affordable at HEAD, where
r4 ran out of budget):
- PREFIX SLICING: both pipelines are strictly causal (trajectory entries
  are appended at processing time and never retroactively edited — BA
  write-back only affects FUTURE tracking), and the synthetic sequence is
  prefix-stable (orbit_trajectory/generate_sequence consume their RNGs
  frame by frame, so frames 0..119 of a 480-frame sequence are bitwise
  the 120-frame sequence). One 480-frame run per (res, seed[, mode])
  therefore yields the f120/f240/f480 cells exactly by slicing — 10
  oracle runs + 20 TPU runs instead of 30 + 60.
- LM-SCHUR ORACLE: oracle/ba_cpu's inner solver is the r5 Schur-LM
  (~300x the old scipy-TRF path, identical optima — see
  tests/test_ba_oracle.py::TestInnerSolverEquivalence), so a 480-frame
  640x480 oracle run costs ~30 s, not >1 h.
- ORACLE CACHE: per-(res, seed) oracle trajectories are cached under
  parity_sweep/oracle_cache/ keyed by a config fingerprint; reruns at the
  same HEAD reuse them (the sweep.json records cache provenance).

Run: python scripts/parity_sweep.py [--seeds 5] [--out parity_sweep]
     [--quick]  (2 seeds x {120,240} x 424x240 — CI smoke)
"""

import argparse
import dataclasses as dc
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _cfg_fingerprint(cfg) -> str:
    return hashlib.sha256(
        json.dumps(cfg.to_dict(), sort_keys=True).encode()).hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--out", default="parity_sweep")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--frames-list", type=int, nargs="*", default=None,
                    help="restrict the frame-count axis (resume/fill runs)")
    ap.add_argument("--res-list", nargs="*", default=None,
                    help="restrict resolutions, e.g. 640x480")
    ap.add_argument("--sync-every", type=int, default=8,
                    help="TPU result-drain cadence (drain timing only — "
                         "trajectories are identical for any value)")
    args = ap.parse_args()

    import jax

    # persistent compile cache (see tests/conftest.py: must go through
    # jax.config, the env-var path is not reliably honored)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR",
                                         "/tmp/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001
        pass

    from dynamic_visual_slam_tpu.config import SLAMConfig
    from dynamic_visual_slam_tpu.io import synthetic, trajectory
    from dynamic_visual_slam_tpu.oracle.pipeline_cpu import OracleSLAM
    from dynamic_visual_slam_tpu.pipeline.slam import SLAMSystem

    platform = jax.devices()[0].platform

    frame_counts = [120, 240] if args.quick else [120, 240, 480]
    resolutions = [(424, 240)] if args.quick else [(424, 240), (640, 480)]
    if args.frames_list:
        frame_counts = args.frames_list
    if args.res_list:
        resolutions = [tuple(int(v) for v in r.split("x"))
                       for r in args.res_list]
    modes = ["anchored", "frame2frame"]
    seeds = list(range(2 if args.quick else args.seeds))
    n_max = max(frame_counts)

    os.makedirs(args.out, exist_ok=True)
    cache_dir = os.path.join(args.out, "oracle_cache")
    os.makedirs(cache_dir, exist_ok=True)

    def run_tpu_full(cfg, frames):
        """One 480-frame run; returns (t (N,3), per-frame cum-kf (N,))."""
        slam = SLAMSystem(cfg, enable_place_recognition=False,
                          sync_every=max(1, args.sync_every))
        for gray, depth, _, _, ts in frames:
            slam.process(gray, depth, ts)
        slam.finalize()
        _, _, t = slam.frontend_trajectory()
        kf_cum = np.cumsum([f.is_keyframe for f in slam.trajectory])
        return t, kf_cum

    def run_oracle_full(cfg, frames, cache_key):
        """One 480-frame oracle run with per-frame cumulative counters,
        disk-cached (strictly causal → prefixes are exact)."""
        path = os.path.join(cache_dir, cache_key + ".npz")
        if os.path.exists(path):
            d = np.load(path)
            return d["t"], d["kf_cum"], d["ba_cum"], True
        orc = OracleSLAM(cfg, run_ba=True)
        kf_cum, ba_cum = [], []
        for gray, depth, _, _, ts in frames:
            orc.process(gray, depth, ts)
            kf_cum.append(len(orc.keyframes))
            ba_cum.append(orc.ba_rounds)
        _, _, t = orc.frontend_trajectory()
        np.savez_compressed(path, t=t, kf_cum=np.asarray(kf_cum),
                            ba_cum=np.asarray(ba_cum))
        return t, np.asarray(kf_cum), np.asarray(ba_cum), False

    all_cells = []
    t_start = time.time()
    for w, h in resolutions:
        base = SLAMConfig()
        cam = base.camera.scaled(w, h)
        cfg0 = base.replace(camera=cam)
        fp = _cfg_fingerprint(cfg0)
        # per-seed full-length runs, then slice every (frames, mode) cell
        per_seed = {}
        for seed in seeds:
            frames = list(synthetic.generate_sequence(
                cam, n_max, seed=seed, depth_noise=0.004))
            gt_t = np.stack([f[3] for f in frames])
            ck = f"oracle_{w}x{h}_seed{seed}_f{n_max}_{fp}"
            orc_t, orc_kf_cum, orc_ba_cum, cached = run_oracle_full(
                cfg0, frames, ck)
            print(f"[{time.time() - t_start:7.1f}s] {w}x{h} seed={seed} "
                  f"oracle done ({'cache' if cached else 'fresh'})",
                  flush=True)
            tpu = {}
            for mode in modes:
                cfg = cfg0.replace(tracking=dc.replace(
                    base.tracking,
                    anchor_to_keyframe=(mode == "anchored")))
                tpu[mode] = run_tpu_full(cfg, frames)
                print(f"[{time.time() - t_start:7.1f}s] {w}x{h} "
                      f"seed={seed} tpu {mode} done", flush=True)
            per_seed[seed] = (gt_t, orc_t, orc_kf_cum, orc_ba_cum, tpu)
            del frames

        for n_frames in frame_counts:
            for mode in modes:
                runs = []
                for seed in seeds:
                    gt_t, orc_t, okf, oba, tpu = per_seed[seed]
                    tpu_t, tkf = tpu[mode]
                    gt_n, orc_n, tpu_n = \
                        gt_t[:n_frames], orc_t[:n_frames], tpu_t[:n_frames]
                    orc_ate = float(trajectory.ate_rmse(orc_n, gt_n))
                    tpu_ate = float(trajectory.ate_rmse(tpu_n, gt_n))
                    runs.append(dict(
                        seed=seed, source=f"synthetic(seed={seed})",
                        frames=n_frames,
                        tpu_keyframes=int(tkf[n_frames - 1]),
                        oracle_keyframes=int(okf[n_frames - 1]),
                        oracle_ba_rounds=int(oba[n_frames - 1]),
                        tpu_vs_oracle_ate_m=round(float(
                            trajectory.ate_rmse(tpu_n, orc_n)), 5),
                        tpu_ate_m=round(tpu_ate, 5),
                        oracle_ate_m=round(orc_ate, 5),
                        ate_ratio=round(tpu_ate / max(orc_ate, 1e-9), 4)))
                ratios = [r["ate_ratio"] for r in runs]
                cell = dict(
                    platform=platform, mode=mode, frames=n_frames,
                    resolution=f"{w}x{h}", seeds=len(seeds), runs=runs,
                    provenance=(f"prefix-sliced from one {n_max}-frame "
                                "run per seed (strictly causal pipeline, "
                                "prefix-stable sequence)"),
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
                print(f"[{time.time() - t_start:7.1f}s] wrote {path} "
                      f"(ratio mean {cell['ate_ratio_mean']})", flush=True)
        del per_seed

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
