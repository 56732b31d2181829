"""Loop closure at PRODUCTION shape (VERDICT r4 next #5): loops/reloc were
proven at <=320x240; this runs the SHIPPED defaults — 1280x720 camera, the
pretrained BoW vocabulary asset, place recognition + geometric verification
+ pose-graph loop consumption all ON, microbatched device pipeline — on a
revisit sequence with injected depth-scale drift, and records an artifact
asserting >=1 APPLIED loop and BOUNDED ATE vs the loop-off control.

What the measured r5 runs established (all on the real chip, artifacts
quoted in PARITY_RESULTS.md):
- the full chain fires at 720p: BoW retrieval -> geometric verification
  -> high-consensus PnP (178-268 inliers per loop) -> applied correction,
  12 applied loops per 3-orbit run;
- ATE does NOT improve on THIS fixture (0.175 with loops vs 0.122
  without at 0.8 depth-scale injection, scheme-independent: PGO 0.17524
  vs interp 0.17533): at 720p's ~1000-feature budget the keyframe-
  anchored tracker out-resists the injected drift (0.12 ATE at a 1.8x
  final depth scale), while the loop corrections inherit the fixture's
  scale mismatch (stored candidate points carry candidate-epoch depth
  scale) and apply only FORWARD — the already-recorded majority of the
  trajectory keeps its drift, so rigid alignment trades the corrected
  tail against the drifted body. The regime where loops pay is weaker
  tracking/stronger drift: measured at 160x120 (ATE 0.106 -> 0.071,
  tests/test_soak.py) and in the 32-KF one-shot-correction fixture
  (tests/test_pose_graph.py). The artifact pins the 720p chain working
  end-to-end + the bounded-ATE contract, not an improvement claim.

Run: python scripts/loop720p.py [--drift 0.8] [--out loop720p.json]
"""

import argparse
import dataclasses as dc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames-per-orbit", type=int, default=240)
    # THREE orbits by default: the async BoW query -> verify -> harvest
    # chain spans ~2 result drains, so loops detected while re-traversing
    # orbit 2 apply their corrections DURING orbit 3 — with only two
    # orbits the loops verify in the final seconds and the whole recorded
    # trajectory predates them (measured: 4 applied loops, ATE unchanged)
    ap.add_argument("--orbits", type=int, default=3)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--drift", type=float, default=0.35,
                    help="injected depth-scale drift over the run (the "
                         "loop correction must undo the accumulated error)")
    ap.add_argument("--noise", type=float, default=0.0,
                    help="additive Gaussian image noise std (u8 levels). "
                         "Unlike depth-scale drift, noise degrades MATCHING "
                         "while keyframes store clean geometry, so real "
                         "drift accumulates that loop corrections can "
                         "genuinely undo — and the compiled program shapes "
                         "are unchanged (no recompile vs shipped defaults)")
    ap.add_argument("--out", default="loop720p.json")
    import argparse as _ap
    ap.add_argument("--loop-pgo", action=_ap.BooleanOptionalAction,
                    default=True,
                    help="loop consumption scheme (--no-loop-pgo = the "
                         "age-interpolated correction)")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR",
                                         "/tmp/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001
        pass

    from dynamic_visual_slam_tpu.config import SLAMConfig
    from dynamic_visual_slam_tpu.io import synthetic
    from dynamic_visual_slam_tpu.io.trajectory import ate_rmse
    from dynamic_visual_slam_tpu.pipeline.slam import SLAMSystem

    cfg = SLAMConfig()                     # shipped 1280x720 defaults
    n_orbit = args.frames_per_orbit
    # widened depth gate for the drift-injection fixture (same reasoning
    # as tests/test_pose_graph.py::test_pgo_loop_consumption_corrects_drift:
    # the scaled depths must stay inside the gate or the tail starves)
    cfg = cfg.replace(depth=dc.replace(cfg.depth, max_depth=6.0))

    scene = synthetic.SyntheticScene(cfg.camera, seed=5)
    poses = []
    for k in range(args.orbits):
        poses += synthetic.loop_trajectory(
            n_orbit, radius=0.35 - 0.01 * (k % 2))
    frames = []
    rng = np.random.default_rng(11)
    for i, (r, t) in enumerate(poses):
        gray, depth = scene.render(r, t)
        scale = 1.0 + args.drift * i / len(poses)
        g = gray.astype(np.float32)
        if args.noise > 0.0:
            g = g + rng.normal(0.0, args.noise, g.shape)
        frames.append((np.clip(g, 0, 255).astype(np.uint8),
                       (depth * scale * 1000.0).astype(np.uint16), t))
    gt = np.stack([t for _, _, t in frames])
    n = len(frames)

    vocab = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "orbvoc_synth.npz")

    def run(loop_correction: bool):
        slam = SLAMSystem(cfg, ba_async=True, sync_every=2,
                          vocab_path=vocab if os.path.exists(vocab)
                          else None,
                          loop_correction=loop_correction,
                          loop_pgo=args.loop_pgo)
        slam.warmup_place()
        b = args.batch
        t0 = time.perf_counter()
        for i0 in range(0, n - n % b, b):
            gs = np.stack([frames[i0 + j][0] for j in range(b)])
            ds = np.stack([frames[i0 + j][1] for j in range(b)])
            tss = (i0 + np.arange(b)) / 30.0
            slam.process_batch(gs, ds, tss)
        for i in range(n - n % b, n):
            slam.process(frames[i][0], frames[i][1], i / 30.0)
        slam.finalize()
        wall = time.perf_counter() - t0
        est = np.stack([f.t_wc for f in slam.trajectory])
        order = np.argsort([f.timestamp for f in slam.trajectory])
        est = est[order]
        return slam, float(ate_rmse(est, gt[: len(est)])), wall

    print("== loops ON (shipped defaults) ==", flush=True)
    slam_on, ate_on, wall_on = run(True)
    print(f"ate={ate_on:.4f} loops_applied="
          f"{slam_on.stats.get('loops_applied', 0)} "
          f"candidates={slam_on.stats['loop_candidates']} "
          f"wall={wall_on:.1f}s", flush=True)
    for rec in slam_on.loop_candidates:
        print("  loop:", json.dumps(rec), flush=True)
    print("== loops OFF (control) ==", flush=True)
    slam_off, ate_off, wall_off = run(False)
    print(f"ate={ate_off:.4f}", flush=True)

    rec = dict(
        platform=jax.devices()[0].platform,
        resolution=f"{cfg.camera.width}x{cfg.camera.height}",
        frames=n, drift_injected=args.drift, noise_std=args.noise,
        config="shipped defaults (pretrained vocab, loop_pgo on, "
               "geometric verification on, reloc on)",
        loops_applied=int(slam_on.stats.get("loops_applied", 0)),
        loop_candidates=int(slam_on.stats["loop_candidates"]),
        keyframes=int(slam_on.stats["keyframes"]),
        ate_with_loops_m=round(ate_on, 5),
        ate_without_loops_m=round(ate_off, 5),
        improvement=round(ate_off / max(ate_on, 1e-9), 3),
        wall_s=round(wall_on, 1))
    rec["loops"] = slam_on.loop_candidates
    rec["scheme"] = "pgo" if args.loop_pgo else "interp"
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec, indent=2))
    # contract: the chain fires at production shape and ATE stays BOUNDED
    # (see module docstring for why improvement is not asserted here)
    ok = rec["loops_applied"] >= 1 \
        and ate_on <= max(1.5 * ate_off, 0.2)
    print("PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
