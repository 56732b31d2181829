"""Diagnose the drift-fixture tail excursion + loop consumption detail.

Runs the test_pose_graph fixture once (configurable scheme) and dumps the
per-frame raw error curve, tracking health, and the loop timeline.
"""
import dataclasses
import os
import sys

import numpy as np

from dynamic_visual_slam_tpu.config import CameraConfig, MapConfig, SLAMConfig
from dynamic_visual_slam_tpu.io import synthetic
from dynamic_visual_slam_tpu.io.trajectory import ate_rmse
from dynamic_visual_slam_tpu.pipeline.slam import SLAMSystem

scheme = sys.argv[1] if len(sys.argv) > 1 else "pgo"
drift = float(sys.argv[2]) if len(sys.argv) > 2 else 0.40

cam = CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                   cx=79.5, cy=59.5)
base = SLAMConfig()
cfg = base.replace(
    camera=cam,
    keyframe=dataclasses.replace(base.keyframe, max_frames_between_kf=6),
    ba=dataclasses.replace(base.ba, period_s=1.0),
    depth=dataclasses.replace(base.depth, max_depth=6.0),
    map=MapConfig(max_landmarks=1024, max_keyframes=8,
                  max_obs_per_landmark=6, max_obs_per_keyframe=256))
n_orbit = 100
scene = synthetic.SyntheticScene(cam, seed=5)
poses = synthetic.loop_trajectory(n_orbit) + \
    synthetic.loop_trajectory(n_orbit, radius=0.34)
frames = []
for i, (r, t) in enumerate(poses):
    gray, depth = scene.render(r, t)
    scale = 1.0 + drift * i / len(poses)
    frames.append((gray, depth * scale, t))
gt = np.stack([t for _, _, t in frames])

lc = scheme != "off"
slam = SLAMSystem(cfg, ba_async=False, vocab_train_keyframes=3,
                  loop_min_gap=12, loop_min_score=0.15,
                  loop_correction=lc, loop_pgo=(scheme == "pgo"))
for i, (gray, depth, _) in enumerate(frames):
    slam.process(gray, depth, i / 30.0)
slam.finalize()
est = np.stack([f.t_wc for f in slam.trajectory])
ok = np.asarray([f.tracking_ok for f in slam.trajectory])
per = np.linalg.norm(est - gt, axis=1)
print(f"scheme={scheme} drift={drift} ate={ate_rmse(est, gt):.4f} "
      f"loops_applied={slam.stats.get('loops_applied', 0)} "
      f"track_ok={ok.mean():.3f}", flush=True)
for i in range(0, len(per), 5):
    print(f"  f{i:3d} err={per[i]:.3f} ok={int(ok[i])}")
print("last10:", np.round(per[-10:], 3), "ok:", ok[-10:].astype(int))
print("tail detail (err / features / matches / inliers / kf):")
for i in range(len(frames) - 25, len(frames)):
    f = slam.trajectory[i]
    print(f"  f{i:3d} err={per[i]:.3f} nf={f.n_features:3d} "
          f"nm={f.n_matches:3d} ni={f.n_inliers:3d} kf={int(f.is_keyframe)}")
print("loop timeline (applied):")
for rec in slam.loop_candidates:
    print("  ", {k: rec.get(k) for k in
                 ("timestamp", "candidate", "inliers", "pnp_inliers",
                  "applied", "score")})
