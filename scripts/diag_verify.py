"""Capture loop-verification inputs from the drift fixture and analyze the
tail-end PnP collapse offline (monkeypatches SLAMSystem._dispatch_verify to
dump every verification pair to /tmp/verify_pairs/)."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_visual_slam_tpu.config import CameraConfig, MapConfig, SLAMConfig
from dynamic_visual_slam_tpu.io import synthetic
from dynamic_visual_slam_tpu.pipeline.slam import SLAMSystem

OUT = "/tmp/verify_pairs"
os.makedirs(OUT, exist_ok=True)

cam = CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                   cx=79.5, cy=59.5)
base = SLAMConfig()
cfg = base.replace(
    camera=cam,
    keyframe=dataclasses.replace(base.keyframe, max_frames_between_kf=6),
    ba=dataclasses.replace(base.ba, period_s=1.0),
    map=MapConfig(max_landmarks=1024, max_keyframes=8,
                  max_obs_per_landmark=6, max_obs_per_keyframe=256))
n_orbit, drift = 100, 0.40
scene = synthetic.SyntheticScene(cam, seed=5)
poses = synthetic.loop_trajectory(n_orbit) + \
    synthetic.loop_trajectory(n_orbit, radius=0.34)
frames = []
for i, (r, t) in enumerate(poses):
    gray, depth = scene.render(r, t)
    scale = 1.0 + drift * i / len(poses)
    frames.append((gray, depth * scale, t))

slam = SLAMSystem(cfg, ba_async=False, vocab_train_keyframes=3,
                  loop_min_gap=12, loop_min_score=0.15,
                  loop_correction=True, loop_pgo=True)

orig = SLAMSystem._dispatch_verify
count = [0]


def patched(self, entry, cand):
    seq_e = self._kf_store[entry][0]
    seq_c, d2, uv2, m2, xyz2, _, _ = self._kf_store[cand]
    _, d1, uv1, m1, _, q1, t1 = self._kf_store[entry]
    np.savez(f"{OUT}/pair_{count[0]:02d}_e{seq_e}_c{seq_c}.npz",
             d1=np.asarray(d1), uv1=np.asarray(uv1), m1=np.asarray(m1),
             q1=np.asarray(q1), t1=np.asarray(t1),
             d2=np.asarray(d2), uv2=np.asarray(uv2), m2=np.asarray(m2),
             xyz2=np.asarray(xyz2))
    count[0] += 1
    return orig(self, entry, cand)


SLAMSystem._dispatch_verify = patched
for i, (gray, depth, _) in enumerate(frames):
    slam.process(gray, depth, i / 30.0)
slam.finalize()
print("pairs dumped:", count[0])
for rec in slam.loop_candidates:
    print("  ", {k: rec.get(k) for k in
                 ("keyframe", "candidate", "inliers", "pnp_inliers",
                  "applied")})
