"""False-loop REJECTION (VERDICT r3 next #4): on a perceptually-aliased
scene, BoW retrieval WILL surface a wrong candidate — the geometric
verification gate (Hamming cross-check + F-RANSAC + PnP consensus,
pipeline/slam.py _dispatch_verify/_harvest_loops) must reject it and the
map must stay uncorrupted.

Round 3 tested the gates only in the ACCEPT direction (the drift fixture's
true loops). This fixture drives them in the REJECT direction: a single
plane textured by a random arrangement of a small tile library
(SyntheticScene tile_px mode). Two far-apart stretches of that corridor
share visual-word content (same tiles → high BoW similarity) but not
spatial arrangement, so any cross-stretch candidate is geometrically
inconsistent. This is the verification step real DBoW2 deployments run
before trusting a match (test_dbow2_integration.cpp intent; the reference
itself never wires it, SURVEY.md C7).

The control run (loop_geometric_check=False) proves the fixture has teeth:
without the gate the false candidates ARE reported as loops.
"""

import dataclasses

import numpy as np
import pytest

from dynamic_visual_slam_tpu.config import CameraConfig, MapConfig, SLAMConfig
from dynamic_visual_slam_tpu.io import synthetic
from dynamic_visual_slam_tpu.io.trajectory import ate_rmse
from dynamic_visual_slam_tpu.pipeline.slam import SLAMSystem

CAM = CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                   cx=79.5, cy=59.5)
N_HOVER = 30          # frames mapping stretch A / stretch B
N_WALK = 60           # frames translating A → B
# world-x distance between the stretches: beyond any genuine co-visibility
# (view half-width at z=2.4 is ~1.5 m, so views >3 m apart share NOTHING —
# a candidate pairing them is false by construction)
X_FAR = 4.0
FALSE_SEP = 3.2       # GT separation above which a pair must be rejected


def _aliased_frames():
    # alternating-depth tiled corridor: strips every 0.4 m at z 1.8/2.4
    # (a flat single plane would degenerate the DLT-PnP minimal sets);
    # every strip draws from the SAME tile library, so the aliasing holds
    # across the whole corridor while the scene stays non-planar
    edges = tuple(float(x) for x in np.arange(-0.4, X_FAR + 0.5, 0.4))
    depths = tuple(1.8 if i % 2 == 0 else 2.4 for i in range(len(edges) + 1))
    scene = synthetic.SyntheticScene(
        CAM, seed=11, plane_depths=depths, strip_edges=edges,
        tile_px=48, tile_library=8)
    poses = []
    for i in range(N_HOVER):                      # stretch A: hover near 0
        poses.append(np.array([0.02 * np.sin(i / 5.0), 0.0, 0.0]))
    for i in range(N_WALK):                       # corridor walk A → B
        poses.append(np.array([X_FAR * (i + 1) / N_WALK, 0.0, 0.0]))
    for i in range(N_HOVER):                      # stretch B: hover at far x
        poses.append(np.array([X_FAR + 0.02 * np.sin(i / 5.0), 0.0, 0.0]))
    frames = []
    r = np.eye(3)
    for t in poses:
        gray, depth = scene.render(r, t)
        frames.append((gray, depth, t.copy()))
    return frames


def _run(geometric_check: bool):
    base = SLAMConfig()
    cfg = base.replace(
        camera=CAM,
        keyframe=dataclasses.replace(base.keyframe, max_frames_between_kf=6),
        map=MapConfig(max_landmarks=1024, max_keyframes=32,
                      max_obs_per_landmark=6, max_obs_per_keyframe=256))
    slam = SLAMSystem(cfg, ba_async=False, vocab_train_keyframes=3,
                      loop_min_gap=8, loop_min_score=0.15,
                      loop_geometric_check=geometric_check)
    frames = _aliased_frames()
    for i, (g, d, _) in enumerate(frames):
        slam.process(g, d, i / 30.0)
    slam.finalize()
    gt = np.stack([t for _, _, t in frames])
    est = np.stack([f.t_wc for f in slam.trajectory])
    return slam, float(ate_rmse(est, gt)), gt


def _pair_separations(slam, gt):
    """GT camera distance for each reported loop (keyframe seq ↔ frame)."""
    kf_frames = [i for i, f in enumerate(slam.trajectory) if f.is_keyframe]
    seps = []
    for rec in slam.loop_candidates:
        fa = kf_frames[rec["keyframe"]]
        fb = kf_frames[rec["candidate"]]
        seps.append(float(np.linalg.norm(gt[fa] - gt[fb])))
    return np.asarray(seps)


@pytest.mark.slow
def test_geometric_gate_rejects_aliased_loops():
    slam_off, ate_off, gt_off = _run(geometric_check=False)
    seps_off = _pair_separations(slam_off, gt_off)
    # the fixture has teeth: WITHOUT verification, BoW similarity alone
    # pairs views that share NO genuine co-visibility (GT separation well
    # beyond the view overlap range) on the aliased corridor
    assert np.any(seps_off > FALSE_SEP), \
        (f"aliasing fixture never surfaced a distant BoW candidate — "
         f"fixture broken: {seps_off}")

    slam_on, ate_on, gt_on = _run(geometric_check=True)
    seps_on = _pair_separations(slam_on, gt_on)
    # WITH verification, no cross-stretch (zero-covisibility) pair ever
    # survives the geometry gate — nearby TRUE revisits along the corridor
    # may legitimately pass, but nothing beyond the overlap horizon
    assert not np.any(seps_on > FALSE_SEP), \
        list(zip(slam_on.loop_candidates, seps_on))
    # and nothing the gate let through corrupted the trajectory: the
    # check-OFF run applies no corrections (unverified candidates are
    # log-only), so its ATE is the pure-odometry baseline on this
    # repetitive corridor — the gated run must sit at that baseline
    # (allowing mm-level decorrelation), not above it
    assert ate_on <= ate_off + 0.02, (ate_on, ate_off)
    assert ate_on < 0.30, ate_on
    assert slam_on.stats["keyframes"] >= 15
