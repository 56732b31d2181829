"""Relocalization after tracking loss, end to end.

The reference freezes the pose on tracking failure and never recovers the
anchor (frontend.cpp:925-944, 1107-1117): after a sensor blackout the
trajectory continues RELATIVE to the frozen pose, i.e. permanently offset.
The TPU rebuild relocalizes: the lost frame's descriptors query the BoW
database and a loop-grade geometric verification (Hamming match + F-RANSAC
+ PnP against the stored keyframe's world points) re-anchors the live pose.

Fixture: a wandering sequence, then a sensor blackout (featureless frames)
while the "camera" teleports back to a previously-mapped view, then a
replay of that earlier segment.  Without relocalization the replay is
anchored at the frozen end-of-segment pose (constant offset); with it the
pose snaps back.  Loop correction is disabled in BOTH runs so the contrast
isolates relocalization.
"""

import dataclasses

import numpy as np
import pytest

from dynamic_visual_slam_tpu.config import CameraConfig, MapConfig, SLAMConfig
from dynamic_visual_slam_tpu.io import synthetic
from dynamic_visual_slam_tpu.pipeline.slam import SLAMSystem

CAM = CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                   cx=79.5, cy=59.5)
N_A, N_BLACK, B_START = 60, 6, 10


def _run(enable_reloc: bool):
    base = SLAMConfig()
    cfg = base.replace(
        camera=CAM,
        keyframe=dataclasses.replace(base.keyframe, max_frames_between_kf=6),
        map=MapConfig(max_landmarks=1024, max_keyframes=8,
                      max_obs_per_landmark=6, max_obs_per_keyframe=256))
    slam = SLAMSystem(cfg, vocab_train_keyframes=3, loop_min_gap=4,
                      loop_min_score=0.08, loop_min_inliers=20,
                      loop_correction=False,
                      enable_relocalization=enable_reloc)
    seg_a = list(synthetic.generate_sequence(CAM, N_A, seed=5,
                                             depth_noise=0.004))
    blank = np.zeros((CAM.height, CAM.width), np.float32)
    frames = [(g, d, t) for g, d, _, t, _ in seg_a]
    frames += [(blank, np.ones_like(blank), None)] * N_BLACK
    frames += [(g, d, t) for g, d, _, t, _ in seg_a[B_START:]]
    for i, (g, d, _) in enumerate(frames):
        slam.process(g, d, i / 30.0)
    slam.finalize()
    est = np.stack([f.t_wc for f in slam.trajectory])
    # post-blackout ATE: the replayed segment's GT is seg_a[B_START:]
    gt_b = np.stack([t for _, _, t in frames[N_A + N_BLACK:]])
    est_b = est[N_A + N_BLACK:]
    ate_b = float(np.sqrt(np.mean(np.sum((est_b - gt_b) ** 2, axis=1))))
    return slam, ate_b


@pytest.mark.slow
def test_relocalization_reanchors_after_blackout():
    slam_on, ate_on = _run(True)
    slam_off, ate_off = _run(False)
    # the recovery must actually have happened through the reloc path
    assert slam_on.stats["relocalizations"] >= 1, slam_on.reloc_log
    assert slam_off.stats["relocalizations"] == 0
    # and it must pull the replayed segment back onto GT by a real margin
    assert ate_on < 0.6 * ate_off, (ate_on, ate_off)
    assert ate_on < 0.15, (ate_on, ate_off, slam_on.reloc_log)


@pytest.mark.slow
def test_relocalization_in_microbatch_mode():
    """The reloc dispatch path also works from process_batch drains (the
    keyframe payload arrives stacked; _dispatch_reloc slices batch_idx)."""
    base = SLAMConfig()
    cfg = base.replace(
        camera=CAM,
        keyframe=dataclasses.replace(base.keyframe, max_frames_between_kf=6),
        map=MapConfig(max_landmarks=1024, max_keyframes=8,
                      max_obs_per_landmark=6, max_obs_per_keyframe=256))
    slam = SLAMSystem(cfg, vocab_train_keyframes=3, loop_min_gap=4,
                      loop_min_score=0.08, loop_min_inliers=20,
                      loop_correction=False)
    seg_a = list(synthetic.generate_sequence(CAM, N_A, seed=5,
                                             depth_noise=0.004))
    blank = np.zeros((CAM.height, CAM.width), np.float32)
    frames = [(g, d, t) for g, d, _, t, _ in seg_a]
    frames += [(blank, np.ones_like(blank), None)] * N_BLACK
    frames += [(g, d, t) for g, d, _, t, _ in seg_a[B_START:]]
    frames = frames[:112]                       # 14 batches of 8
    b = 8
    for i in range(0, len(frames), b):
        chunk = frames[i:i + b]
        slam.process_batch(np.stack([g for g, _, _ in chunk]),
                           np.stack([d for _, d, _ in chunk]),
                           np.arange(i, i + len(chunk)) / 30.0)
    slam.finalize()
    assert slam.stats["relocalizations"] >= 1, slam.reloc_log
    est = np.stack([f.t_wc for f in slam.trajectory])
    gt_b = np.stack([t for _, _, t in frames[N_A + N_BLACK:]])
    est_b = est[N_A + N_BLACK:]
    ate_b = float(np.sqrt(np.mean(np.sum((est_b - gt_b) ** 2, axis=1))))
    # batched drains lag the correction by up to sync_every batches, so the
    # bound is looser than the per-frame test's 0.15
    assert ate_b < 0.3, (ate_b, slam.reloc_log)


@pytest.mark.slow
def test_no_spurious_relocalization_on_clean_run():
    """A healthy sequence must never trigger the reloc path."""
    base = SLAMConfig()
    cfg = base.replace(
        camera=CAM,
        keyframe=dataclasses.replace(base.keyframe, max_frames_between_kf=6),
        map=MapConfig(max_landmarks=1024, max_keyframes=8,
                      max_obs_per_landmark=6, max_obs_per_keyframe=256))
    slam = SLAMSystem(cfg, vocab_train_keyframes=3, loop_min_gap=4,
                      loop_correction=False)
    for g, d, _, _, ts in synthetic.generate_sequence(CAM, 50, seed=3,
                                                      depth_noise=0.004):
        slam.process(g, d, ts)
    slam.finalize()
    assert slam.stats["relocalizations"] == 0
    assert slam.reloc_log == []


def test_recovery_frame_is_not_a_stale_pose_keyframe():
    """After a mid-run tracking reset the first recovery frame must NOT
    become a keyframe (it would be anchored at the frozen pose with no
    accepted PnP); the bootstrap branch applies only before the first
    keyframe exists (tracker.py is_kf gate)."""
    from dynamic_visual_slam_tpu.frontend import tracker

    cfg = SLAMConfig().replace(camera=CAM)
    step = tracker.make_jitted_step(cfg)
    state = tracker.init_state(cfg)
    frames = list(synthetic.generate_sequence(CAM, 6, seed=2))
    blank = np.zeros((CAM.height, CAM.width), np.float32)
    for i, (g, d, _, _, _) in enumerate(frames[:4]):
        state, out = step(state, g, d, float(i) / 30.0)
    assert bool(state.has_kf)
    state, out = step(state, blank, np.ones_like(blank), 4 / 30.0)
    assert not bool(state.has_prev)          # tracking reset
    state, out = step(state, *frames[4][:2], 5 / 30.0)
    assert not bool(out.is_keyframe)         # recovery frame: no stale KF
    state, out = step(state, *frames[5][:2], 6 / 30.0)
    assert bool(out.tracking_ok)             # tracking itself resumed
