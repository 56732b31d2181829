"""Checkpoint/resume: snapshot the full system state mid-sequence, reload,
and continue with identical results."""

import numpy as np
import pytest

from dynamic_visual_slam_tpu.config import CameraConfig, SLAMConfig
from dynamic_visual_slam_tpu.io import synthetic
from dynamic_visual_slam_tpu.pipeline import snapshot
from dynamic_visual_slam_tpu.pipeline.slam import SLAMSystem

CAM = CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                   cx=79.5, cy=59.5)
CFG = SLAMConfig().replace(camera=CAM)


@pytest.mark.slow
def test_save_load_resume(tmp_path):
    frames = list(synthetic.generate_sequence(CAM, 14, seed=7))
    a = SLAMSystem(CFG, ba_async=False, enable_place_recognition=False)
    for gray, depth, _, _, ts in frames[:7]:
        a.process(gray, depth, ts)
    path = str(tmp_path / "ckpt.npz")
    snapshot.save(path, a.tracker_state, a.map_state, CFG)

    ts_state, ms_state, cfg2 = snapshot.load(path)
    assert cfg2 == CFG
    b = SLAMSystem(CFG, ba_async=False, enable_place_recognition=False)
    b.tracker_state = ts_state
    b.map_state = ms_state
    # continue both from the same point: identical downstream results
    for gray, depth, _, _, ts in frames[7:]:
        fa = a.process(gray, depth, ts)
        fb = b.process(gray, depth, ts)
        np.testing.assert_allclose(fa.t_wc, fb.t_wc, atol=1e-6)
        assert fa.is_keyframe == fb.is_keyframe
    la, lb = a.landmarks_world(), b.landmarks_world()
    assert len(la["xyz"]) == len(lb["xyz"])
    np.testing.assert_allclose(la["xyz"], lb["xyz"], atol=1e-6)


@pytest.mark.slow
def test_loop_candidates_surface():
    """Place recognition fires when the camera revisits a pose."""
    frames = list(synthetic.generate_sequence(CAM, 6, seed=9))
    slam = SLAMSystem(CFG, ba_async=False, enable_place_recognition=True,
                      vocab_train_keyframes=2, loop_min_gap=2,
                      loop_min_score=0.05)
    # force frequent keyframes by revisiting the exact same frames repeatedly
    for loop in range(4):
        for gray, depth, _, _, ts in frames:
            slam.process(gray, depth, ts + loop * 0.2)
    assert slam._bow_db is not None
    # identical revisited frames must produce at least one strong candidate
    if slam.stats["keyframes"] >= slam.loop_min_gap + 2:
        assert slam.stats["loop_candidates"] >= 1


def _run_room_tour(geometric: bool):
    rooms = [list(synthetic.generate_sequence(CAM, 2, seed=s))
             for s in range(6)]
    slam = SLAMSystem(CFG, ba_async=False, vocab_train_keyframes=3,
                      loop_min_gap=3, loop_min_score=0.05,
                      loop_geometric_check=geometric, loop_min_inliers=30)
    t = 0.0
    for r in list(range(6)) + [0, 1]:      # tour, then revisit rooms 0/1
        for g, d, _, _, _ in rooms[r]:
            slam.process(g, d, t)
            t += 1 / 30
    slam.finalize()
    return slam


@pytest.mark.slow
def test_loop_geometric_verification_rejects_false_positives():
    """Cross-scene BoW hits (small online vocabularies produce them) must be
    killed by the fundamental-RANSAC check; true revisits must survive."""
    verified = _run_room_tour(geometric=True)
    raw = _run_room_tour(geometric=False)
    assert verified.stats["keyframes"] >= 8
    # the check must actually reject something AND keep something: the tour
    # produces cross-room BoW hits (raw) of which only true revisits survive
    assert raw.stats["loop_candidates"] > verified.stats["loop_candidates"]
    assert verified.stats["loop_candidates"] >= 1
    for c in verified.loop_candidates:
        assert c["inliers"] >= 30
        assert c["candidate"] < c["keyframe"] - 2


@pytest.mark.slow
def test_system_save_restore_includes_place_state(tmp_path):
    """SLAMSystem.save/restore round-trips the BoW database so loops against
    pre-snapshot keyframes remain findable (code-review finding)."""
    slam = _run_room_tour(geometric=True)
    path = str(tmp_path / "sys.npz")
    slam.save(path)
    fresh = SLAMSystem(CFG, ba_async=False, vocab_train_keyframes=3,
                       loop_min_gap=3, loop_min_score=0.05,
                       loop_geometric_check=True, loop_min_inliers=30)
    fresh.restore(path)
    assert fresh._bow_db is not None
    assert fresh._bow_db.count == slam._bow_db.count
    assert fresh._kf_seq == slam._kf_seq
    assert set(fresh._kf_store) == set(slam._kf_store)
    # a revisit processed on the restored system finds a pre-snapshot loop
    frames = list(synthetic.generate_sequence(CAM, 2, seed=0))
    t = 99.0
    for g, d, _, _, _ in frames:
        fresh.process(g, d, t)
        t += 1 / 30
    fresh.finalize()
    assert fresh.stats["loop_candidates"] >= 1


@pytest.mark.slow
def test_old_checkpoint_missing_fields_get_semantic_defaults(tmp_path):
    """Snapshots written before desc_anchor / kf_xyz_w existed must not
    backfill them as zeros: a zero anchor descriptor would win min-Hamming
    association for low-popcount observations, and zero anchor world
    points would poison keyframe-anchored PnP. The loader substitutes the
    newest descriptor and drops the keyframe arm instead."""
    frames = list(synthetic.generate_sequence(CAM, 6, seed=2))
    slam = SLAMSystem(CFG, ba_async=False, enable_place_recognition=False)
    for gray, depth, _, _, ts in frames:
        slam.process(gray, depth, ts)
    path = str(tmp_path / "new.npz")
    snapshot.save(path, slam.tracker_state, slam.map_state, CFG)
    # strip the post-v1 fields to fabricate an old-format checkpoint
    data = dict(np.load(path))
    del data["map/landmarks/desc_anchor"]
    del data["tracker/kf_xyz_w"]
    old_path = str(tmp_path / "old.npz")
    np.savez_compressed(old_path, **data)
    ts_state, ms_state, _ = snapshot.load(old_path)
    np.testing.assert_array_equal(np.asarray(ms_state.landmarks.desc_anchor),
                                  np.asarray(ms_state.landmarks.desc_bits))
    assert not bool(ts_state.has_kf)


@pytest.mark.slow
def test_restore_drops_inflight_recovery_state(tmp_path):
    """restore() must clear a pending relocalization verdict and the lost
    streak: the verdict was computed against the pre-restore pose, so
    harvesting it afterwards would re-anchor the restored trajectory to a
    stale frozen pose."""
    frames = list(synthetic.generate_sequence(CAM, 4, seed=3))
    slam = SLAMSystem(CFG, ba_async=False, enable_place_recognition=False)
    for gray, depth, _, _, ts in frames:
        slam.process(gray, depth, ts)
    path = str(tmp_path / "ckpt.npz")
    slam.save(path)
    # simulate an in-flight recovery attempt at snapshot-load time
    slam._pending_reloc = ("stale-verdict", None, None, {})
    slam._lost_streak = 5
    slam.restore(path)
    assert slam._pending_reloc is None
    assert slam._lost_streak == 0
    # the restored system keeps processing normally (harvest is a no-op)
    g, d, _, _, ts = frames[-1]
    fr = slam.process(g, d, ts + 1 / 30)
    assert np.all(np.isfinite(fr.t_wc))
