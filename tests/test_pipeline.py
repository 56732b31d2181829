"""Full-system SLAM pipeline on synthetic sequences (tracking + mapping +
periodic BA), plus the ApproximateTime pairing semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_visual_slam_tpu.backend import mapping
from dynamic_visual_slam_tpu.config import CameraConfig, SLAMConfig
from dynamic_visual_slam_tpu.io import synthetic, trajectory
from dynamic_visual_slam_tpu.pipeline import sync
from dynamic_visual_slam_tpu.pipeline.slam import SLAMSystem
from dynamic_visual_slam_tpu.semantic.classes import category_id

CAM = CameraConfig(width=320, height=240, fx=260.0, fy=260.0,
                   cx=159.5, cy=119.5)
CFG = SLAMConfig().replace(camera=CAM)


@pytest.fixture(scope="module")
def full_run():
    slam = SLAMSystem(CFG, ba_async=False)
    gts = []
    for gray, depth, r_gt, t_gt, ts in synthetic.generate_sequence(
            CAM, 70, seed=11, depth_noise=0.004):
        slam.process(gray, depth, ts)
        gts.append((r_gt, t_gt))
    return slam, gts


class TestFullSystem:
    def test_pipeline_runs_and_maps(self, full_run):
        slam, _ = full_run
        assert slam.stats["frames"] == 70
        assert 2 <= slam.stats["keyframes"] < 70
        assert slam.stats["ba_runs"] >= 1
        # every BA run must improve the window cost (apply gate); strict
        # ftol-convergence within the 20-iteration budget is not guaranteed
        assert all(e["final_cost"] < e["initial_cost"] for e in slam.ba_log)
        lms = slam.landmarks_world()
        assert len(lms["xyz"]) > 200
        # multi-observation landmarks exist (associations happened)
        assert (lms["n_obs"] >= 2).sum() > 50

    def test_frontend_trajectory_accuracy(self, full_run):
        slam, gts = full_run
        _, _, est_t = slam.frontend_trajectory()
        gt_t = np.stack([t for _, t in gts])
        ate = trajectory.ate_rmse(est_t, gt_t)
        dist = np.linalg.norm(np.diff(gt_t, axis=0), axis=1).sum()
        assert ate < max(0.05, 0.06 * dist), (ate, dist)

    def test_keyframe_trajectory_refined(self, full_run):
        slam, gts = full_run
        stamps, _, kf_t = slam.keyframe_trajectory()
        assert len(stamps) == min(slam.stats["keyframes"],
                                  CFG.map.max_keyframes)
        # keyframe poses close to GT at matching timestamps
        gt_t = np.stack([t for _, t in gts])
        gt_stamps = np.asarray([i / 30.0 for i in range(len(gts))])
        gt_at_kf = np.stack([gt_t[np.argmin(np.abs(gt_stamps - s))]
                             for s in stamps])
        ate = trajectory.ate_rmse(kf_t, gt_at_kf)
        assert ate < 0.06, ate

    def test_landmarks_lie_on_scene_planes(self, full_run):
        slam, _ = full_run
        z = slam.landmarks_world()["xyz"][:, 2]
        close = np.min(np.abs(z[:, None] - np.array([[1.7, 2.3, 2.9]])), axis=1)
        assert np.median(close) < 0.1

    def test_ba_costs_logged(self, full_run):
        slam, _ = full_run
        assert slam.ba_log
        for entry in slam.ba_log:
            assert entry["final_cost"] <= entry["initial_cost"] * 1.001
            assert entry["n_residuals"] > 0


class TestDetectionsPath:
    @pytest.mark.slow
    def test_person_region_not_mapped(self):
        cfg = CFG
        slam = SLAMSystem(cfg, ba_async=False)
        person = category_id("person")
        d = cfg.semantic.max_detections
        det = mapping.Detections(
            boxes=jnp.asarray([[0, 0, 160, 240]] + [[0] * 4] * (d - 1),
                              jnp.float32),
            category=jnp.asarray([person] + [0] * (d - 1), jnp.int32),
            score=jnp.ones(d), mask=jnp.asarray([True] + [False] * (d - 1)))
        for i, (gray, depth, _, _, ts) in enumerate(
                synthetic.generate_sequence(CAM, 8, seed=12)):
            slam.process(gray, depth, ts, detections=det)
        lms = slam.landmarks_world()
        assert len(lms["xyz"]) > 0
        # no landmark was created from the masked (left-half) region:
        # all mapped landmarks must be unlabeled category
        assert (lms["category"] == 0).all()


class TestApproxTimeSync:
    def test_pairs_within_slop(self):
        s = sync.ApproximateTimeSync(slop=0.05)
        s.push_a(1.00, "a0")
        s.push_b(1.02, "b0")
        out = s.poll()
        assert out == [(1.00, "a0", "b0")]

    def test_no_pair_outside_slop(self):
        s = sync.ApproximateTimeSync(slop=0.05)
        s.push_a(1.0, "a0")
        s.push_b(2.0, "b0")
        assert s.poll() == []          # mandatory b: wait

    def test_optional_b_emits_alone(self):
        s = sync.ApproximateTimeSync(slop=0.05, b_optional=True)
        s.push_a(1.0, "a0")
        s.push_b(2.0, "b-late")        # newer than a+slop → a emitted alone
        out = s.poll()
        assert out == [(1.0, "a0", None)]

    def test_picks_closest_b(self):
        s = sync.ApproximateTimeSync(slop=0.2)
        s.push_b(0.9, "early")
        s.push_b(1.01, "close")
        s.push_a(1.0, "a0")
        out = s.poll()
        assert out == [(1.0, "a0", "close")]

    def test_bounded_queue_drops_oldest(self):
        q = sync.BoundedQueue(depth=2)
        q.push(1)
        q.push(2)
        q.push(3)
        assert q.dropped == 1
        assert q.pop() == 2
