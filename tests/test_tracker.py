"""End-to-end frontend tracking on a synthetic RGB-D sequence with exact
ground truth (SURVEY.md §7 step 3: 'the minimum end-to-end slice')."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_visual_slam_tpu.config import CameraConfig, SLAMConfig
from dynamic_visual_slam_tpu.frontend import tracker
from dynamic_visual_slam_tpu.io import synthetic, trajectory

# small camera for test speed; geometry identical to bigger profiles
CAM = CameraConfig(width=320, height=240, fx=260.0, fy=260.0,
                   cx=159.5, cy=119.5)
CFG = SLAMConfig().replace(camera=CAM)


@pytest.fixture(scope="module")
def run_sequence():
    step = tracker.make_jitted_step(CFG)
    state = tracker.init_state(CFG)
    outs, gts = [], []
    for gray, depth, r_gt, t_gt, ts in synthetic.generate_sequence(CAM, 40, seed=5):
        state, out = step(state, jnp.asarray(gray), jnp.asarray(depth),
                          jnp.asarray(ts, jnp.float32))
        outs.append(jax.device_get(out))
        gts.append((r_gt, t_gt))
    return outs, gts


class TestTracking(object):
    def test_tracks_most_frames(self, run_sequence):
        outs, _ = run_sequence
        ok = np.array([bool(o.tracking_ok) for o in outs])
        assert not ok[0]               # first frame: nothing to track against
        assert ok[1:].mean() > 0.9, ok

    def test_feature_and_match_counts(self, run_sequence):
        outs, _ = run_sequence
        nf = np.array([int(o.n_features) for o in outs])
        nm = np.array([int(o.n_matches) for o in outs[1:]])
        ni = np.array([int(o.n_inliers) for o in outs[1:]])
        assert nf.min() > 300          # plenty of depth-valid features
        assert nm.min() > 100
        assert (ni / np.maximum(nm, 1)).mean() > 0.5

    def test_trajectory_accuracy(self, run_sequence):
        outs, gts = run_sequence
        est = np.stack([np.asarray(o.t_wc) for o in outs])
        gt = np.stack([t for _, t in gts])
        gt_dist = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
        ate = trajectory.ate_rmse(est, gt)
        # strict: per-frame PnP only (no BA yet) on a noiseless sequence
        assert gt_dist > 0.05          # the camera actually moved
        assert ate < 0.05, (ate, gt_dist)

    def test_rotation_accuracy(self, run_sequence):
        outs, gts = run_sequence
        from dynamic_visual_slam_tpu.core import lie
        errs = []
        for o, (r_gt, _) in zip(outs, gts):
            r_est = np.asarray(lie.quat_to_mat(jnp.asarray(o.q_wc)))
            cosang = (np.trace(r_est.T @ r_gt) - 1) / 2
            errs.append(np.degrees(np.arccos(np.clip(cosang, -1, 1))))
        # frontend-only odometry drifts ~0.1 deg/frame (integer-pixel ORB,
        # same as the reference without BA); the backend BA tightens this
        assert np.mean(errs) < 2.5, errs
        assert np.max(errs) < 6.0, errs

    def test_keyframe_policy(self, run_sequence):
        outs, _ = run_sequence
        kf = np.array([bool(o.is_keyframe) for o in outs])
        assert kf[0] and kf[1]         # reference quirk: frames 0 AND 1 are KFs
        assert kf.sum() < len(outs)    # but not every frame
        # the keyframe payload is built EVERY frame (consumers gate on
        # is_keyframe; relocalization queries BoW with a lost frame's
        # payload) — keyframes must carry real observations
        for o in outs:
            if bool(o.is_keyframe) and bool(o.tracking_ok):
                assert np.asarray(o.keyframe.mask).any()

    def test_keyframe_world_points_accurate(self, run_sequence):
        """Keyframe landmark positions must reproject to their pixels under
        the GT pose — validates the whole back-projection + pose chain."""
        outs, gts = run_sequence
        o = next(o for o, k in zip(outs, (bool(x.is_keyframe) for x in outs))
                 if k and bool(o.tracking_ok))
        m = np.asarray(o.keyframe.mask)
        xyz_w = np.asarray(o.keyframe.xyz_w)[m]
        # synthetic planes: world points must lie on one of the plane depths
        z = xyz_w[:, 2]
        close = np.min(np.abs(z[:, None]
                              - np.array([[1.7, 2.3, 2.9]])), axis=1)
        assert np.median(close) < 0.08, np.median(close)


def test_tracking_lost_resets_state():
    cfg = CFG
    step = tracker.make_jitted_step(cfg)
    state = tracker.init_state(cfg)
    gray = jnp.zeros((CAM.height, CAM.width), jnp.float32)   # featureless
    depth = jnp.ones((CAM.height, CAM.width), jnp.float32)
    state, out = step(state, gray, depth, jnp.asarray(0.0))
    assert int(out.n_features) == 0
    assert not bool(out.is_keyframe)
    assert not bool(state.has_prev)
