"""RANSAC estimators vs synthetic ground truth + cv2 oracle.

Parity is on inlier-set quality and pose error, not bitwise-identical
sampling (SURVEY.md §7)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_visual_slam_tpu.config import SLAMConfig
from dynamic_visual_slam_tpu.core import lie
from dynamic_visual_slam_tpu.core.camera import Intrinsics
from dynamic_visual_slam_tpu.frontend import ransac

CFG = SLAMConfig.preset("tum_fr3")
K = Intrinsics.from_config(CFG.camera)
K_np = np.asarray(K.matrix())


def make_scene(seed, n=200, outlier_frac=0.3, noise_px=0.5):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -1.5, 2.0], [2, 1.5, 6.0], (n, 3)).astype(np.float32)
    rvec = rng.normal(size=3) * 0.1
    tvec = rng.normal(size=3) * 0.3
    r = np.asarray(lie.rodrigues(jnp.asarray(rvec)))
    cam2 = pts @ r.T + tvec
    uv1 = (pts / pts[:, 2:]) @ K_np.T
    uv2 = (cam2 / cam2[:, 2:]) @ K_np.T
    uv1 = uv1[:, :2] + rng.normal(size=(n, 2)) * noise_px
    uv2 = uv2[:, :2] + rng.normal(size=(n, 2)) * noise_px
    is_out = rng.random(n) < outlier_frac
    uv2[is_out] += rng.uniform(20, 120, size=(is_out.sum(), 2))
    return (pts.astype(np.float32), uv1.astype(np.float32),
            uv2.astype(np.float32), r, tvec, ~is_out)


class TestFundamental:
    def test_recovers_inliers(self):
        pts, uv1, uv2, *_ , gt_in = make_scene(0)
        mask = jnp.ones(len(uv1), bool)
        res = jax.jit(ransac.fundamental_ransac)(
            jnp.asarray(uv1), jnp.asarray(uv2), mask, jax.random.key(0))
        assert bool(res.valid)
        got = np.asarray(res.inliers)
        # recall/precision vs ground-truth inliers
        recall = got[gt_in].mean()
        precision = gt_in[got].mean()
        assert recall > 0.9, recall
        assert precision > 0.9, precision

    def test_matches_opencv_inlier_count(self):
        pts, uv1, uv2, *_, gt_in = make_scene(1)
        f_cv, cv_mask = cv2.findFundamentalMat(uv1, uv2, cv2.FM_RANSAC, 2.0, 0.99)
        res = ransac.fundamental_ransac(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(len(uv1), bool),
            jax.random.key(1))
        ours = int(res.n_inliers)
        theirs = int(cv_mask.sum())
        assert abs(ours - theirs) / max(theirs, 1) < 0.15, (ours, theirs)

    def test_degenerate_too_few(self):
        uv = jnp.zeros((64, 2))
        mask = jnp.zeros(64, bool).at[:5].set(True)
        res = ransac.fundamental_ransac(uv, uv, mask, jax.random.key(0))
        assert not bool(res.valid)


class TestPnP:
    def test_recovers_pose(self):
        pts, uv1, uv2, r_gt, t_gt, gt_in = make_scene(2)
        res = jax.jit(lambda *a: ransac.pnp_ransac(K, *a))(
            jnp.asarray(pts), jnp.asarray(uv2), jnp.ones(len(pts), bool),
            jax.random.key(2))
        assert bool(res.valid)
        r = np.asarray(lie.quat_to_mat(res.q))
        rot_err = np.rad2deg(np.arccos(np.clip((np.trace(r.T @ r_gt) - 1) / 2, -1, 1)))
        t_err = np.linalg.norm(np.asarray(res.t) - t_gt)
        assert rot_err < 0.5, rot_err
        assert t_err < 0.05, t_err
        assert np.asarray(res.inliers)[gt_in].mean() > 0.9

    def test_matches_opencv_pose(self):
        pts, uv1, uv2, r_gt, t_gt, gt_in = make_scene(3)
        ok, rvec, tvec, inl = cv2.solvePnPRansac(
            pts, uv2.reshape(-1, 1, 2), K_np, None, iterationsCount=100,
            reprojectionError=4.0, confidence=0.99)
        assert ok
        r_cv = cv2.Rodrigues(rvec)[0]
        res = ransac.pnp_ransac(K, jnp.asarray(pts), jnp.asarray(uv2),
                                jnp.ones(len(pts), bool), jax.random.key(3))
        r = np.asarray(lie.quat_to_mat(res.q))
        rel = np.rad2deg(np.arccos(np.clip((np.trace(r.T @ r_cv) - 1) / 2, -1, 1)))
        t_rel = np.linalg.norm(np.asarray(res.t) - tvec.ravel())
        assert rel < 0.5, rel
        assert t_rel < 0.05, t_rel

    def test_degenerate_all_masked(self):
        res = ransac.pnp_ransac(K, jnp.zeros((32, 3)), jnp.zeros((32, 2)),
                                jnp.zeros(32, bool), jax.random.key(0))
        assert not bool(res.valid)

    def test_prior_hypothesis_rescues_starved_ransac(self):
        """A constant-velocity prior injected into the hypothesis pool wins
        when the random draws are starved (tiny n_hyp, heavy outliers) —
        the fast-motion excursion fix (tracker.py passes the last accepted
        relative transform as prior_q/prior_t)."""
        pts, uv1, uv2, r_gt, t_gt, gt_in = make_scene(7, outlier_frac=0.6)
        q_gt = lie.mat_to_quat(jnp.asarray(r_gt, jnp.float32))
        args = (jnp.asarray(pts), jnp.asarray(uv2), jnp.ones(len(pts), bool),
                jax.random.key(9))
        # starved: 2 hypotheses, 60% outliers → P(clean 6-sample) ≈ 0.4^6
        bare = ransac.pnp_ransac(K, *args, n_hyp=2)
        with_prior = ransac.pnp_ransac(
            K, *args, n_hyp=2, prior_q=q_gt,
            prior_t=jnp.asarray(t_gt, jnp.float32))
        assert int(with_prior.n_inliers) >= int(bare.n_inliers)
        r = np.asarray(lie.quat_to_mat(with_prior.q))
        rot_err = np.rad2deg(np.arccos(
            np.clip((np.trace(r.T @ r_gt) - 1) / 2, -1, 1)))
        assert rot_err < 0.5, rot_err
        assert np.linalg.norm(np.asarray(with_prior.t) - t_gt) < 0.05

    def test_bad_prior_is_harmless(self):
        """A wildly wrong prior just loses the inlier argmax — result matches
        the prior-free estimate."""
        pts, uv1, uv2, r_gt, t_gt, gt_in = make_scene(8)
        args = (jnp.asarray(pts), jnp.asarray(uv2), jnp.ones(len(pts), bool),
                jax.random.key(10))
        bare = ransac.pnp_ransac(K, *args)
        off = ransac.pnp_ransac(
            K, *args, prior_q=lie.quat_identity(),
            prior_t=jnp.asarray([5.0, -3.0, 2.0]))
        np.testing.assert_allclose(np.asarray(off.q), np.asarray(bare.q),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(off.t), np.asarray(bare.t),
                                   atol=1e-5)

    def test_pose_convention_object_to_camera(self):
        """X_cam = R X + t: a camera at origin looking at +z with points ahead."""
        rng = np.random.default_rng(4)
        pts = rng.uniform([-1, -1, 3], [1, 1, 6], (50, 3)).astype(np.float32)
        uv = (pts / pts[:, 2:]) @ K_np.T
        res = ransac.pnp_ransac(K, jnp.asarray(pts), jnp.asarray(uv[:, :2]),
                                jnp.ones(50, bool), jax.random.key(4))
        np.testing.assert_allclose(np.abs(np.asarray(res.q)[0]), 1.0, atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.t), 0.0, atol=1e-2)
