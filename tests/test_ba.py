"""Bundle adjustment: synthetic window problems with exact ground truth
(cost-trajectory / recovery validation per SURVEY.md §7 step 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_visual_slam_tpu.config import BAConfig, SLAMConfig
from dynamic_visual_slam_tpu.backend import ba
from dynamic_visual_slam_tpu.core import lie
from dynamic_visual_slam_tpu.core.camera import Intrinsics

CFG = SLAMConfig.preset("tum_fr3")
K = Intrinsics.from_config(CFG.camera)


def make_problem(seed=0, w=8, l=200, noise_px=0.3, pose_pert=0.02,
                 point_pert=0.05, outlier_frac=0.0, drop_frac=0.2):
    """Ground-truth world + perturbed initial estimates."""
    rng = np.random.default_rng(seed)
    xyz_gt = rng.uniform([-2, -1.5, 2.5], [2, 1.5, 6], (l, 3)).astype(np.float32)
    qs, ts, uvs, valids = [], [], [], []
    for i in range(w):
        rvec = rng.normal(size=3) * 0.05
        q = np.asarray(lie.so3_exp(jnp.asarray(rvec, jnp.float32)))
        t = (rng.normal(size=3) * 0.2).astype(np.float32)
        # camera-to-world pose; observations = project world→camera
        xc = (xyz_gt - t) @ np.asarray(lie.quat_to_mat(jnp.asarray(q)))
        uv = np.stack([np.float32(K.fx) * xc[:, 0] / xc[:, 2] + np.float32(K.cx),
                       np.float32(K.fy) * xc[:, 1] / xc[:, 2] + np.float32(K.cy)], -1)
        uv += rng.normal(size=uv.shape) * noise_px
        valid = (xc[:, 2] > 0.3) & (rng.random(l) > drop_frac)
        if outlier_frac > 0:
            # association mismatches that slipped the 5 px backend gate
            out = rng.random(l) < outlier_frac
            uv[out] += rng.uniform(5, 25, size=(out.sum(), 2)) * \
                rng.choice([-1, 1], size=(out.sum(), 2))
        qs.append(q); ts.append(t); uvs.append(uv); valids.append(valid)

    q_gt = np.stack(qs); t_gt = np.stack(ts)
    uv = np.stack(uvs, axis=1)          # (L, W, 2)
    valid = np.stack(valids, axis=1)    # (L, W)

    # perturb all but the first (gauge) pose + all points
    q0 = q_gt.copy(); t0 = t_gt.copy()
    for i in range(1, w):
        dq = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(size=3).astype(np.float32) * pose_pert)))
        q0[i] = np.asarray(lie.quat_mul(jnp.asarray(dq), jnp.asarray(q_gt[i])))
        t0[i] = t_gt[i] + rng.normal(size=3).astype(np.float32) * pose_pert * 5
    xyz0 = xyz_gt + rng.normal(size=(l, 3)).astype(np.float32) * point_pert

    problem = ba.BAProblem(
        q_wc=jnp.asarray(q0), t_wc=jnp.asarray(t0),
        kf_active=jnp.ones(w, bool),
        xyz=jnp.asarray(xyz0), lm_active=jnp.ones(l, bool),
        uv=jnp.asarray(uv.astype(np.float32)), valid=jnp.asarray(valid))
    return problem, (q_gt, t_gt, xyz_gt)


class TestBA:
    def test_cost_decreases_and_converges(self):
        problem, _ = make_problem(0)
        res = jax.jit(lambda p: ba.optimize(K, p, CFG.ba))(problem)
        assert float(res.final_cost) < 0.2 * float(res.initial_cost)
        # `converged` is strict Ceres-style telemetry (ftol on an ACCEPTED
        # step); a run that spends its whole budget polishing reports False
        # while still producing the better solution — apply gates on
        # improvement, which is what we assert
        assert int(res.iterations) <= CFG.ba.max_iterations
        assert int(res.iterations) >= 2

    def test_recovers_ground_truth(self):
        problem, (q_gt, t_gt, xyz_gt) = make_problem(1, noise_px=0.0)
        res = ba.optimize(K, problem, CFG.ba)
        # final cost includes the soft-prior floor (inits were perturbed, so
        # the recovered GT sits ~5 cm from the anchors); reprojection itself
        # goes to ~0 — the accuracy assertions below are the real check
        assert float(res.final_cost) < 0.02 * float(res.initial_cost)
        # reprojection-only BA with a single fixed pose keeps a free global
        # scale (the 7th gauge DOF — the reference's Ceres setup shares it,
        # bundle_adjustment.hpp:781-785); compare modulo similarity and
        # check the recovered scale stays near 1 (anchored by the init)
        from dynamic_visual_slam_tpu.io.trajectory import umeyama_alignment
        pts_est = np.asarray(res.xyz)
        r_a, t_a, s_a = umeyama_alignment(pts_est, xyz_gt, with_scale=True)
        # in the live pipeline metric-depth landmark inits re-anchor scale at
        # every keyframe insertion; a standalone window drifts a few percent
        assert abs(s_a - 1.0) < 0.10, s_a
        aligned = s_a * pts_est @ r_a.T + t_a
        assert np.median(np.linalg.norm(aligned - xyz_gt, axis=1)) < 2e-3
        t_est_al = s_a * np.asarray(res.t_wc) @ r_a.T + t_a
        assert np.linalg.norm(t_est_al - t_gt, axis=1).max() < 2e-3
        for i in range(q_gt.shape[0]):
            dq = np.abs(np.sum(np.asarray(res.q_wc[i]) * q_gt[i]))
            assert dq > 1 - 1e-4, (i, dq)

    def test_gauge_first_pose_fixed(self):
        problem, _ = make_problem(2)
        res = ba.optimize(K, problem, CFG.ba)
        np.testing.assert_allclose(np.asarray(res.q_wc[0]),
                                   np.asarray(problem.q_wc[0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.t_wc[0]),
                                   np.asarray(problem.t_wc[0]), atol=1e-6)

    def test_huber_robust_to_outliers(self):
        # tracking-grade init (the live system's PnP poses); far inits drift
        # along the near-flat scale direction at identical cost (gauge)
        problem, (q_gt, t_gt, xyz_gt) = make_problem(3, outlier_frac=0.10,
                                                     pose_pert=0.005)
        res = ba.optimize(K, problem, CFG.ba)
        t_err = np.linalg.norm(np.asarray(res.t_wc) - t_gt, axis=1)
        assert t_err.max() < 0.02, t_err
        import dataclasses
        cfg_l2 = dataclasses.replace(CFG.ba, huber_delta=1e6)
        res_l2 = ba.optimize(K, problem, cfg_l2)
        t_err_l2 = np.linalg.norm(np.asarray(res_l2.t_wc) - t_gt, axis=1)
        assert t_err.max() < t_err_l2.max(), (t_err.max(), t_err_l2.max())

    def test_partial_window(self):
        """Fewer active keyframes than capacity (early in a sequence)."""
        problem, _ = make_problem(4, w=8)
        problem = problem._replace(
            kf_active=jnp.asarray([True] * 3 + [False] * 5))
        res = ba.optimize(K, problem, CFG.ba)
        assert np.isfinite(float(res.final_cost))
        assert float(res.final_cost) <= float(res.initial_cost)
        # inactive poses untouched
        np.testing.assert_allclose(np.asarray(res.q_wc[4]),
                                   np.asarray(problem.q_wc[4]), atol=1e-6)

    def test_empty_problem(self):
        problem, _ = make_problem(5)
        problem = problem._replace(lm_active=jnp.zeros_like(problem.lm_active))
        res = ba.optimize(K, problem, CFG.ba)
        assert np.isfinite(float(res.final_cost))
        assert int(res.n_residuals) == 0
