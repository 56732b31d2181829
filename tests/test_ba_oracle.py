"""Ceres-grade oracle validation of the TPU BA solver (VERDICT item 2;
SURVEY.md §7 step 5 "validate cost trajectories vs Ceres").

The oracle is a f64 scipy TRF solver on the *identical* window problem
(`oracle/ba_cpu.py`), with the block-Huber robust loss handled by IRLS —
numerically equivalent to the reference's Ceres setup
(bundle_adjustment.hpp:737-905, tolerances :839-851). These tests assert
the f32 TPU solution lands within a fraction of a percent of the f64
optimum — tight enough to catch a 0.5 % pose regression.
"""

import dataclasses

import numpy as np
import pytest

from dynamic_visual_slam_tpu.backend import ba
from dynamic_visual_slam_tpu.oracle import ba_cpu

from tests.test_ba import CFG, K, make_problem

# prior-free configuration: the oracle solves the exact Ceres problem
# (no priors), so compare against the solver in the same mode
CFG_NOPRIOR = dataclasses.replace(
    CFG.ba, pose_prior_sigma_rot=0.0, pose_prior_sigma_t=0.0,
    point_prior_sigma=0.0, max_iterations=40)


def _solve_both(seed, **kw):
    problem, gt = make_problem(seed, w=5, l=64, **kw)
    res = ba.optimize(K, problem, CFG_NOPRIOR)
    orc = ba_cpu.solve(
        np.asarray(problem.q_wc), np.asarray(problem.t_wc),
        np.asarray(problem.xyz), np.asarray(problem.uv),
        np.asarray(problem.valid),
        float(K.fx), float(K.fy), float(K.cx), float(K.cy),
        sigma=CFG.ba.sigma_px, huber_delta=CFG.ba.huber_delta)
    return problem, res, orc


def _gauge_align(res, orc):
    """Reprojection-only BA with one fixed pose has EXACTLY one gauge DOF:
    uniform scale about the fixed first camera center (scaling all points
    and camera centers about it leaves every projection unchanged — the
    reference's Ceres problem shares this, bundle_adjustment.hpp:781-785).
    Estimate that single scalar and map the TPU solution into the oracle's
    gauge; everything else must then match to solver precision."""
    c0 = orc.t_wc[0]
    x_est = np.asarray(res.xyz) - c0
    x_orc = orc.xyz - c0
    s = float(np.sum(x_est * x_orc) / np.maximum(np.sum(x_est * x_est),
                                                 1e-30))
    xyz_al = s * x_est + c0
    t_al = s * (np.asarray(res.t_wc) - c0) + c0
    return s, xyz_al, t_al


def _pose_diff(res, orc):
    _, _, t_al = _gauge_align(res, orc)
    t_diff = np.linalg.norm(t_al - orc.t_wc, axis=1)
    q_est = np.asarray(res.q_wc)   # rotations are gauge-invariant here
    dots = np.abs(np.sum(q_est * orc.q_wc, axis=1))
    ang_deg = 2 * np.degrees(np.arccos(np.clip(dots, -1, 1)))
    return t_diff, ang_deg


class TestBAOracle:
    def test_matches_f64_oracle_l2(self):
        """Low noise, no outliers: all residuals in the Huber L2 region, so
        scipy TRF (f64) finds the exact optimum. The f32 TPU solution must
        match it to sub-millimeter / hundredth-degree."""
        problem, res, orc = _solve_both(10, noise_px=0.05, drop_frac=0.2)
        # cost agreement: evaluate the SAME cost on both solutions
        assert orc.cost > 0
        rel = abs(float(res.final_cost) - orc.cost) / orc.cost
        assert rel < 0.01, (float(res.final_cost), orc.cost)
        # the TPU solution may not be *below* f64 optimum by more than noise
        assert float(res.final_cost) > orc.cost * 0.99
        t_diff, ang_deg = _pose_diff(res, orc)
        assert t_diff.max() < 1.5e-3, t_diff
        assert ang_deg.max() < 0.02, ang_deg
        # landmark agreement (in the oracle's gauge)
        _, xyz_al, _ = _gauge_align(res, orc)
        pt_diff = np.linalg.norm(xyz_al - orc.xyz, axis=1)
        assert np.median(pt_diff) < 1e-3
        assert pt_diff.max() < 1e-2

    def test_matches_f64_oracle_huber(self):
        """10 % gross outliers: the robust (block-Huber) optimum, via the
        oracle's IRLS. Validates the Huber IRLS weights of the TPU solver
        against an independent f64 formulation."""
        problem, res, orc = _solve_both(11, noise_px=0.3, outlier_frac=0.10,
                                        pose_pert=0.005)
        assert orc.n_irls > 1  # loss actually active
        rel = abs(float(res.final_cost) - orc.cost) / orc.cost
        assert rel < 0.01, (float(res.final_cost), orc.cost)
        t_diff, ang_deg = _pose_diff(res, orc)
        assert t_diff.max() < 5e-3, t_diff
        assert ang_deg.max() < 0.05, ang_deg

    @pytest.mark.slow
    def test_matches_f64_oracle_shipped_scale(self):
        """The SHIPPED solve size (w=8 window, 512 landmarks —
        config.ba.window_size=8, run_ba max_landmarks=512): the f32 Schur
        system is 48x48 with 8x the landmarks of the small tests; pin its
        accuracy against the f64 oracle at that scale (VERDICT r2 missing
        #2)."""
        problem, gt = make_problem(20, w=8, l=512, noise_px=0.2,
                                   drop_frac=0.15)
        res = ba.optimize(K, problem, CFG_NOPRIOR)
        orc = ba_cpu.solve(
            np.asarray(problem.q_wc), np.asarray(problem.t_wc),
            np.asarray(problem.xyz), np.asarray(problem.uv),
            np.asarray(problem.valid),
            float(K.fx), float(K.fy), float(K.cx), float(K.cy),
            sigma=CFG.ba.sigma_px, huber_delta=CFG.ba.huber_delta)
        rel = abs(float(res.final_cost) - orc.cost) / orc.cost
        assert rel < 0.01, (float(res.final_cost), orc.cost)
        t_diff, ang_deg = _pose_diff(res, orc)
        assert t_diff.max() < 5e-3, t_diff
        assert ang_deg.max() < 0.05, ang_deg

    @pytest.mark.slow
    def test_live_pipeline_window_matches_oracle(self):
        """Oracle parity on a window EXTRACTED FROM A LIVE PIPELINE RUN
        (not make_problem's synthetic grid): real keyframe ring, real
        association/triangulation landmarks, real observation rings —
        the exact problem run_ba ships to the solver."""
        import dataclasses as dc

        import jax.numpy as jnp

        from dynamic_visual_slam_tpu.config import (CameraConfig, MapConfig,
                                                    SLAMConfig)
        from dynamic_visual_slam_tpu.io import synthetic
        from dynamic_visual_slam_tpu.pipeline.slam import SLAMSystem

        cam = CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                           cx=79.5, cy=59.5)
        base = SLAMConfig()
        cfg = base.replace(
            camera=cam,
            keyframe=dc.replace(base.keyframe, max_frames_between_kf=5),
            map=MapConfig(max_landmarks=1024, max_keyframes=8,
                          max_obs_per_landmark=6, max_obs_per_keyframe=256))
        slam = SLAMSystem(cfg, ba_async=False,
                          enable_place_recognition=False)
        for gray, depth, _, _, ts in synthetic.generate_sequence(
                cam, 60, seed=9, depth_noise=0.004):
            slam.process(gray, depth, ts)
        slam.finalize()
        assert slam.stats["keyframes"] >= 6

        import jax.numpy as jnp

        from dynamic_visual_slam_tpu.core import lie

        problem, _, _ = ba.extract_window(cfg, slam.map_state,
                                          max_landmarks=256)
        k = slam._k

        # Well-posedness filter on the INITIAL estimates: live windows
        # carry association junk (bad triangulations, near-degenerate
        # points) that the robust TPU solver shrugs off but that gives the
        # f64 oracle a degenerate optimum (behind-camera points).  Both
        # solvers get the SAME filtered subproblem: landmarks whose valid
        # observations all start in front of the camera (z > 0.3) with
        # < 20 px initial reprojection error, >= 2 observations.
        q = np.asarray(problem.q_wc)
        t = np.asarray(problem.t_wc)
        xyz = np.asarray(problem.xyz)
        uv = np.asarray(problem.uv)
        valid = np.asarray(problem.valid) \
            & np.asarray(problem.lm_active)[:, None] \
            & np.asarray(problem.kf_active)[None, :]
        r_wc = np.asarray(lie.quat_to_mat(problem.q_wc))     # (W,3,3)
        xc = np.einsum("wji,lwj->lwi", r_wc,
                       xyz[:, None, :] - t[None, :, :])      # (L,W,3)
        z = xc[..., 2]
        zs = np.where(np.abs(z) < 1e-9, 1e-9, z)
        du = float(k.fx) * xc[..., 0] / zs + float(k.cx) - uv[..., 0]
        dv = float(k.fy) * xc[..., 1] / zs + float(k.cy) - uv[..., 1]
        err = np.hypot(du, dv)
        obs_ok = valid & (z > 0.5) & (z < 8.0) & (err < 10.0)
        lm_ok = (obs_ok.sum(axis=1) >= 3) \
            & (obs_ok.sum(axis=1) == valid.sum(axis=1))
        assert lm_ok.sum() >= 30, lm_ok.sum()
        # top-64 by observation count keeps the f64 oracle fast on the
        # single-core host (33 s measured) while staying a genuine
        # live-window problem
        rank = np.where(lm_ok, obs_ok.sum(axis=1), -1)
        sel = np.argsort(-rank)[:64]
        sel = sel[rank[sel] >= 3]

        sub = ba.BAProblem(
            q_wc=problem.q_wc, t_wc=problem.t_wc,
            kf_active=problem.kf_active,
            xyz=jnp.asarray(xyz[sel]),
            lm_active=jnp.ones(len(sel), bool),
            uv=jnp.asarray(uv[sel]), valid=jnp.asarray(obs_ok[sel]))
        # pose priors off (pure comparison); the shipped POINT prior stays
        # ON for BOTH solvers: real low-parallax live windows make the
        # fully prior-free problem degenerate (per-landmark depth is near-
        # unobservable, and the f64 TRF legitimately walks the flat valley
        # to an exploded-depth optimum with a lower unguarded cost) — the
        # production formulation regularizes exactly this, so the parity
        # statement is about the problem both solvers actually solve
        nop = dc.replace(cfg.ba, pose_prior_sigma_rot=0.0,
                         pose_prior_sigma_t=0.0,
                         max_iterations=40)
        res = ba.optimize(k, sub, nop)
        orc = ba_cpu.solve(
            q, t, xyz[sel], uv[sel], obs_ok[sel],
            float(k.fx), float(k.fy), float(k.cx), float(k.cy),
            sigma=cfg.ba.sigma_px, huber_delta=cfg.ba.huber_delta,
            point_prior_sigma=nop.point_prior_sigma,
            prior_obs_decay=nop.prior_obs_decay)
        assert orc.cost > 0
        rel = abs(float(res.final_cost) - orc.cost) / orc.cost
        assert rel < 0.015, (float(res.final_cost), orc.cost)
        # live windows are flatter than make_problem's grid (few landmarks,
        # small baselines, real association noise): two solvers at the same
        # cost can sit sub-degree apart in rotation — the binding invariant
        # is COST parity; rotations must merely stay in the same basin
        kfa = np.asarray(problem.kf_active)
        dots = np.abs(np.sum(np.asarray(res.q_wc) * orc.q_wc, axis=1))
        ang = 2 * np.degrees(np.arccos(np.clip(dots, -1, 1)))
        assert ang[kfa].max() < 0.75, ang

    def test_default_config_near_oracle(self):
        """The SHIPPING config (decayed priors on): on a well-observed
        window the decayed priors must not pull the solution off the
        prior-free f64 optimum (this is the regression that shipped red in
        round 1). Noisy small-baseline windows have genuinely flat cost
        directions (a prior-free solution with BIT-IDENTICAL cost to the
        oracle can sit cm away in parameter space), so the observable
        criterion is reprojection-cost parity, not parameter equality."""
        import dataclasses as dc
        problem, gt = make_problem(12, w=5, l=64, noise_px=0.2)
        res = ba.optimize(K, problem, CFG.ba)
        orc = ba_cpu.solve(
            np.asarray(problem.q_wc), np.asarray(problem.t_wc),
            np.asarray(problem.xyz), np.asarray(problem.uv),
            np.asarray(problem.valid),
            float(K.fx), float(K.fy), float(K.cx), float(K.cy),
            sigma=CFG.ba.sigma_px, huber_delta=CFG.ba.huber_delta)
        # reprojection-only cost of OUR solution: optimize() reports
        # initial_cost without prior terms (priors are 0 at the inits)
        import jax.numpy as jnp
        probe = problem._replace(
            q_wc=res.q_wc, t_wc=res.t_wc,
            xyz=res.xyz)
        probe_res = ba.optimize(K, probe,
                                dc.replace(CFG.ba, max_iterations=1))
        repro_cost = float(probe_res.initial_cost)
        assert repro_cost < orc.cost * 1.01, (repro_cost, orc.cost)
        # rotations are well-conditioned — those must agree tightly
        _, ang_deg = _pose_diff(res, orc)
        assert ang_deg.max() < 0.05, ang_deg


class TestInnerSolverEquivalence:
    def test_lm_schur_matches_trf(self):
        """The r5 LM-Schur inner solver (oracle/ba_cpu.lm_schur_solve —
        damped normal equations solved exactly via the 6x6/3x3 Schur
        complement) must land on the same optimum as the r1-r4 scipy TRF
        path on the identical weighted subproblems. Measured on captured
        640x480 pipeline windows: dq ~3e-10, dt ~6e-10, dcost ~2e-8, at
        ~300x less wall time (the TRF dense SVD was 97% of the parity
        sweep's oracle cost, VERDICT r4 next #3)."""
        problem, _ = make_problem(3, w=5, l=96)
        kw = dict(sigma=CFG.ba.sigma_px, huber_delta=CFG.ba.huber_delta)
        args = (np.asarray(problem.q_wc), np.asarray(problem.t_wc),
                np.asarray(problem.xyz), np.asarray(problem.uv),
                np.asarray(problem.valid),
                float(K.fx), float(K.fy), float(K.cx), float(K.cy))
        a = ba_cpu.solve(*args, inner="lm_schur", **kw)
        b = ba_cpu.solve(*args, inner="trf", **kw)
        # the optimum cost must agree to solver precision; parameters are
        # compared modulo the problem's exact gauge symmetry (scale about
        # the fixed first camera center) plus its near-flat directions —
        # rotations are gauge-invariant and must agree tightly
        assert abs(a.cost - b.cost) < 1e-8 * max(a.cost, 1.0), \
            (a.cost, b.cost)
        dots = np.abs(np.sum(a.q_wc * b.q_wc, axis=1))
        ang_deg = 2 * np.degrees(np.arccos(np.clip(dots, -1, 1)))
        assert ang_deg.max() < 0.02, ang_deg
        c0 = b.t_wc[0]
        x_a, x_b = a.xyz - c0, b.xyz - c0
        s = float(np.sum(x_a * x_b) / np.maximum(np.sum(x_a * x_a), 1e-30))
        t_al = s * (a.t_wc - c0) + c0
        assert np.max(np.abs(t_al - b.t_wc)) < 5e-3, \
            np.max(np.abs(t_al - b.t_wc))
