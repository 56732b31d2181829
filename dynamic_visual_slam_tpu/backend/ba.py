"""Sliding-window bundle adjustment: Levenberg-Marquardt with a Schur
complement over the camera/landmark block system — the Ceres solver of the
reference (bundle_adjustment.hpp:737-905) rebuilt as one jitted fixed-shape
program.

Reference formulation reproduced:
- world→camera pose parameters (CameraPose::fromRt inverts the stored
  camera-to-world poses, bundle_adjustment.hpp:138-165), 6-DoF tangent
  updates (the quaternion manifold's local parametrization);
- weighted reprojection residuals  r = (π(R_cw X + t_cw) − uv)/σ  with a
  zero-residual behind-camera guard at z ≤ 0.1
  (bundle_adjustment.hpp:531-565) and Huber(1.345) robustification (818);
- gauge fixed by holding the first window pose constant (781-785);
- LM with Ceres-style trust-region λ updates and the same termination
  tolerances (839-851).

TPU redesign: observations live on a dense (L, W) landmark×keyframe grid
(a window has ≤1 observation per landmark per keyframe), so every
Jacobian/Hessian block is one einsum: U (W,6,6), V (L,3,3), W (L,W,6,3);
the reduced camera system S = U − W V⁻¹ Wᵀ is a dense (6W, 6W) solve.
No sparse structures, no Ceres — sparse-Schur's sparsity pattern IS this
grid at window scale (W ≤ 8, L ≤ 512 ⇒ S is at most 48×48).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynamic_visual_slam_tpu.config import BAConfig
from dynamic_visual_slam_tpu.core import lie
from dynamic_visual_slam_tpu.core.camera import Intrinsics
from dynamic_visual_slam_tpu.ops import linalg_small as ls


class BAProblem(NamedTuple):
    """Dense-grid window problem.  W keyframes × L landmarks."""

    q_wc: jnp.ndarray      # (W, 4) camera-to-world (optical) — input poses
    t_wc: jnp.ndarray      # (W, 3)
    kf_active: jnp.ndarray  # (W,) bool
    xyz: jnp.ndarray       # (L, 3) world points
    lm_active: jnp.ndarray  # (L,) bool
    uv: jnp.ndarray        # (L, W, 2) observed pixels
    valid: jnp.ndarray     # (L, W) bool


class BAResult(NamedTuple):
    q_wc: jnp.ndarray      # (W, 4) optimized camera-to-world
    t_wc: jnp.ndarray      # (W, 3)
    xyz: jnp.ndarray       # (L, 3) optimized points
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray  # () bool — CONVERGENCE-equivalent
    n_residuals: jnp.ndarray


def _residuals(k: Intrinsics, q_cw, t_cw, xyz, uv, valid, sigma):
    """r (L, W, 2) weighted residuals + per-obs validity incl. z-guard."""
    xc = lie.quat_rotate(q_cw[None, :, :], xyz[:, None, :]) + t_cw[None]
    z = xc[..., 2]
    guard = z > 0.1                       # behind-camera zeroing (hpp:545-563)
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = k.fx * xc[..., 0] / zs + k.cx
    v = k.fy * xc[..., 1] / zs + k.cy
    r = jnp.stack([u - uv[..., 0], v - uv[..., 1]], -1) / sigma
    ok = valid & guard
    return jnp.where(ok[..., None], r, 0.0), ok, xc


def _huber_weight(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight of the Huber loss on the residual norm (L, W)."""
    n = jnp.linalg.norm(r, axis=-1)
    return jnp.where(n <= delta, 1.0, delta / jnp.maximum(n, 1e-12))


def _cost(r: jnp.ndarray, ok: jnp.ndarray, delta: float) -> jnp.ndarray:
    """Total robust cost: Huber(||r||) summed (x0.5 like Ceres)."""
    n2 = jnp.sum(r * r, axis=-1)
    n = jnp.sqrt(jnp.maximum(n2, 0.0))
    rho = jnp.where(n <= delta, n2, 2.0 * delta * n - delta * delta)
    return 0.5 * jnp.sum(jnp.where(ok, rho, 0.0))


def optimize(k: Intrinsics, problem: BAProblem, cfg: BAConfig) -> BAResult:
    """LM iterations as a lax.scan with accept/reject steps (fixed trip count
    cfg.max_iterations; converged iterations become no-ops)."""
    lcap, wcap = problem.valid.shape
    sigma = cfg.sigma_px

    # parameters: world→camera pose tangent state + points
    q_cw0, t_cw0 = lie.se3_inverse(problem.q_wc, problem.t_wc)
    obs_ok = problem.valid & problem.lm_active[:, None] \
        & problem.kf_active[None, :]
    n_res = jnp.sum(obs_ok.astype(jnp.int32))

    # gauge: fix the first ACTIVE window pose (position 0 is inactive padding
    # whenever fewer keyframes exist than the window size — fixing it would
    # leave the whole problem gauge-free)
    first_active = jnp.cumsum(problem.kf_active.astype(jnp.int32)) == 1
    gauge_free = problem.kf_active & ~first_active

    # soft priors (see BAConfig): anchor poses to the tracker estimates and
    # points to their depth-measured inits — removes the scale gauge and
    # keeps weakly-shared keyframes from escaping their basin
    w_rot = 1.0 / cfg.pose_prior_sigma_rot ** 2 \
        if cfg.pose_prior_sigma_rot > 0 else 0.0
    w_trn = 1.0 / cfg.pose_prior_sigma_t ** 2 \
        if cfg.pose_prior_sigma_t > 0 else 0.0
    w_pt_prior = 1.0 / cfg.point_prior_sigma ** 2 \
        if cfg.point_prior_sigma > 0 else 0.0
    wp_diag = jnp.asarray([w_rot] * 3 + [w_trn] * 3, jnp.float32)
    # observation-count decay (see BAConfig.prior_obs_decay): well-observed
    # poses/points converge to the prior-free (Ceres) optimum
    if cfg.prior_obs_decay > 0:
        n0 = cfg.prior_obs_decay
        n_obs_pose = jnp.sum(obs_ok, axis=0).astype(jnp.float32)   # (W,)
        n_obs_pt = jnp.sum(obs_ok, axis=1).astype(jnp.float32)     # (L,)
        decay_pose = n0 / (n0 + n_obs_pose)                        # (W,)
        decay_pt = n0 / (n0 + n_obs_pt)                            # (L,)
    else:
        decay_pose = jnp.ones(wcap, jnp.float32)
        decay_pt = jnp.ones(lcap, jnp.float32)
    wp_pose = wp_diag[None, :] * decay_pose[:, None]               # (W,6)
    wp_pt = w_pt_prior * decay_pt                                  # (L,)

    def prior_residuals(q_cw, t_cw, xyz):
        """Left-multiplicative pose tangents relative to the inits + point
        deltas: rp_pose (W,6), rp_pt (L,3)."""
        q_err = lie.quat_mul(q_cw, lie.quat_conj(q_cw0))
        dtheta = lie.so3_log(q_err)
        dt = t_cw - lie.quat_rotate(q_err, t_cw0)
        rp_pose = jnp.concatenate([dtheta, dt], axis=-1) \
            * gauge_free[:, None]
        rp_pt = (xyz - problem.xyz) * problem.lm_active[:, None]
        return rp_pose, rp_pt

    def prior_cost(q_cw, t_cw, xyz):
        rp_pose, rp_pt = prior_residuals(q_cw, t_cw, xyz)
        return 0.5 * (jnp.sum(rp_pose * rp_pose * wp_pose)
                      + jnp.sum(wp_pt[:, None] * rp_pt * rp_pt))

    def linearize(q_cw, t_cw, xyz):
        r, ok, xc = _residuals(k, q_cw, t_cw, xyz, problem.uv, obs_ok, sigma)
        w_huber = _huber_weight(r, cfg.huber_delta) * ok
        z = xc[..., 2]
        iz = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        zeros = jnp.zeros_like(iz)
        # d(residual)/d(xc): (L, W, 2, 3)
        ju = jnp.stack([k.fx * iz, zeros, -k.fx * xc[..., 0] * iz * iz], -1)
        jv = jnp.stack([zeros, k.fy * iz, -k.fy * xc[..., 1] * iz * iz], -1)
        jp = jnp.stack([ju, jv], -2) / sigma
        # pose: left-multiplicative xc' = exp(δθ)·xc + δt → [-[xc]×, I]
        sk = jnp.stack([
            jnp.stack([zeros, xc[..., 2], -xc[..., 1]], -1),
            jnp.stack([-xc[..., 2], zeros, xc[..., 0]], -1),
            jnp.stack([xc[..., 1], -xc[..., 0], zeros], -1)], -2)
        j_pose = jnp.concatenate([jnp.einsum("lwri,lwij->lwrj", jp, sk), jp],
                                 axis=-1)            # (L, W, 2, 6)
        # point: d xc / d X_w = R_cw → (L, W, 2, 3)
        r_cw = lie.quat_to_mat(q_cw)                 # (W, 3, 3)
        j_pt = jnp.einsum("lwri,wij->lwrj", jp, r_cw)
        # zero out gauge-fixed / invalid blocks
        j_pose = j_pose * (gauge_free[None, :, None, None]) * ok[..., None, None]
        j_pt = j_pt * ok[..., None, None]
        return r, ok, w_huber, j_pose, j_pt

    def solve_step(q_cw, t_cw, xyz, lam):
        r, ok, wh, j_pose, j_pt = linearize(q_cw, t_cw, xyz)
        whx = wh[..., None, None]
        u_blk = jnp.einsum("lwri,lwrj->wij", j_pose * whx, j_pose)   # (W,6,6)
        v_blk = jnp.einsum("lwri,lwrj->lij", j_pt * whx, j_pt)       # (L,3,3)
        w_blk = jnp.einsum("lwri,lwrj->lwij", j_pose * whx, j_pt)    # (L,W,6,3)
        g_pose = jnp.einsum("lwri,lwr->wi", j_pose * whx, r)          # (W,6)
        g_pt = jnp.einsum("lwri,lwr->li", j_pt * whx, r)              # (L,3)

        # prior terms (J ≈ I in the tangent): H += diag(w), g += w·r_prior
        rp_pose, rp_pt = prior_residuals(q_cw, t_cw, xyz)
        u_blk = u_blk + jnp.eye(6)[None] * wp_pose[:, None, :] \
            * gauge_free[:, None, None]
        v_blk = v_blk + wp_pt[:, None, None] * jnp.eye(3)[None] \
            * problem.lm_active[:, None, None]
        g_pose = g_pose + wp_pose * rp_pose
        g_pt = g_pt + wp_pt[:, None] * rp_pt

        # Ceres-style multiplicative damping: J'J + λ·diag(J'J) with the
        # diagonal clamped away from zero — regularizes near-parallax-free
        # landmarks whose V blocks are otherwise numerically singular (their
        # f32 adjugate inverses would poison the Schur complement)
        du = jnp.clip(jnp.diagonal(u_blk, axis1=-2, axis2=-1), 1e-6, 1e32)
        dv = jnp.clip(jnp.diagonal(v_blk, axis1=-2, axis2=-1), 1e-6, 1e32)
        u_d = u_blk + lam * du[..., None] * jnp.eye(6)[None]
        v_d = v_blk + lam * dv[..., None] * jnp.eye(3)[None]
        v_inv = _inv3x3(v_d, problem.lm_active)

        # Schur complement S = U − Σ_l W V⁻¹ Wᵀ  (W,W,6,6)
        wv = jnp.einsum("lwij,ljk->lwik", w_blk, v_inv)              # (L,W,6,3)
        s_cross = jnp.einsum("lwik,lvjk->wvij", wv, w_blk)           # (W,W,6,6)
        s = -s_cross
        s = s.at[jnp.arange(wcap), jnp.arange(wcap)].add(u_d)
        rhs = g_pose - jnp.einsum("lwik,lk->wi", wv, g_pt)           # (W,6)

        # fold to dense (6W, 6W); pin gauge-fixed / inactive poses to identity
        s_dense = s.transpose(0, 2, 1, 3).reshape(wcap * 6, wcap * 6)
        free = jnp.repeat(gauge_free, 6)
        s_dense = jnp.where(free[:, None] & free[None, :], s_dense, 0.0)
        s_dense = s_dense + jnp.diag(jnp.where(free, 0.0, 1.0))
        rhs_vec = jnp.where(free, rhs.reshape(-1), 0.0)

        d_pose = -ls.solve_psd(s_dense, rhs_vec, refine=2).reshape(wcap, 6)
        # back-substitute landmarks: δx = −V⁻¹(g_pt + Wᵀ δ_pose)
        wtd = jnp.einsum("lwij,wi->lj", w_blk, d_pose)
        d_pt = -jnp.einsum("lij,lj->li", v_inv, g_pt + wtd)
        d_pt = d_pt * problem.lm_active[:, None]

        # apply updates
        dq = lie.so3_exp(d_pose[:, :3])
        q_new = lie.quat_normalize(lie.quat_mul(dq, q_cw))
        t_new = lie.quat_rotate(dq, t_cw) + d_pose[:, 3:]
        x_new = xyz + d_pt
        step_sq = jnp.sum(d_pose * d_pose) + jnp.sum(d_pt * d_pt)
        grad_max = jnp.maximum(jnp.max(jnp.abs(g_pose)), jnp.max(jnp.abs(g_pt)))
        # predicted cost reduction of the damped quadratic model:
        # −gᵀδ − ½δᵀHδ = −½gᵀδ + ½λδᵀDδ  (using (H+λD)δ = −g)
        g_dot_d = jnp.sum(g_pose * d_pose) + jnp.sum(g_pt * d_pt)
        dtd = jnp.sum(d_pose * d_pose * du) + jnp.sum(d_pt * d_pt * dv)
        pred = -0.5 * g_dot_d + 0.5 * lam * dtd
        return q_new, t_new, x_new, step_sq, grad_max, pred

    r0, ok0, _ = _residuals(k, q_cw0, t_cw0, problem.xyz, problem.uv,
                            obs_ok, sigma)
    cost0 = _cost(r0, ok0, cfg.huber_delta)   # prior cost is 0 at the inits

    class Carry(NamedTuple):
        q_cw: jnp.ndarray
        t_cw: jnp.ndarray
        xyz: jnp.ndarray
        cost: jnp.ndarray
        lam: jnp.ndarray
        done: jnp.ndarray
        converged: jnp.ndarray
        iters: jnp.ndarray

    def lm_iter(c: Carry, _):
        q_new, t_new, x_new, step_sq, grad_max, pred = solve_step(
            c.q_cw, c.t_cw, c.xyz, c.lam)
        r_new, ok_new, _ = _residuals(k, q_new, t_new, x_new, problem.uv,
                                      obs_ok, sigma)
        cost_new = _cost(r_new, ok_new, cfg.huber_delta) \
            + prior_cost(q_new, t_new, x_new)
        # Ceres trust-region acceptance: gain ratio vs the quadratic model
        rho = (c.cost - cost_new) / jnp.maximum(pred, 1e-20)
        accept = (rho > 1e-3) & (cost_new < c.cost)
        # radius update: λ ×= max(1/3, 1−(2ρ−1)³) on accept; ×2 on reject
        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam = jnp.where(accept, jnp.maximum(c.lam * shrink, 1e-12),
                        jnp.minimum(c.lam * 2.0, 1e10))
        # termination checks (bundle_adjustment.hpp:843-847)
        # tolerances gate only on ACCEPTED steps (Ceres semantics — a single
        # rejected near-neutral overshoot must not terminate the solve);
        # a collapsed trust region (λ huge) ends iteration without claiming
        # convergence
        ftol = jnp.abs(c.cost - cost_new) <= cfg.function_tolerance * \
            jnp.maximum(c.cost, 1e-30)
        gtol = grad_max <= cfg.gradient_tolerance
        ptol = jnp.sqrt(step_sq) <= cfg.parameter_tolerance
        converged = accept & (ftol | gtol | ptol)
        collapsed = lam >= 1e7
        upd = accept & ~c.done
        new = Carry(
            q_cw=jnp.where(upd, q_new, c.q_cw),
            t_cw=jnp.where(upd, t_new, c.t_cw),
            xyz=jnp.where(upd, x_new, c.xyz),
            cost=jnp.where(upd, cost_new, c.cost),
            lam=jnp.where(c.done, c.lam, lam),
            done=c.done | converged | collapsed,
            converged=c.converged | converged,
            iters=c.iters + jnp.where(c.done, 0, 1))
        return new, None

    init = Carry(q_cw0, t_cw0, problem.xyz, cost0,
                 jnp.asarray(cfg.init_lambda, jnp.float32),
                 jnp.asarray(False), jnp.asarray(False),
                 jnp.asarray(0, jnp.int32))
    # while_loop, not scan: once `done` latches, every further iteration is
    # a masked no-op, so exiting early returns the identical carry while
    # cutting solve latency to the iterations actually used (typical
    # convergence is 5-15 of the 20 allowed, README.md:241) — the solve is
    # iteration-sequencing-bound on TPU (docs/PERF.md), so latency scales
    # ~linearly with executed iterations.
    final = jax.lax.while_loop(
        lambda c: jnp.logical_not(c.done) & (c.iters < cfg.max_iterations),
        lambda c: lm_iter(c, None)[0],
        init)

    q_wc, t_wc = lie.se3_inverse(final.q_cw, final.t_cw)
    return BAResult(q_wc=q_wc, t_wc=t_wc, xyz=final.xyz,
                    initial_cost=cost0, final_cost=final.cost,
                    iterations=final.iters, converged=final.converged,
                    n_residuals=n_res)


def _inv3x3(m: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate); inactive → zero block."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack([
        jnp.stack([co_a, -(b * i - c * h), b * f - c * e], -1),
        jnp.stack([co_b, a * i - c * g, -(a * f - c * d)], -1),
        jnp.stack([co_c, -(a * h - b * g), a * e - b * d], -1)], -2)
    inv = adj / det[..., None, None]
    return inv * active[..., None, None]


# ---------------------------------------------------------------------------
# Window extraction / write-back (bundleAdjustmentCallback, backend.cpp:874-990)
# ---------------------------------------------------------------------------

def extract_window(cfg, state, max_landmarks: int = 512):
    """MapState → (BAProblem, window_slots, lm_slots).

    Window = the last min(window_size, count) keyframes in the ring
    (backend.cpp:895-901); landmark set = landmarks observed in the window,
    capped at max_landmarks by in-window observation count
    (backend.cpp:916-945 gathers exactly the window-observed set).
    """
    from dynamic_visual_slam_tpu.config import SLAMConfig  # typing only
    lm, kdb = state.landmarks, state.keyframes
    f_cap = kdb.q.shape[0]
    w = cfg.ba.window_size

    # monotone sequence ids of the last w keyframes, oldest-first so the
    # gauge fixes the OLDEST pose (hpp:781-785); obs rings store the same
    # monotone ids, so stale observations of recycled ring slots never match
    seq = (kdb.next_slot - 1 - jnp.arange(w))[::-1]    # oldest first
    window_slots = (seq % f_cap).astype(jnp.int32)
    kf_active = seq >= 0

    # (L, M, W): does obs m of landmark l live in window position w?
    in_win = (lm.obs_kf[:, :, None] == seq[None, None, :]) \
        & lm.obs_valid[:, :, None] & kf_active[None, None, :]
    obs_per_lm = jnp.sum(in_win.astype(jnp.int32), axis=(1, 2))
    score = jnp.where(lm.active, obs_per_lm, -1)
    max_landmarks = min(max_landmarks, score.shape[-1])
    _, lm_slots = jax.lax.top_k(score, max_landmarks)
    # single-observation landmarks give rank-2 V blocks (2 residual rows, 3
    # unknowns) — pure gauge noise; exclude them (their pose information is
    # nil: any pose change is absorbed by the free point)
    lm_sel_active = score[lm_slots] >= 2

    sel_in_win = in_win[lm_slots]                       # (Lba, M, W)
    has_obs = jnp.any(sel_in_win, axis=1)               # (Lba, W)
    first_m = jnp.argmax(sel_in_win, axis=1)            # (Lba, W)
    uv = jnp.take_along_axis(lm.obs_uv[lm_slots], first_m[:, :, None],
                             axis=1)                    # (Lba, W, 2)

    problem = BAProblem(
        q_wc=kdb.q[window_slots], t_wc=kdb.t[window_slots],
        kf_active=kf_active,
        xyz=lm.xyz[lm_slots], lm_active=lm_sel_active,
        uv=uv, valid=has_obs)
    return problem, window_slots, lm_slots


def apply_result(state, result: BAResult, window_slots, lm_slots,
                 min_valid: bool = True):
    """Write optimized poses/points back into the arenas
    (updateOptimizedResults, backend.cpp:1356-1392).

    The reference gates on Ceres CONVERGENCE because a failed Ceres solve can
    return garbage; our LM scan only ever accepts cost-decreasing steps, so
    any result with final_cost < initial_cost is a strict improvement — gate
    on that instead (a converged-only gate would throw away good updates
    whenever the 20-iteration budget ends mid-polish)."""
    lm, kdb = state.landmarks, state.keyframes
    improved = result.final_cost < result.initial_cost
    apply = improved if min_valid else jnp.asarray(True)
    q = jnp.where(apply, result.q_wc, kdb.q[window_slots])
    t = jnp.where(apply, result.t_wc, kdb.t[window_slots])
    x = jnp.where(apply, result.xyz, lm.xyz[lm_slots])
    kdb = kdb._replace(q=kdb.q.at[window_slots].set(q),
                       t=kdb.t.at[window_slots].set(t))
    lm = lm._replace(xyz=lm.xyz.at[lm_slots].set(x))
    return state._replace(landmarks=lm, keyframes=kdb)


def run_ba(cfg, k: Intrinsics, state, max_landmarks: int = 512):
    """One BA round on the current window: extract → optimize → write back.
    Jit this whole function; dispatch it asynchronously from the pipeline
    (the reference's 2 s wall-timer + ba_running_ flag, backend.cpp:874-890,
    maps to async device execution overlapping the next tracking steps)."""
    problem, window_slots, lm_slots = extract_window(cfg, state, max_landmarks)
    result = optimize(k, problem, cfg.ba)
    new_state = apply_result(state, result, window_slots, lm_slots)
    return new_state, result
