"""Batched RANSAC estimators: fundamental matrix + PnP, all hypotheses at once.

The reference calls cv::findFundamentalMat(FM_RANSAC, 2.0 px, 0.99)
(frontend.cpp:1146-1147) and cv::solvePnPRansac(100 iter, 4.0 px, 0.99)
(frontend.cpp:911-923) — sequential CPU hypothesize-and-verify loops.

TPU redesign: a *fixed* batch of hypotheses is generated, solved, and scored
in parallel (vmap over the hypothesis axis ⇒ batched small SVDs + one big
residual matrix on the VPU/MXU).  No early termination — with 128-256
simultaneous hypotheses the success probability already exceeds the 0.99
adaptive-termination target for any usable inlier ratio, and the fixed shape
is what makes the whole tracking step one compiled program.  Parity is
defined on inlier-set quality and pose error, not RNG-identical sampling
(SURVEY.md §7 "hard parts").

All inputs are capacity+mask arrays; degenerate cases (too few matches)
return valid=False and identity poses — mirroring the reference's
keep-last-pose fallback (frontend.cpp:925-944).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynamic_visual_slam_tpu.core import containers, lie
from dynamic_visual_slam_tpu.core.camera import Intrinsics
from dynamic_visual_slam_tpu.ops import linalg_small as ls


def _sample_indices(key: jax.Array, n_hyp: int, sample_size: int,
                    count: jnp.ndarray) -> jnp.ndarray:
    """(n_hyp, sample_size) indices into the *compacted* valid region [0,count).

    Uniform with replacement across draws; within a draw duplicates are
    avoided by a fixed small number of re-draw rounds (cheap, static).
    """
    idx = jax.random.randint(key, (n_hyp, sample_size, 4), 0, jnp.maximum(count, 1))
    # per slot, take the first of 4 candidates that doesn't clash with earlier
    # slots (static unroll over the tiny sample_size)
    picks = []
    for s in range(sample_size):
        cand = idx[:, s, :]  # (n_hyp, 4) candidates for this slot
        if not picks:
            picks.append(cand[:, 0])
            continue
        prev = jnp.stack(picks, axis=1)  # (n_hyp, s)
        best = cand[:, 0]
        for a in range(1, 4):
            clash = jnp.any(prev == best[:, None], axis=1)
            best = jnp.where(clash, cand[:, a], best)
        picks.append(best)
    return jnp.stack(picks, axis=1)


# ===========================================================================
# Fundamental matrix
# ===========================================================================

class FundamentalResult(NamedTuple):
    F: jnp.ndarray            # (3, 3)
    inliers: jnp.ndarray      # (K,) bool — over the ORIGINAL match slots
    n_inliers: jnp.ndarray    # () int32
    valid: jnp.ndarray        # () bool


def _normalize_points(pts: jnp.ndarray):
    """Hartley normalization: translate to centroid, scale mean dist to √2."""
    c = jnp.mean(pts, axis=0)
    d = jnp.mean(jnp.linalg.norm(pts - c, axis=1))
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-9)
    t = jnp.array([[s, 0, -s * c[0]], [0, s, -s * c[1]], [0, 0, 1.0]])
    return (pts - c) * s, t


def _eight_point_weighted(p1: jnp.ndarray, p2: jnp.ndarray,
                          w: jnp.ndarray) -> jnp.ndarray:
    """Normalized 8-point from weighted correspondences → F (3,3): epipolar
    rows x2ᵀFx1=0, nullspace via AᵀA smallest eigvec (jnp.linalg.svd lowers
    to a sequential loop on TPU — avoided), rank-2 projection
    F(I − v₃v₃ᵀ), denormalize."""
    n1, t1 = _normalize_points(p1)
    n2, t2 = _normalize_points(p2)
    x1, y1 = n1[:, 0], n1[:, 1]
    x2, y2 = n2[:, 0], n2[:, 1]
    a = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
                   jnp.ones_like(x1)], -1) * w[:, None]
    f = ls.smallest_eigvec(a.T @ a).reshape(3, 3)
    _, v = ls.eigh3x3(f.T @ f)
    v3 = v[..., 0]
    f2 = f - jnp.outer(f @ v3, v3)
    return t2.T @ f2 @ t1


def _eight_point(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """(8,2),(8,2) minimal sample → F (3,3)."""
    return _eight_point_weighted(p1, p2, jnp.ones(p1.shape[0]))


def _epipolar_errors(f: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Symmetric point-to-epipolar-line distance (max of both directions),
    matching cv::FM_RANSAC's error metric."""
    h1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], axis=1)  # (K,3)
    h2 = jnp.concatenate([p2, jnp.ones_like(p2[:, :1])], axis=1)
    l2 = h1 @ f.T       # epipolar lines in image 2
    l1 = h2 @ f         # epipolar lines in image 1
    num = jnp.abs(jnp.sum(h2 * l2, axis=1))
    d2 = num / jnp.maximum(jnp.linalg.norm(l2[:, :2], axis=1), 1e-12)
    d1 = num / jnp.maximum(jnp.linalg.norm(l1[:, :2], axis=1), 1e-12)
    return jnp.maximum(d1, d2)


def fundamental_ransac(p1: jnp.ndarray, p2: jnp.ndarray, mask: jnp.ndarray,
                       key: jax.Array, n_hyp: int = 256,
                       threshold: float = 2.0) -> FundamentalResult:
    """p1/p2: (K,2) matched pixels (same slot = same match), mask: (K,) bool."""
    k_cap = p1.shape[0]
    count = jnp.sum(mask.astype(jnp.int32))
    # compact valid matches to the front so sampling hits only valid rows
    # (prefix-sum partition, not argsort: a stable 1024-sort is a ~0.5 ms
    # sequential while loop on TPU and this sits on the per-frame latency
    # critical path)
    order = containers.stable_partition(mask)
    cp1, cp2 = p1[order], p2[order]

    samples = _sample_indices(key, n_hyp, 8, count)      # (N,8)
    s1 = cp1[samples]                                            # (N,8,2)
    s2 = cp2[samples]
    fs = jax.vmap(_eight_point)(s1, s2)                          # (N,3,3)
    errs = jax.vmap(lambda f: _epipolar_errors(f, p1, p2))(fs)   # (N,K)
    inl = (errs < threshold) & mask[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)

    # least-squares refit on the best inlier set
    w = inl[best].astype(jnp.float32)
    f = _eight_point_weighted(jnp.where(mask[:, None], p1, 0.0),
                              jnp.where(mask[:, None], p2, 0.0), w)
    refined_inl = (_epipolar_errors(f, p1, p2) < threshold) & mask
    refined_n = jnp.sum(refined_inl)
    use_refined = refined_n >= scores[best]
    inliers = jnp.where(use_refined, refined_inl, inl[best])
    f_out = jnp.where(use_refined, f, fs[best])
    n_in = jnp.maximum(refined_n, scores[best])
    return FundamentalResult(f_out, inliers, n_in.astype(jnp.int32),
                             (count >= 8) & (n_in >= 8))


# ===========================================================================
# PnP
# ===========================================================================

class PnPResult(NamedTuple):
    """Pose maps object-frame points into the camera: X_cam = R X + t."""

    q: jnp.ndarray            # (4,) wxyz
    t: jnp.ndarray            # (3,)
    inliers: jnp.ndarray      # (K,) bool
    n_inliers: jnp.ndarray    # () int32
    valid: jnp.ndarray        # () bool


def _dlt_pose(xyz: jnp.ndarray, xn: jnp.ndarray):
    """(6,3) object points + (6,2) normalized image points → (R, t) via DLT
    + Procrustes orthogonalization + cheirality fix."""
    n = xyz.shape[0]
    zeros = jnp.zeros((n, 4))
    xh = jnp.concatenate([xyz, jnp.ones((n, 1))], axis=1)        # (6,4)
    rows_u = jnp.concatenate([xh, zeros, -xn[:, :1] * xh], axis=1)
    rows_v = jnp.concatenate([zeros, xh, -xn[:, 1:2] * xh], axis=1)
    a = jnp.concatenate([rows_u, rows_v], axis=0)                # (12,12)
    p = ls.smallest_eigvec(a.T @ a).reshape(3, 4)
    # cheirality: mean depth of points must be positive
    depths = xh @ p[2]
    p = p * jnp.where(jnp.mean(depths) < 0, -1.0, 1.0)
    m = p[:, :3]
    u, s, vt2 = ls.svd3x3(m)
    det = jnp.linalg.det(u @ vt2)
    d = jnp.diag(jnp.array([1.0, 1.0, 1.0]))
    r = u @ d.at[2, 2].set(det) @ vt2
    scale = jnp.mean(s) * jnp.where(det < 0, -1.0, 1.0)
    t = p[:, 3] / jnp.maximum(jnp.abs(scale), 1e-12) * jnp.sign(scale)
    return r, t


def _reproj_errors(k: Intrinsics, r: jnp.ndarray, t: jnp.ndarray,
                   xyz: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    xc = xyz @ r.T + t
    z = jnp.maximum(xc[:, 2], 1e-6)
    u = k.fx * xc[:, 0] / z + k.cx
    v = k.fy * xc[:, 1] / z + k.cy
    err = jnp.sqrt((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2)
    return jnp.where(xc[:, 2] > 1e-6, err, 1e9)


def _gauss_newton_refine(k: Intrinsics, q0, t0, xyz, uv, w, iters: int):
    """Masked GN on SE(3) (left-multiplicative so3+t), reprojection residuals.
    Replaces cv::solvePnP ITERATIVE refinement."""
    def step(carry, _):
        q, t = carry
        r = lie.quat_to_mat(q)
        xc = xyz @ r.T + t                       # (K,3)
        z = jnp.maximum(xc[:, 2], 1e-6)
        iz = 1.0 / z
        u = k.fx * xc[:, 0] * iz + k.cx
        v = k.fy * xc[:, 1] * iz + k.cy
        res = jnp.stack([u - uv[:, 0], v - uv[:, 1]], -1)        # (K,2)
        # d(res)/d(xc)
        ju = jnp.stack([k.fx * iz, jnp.zeros_like(z),
                        -k.fx * xc[:, 0] * iz * iz], -1)
        jv = jnp.stack([jnp.zeros_like(z), k.fy * iz,
                        -k.fy * xc[:, 1] * iz * iz], -1)
        jp = jnp.stack([ju, jv], 1)                              # (K,2,3)
        # d(xc)/d[dθ, dt] with xc' = exp(dθ)(R X + t) + dt ⇒ [-[xc]x | I]
        zs = jnp.zeros_like(z)
        skew = jnp.stack([
            jnp.stack([zs, xc[:, 2], -xc[:, 1]], -1),
            jnp.stack([-xc[:, 2], zs, xc[:, 0]], -1),
            jnp.stack([xc[:, 1], -xc[:, 0], zs], -1)], 1)        # (K,3,3) = -[xc]×
        jtheta = jnp.einsum("kij,kjl->kil", jp, skew)            # (K,2,3)
        jfull = jnp.concatenate([jtheta, jp], axis=2)            # (K,2,6)
        wk = (w * (xc[:, 2] > 1e-6))[:, None, None]
        h = jnp.einsum("kri,krj->ij", jfull * wk, jfull)
        b = jnp.einsum("kri,kr->i", jfull * wk, res)
        dx = -ls.solve_psd(h, b, damping=1e-6)
        # left-multiplicative update xc' = exp(dθ)·xc + dt composes onto the
        # pose as q' = exp(dθ)·q, t' = exp(dθ)·t + dt
        dq = lie.so3_exp(dx[:3])
        q_new = lie.quat_normalize(lie.quat_mul(dq, q))
        t_new = lie.quat_rotate(dq, t) + dx[3:]
        return (q_new, t_new), None

    # unrolled, not lax.scan: the body is ~10 tiny fused kernels and the
    # step is latency-bound, so per-iteration while-loop sequencing overhead
    # dominated the actual GN math; unrolling lets XLA fuse across
    # iterations into one dispatch chain (same floats, fewer kernels)
    carry = (q0, t0)
    for _ in range(iters):
        carry, _ = step(carry, None)
    return carry


def pnp_ransac(k: Intrinsics, xyz: jnp.ndarray, uv: jnp.ndarray,
               mask: jnp.ndarray, key: jax.Array, n_hyp: int = 128,
               threshold: float = 4.0, min_inliers: int = 6,
               refine_iters: int = 10,
               prior_q: jnp.ndarray | None = None,
               prior_t: jnp.ndarray | None = None) -> PnPResult:
    """xyz: (K,3) object-frame points; uv: (K,2) observed pixels; mask valid.

    Equivalent of cv::solvePnPRansac + iterative refinement on the inlier set
    (frontend.cpp:911-923).

    prior_q/prior_t (optional): a predicted pose (same convention as the
    result: X_cam = R X + t) injected into the hypothesis pool alongside an
    identity hypothesis, scored against the random minimal-set draws by the
    same inlier count.  On fast motion the DLT-6 minimal solutions are noisy
    and their inlier sets biased; a constant-velocity prediction that scores
    more inliers than every random draw then seeds the refinement instead.
    When the prediction is worse it simply loses the argmax — injection
    never degrades the inlier score of the selected hypothesis.
    """
    count = jnp.sum(mask.astype(jnp.int32))
    order = containers.stable_partition(mask)   # see fundamental_ransac note
    cxyz, cuv = xyz[order], uv[order]

    xn = jnp.stack([(uv[:, 0] - k.cx) / k.fx, (uv[:, 1] - k.cy) / k.fy], -1)
    cxn = xn[order]

    samples = _sample_indices(key, n_hyp, 6, count)
    rs, ts = jax.vmap(_dlt_pose)(cxyz[samples], cxn[samples])    # (N,3,3),(N,3)
    if prior_q is not None:
        rs = jnp.concatenate(
            [rs, lie.quat_to_mat(prior_q)[None], jnp.eye(3)[None]], axis=0)
        ts = jnp.concatenate(
            [ts, prior_t[None], jnp.zeros((1, 3), ts.dtype)], axis=0)
    errs = jax.vmap(lambda r, t: _reproj_errors(k, r, t, xyz, uv))(rs, ts)
    inl = (errs < threshold) & mask[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)

    q0 = lie.mat_to_quat(rs[best])
    t0 = ts[best]
    # two refinement rounds with inlier re-selection in between — the DLT-6
    # minimal solutions are noisy, so the first inlier set is biased; one
    # re-gate after polishing recovers cv2-grade accuracy (see
    # tests/test_ransac.py cv2 parity bounds)
    w = inl[best].astype(jnp.float32)
    q, t = _gauss_newton_refine(k, q0, t0, xyz, uv, w, refine_iters)
    mid_err = _reproj_errors(k, lie.quat_to_mat(q), t, xyz, uv)
    w2 = ((mid_err < threshold) & mask).astype(jnp.float32)
    q, t = _gauss_newton_refine(k, q, t, xyz, uv, w2, refine_iters)
    final_err = _reproj_errors(k, lie.quat_to_mat(q), t, xyz, uv)
    inliers = (final_err < threshold) & mask
    n_in = jnp.sum(inliers.astype(jnp.int32))
    keep_refined = n_in >= scores[best]
    q = jnp.where(keep_refined, q, q0)
    t = jnp.where(keep_refined, t, t0)
    inliers = jnp.where(keep_refined, inliers, inl[best])
    n_in = jnp.maximum(n_in, scores[best])
    return PnPResult(q, t, inliers, n_in,
                     (count >= min_inliers) & (n_in >= min_inliers))
