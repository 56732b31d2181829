"""Pose-graph optimization over the keyframe ring for loop corrections.

The reference links DBoW2 as "loop-closure ready" but never closes a loop
(SURVEY.md C7); this rebuild both detects and consumes loops.  The first
consumption scheme (pipeline/slam.py apply_loop) distributes the drift
correction by keyframe age — the standard treatment, used by production
SLAM systems, is a POSE-GRAPH solve instead: odometry edges between
consecutive keyframes pin their measured relative transforms, the verified
loop adds an absolute pose constraint on the entry keyframe, and the
least-squares optimum distributes the drift according to the actual graph
structure rather than a linear age schedule.

TPU-native formulation: the ring is a FIXED-capacity arena (F ≤ 64 slots,
backend/mapping.py), so the whole graph is dense and tiny — a (6F, 6F)
Gauss-Newton normal system solved exactly in a handful of MXU matmuls.
No sparse machinery, no Schur tricks, static shapes throughout; inactive
slots ride along pinned to zero correction.  The Jacobian comes from
`jax.jacfwd` of the residual stack (R ≈ 13F rows), which XLA fuses into
the same program as the solve.

Parameterization per keyframe k: left rotation tangent φ_k plus additive
translation δ_k — q_k = exp(φ_k) ∘ q_k0,  t_k = t_k0 + δ_k.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynamic_visual_slam_tpu.core import lie


def _safe_so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """so3_exp with a jacfwd-safe norm: lie.so3_exp guards its VALUE at
    φ=0 with a where(), but d‖φ‖/dφ = φ/‖φ‖ is NaN at exactly zero — and
    Gauss-Newton starts at x=0, so every Jacobian row would be NaN.
    sqrt(φ·φ + ε) has the same value to 1e-12 and a finite gradient."""
    theta = jnp.sqrt(jnp.sum(phi * phi, axis=-1, keepdims=True) + 1e-24)
    half = 0.5 * theta
    k = jnp.sin(half) / theta
    return jnp.concatenate([jnp.cos(half), k * phi], axis=-1)


def _safe_so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """so3_log with a jacfwd-safe vector norm (see _safe_so3_exp); the
    residual is exactly zero rotation whenever a pose matches its
    measurement, which is the typical case for most edges."""
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vn = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-24)
    theta = 2.0 * jnp.arctan2(vn, w)
    return (theta / vn) * v


class PGOResult(NamedTuple):
    q: jnp.ndarray        # (F, 4) optimized ring poses
    t: jnp.ndarray        # (F, 3)
    q_corr: jnp.ndarray   # (F, 4) world-frame correction per slot:
    t_corr: jnp.ndarray   # (F, 3)   T_new ∘ T_old⁻¹ (identity where pinned)
    ok: jnp.ndarray       # () bool — entry keyframe was found in the ring


def optimize_ring(q0: jnp.ndarray, t0: jnp.ndarray, active: jnp.ndarray,
                  seq: jnp.ndarray, q_loop: jnp.ndarray, t_loop: jnp.ndarray,
                  entry_seq: jnp.ndarray, cand_seq: jnp.ndarray,
                  iters: int = 8, damping: float = 1e-4,
                  w_loop: float = 4.0) -> PGOResult:
    """Gauss-Newton pose graph over the keyframe ring.

    q0/t0 (F,4)/(F,3): current ring poses (camera-to-world);
    active (F,) bool; seq (F,) int32 monotone keyframe ids (-like);
    q_loop/t_loop: the verified absolute pose of the ENTRY keyframe from
    loop PnP; entry_seq/cand_seq: the loop endpoints' sequence ids.

    Residuals (all static-shape, masked by weights):
      - odometry (F-1 edges): consecutive active keyframes in seq order
        must keep their measured relative transform T_i⁻¹∘T_j;
      - loop prior (1 edge, weight w_loop): the entry keyframe's absolute
        pose must match T_pnp;
      - pins: the candidate keyframe (gauge anchor — the loop correction
        is relative to ITS frame) and all inactive slots are pinned hard;
        every state gets a tiny Tikhonov pull so H stays PD.
    """
    f = q0.shape[0]
    big = jnp.iinfo(jnp.int32).max // 2
    seq_key = jnp.where(active, seq, big)
    order = jnp.argsort(seq_key)                     # active first, seq-sorted
    ei, ej = order[:-1], order[1:]                   # (F-1,) edge endpoints
    w_odo = (active[ei] & active[ej]).astype(jnp.float32)

    # measured relative transforms from the CURRENT (pre-correction) poses —
    # these encode the odometry the frontend actually integrated
    qi0, ti0 = q0[ei], t0[ei]
    q_ij0, t_ij0 = lie.se3_compose(*lie.se3_inverse(qi0, ti0),
                                   q0[ej], t0[ej])

    entry_hit = (seq == entry_seq) & active
    entry_slot = jnp.argmax(entry_hit)
    ok = jnp.any(entry_hit)
    cand_hit = (seq == cand_seq) & active
    # gauge: the candidate keyframe if still in the ring, else the oldest
    # active keyframe (the least-drifted end of the chain)
    oldest = jnp.argmin(seq_key)
    cand_slot = jnp.where(jnp.any(cand_hit), jnp.argmax(cand_hit), oldest)

    pin = (~active) | (jnp.arange(f) == cand_slot)
    pin_w = jnp.where(pin, 1e3, 1e-3)                # (F,)

    def residuals(x):
        phi, rho = x[:, :3], x[:, 3:]
        q = lie.quat_normalize(lie.quat_mul(_safe_so3_exp(phi), q0))
        t = t0 + rho
        q_rel, t_rel = lie.se3_compose(*lie.se3_inverse(q[ei], t[ei]),
                                       q[ej], t[ej])
        r_rot = _safe_so3_log(lie.quat_mul(lie.quat_conj(q_ij0), q_rel))
        r_odo = jnp.concatenate([r_rot, t_rel - t_ij0], axis=-1) \
            * w_odo[:, None]                          # (F-1, 6)
        r_lrot = _safe_so3_log(lie.quat_mul(lie.quat_conj(q_loop),
                                            q[entry_slot]))
        r_loop = jnp.concatenate([r_lrot, t[entry_slot] - t_loop]) \
            * (w_loop * ok.astype(jnp.float32))       # (6,)
        r_pin = (x * pin_w[:, None]).reshape(-1)      # (6F,)
        return jnp.concatenate([r_odo.reshape(-1), r_loop, r_pin])

    eye = jnp.eye(6 * f, dtype=jnp.float32)

    def gn_step(x, _):
        r = residuals(x)
        j = jax.jacfwd(residuals)(x).reshape(r.shape[0], 6 * f)
        h = j.T @ j + damping * eye
        dx = jnp.linalg.solve(h, j.T @ r)
        return x - dx.reshape(f, 6), None

    x, _ = jax.lax.scan(gn_step, jnp.zeros((f, 6), jnp.float32), None,
                        length=iters)

    phi, rho = x[:, :3], x[:, 3:]
    q_new = lie.quat_normalize(lie.quat_mul(lie.so3_exp(phi), q0))
    t_new = t0 + rho
    # no-op everything when the entry keyframe is gone
    q_new = jnp.where(ok, q_new, q0)
    t_new = jnp.where(ok, t_new, t0)
    q_corr, t_corr = lie.se3_compose(q_new, t_new,
                                     *lie.se3_inverse(q0, t0))
    return PGOResult(q=q_new, t=t_new, q_corr=q_corr, t_corr=t_corr, ok=ok)
