"""Pose-graph loop consumption (backend/pose_graph.py).

Unit level: Gauss-Newton over a drifted keyframe chain with a ground-truth
loop constraint must pull every pose toward GT (odometry edges keep the
chain shape; the loop pins the far end).  System level: the pipeline's
loop_pgo=True path must correct the drift-injected two-orbit fixture at
least as the interpolated scheme does (tests/test_soak.py).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_visual_slam_tpu.backend import pose_graph
from dynamic_visual_slam_tpu.config import CameraConfig, MapConfig, SLAMConfig
from dynamic_visual_slam_tpu.core import lie
from dynamic_visual_slam_tpu.io import synthetic
from dynamic_visual_slam_tpu.pipeline.slam import SLAMSystem


def _chain(f=8, noise=0.02, seed=0):
    """GT poses along a bent path; drifted ring = integration of noisy
    relative transforms. Returns (q_gt, t_gt, q0, t0)."""
    rng = np.random.default_rng(seed)
    q_gt = [np.array([1.0, 0, 0, 0], np.float32)]
    t_gt = [np.zeros(3, np.float32)]
    for k in range(1, f):
        dq = np.asarray(lie.so3_exp(jnp.asarray(
            [0.0, 0.04, 0.0], jnp.float32)))
        q, t = lie.se3_compose(jnp.asarray(q_gt[-1]), jnp.asarray(t_gt[-1]),
                               jnp.asarray(dq),
                               jnp.asarray([0.1, 0.0, 0.02], jnp.float32))
        q_gt.append(np.asarray(q))
        t_gt.append(np.asarray(t))
    q0, t0 = [q_gt[0]], [t_gt[0]]
    for k in range(1, f):
        # measured relative = GT relative + noise; integrate → drift
        q_rel, t_rel = lie.se3_compose(
            *lie.se3_inverse(jnp.asarray(q_gt[k - 1]),
                             jnp.asarray(t_gt[k - 1])),
            jnp.asarray(q_gt[k]), jnp.asarray(t_gt[k]))
        nq = lie.so3_exp(jnp.asarray(
            rng.normal(size=3) * noise * 0.3, jnp.float32))
        q_rel = lie.quat_mul(nq, q_rel)
        t_rel = t_rel + jnp.asarray(rng.normal(size=3) * noise, jnp.float32)
        q, t = lie.se3_compose(jnp.asarray(q0[-1]), jnp.asarray(t0[-1]),
                               q_rel, t_rel)
        q0.append(np.asarray(q))
        t0.append(np.asarray(t))
    return (np.stack(q_gt), np.stack(t_gt),
            np.stack(q0).astype(np.float32), np.stack(t0).astype(np.float32))


class TestOptimizeRing:
    def test_loop_constraint_pulls_chain_to_gt(self):
        f = 8
        q_gt, t_gt, q0, t0 = _chain(f)
        seq = jnp.arange(f, dtype=jnp.int32)
        res = pose_graph.optimize_ring(
            jnp.asarray(q0), jnp.asarray(t0), jnp.ones(f, bool), seq,
            jnp.asarray(q_gt[-1]), jnp.asarray(t_gt[-1]),
            entry_seq=jnp.asarray(f - 1), cand_seq=jnp.asarray(0))
        assert bool(res.ok)
        err0 = np.linalg.norm(t0 - t_gt, axis=1)
        err1 = np.linalg.norm(np.asarray(res.t) - t_gt, axis=1)
        # the far end lands on the loop constraint ...
        assert err1[-1] < 0.25 * max(err0[-1], 1e-6), (err0, err1)
        # ... and the chain as a whole improves
        assert err1.mean() < 0.6 * err0.mean(), (err0.mean(), err1.mean())
        # gauge: the candidate keyframe did not move
        np.testing.assert_allclose(np.asarray(res.t)[0], t0[0], atol=1e-3)

    def test_missing_entry_is_a_noop(self):
        f = 6
        q_gt, t_gt, q0, t0 = _chain(f)
        seq = jnp.arange(f, dtype=jnp.int32)
        res = pose_graph.optimize_ring(
            jnp.asarray(q0), jnp.asarray(t0), jnp.ones(f, bool), seq,
            jnp.asarray(q_gt[-1]), jnp.asarray(t_gt[-1]),
            entry_seq=jnp.asarray(99), cand_seq=jnp.asarray(0))
        assert not bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.t), t0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.q), q0, atol=1e-6)

    def test_inactive_slots_pinned_and_evicted_cand_falls_back(self):
        f = 8
        q_gt, t_gt, q0, t0 = _chain(f)
        active = jnp.asarray([False, True, True, True, True, True, True,
                              True])
        seq = jnp.arange(f, dtype=jnp.int32)
        # cand_seq=0 is inactive (evicted) → gauge falls back to oldest
        # active (slot 1)
        res = pose_graph.optimize_ring(
            jnp.asarray(q0), jnp.asarray(t0), active, seq,
            jnp.asarray(q_gt[-1]), jnp.asarray(t_gt[-1]),
            entry_seq=jnp.asarray(f - 1), cand_seq=jnp.asarray(0))
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.t)[0], t0[0], atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.t)[1], t0[1], atol=1e-3)
        err0 = np.linalg.norm(t0[-1] - t_gt[-1])
        err1 = np.linalg.norm(np.asarray(res.t)[-1] - t_gt[-1])
        assert err1 < 0.3 * max(err0, 1e-6)


@pytest.mark.slow
def test_pgo_loop_consumption_corrects_drift():
    """The loop_pgo=True pipeline path on the drift-injected two-orbit
    fixture (same as test_soak.py::test_loop_closure_corrects_drift, which
    pins the interpolated path): corrections are applied and pull ATE down
    by a real margin."""
    cam = CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                       cx=79.5, cy=59.5)
    base = SLAMConfig()
    cfg = base.replace(
        camera=cam,
        keyframe=dataclasses.replace(base.keyframe, max_frames_between_kf=6),
        ba=dataclasses.replace(base.ba, period_s=1.0),
        # widened depth gate: the injected 1.4x depth-scale drift pushes the
        # scene (raw 1.8-3.6 m) past the production 3.0 m gate, starving the
        # tracker of features at the orbit tail — chaotic-noise ATE that no
        # loop correction can fix by construction. 6 m keeps the fixture a
        # pure drift-correction test.
        depth=dataclasses.replace(base.depth, max_depth=6.0),
        map=MapConfig(max_landmarks=1024, max_keyframes=8,
                      max_obs_per_landmark=6, max_obs_per_keyframe=256))
    n_orbit, drift = 100, 0.40
    scene = synthetic.SyntheticScene(cam, seed=5)
    poses = synthetic.loop_trajectory(n_orbit) + \
        synthetic.loop_trajectory(n_orbit, radius=0.34)
    frames = []
    for i, (r, t) in enumerate(poses):
        gray, depth = scene.render(r, t)
        scale = 1.0 + drift * i / len(poses)
        frames.append((gray, depth * scale, t))
    gt = np.stack([t for _, _, t in frames])

    from dynamic_visual_slam_tpu.io.trajectory import ate_rmse

    def run(loop_correction):
        slam = SLAMSystem(cfg, ba_async=False, vocab_train_keyframes=3,
                          loop_min_gap=12, loop_min_score=0.15,
                          loop_correction=loop_correction, loop_pgo=True)
        for i, (gray, depth, _) in enumerate(frames):
            slam.process(gray, depth, i / 30.0)
        slam.finalize()
        est = np.stack([f.t_wc for f in slam.trajectory])
        return slam, float(ate_rmse(est, gt))

    slam_on, ate_on = run(True)
    slam_off, ate_off = run(False)
    assert slam_on.stats.get("loops_applied", 0) >= 1
    assert ate_on < ate_off * 0.8, (ate_on, ate_off)


class TestInterpVsPGODivergence:
    def test_pgo_beats_interp_at_32_ring_large_correction(self):
        """The regime where the two loop-consumption schemes diverge
        (VERDICT r4 next #8 — they measure equivalent at ring capacity
        8): a 32-keyframe ring with smoothly accumulated drift and a
        large one-shot correction (~0.28 rad / 0.22 m). The interp
        scheme's linear age ramp applied about the world origin distorts
        a chain this long; the pose-graph solve respects the odometry
        structure. Measured (this fixture): interp keyframe ATE 0.094 m,
        PGO 0.037 m — the basis for loop_pgo=True as the r5 default.
        Drives the REAL shipped programs (slam._apply_loop_fn /
        _apply_loop_pgo_fn) on a crafted ring."""
        import jax.numpy as jnp

        f = 32
        cam = CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                           cx=79.5, cy=59.5)
        cfg = SLAMConfig().replace(
            camera=cam,
            map=MapConfig(max_landmarks=64, max_keyframes=f,
                          max_obs_per_landmark=4, max_obs_per_keyframe=64))
        slam = SLAMSystem(cfg, enable_place_recognition=False)

        # GT arc (poses up to ~3 m from origin, slow yaw); drifted chain
        # integrates per-edge bias (0.009 rad + mm-level translation)
        q_gt = [np.array([1.0, 0, 0, 0], np.float32)]
        t_gt = [np.zeros(3, np.float32)]
        for _ in range(1, f):
            dq = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.06, 0.0],
                                                    jnp.float32)))
            q, t = lie.se3_compose(
                jnp.asarray(q_gt[-1]), jnp.asarray(t_gt[-1]),
                jnp.asarray(dq), jnp.asarray([0.12, 0.0, 0.03],
                                             jnp.float32))
            q_gt.append(np.asarray(q))
            t_gt.append(np.asarray(t))
        q_gt, t_gt = np.stack(q_gt), np.stack(t_gt)
        q_dr, t_dr = [q_gt[0]], [t_gt[0]]
        for k in range(1, f):
            q_rel, t_rel = lie.se3_compose(
                *lie.se3_inverse(jnp.asarray(q_gt[k - 1]),
                                 jnp.asarray(t_gt[k - 1])),
                jnp.asarray(q_gt[k]), jnp.asarray(t_gt[k]))
            nq = lie.so3_exp(jnp.asarray([0.0, 0.009, 0.0], jnp.float32))
            q_rel = lie.quat_mul(nq, q_rel)
            t_rel = t_rel + jnp.asarray([0.004, 0.0, -0.01], jnp.float32)
            q, t = lie.se3_compose(jnp.asarray(q_dr[-1]),
                                   jnp.asarray(t_dr[-1]), q_rel, t_rel)
            q_dr.append(np.asarray(q))
            t_dr.append(np.asarray(t))
        q_dr = np.stack(q_dr).astype(np.float32)
        t_dr = np.stack(t_dr).astype(np.float32)

        kdb = slam.map_state.keyframes._replace(
            q=jnp.asarray(q_dr), t=jnp.asarray(t_dr),
            active=jnp.ones(f, bool),
            next_slot=jnp.asarray(f, jnp.int32),
            count=jnp.asarray(f, jnp.int32))
        ms = slam.map_state._replace(keyframes=kdb)
        q_pnp, t_pnp = jnp.asarray(q_gt[-1]), jnp.asarray(t_gt[-1])

        def ate(fn):
            _, ms2 = fn(slam.tracker_state, ms, q_pnp, t_pnp,
                        jnp.asarray(0, jnp.int32),
                        jnp.asarray(f - 1, jnp.int32))
            tn = np.asarray(ms2.keyframes.t)
            return float(np.sqrt(np.mean(np.sum((tn - t_gt) ** 2, axis=1))))

        pre = float(np.sqrt(np.mean(np.sum((t_dr - t_gt) ** 2, axis=1))))
        a_interp = ate(slam._apply_loop_fn)
        a_pgo = ate(slam._apply_loop_pgo_fn)
        # both schemes correct most of the drift ...
        assert a_interp < 0.4 * pre, (a_interp, pre)
        assert a_pgo < 0.4 * pre, (a_pgo, pre)
        # ... and PGO is decisively better at this ring size
        assert a_pgo < 0.6 * a_interp, (a_pgo, a_interp)
