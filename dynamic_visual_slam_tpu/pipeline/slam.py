"""Full SLAM system: tracking frontend + mapping backend + periodic BA as one
orchestrated pipeline.

The reference runs two OS processes joined by DDS (frontend node →
/frontend/keyframe → backend node) with a 2 s wall-timer BA guarded by a
mutex + atomic flag (backend.cpp:207-209, 273-277, 876-890).  TPU-native
equivalent: all three stages are jitted device programs issued from one host
loop — JAX's async dispatch gives the same overlap the reference gets from
threads (the tracking step for frame t+1 is enqueued while the device still
runs the BA for window t), with the device stream, not a mutex, serializing
map-state access.  Keyframe payloads stay on device end to end; nothing
crosses the host boundary except scalar stats.

Detections are optional (quirk fix: the reference backend stalls without a
YOLO publisher, SURVEY.md §3.3): frames without detections map everything as
"unlabeled".
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from dataclasses import fields as dataclass_fields
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_visual_slam_tpu.backend import ba as ba_mod
from dynamic_visual_slam_tpu.backend import mapping
from dynamic_visual_slam_tpu.config import SLAMConfig
from dynamic_visual_slam_tpu.core import lie
from dynamic_visual_slam_tpu.core.camera import Intrinsics
from dynamic_visual_slam_tpu.frontend import tracker
from dynamic_visual_slam_tpu.semantic.classes import filtered_mask


def _start_host_copy(arr) -> None:
    """Kick off the device→host copy of a telemetry array WITHOUT blocking:
    the runtime moves the bytes as soon as the producing computation
    finishes, so the eventual device_get in _drain_results finds them
    already host-side. On a tunneled/remote TPU a blocking read with work
    in flight costs 0.1–1 s of polling backoff per drain; pre-issuing the
    copy at dispatch time makes the drain a (near-)free memcpy."""
    try:
        arr.copy_to_host_async()
    except (AttributeError, NotImplementedError):
        pass  # backends without async host copies fall back to the drain


def _correct_tracker(tstate, q_c: jnp.ndarray, t_c: jnp.ndarray):
    """Left-compose a world-frame correction onto the live tracker: pose
    T ← T_c ∘ T, and the stored last-keyframe anchor points x ← R_c x + t_c
    (they live in the same pre-correction world frame; leaving them behind
    would make the next keyframe-anchored PnP revert the correction,
    frontend/tracker.py `kf_xyz_w`)."""
    return tstate._replace(
        q_wc=lie.quat_normalize(lie.quat_mul(q_c, tstate.q_wc)),
        t_wc=lie.quat_rotate(q_c, tstate.t_wc) + t_c,
        kf_xyz_w=lie.quat_rotate(q_c, tstate.kf_xyz_w) + t_c)


@dataclass
class FrameResult:
    timestamp: float
    q_wc: np.ndarray
    t_wc: np.ndarray
    tracking_ok: bool
    is_keyframe: bool
    n_features: int
    n_matches: int
    n_inliers: int
    # mask-valid payload observations (sum(keyframe.mask)) — what BoW
    # query/verify actually consume; can be far below n_features on a
    # lost frame (few depth-valid / culled observations)
    n_payload_valid: int = 0


@functools.lru_cache(maxsize=8)
def _build_programs(cfg: SLAMConfig):
    """All of SLAMSystem's jitted device programs, built from the config
    alone and shared across instances (lru_cache): every closure captures
    only cfg-derived values (intrinsics, the filtered-category mask), so
    two systems with the same config hit the SAME jit caches instead of
    re-tracing + recompiling ~10 sizeable programs per instance. This is
    what lets bench.py run its shipped-defaults stage on a second 720p
    system for free (the r4 bench timed out exactly here) and keeps test
    suites from paying per-instance compiles."""
    k = Intrinsics.from_config(cfg.camera)
    filtered = filtered_mask(cfg)
    f_cap = cfg.map.max_keyframes

    def step_insert(tstate, mstate, gray, depth, ts, det, kps=None):
        """Track + conditional keyframe insert as ONE device program —
        the insert runs under lax.cond on out.is_keyframe (a real
        runtime branch: XLA executes the insert only on keyframes,
        ~1/20 frames, so its ~2.4 ms amortizes to ~0.1 ms/frame), and
        the host never reads the keyframe flag synchronously. The (13,)
        f32 telemetry vector packs everything the host reads per frame
        into ONE d2h transfer: [q_wc(4), t_wc(3), tracking_ok, is_kf,
        n_features, n_matches, n_inliers, n_payload_valid]. The last
        entry is sum(keyframe.mask) — the number of mask-valid payload
        observations, which is what BoW query/verify actually consume
        (the reloc feature floor gates on it, not on raw extracted
        features)."""
        tstate, out = tracker.track_step(cfg, tstate, gray, depth, ts,
                                         det=det, filtered=filtered,
                                         kps=kps)
        mstate = jax.lax.cond(
            out.is_keyframe,
            lambda ms: mapping.insert_keyframe(cfg, ms, out.keyframe,
                                               det, filtered)[0],
            lambda ms: ms,
            mstate)
        telem = jnp.concatenate([
            out.q_wc, out.t_wc,
            jnp.stack([out.tracking_ok.astype(jnp.float32),
                       out.is_keyframe.astype(jnp.float32),
                       out.n_features.astype(jnp.float32),
                       out.n_matches.astype(jnp.float32),
                       out.n_inliers.astype(jnp.float32),
                       jnp.sum(out.keyframe.mask).astype(jnp.float32)])])
        return tstate, mstate, out, telem

    def batch_step(tstate, mstate, grays, depths, tss, dets):
        """Microbatched pipeline: scan B frames through the fused
        track+insert step in ONE dispatch. One h2d upload + one drain
        per batch instead of per frame — on remote/tunneled devices the
        per-RPC latency while the queue is busy dominates the frame
        loop otherwise (measured: 12 ms device compute, ~60 ms RPC
        overhead per frame at batch 1).

        Structure (docs/PERF.md): extraction for ALL B frames runs in
        one batched dispatch (orb.extract_batch), then
        tracker.track_batch vmaps every state-free stage (depth gate,
        culling, matching, F-RANSAC, frame-to-frame PnP, payload
        selection) across the batch and scans only the state-dependent
        core; a second light scan applies the conditional keyframe
        inserts.  The old formulation scanned the WHOLE step per frame
        — ~3.5 ms/frame of launch-bound device time."""
        from dynamic_visual_slam_tpu.frontend import orb as orb_mod
        kps_b = orb_mod.extract_batch(grays, cfg.orb)
        tstate, outs = tracker.track_batch(
            cfg, tstate, kps_b, depths, tss, dets, filtered=filtered)

        def insert_body(ms_, x):
            out_is_kf, kf, det = x
            ms_ = jax.lax.cond(
                out_is_kf,
                lambda ms: mapping.insert_keyframe(cfg, ms, kf, det,
                                                   filtered)[0],
                lambda ms: ms,
                ms_)
            return ms_, None
        mstate, _ = jax.lax.scan(
            insert_body, mstate, (outs.is_keyframe, outs.keyframe, dets))
        telems = jnp.concatenate([
            outs.q_wc, outs.t_wc,
            jnp.stack([outs.tracking_ok.astype(jnp.float32),
                       outs.is_keyframe.astype(jnp.float32),
                       outs.n_features.astype(jnp.float32),
                       outs.n_matches.astype(jnp.float32),
                       outs.n_inliers.astype(jnp.float32),
                       jnp.sum(outs.keyframe.mask,
                               axis=-1).astype(jnp.float32)], axis=-1)],
            axis=-1)
        return tstate, mstate, outs, telems

    def run_ba_fb(mstate, tstate):
        """BA + tracker feedback: left-compose the newest keyframe's
        BA correction onto the live tracker pose (identity when the
        solve was rejected — apply_result leaves poses unchanged).

        Magnitude gate: a 2 s window's refinement should move the
        newest pose by millimetres; a large correction means the
        window was poisoned (sparse associations, degenerate
        geometry) and feeding it into the live tracker amplifies the
        excursion instead of damping it (measured on the hard
        640x480 parity seed: unguarded feedback 0.238 m ATE vs
        0.193 m without feedback). Corrections > 0.15 m / 0.1 rad
        are discarded for the TRACKER (the window write-back keeps
        its own cost-improvement gate)."""
        new_m, res = ba_mod.run_ba(cfg, k, mstate)
        slot = jnp.mod(mstate.keyframes.next_slot - 1, f_cap)
        q_oi, t_oi = lie.se3_inverse(mstate.keyframes.q[slot],
                                     mstate.keyframes.t[slot])
        q_c, t_c = lie.se3_compose(new_m.keyframes.q[slot],
                                   new_m.keyframes.t[slot], q_oi, t_oi)
        ok = (jnp.linalg.norm(t_c) < 0.15) \
            & (jnp.linalg.norm(lie.so3_log(q_c)) < 0.1)
        q_c = jnp.where(ok, q_c, lie.quat_identity())
        t_c = jnp.where(ok, t_c, jnp.zeros(3))
        tstate = _correct_tracker(tstate, q_c, t_c)
        return new_m, tstate, res

    def apply_loop(tstate, mstate, q_pnp, t_pnp, cand_seq, entry_seq):
        """Distribute a verified loop's drift correction over the
        keyframe ring (se3-tangent scaled by keyframe age between the
        loop endpoints), the landmarks (by newest observation), and
        the live tracker pose (full correction).

        The correction is computed HERE against the entry keyframe's
        CURRENT ring pose (BA feedback may have moved it since the
        loop was dispatched): T_corr = T_pnp ∘ T_entry_now⁻¹. Spurious
        PnP poses are rejected by a magnitude gate (>1 m or >0.5 rad
        corrections are no-ops)."""
        kdb = mstate.keyframes
        s = jnp.arange(f_cap)
        newest = kdb.next_slot - 1
        seq = newest - jnp.mod(newest - s, f_cap)        # per-slot seq
        entry_hit = (seq == entry_seq) & kdb.active
        slot = jnp.argmax(entry_hit)
        q_ei, t_ei = lie.se3_inverse(kdb.q[slot], kdb.t[slot])
        q_corr, t_corr = lie.se3_compose(q_pnp, t_pnp, q_ei, t_ei)
        ok = jnp.any(entry_hit) \
            & (jnp.linalg.norm(t_corr) < 1.0) \
            & (jnp.linalg.norm(lie.so3_log(q_corr)) < 0.5)
        q_corr = jnp.where(ok, q_corr, jnp.asarray([1., 0., 0., 0.]))
        t_corr = jnp.where(ok, t_corr, jnp.zeros(3))
        span = jnp.maximum(entry_seq - cand_seq, 1).astype(jnp.float32)
        alpha = jnp.clip((seq - cand_seq).astype(jnp.float32) / span,
                         0.0, 1.0) * kdb.active
        phi = lie.so3_log(q_corr)
        q_a = lie.so3_exp(alpha[:, None] * phi[None])    # (F, 4)
        t_a = alpha[:, None] * t_corr[None]
        q_new = lie.quat_normalize(lie.quat_mul(q_a, kdb.q))
        t_new = lie.quat_rotate(q_a, kdb.t) + t_a
        act = kdb.active[:, None]
        kdb = kdb._replace(q=jnp.where(act, q_new, kdb.q),
                           t=jnp.where(act, t_new, kdb.t))
        lm = mstate.landmarks
        lm_seq = jnp.max(jnp.where(lm.obs_valid, lm.obs_kf, -1), axis=1)
        al = jnp.clip((lm_seq - cand_seq).astype(jnp.float32) / span,
                      0.0, 1.0) * lm.active
        q_l = lie.so3_exp(al[:, None] * phi[None])
        xyz = lie.quat_rotate(q_l, lm.xyz) + al[:, None] * t_corr[None]
        lm = lm._replace(xyz=jnp.where(lm.active[:, None], xyz, lm.xyz))
        tstate = _correct_tracker(tstate, q_corr, t_corr)
        return tstate, mstate._replace(keyframes=kdb, landmarks=lm)

    def apply_loop_pgo(tstate, mstate, q_pnp, t_pnp, cand_seq,
                       entry_seq):
        """Pose-graph variant of apply_loop (loop_pgo=True): the ring
        poses come from a dense Gauss-Newton over odometry edges + the
        loop's absolute constraint (backend/pose_graph.py); landmarks
        follow their newest observing keyframe's world-frame
        correction; the live tracker follows the newest keyframe.
        Same entry-correction magnitude gate as apply_loop."""
        from dynamic_visual_slam_tpu.backend import pose_graph

        kdb = mstate.keyframes
        s = jnp.arange(f_cap)
        newest = kdb.next_slot - 1
        seq = newest - jnp.mod(newest - s, f_cap)
        entry_hit = (seq == entry_seq) & kdb.active
        slot = jnp.argmax(entry_hit)
        q_ei, t_ei = lie.se3_inverse(kdb.q[slot], kdb.t[slot])
        q_raw, t_raw = lie.se3_compose(q_pnp, t_pnp, q_ei, t_ei)
        res = pose_graph.optimize_ring(
            kdb.q, kdb.t, kdb.active, seq, q_pnp, t_pnp,
            entry_seq, cand_seq)
        ok = jnp.any(entry_hit) & res.ok \
            & (jnp.linalg.norm(t_raw) < 1.0) \
            & (jnp.linalg.norm(lie.so3_log(q_raw)) < 0.5)
        kdb = kdb._replace(q=jnp.where(ok, res.q, kdb.q),
                           t=jnp.where(ok, res.t, kdb.t))
        lm = mstate.landmarks
        lm_seq = jnp.max(jnp.where(lm.obs_valid, lm.obs_kf, -1), axis=1)
        live = lm_seq >= (mstate.keyframes.next_slot - f_cap)
        lslot = jnp.mod(jnp.maximum(lm_seq, 0), f_cap)
        xyz = lie.quat_rotate(res.q_corr[lslot], lm.xyz) \
            + res.t_corr[lslot]
        move = ok & lm.active & live & (lm_seq >= 0)
        lm = lm._replace(xyz=jnp.where(move[:, None], xyz, lm.xyz))
        ns = jnp.mod(mstate.keyframes.next_slot - 1, f_cap)
        q_tc = jnp.where(ok, res.q_corr[ns], lie.quat_identity())
        t_tc = jnp.where(ok, res.t_corr[ns], jnp.zeros(3))
        tstate = _correct_tracker(tstate, q_tc, t_tc)
        return tstate, mstate._replace(keyframes=kdb, landmarks=lm)

    def apply_reloc(tstate, q_pnp, t_pnp, q_froz, t_froz):
        """Re-anchor the live tracker after a verified relocalization:
        T_corr = T_pnp ∘ T_frozen⁻¹ left-composes onto the CURRENT pose,
        so relative tracking resumed since the queried frame is
        preserved (T_now = T_frozen ∘ ΔT  →  T_pnp ∘ ΔT). No magnitude
        gate — relocalization corrections are legitimately large; the
        defense is the loop-grade PnP consensus demanded at harvest."""
        q_fi, t_fi = lie.se3_inverse(q_froz, t_froz)
        q_c, t_c = lie.se3_compose(q_pnp, t_pnp, q_fi, t_fi)
        return _correct_tracker(tstate, q_c, t_c)

    def verify_loop(d1, uv1, m1, q1, t1, d2, uv2, m2, xyz2, key):
        """Geometric loop/reloc verification: Hamming matmul + F-RANSAC
        + PnP of the candidate's stored world points against the entry's
        pixels (drift correction T_corr = T_pnp ∘ T_stored⁻¹)."""
        from dynamic_visual_slam_tpu.frontend import ransac
        from dynamic_visual_slam_tpu.ops import hamming

        res = hamming.match(d1, d2, m1, m2,
                            max_distance=float(cfg.match.max_hamming),
                            cross_check=True)
        fm = ransac.fundamental_ransac(
            uv2[res.train_idx], uv1, res.valid, key,
            n_hyp=cfg.ransac.fm_iterations,
            threshold=cfg.ransac.fm_threshold_px)
        fm_ok = fm.inliers & fm.valid
        n_inl = jnp.sum(fm_ok.astype(jnp.int32))
        k2 = jax.random.fold_in(key, 1)
        pnp = ransac.pnp_ransac(
            k, xyz2[res.train_idx], uv1, fm_ok, k2,
            n_hyp=cfg.ransac.pnp_iterations,
            threshold=cfg.ransac.loop_pnp_threshold_px,
            min_inliers=cfg.ransac.min_pnp_matches,
            refine_iters=cfg.ransac.refine_iterations)
        q_pnp_wc, t_pnp_wc = lie.se3_inverse(pnp.q, pnp.t)
        n_pnp = jnp.where(pnp.valid, pnp.n_inliers, 0)
        return n_inl, q_pnp_wc, t_pnp_wc, n_pnp

    return dict(
        step_insert=jax.jit(step_insert, donate_argnums=(0, 1)),
        batch_step=jax.jit(batch_step, donate_argnums=(0, 1)),
        insert=jax.jit(
            lambda s, kf, det: mapping.insert_keyframe(
                cfg, s, kf, det, filtered)),
        run_ba=jax.jit(lambda s: ba_mod.run_ba(cfg, k, s)),
        run_ba_fb=jax.jit(run_ba_fb),
        apply_loop=jax.jit(apply_loop),
        apply_loop_pgo=jax.jit(apply_loop_pgo),
        apply_reloc=jax.jit(apply_reloc),
        prune=jax.jit(lambda lm, now: mapping.prune(cfg, lm, now)),
        verify_loop=jax.jit(verify_loop),
        intrinsics=k,
        filtered=filtered,
    )


@dataclass
class SLAMSystem:
    """Host-side orchestrator over jitted device stages."""

    config: SLAMConfig
    ba_async: bool = True
    # Host-sync cadence: device→host result reads happen every N frames
    # (1 = classic per-frame results). On a tunneled/remote TPU every
    # completion-wait with in-flight work costs tens of ms, so the frame
    # loop runs free on device — keyframe insertion is a masked on-device
    # select (no host branch) — and results drain in batches. FrameResults
    # therefore lag by up to N-1 frames (available after drain/finalize),
    # exactly like the reference's decoupled frontend/backend queues.
    sync_every: int = 1
    # place recognition: build a BoW database of keyframes and surface
    # loop-closure candidates (the reference links DBoW2 as "loop-closure
    # ready" but never calls it, SURVEY.md C7 — here it actually runs)
    enable_place_recognition: bool = True
    vocab_train_keyframes: int = 4     # train vocabulary after N keyframes
    # Pretrained vocabulary (place/bow.save_vocabulary npz — the ORBvoc.txt
    # deployment mode, trained offline by `cli train-vocab`): loaded at
    # startup, so the BoW database exists from keyframe 0 and no online
    # vocabulary training happens. None = train online as above.
    vocab_path: Optional[str] = None
    loop_min_gap: int = 10             # ignore the most recent N keyframes
    loop_min_score: float = 0.12
    # geometric verification of BoW candidates: descriptor matching +
    # fundamental-matrix RANSAC between the two keyframes (the step DBoW2
    # deployments run before trusting a candidate; small online-trained
    # vocabularies especially need it)
    loop_geometric_check: bool = True
    loop_min_inliers: int = 30
    # BoW retrieval depth for loop/reloc queries. Deeper than the classic
    # top-3 because the ranking is dominated by the entry's own recent
    # neighbours (gap < loop_min_gap, filtered out below) — on a revisit
    # the true old-orbit match often sits at rank 4-8, and stopping at 3
    # creates revisit windows where no loop is ever even verified.
    loop_top_k: int = 8
    # Feed BA pose refinements back into the live tracker: the newest
    # window keyframe's correction T_new∘T_old⁻¹ left-composes onto the
    # tracker pose (the reference never closes this loop — its frontend
    # trajectory is pure odometry; here BA actually improves the live ATE)
    ba_feedback: bool = True
    # Consume verified loop closures: PnP against the candidate keyframe's
    # stored 3D points yields the drift correction, distributed over the
    # keyframe ring (tangent-interpolated by keyframe age) + landmarks +
    # the live tracker pose
    loop_correction: bool = True
    # Consume loops through a dense pose-graph solve over the keyframe
    # ring (backend/pose_graph.py) instead of the age-interpolated
    # correction: odometry edges + the loop's absolute constraint,
    # Gauss-Newton on the (6F,6F) dense normal system — the production
    # SLAM treatment, and a tiny exact solve at ring capacity.
    # Default ON since r5: measured equivalent to interp at ring
    # capacity 8 (ATE 0.073 vs 0.071, PARITY_RESULTS.md), and 2.6x
    # better keyframe ATE at a 32-keyframe ring with a large one-shot
    # correction (0.037 vs 0.094 m — tests/test_pose_graph.py::
    # TestInterpVsPGODivergence), where interp's linear age ramp no
    # longer matches the drift shape. Interp remains available
    # (loop_pgo=False) and is pinned by tests/test_soak.py.
    loop_pgo: bool = True
    # Relocalization after tracking loss (new capability — the reference
    # only freezes the pose, frontend.cpp:925-944): after reloc_after
    # consecutive tracking failures, the current frame's descriptors query
    # the BoW database; the best candidate is geometrically verified with
    # the same machinery as loop closures (Hamming match + F-RANSAC + PnP
    # against the stored keyframe's world points), and on consensus the
    # pose correction T_pnp ∘ T_frozen⁻¹ re-anchors the live tracker.
    enable_relocalization: bool = True
    reloc_after: int = 3               # consecutive failed frames to trigger
    reloc_min_features: int = 50       # need features to query/verify

    def __post_init__(self):
        cfg = self.config
        progs = _build_programs(cfg)
        self._k = progs["intrinsics"]
        self._filtered = progs["filtered"]
        self._step_insert = progs["step_insert"]
        self._batch_step = progs["batch_step"]
        self._insert = progs["insert"]
        self._run_ba = progs["run_ba"]
        self._run_ba_fb = progs["run_ba_fb"]
        self._apply_loop_fn = progs["apply_loop"]
        self._apply_loop_pgo_fn = progs["apply_loop_pgo"]
        self._apply_reloc_fn = progs["apply_reloc"]
        self._prune = progs["prune"]
        self.tracker_state = tracker.init_state(cfg)
        self.map_state = mapping.init_map(cfg)
        self._empty_det = mapping.Detections.empty(cfg.semantic.max_detections)
        self._t0: Optional[float] = None
        self._last_ba_t: Optional[float] = None
        self._pending_ba_results: List[Tuple[Any, float]] = []
        self._pending_out: List[Tuple[float, Any]] = []
        self._n_kf_host = 0   # host mirror of keyframes.count (no sync)
        self.trajectory: List[FrameResult] = []
        self.ba_log: List[Dict[str, Any]] = []
        self.loop_candidates: List[Dict[str, Any]] = []
        self._bow_db = None
        if self.vocab_path is not None:
            from dynamic_visual_slam_tpu.place import bow
            self._bow_db = bow.Database(
                bow.load_vocabulary(self.vocab_path),
                capacity=self.config.place.max_db_entries)
        self._kf_descs: List[Any] = []   # pre-vocabulary descriptor buffer
        # DB slot → (monotone seq id, padded device desc/uv/mask)
        self._kf_store: Dict[int, Any] = {}
        self._kf_seq = 0
        # BoW queries in flight: (entry_seq, QueryResult device arrays, ts).
        # Materialized at the NEXT drain (the _pending_ba pattern) so the
        # keyframe path never blocks on the query chain — with a pretrained
        # vocabulary the whole add/query/store runs device-side with zero
        # host descriptor pulls (VERDICT r3 weak #2: the per-keyframe
        # (512,256) np.asarray was a d2h sync in the drain path).
        # entries: (entry_seq, db_slot, QueryResult, timestamp)
        self._pending_queries: List[Tuple[int, int, Any, float]] = []
        self._pending_loops: List[Any] = []
        self._verify_loop_fn = None
        self._lost_streak = 0
        self._pending_reloc: Optional[Tuple[Any, Any, Any, float]] = None
        self.reloc_log: List[Dict[str, Any]] = []
        self.stats = dict(frames=0, keyframes=0, ba_runs=0, ba_converged=0,
                          loop_candidates=0, relocalizations=0)

    # ------------------------------------------------------------------
    def process(self, gray: np.ndarray, depth_m: np.ndarray, timestamp: float,
                detections: Optional[mapping.Detections] = None
                ) -> Optional[FrameResult]:
        """One RGB-D frame (+ optional synced detections) through the system.

        Returns this frame's FrameResult when sync_every == 1; with a larger
        sync cadence results drain in batches into self.trajectory and the
        return value is the newest drained FrameResult (None until the first
        drain). Call finalize() to flush the tail.

        Device code works in SEQUENCE-RELATIVE time: absolute stamps (e.g.
        TUM epoch seconds ~1.3e9, whose f32 ULP is 128 s!) would destroy the
        prune-age math and keyframe stamps; t0 is re-added at export.
        """
        if self._t0 is None:
            self._t0 = timestamp
        ts_rel = timestamp - self._t0
        det = detections if detections is not None else self._empty_det

        # track + masked keyframe insert: one async device dispatch, no host
        # reads (a tunneled/remote TPU charges tens of ms for any completion
        # wait with work in flight, so the frame loop must run free)
        self.tracker_state, self.map_state, out, telem = self._step_insert(
            self.tracker_state, self.map_state, jnp.asarray(gray),
            jnp.asarray(depth_m), jnp.asarray(ts_rel, jnp.float32), det)
        _start_host_copy(telem)
        self._pending_out.append((timestamp, out, telem))

        newest = None
        if self.sync_every <= 1:
            if self._pending_out:
                drained = self._drain_results()
                newest = drained[-1] if drained else None
        elif len(self._pending_out) > self.sync_every:
            # hold back the frame just dispatched (its compute is in
            # flight) so the drain's blocking read rides under it — same
            # dispatch-then-drain overlap as process_batch
            latest = self._pending_out.pop()
            drained = self._drain_results()
            self._pending_out.append(latest)
            newest = drained[-1] if drained else None

        # periodic BA (2 s wall-timer equivalent); dispatched asynchronously
        # so the device overlaps it with subsequent tracking steps — the
        # ba_running_-flag concurrency of the reference without a mutex
        self._ba_tick(ts_rel, timestamp)
        self.stats["frames"] += 1
        return newest

    def process_batch(self, grays: np.ndarray, depths: np.ndarray,
                      timestamps: np.ndarray,
                      detections: Optional[mapping.Detections] = None
                      ) -> List[FrameResult]:
        """B RGB-D frames through the system in ONE device dispatch
        (lax.scan microbatch) — the throughput mode for offline replay and
        remote devices, where per-frame RPCs dominate process(). Results
        lag one batch (the previous batch's FrameResults are returned);
        finalize() flushes the tail. Detections, if given, must be a
        Detections pytree stacked with leading dim B."""
        timestamps = np.asarray(timestamps, np.float64)
        b = len(timestamps)
        if self._t0 is None:
            self._t0 = float(timestamps[0])
        ts_rel = jnp.asarray(timestamps - self._t0, jnp.float32)
        if detections is None:
            det = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (b,) + x.shape),
                self._empty_det)
        else:
            det = detections

        self.tracker_state, self.map_state, outs, telems = self._batch_step(
            self.tracker_state, self.map_state, jnp.asarray(grays),
            jnp.asarray(depths), ts_rel, det)
        _start_host_copy(telems)
        self._pending_out.append((list(timestamps), outs, telems))

        # drain previous batches on the sync_every cadence (in units of
        # pending batches): each drain is a device sync, which a tunneled
        # TPU charges dearly. Dispatch-THEN-drain (the same order process()
        # uses) so the blocking device_get rides under the batch just
        # dispatched instead of stalling on the previous batch's in-flight
        # compute — the fetched batches finished an iteration ago and their
        # host copies were started at dispatch. Costs one extra batch of
        # latency before a loop/reloc correction lands; the apply programs
        # anchor by keyframe seq id, so late application stays correct.
        drained = []
        if len(self._pending_out) > max(1, self.sync_every):
            newest = self._pending_out.pop()   # still computing — hold back
            drained = self._drain_results()
            self._pending_out.append(newest)

        self._ba_tick(float(timestamps[-1]) - self._t0, timestamps[-1])
        self.stats["frames"] += b
        return drained

    def _ba_tick(self, ts_rel: float, timestamp: float) -> None:
        """Fire a BA round if the period has elapsed (the reference's 2 s
        wall timer, backend.cpp:207-209). In async mode the result scalars
        are NOT read here — materializing them is a device sync that costs
        up to a second on a tunneled TPU; telemetry accumulates on device
        and drains at finalize()."""
        if self._last_ba_t is None:
            self._last_ba_t = ts_rel
        # gate on FRAMES, not the drained keyframe mirror: frames 0 and 1
        # are always keyframes (reference quirk, tracker.py), so after two
        # processed frames the device window is valid — and _n_kf_host only
        # updates on result drains, which a large sync_every defers (BA
        # cadence must not depend on telemetry reads)
        if (ts_rel - self._last_ba_t >= self.config.ba.period_s
                and (self._n_kf_host >= 2 or self.stats["frames"] >= 2)):
            self._last_ba_t = ts_rel
            # BA feedback left-composes a correction onto the live tracker
            # pose; a relocalization in flight froze that pose at dispatch
            # (T_corr = T_pnp ∘ T_frozen⁻¹), so mutating it between dispatch
            # and harvest would bake the feedback into the re-anchored pose
            # as error. Skip feedback for this round only — the map-side BA
            # write-back still happens.
            if self.ba_feedback and self._pending_reloc is None:
                self.map_state, self.tracker_state, res = self._run_ba_fb(
                    self.map_state, self.tracker_state)
            else:
                self.map_state, res = self._run_ba(self.map_state)
            self.map_state = self.map_state._replace(
                landmarks=self._prune(self.map_state.landmarks,
                                      jnp.asarray(ts_rel, jnp.float32)))
            self.stats["ba_runs"] += 1
            if self.ba_async:
                self._pending_ba_results.append((res, timestamp))
            else:
                self._record_ba(res, timestamp)

    def _drain_results(self):
        """Materialize all pending frame outputs (single frames and
        microbatches) AND every pending place-chain result (reloc/loop
        verdicts, BoW query results) in ONE device-to-host transfer; run
        the host-side keyframe bookkeeping (stats, place recognition) for
        the frames that were keyframes.

        One transfer matters on tunneled devices: each materialization
        with work in flight costs a ~33 ms RPC round-trip, and the r4
        shipped-defaults run burned ~1.2 s per 240 frames on the separate
        _harvest_* reads (docs/PERF.md; VERDICT r4 weak #6) — folding
        them into the telemetry drain makes the place chain ride the
        transfer the drain pays anyway.

        Harvest order gives every async device dispatch one full drain
        cycle: loop verifications dispatched at the previous drain
        materialize first, then pending BoW queries materialize and spawn
        new verifications, then newly-emitted keyframes dispatch new
        queries."""
        bundle = {
            "reloc": (self._pending_reloc[0]
                      if self._pending_reloc is not None else ()),
            "loops": [v for _, v, _, _ in self._pending_loops],
            "queries": [r for _, _, r, _ in self._pending_queries],
            "telems": [t for _, _, t in self._pending_out],
        }
        host = jax.device_get(bundle)
        self._harvest_reloc(host["reloc"] or None)
        self._harvest_loops(host["loops"])
        self._harvest_queries(host["queries"])
        if not self._pending_out:
            return []
        pending, self._pending_out = self._pending_out, []
        drained = []
        for (ts_entry, out, _), telem in zip(pending, host["telems"]):
            if isinstance(ts_entry, list):        # microbatch: leading dim B
                for j, ts in enumerate(ts_entry):
                    drained.append(self._emit_frame(ts, telem[j], out, j))
            else:
                drained.append(self._emit_frame(ts_entry, telem, out, None))
        return drained

    def _emit_frame(self, timestamp, telem, out, batch_idx) -> FrameResult:
        q_wc, t_wc = telem[0:4], telem[4:7]
        t_ok, is_kf = telem[7] > 0.5, telem[8] > 0.5
        n_feat, n_match, n_inl = telem[9], telem[10], telem[11]
        is_kf = bool(is_kf)
        fr = FrameResult(
            timestamp=timestamp, q_wc=np.asarray(q_wc),
            t_wc=np.asarray(t_wc), tracking_ok=bool(t_ok),
            is_keyframe=is_kf, n_features=int(n_feat),
            n_matches=int(n_match), n_inliers=int(n_inl),
            n_payload_valid=int(telem[12]))
        self.trajectory.append(fr)
        if fr.tracking_ok:
            self._lost_streak = 0
        else:
            self._lost_streak += 1
            # the floor gates on MASK-VALID payload observations (what the
            # BoW query and geometric verification actually consume), not
            # raw extracted features — a lost frame can extract many
            # features yet have few depth-valid observations
            if (self.enable_relocalization and self._bow_db is not None
                    and self._pending_reloc is None
                    and self._lost_streak >= self.reloc_after
                    and fr.n_payload_valid >= self.reloc_min_features):
                self._dispatch_reloc(fr, out, batch_idx)
        if is_kf:
            self.stats["keyframes"] += 1
            self._n_kf_host += 1
            if self.enable_place_recognition:
                kf = out.keyframe if batch_idx is None else \
                    jax.tree_util.tree_map(lambda a: a[batch_idx],
                                           out.keyframe)
                self._place_recognition(kf, timestamp)
        return fr

    def _place_recognition(self, kf, timestamp: float) -> None:
        """Add the keyframe to the BoW database; report revisit candidates.

        With a pretrained vocabulary (the shipped default) this is fully
        device-side: the padded KeyframeBlock arrays go straight into the
        BoW transform/add and the keyframe store (they already have the
        (cap, ...) layout) — NO host descriptor pull.  The query result is
        dispatched here and materialized at the next drain
        (_harvest_queries), so the drain path never waits on the query
        chain.  Candidate ids are MONOTONE keyframe sequence numbers (not
        DB slots, which wrap at capacity).

        Online vocabulary training (vocab_path=None) still buffers host
        descriptors — training is host-side k-medians (DBoW2 create()).
        """
        from dynamic_visual_slam_tpu.place import bow
        if self._bow_db is None:
            m = np.asarray(kf.mask)
            desc = np.asarray(kf.desc_bits)[m]
            uv = np.asarray(kf.uv)[m]
            xyz = np.asarray(kf.xyz_w)[m]
            pose = (np.asarray(kf.q_wc), np.asarray(kf.t_wc))
            self._kf_descs.append((desc, uv, xyz, pose))
            if len(self._kf_descs) < self.vocab_train_keyframes:
                return
            voc = bow.train_vocabulary(
                np.concatenate([d for d, _, _, _ in self._kf_descs]),
                k=self.config.place.branching,
                depth=self.config.place.depth, seed=0,
                doc_ids=np.concatenate(
                    [np.full(len(d), i)
                     for i, (d, _, _, _) in enumerate(self._kf_descs)]))
            self._bow_db = bow.Database(
                voc, capacity=self.config.place.max_db_entries)
            for d, u, x, po in self._kf_descs:
                slot = self._bow_db.add(jnp.asarray(d))
                self._store_kf(slot, d, u, x, po)
            self._kf_descs = []
            return
        res = self._bow_db.query(kf.desc_bits, kf.mask, top_k=self.loop_top_k)
        entry = self._bow_db.add(kf.desc_bits, kf.mask)
        entry_seq = self._store_kf_block(entry, kf)
        for arr in res:
            _start_host_copy(arr)
        self._pending_queries.append((entry_seq, entry, res, timestamp))

    def _harvest_queries(self, host_results=None) -> None:
        """Materialize pending BoW query results and dispatch geometric
        verification for surviving candidates — the async half of
        _place_recognition. `host_results`, when given, are the already-
        materialized results from _drain_results' single bundled transfer;
        standalone calls (finalize) materialize here in one device_get."""
        if not self._pending_queries:
            return
        pending, self._pending_queries = self._pending_queries, []
        results = host_results if host_results is not None else \
            jax.device_get([res for _, _, res, _ in pending])
        for (entry_seq, entry, _, timestamp), res in zip(pending, results):
            for i in range(self.loop_top_k):
                if not bool(res.valid[i]):
                    continue
                cand, score = int(res.entry_ids[i]), float(res.scores[i])
                if cand not in self._kf_store or score < self.loop_min_score:
                    continue
                cand_seq = self._kf_store[cand][0]
                if entry_seq - cand_seq < self.loop_min_gap:
                    continue
                # the entry keyframe may itself have been evicted from the
                # store by DB-ring wrap between dispatch and harvest
                if entry not in self._kf_store \
                        or self._kf_store[entry][0] != entry_seq:
                    break
                rec = dict(keyframe=entry_seq, candidate=cand_seq,
                           score=round(score, 4), timestamp=timestamp)
                if self.loop_geometric_check:
                    # async dispatch; results are harvested next drain (the
                    # BA _pending pattern) so the frame loop never blocks
                    verdict = self._dispatch_verify(entry, cand)
                    self._pending_loops.append(
                        (rec, verdict, cand_seq, entry_seq))
                else:
                    self.loop_candidates.append(rec)
                    self.stats["loop_candidates"] += 1
                break

    def _store_kf(self, slot: int, desc: np.ndarray, uv: np.ndarray,
                  xyz: np.ndarray = None, pose=None) -> int:
        """Cache the keyframe's padded DEVICE arrays under its DB slot
        (uploaded once; reused by every later verification)."""
        cap = self.config.map.max_obs_per_keyframe
        n = min(len(desc), cap)
        dd = np.zeros((cap, 256), np.uint8)
        uu = np.zeros((cap, 2), np.float32)
        xx = np.zeros((cap, 3), np.float32)
        dd[:n] = desc[:n]
        uu[:n] = uv[:n]
        if xyz is not None:
            xx[:n] = xyz[:n]
        if pose is None:
            pose = (np.asarray([1., 0., 0., 0.], np.float32),
                    np.zeros(3, np.float32))
        seq = self._kf_seq
        self._kf_seq += 1
        self._kf_store[slot] = (seq, jnp.asarray(dd), jnp.asarray(uu),
                                jnp.arange(cap) < n, jnp.asarray(xx),
                                jnp.asarray(pose[0], jnp.float32),
                                jnp.asarray(pose[1], jnp.float32))
        return seq

    def _store_kf_block(self, slot: int, kf) -> int:
        """Device-path _store_kf: the KeyframeBlock arrays already have the
        padded (cap, ...) layout, so they go into the store as-is — zero
        host transfer, zero re-upload."""
        seq = self._kf_seq
        self._kf_seq += 1
        self._kf_store[slot] = (seq, kf.desc_bits, kf.uv, kf.mask,
                                kf.xyz_w, kf.q_wc, kf.t_wc)
        return seq

    def _dispatch_verify(self, entry: int, cand: int):
        """Enqueue the geometric check (Hamming matmul + F-RANSAC) on device;
        returns the un-materialized scalar."""
        self._ensure_verify_fn()
        _, d1, uv1, m1, _, q1, t1 = self._kf_store[entry]
        _, d2, uv2, m2, xyz2, _, _ = self._kf_store[cand]
        key = jax.random.key(entry * 9973 + cand)
        verdict = self._verify_loop_fn(d1, uv1, m1, q1, t1, d2, uv2, m2,
                                       xyz2, key)
        for arr in verdict:       # (n_inl, q_pnp, t_pnp, n): harvest reads
            _start_host_copy(arr)  # them — move the bytes before the wait
        return verdict

    def warmup_place(self) -> None:
        """Compile the place-recognition programs (BoW transform/query/add
        + the loop/reloc geometric-verification program + the loop/reloc
        APPLY programs) on DUMMY data so their multi-second
        trace+lower+compile cost lands at startup, not on the first real
        loop candidate mid-stream. Safe to call any time: database state
        is untouched (query only), the verify result is discarded, and
        the apply programs run as exact no-ops (entry_seq = -1 misses the
        ring, so the magnitude gate zeroes the correction — measured 4.1 s
        of trace+compile for apply_loop_pgo that otherwise stalled the
        frame loop at the FIRST applied loop, profile_place r5).
        Query/verify are a no-op without a vocabulary database."""
        cap = self.config.map.max_obs_per_keyframe
        d = jnp.zeros((cap, 256), jnp.uint8)
        uv = jnp.zeros((cap, 2), jnp.float32)
        m = jnp.zeros(cap, bool)
        xyz = jnp.zeros((cap, 3), jnp.float32)
        q = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
        t = jnp.zeros(3, jnp.float32)
        self._ensure_verify_fn()
        out = self._verify_loop_fn(d, uv, m, q, t, d, uv, m, xyz,
                                   jax.random.key(0))
        if self._bow_db is not None:
            res = self._bow_db.query(d, m, top_k=self.loop_top_k)
            jax.block_until_ready(res.scores)
        # loop/reloc apply programs: no-op invocations (entry_seq -1 is
        # never in the ring; reloc correction identity∘identity⁻¹ = I)
        miss = jnp.asarray(-1, jnp.int32)
        fn = self._apply_loop_pgo_fn if self.loop_pgo \
            else self._apply_loop_fn
        ts2, ms2 = fn(self.tracker_state, self.map_state, q, t, miss, miss)
        self.tracker_state, self.map_state = ts2, ms2   # values unchanged
        if self.enable_relocalization:
            self.tracker_state = self._apply_reloc_fn(
                self.tracker_state, q, t, q, t)
        jax.block_until_ready(out[0])

    def _ensure_verify_fn(self) -> None:
        if self._verify_loop_fn is None:
            self._verify_loop_fn = _build_programs(self.config)["verify_loop"]

    def _dispatch_reloc(self, fr: FrameResult, out, batch_idx) -> None:
        """Query the BoW DB with the LOST frame's descriptors (not added to
        the DB) and enqueue geometric verification against the best-scoring
        stored keyframe — the relocalization analogue of _find_loops, reusing
        the identical verification program. The frame's frozen telemetry pose
        rides along so harvest can form T_corr = T_pnp ∘ T_frozen⁻¹."""
        kf = out.keyframe if batch_idx is None else \
            jax.tree_util.tree_map(lambda a: a[batch_idx], out.keyframe)
        # feature floor already enforced by the caller via telemetry
        # (fr.n_payload_valid = sum(kf.mask) >= reloc_min_features) — no
        # host descriptor pull
        res = self._bow_db.query(kf.desc_bits, kf.mask,
                                 top_k=self.loop_top_k)
        for i in range(self.loop_top_k):
            if not bool(res.valid[i]):
                continue
            cand, score = int(res.entry_ids[i]), float(res.scores[i])
            if cand not in self._kf_store or score < self.loop_min_score:
                continue
            self._ensure_verify_fn()
            _, d2, uv2, m2, xyz2, _, _ = self._kf_store[cand]
            key = jax.random.key(self.stats["frames"] * 7919 + cand)
            verdict = self._verify_loop_fn(
                kf.desc_bits, kf.uv, kf.mask, kf.q_wc, kf.t_wc,
                d2, uv2, m2, xyz2, key)
            for arr in verdict:
                _start_host_copy(arr)
            self._pending_reloc = (
                verdict, jnp.asarray(fr.q_wc), jnp.asarray(fr.t_wc),
                dict(timestamp=fr.timestamp, score=round(score, 4),
                     candidate=self._kf_store[cand][0]))
            return

    def _harvest_reloc(self, host_verdict=None) -> None:
        """`host_verdict`: pre-materialized verdict arrays from
        _drain_results' bundled transfer (standalone calls materialize
        here — still one device_get, not four scalar syncs)."""
        if self._pending_reloc is None:
            return
        verdict, q_froz, t_froz, rec = self._pending_reloc
        self._pending_reloc = None
        if host_verdict is None:
            host_verdict = jax.device_get(verdict)
        n_inl, _, _, pnp_inl = host_verdict
        q_pnp, t_pnp = verdict[1], verdict[2]   # device-side: fed to jit
        rec["inliers"] = int(n_inl)
        rec["pnp_inliers"] = int(pnp_inl)
        # loop-grade consensus: re-anchoring the live pose is as invasive as
        # a drift correction, so demand the same strength as _harvest_loops
        ok = rec["inliers"] >= self.loop_min_inliers and \
            rec["pnp_inliers"] >= max(self.config.ransac.min_pnp_matches,
                                      self.loop_min_inliers)
        rec["applied"] = ok
        self.reloc_log.append(rec)
        if ok:
            self.tracker_state = self._apply_reloc_fn(
                self.tracker_state, q_pnp, t_pnp, q_froz, t_froz)
            self.stats["relocalizations"] += 1
            self._lost_streak = 0

    def _harvest_loops(self, host_verdicts=None) -> None:
        """`host_verdicts`: pre-materialized verdicts (parallel list) from
        _drain_results' bundled transfer; standalone calls materialize all
        pending verdicts here in one device_get."""
        if not self._pending_loops:
            return
        if host_verdicts is None:
            host_verdicts = jax.device_get(
                [v for _, v, _, _ in self._pending_loops])
        for (rec, verdict, cand_seq, entry_seq), hv in zip(
                self._pending_loops, host_verdicts):
            n_inl, q_pnp_h, t_pnp_h, pnp_inl = hv
            q_pnp, t_pnp = verdict[1], verdict[2]  # device-side: fed to jit
            n_inl = int(n_inl)
            rec["inliers"] = n_inl
            rec["pnp_inliers"] = int(pnp_inl)
            # the verified absolute pose rides along (already host-side
            # from the drain bundle) so efficacy harnesses can check the
            # correction magnitude the jitted apply gates on
            rec["t_pnp"] = [round(float(v), 4) for v in t_pnp_h]
            if n_inl >= self.loop_min_inliers:
                self.loop_candidates.append(rec)
                self.stats["loop_candidates"] += 1
                # a drift correction rewrites the whole ring + landmarks —
                # demand the same consensus strength as the loop gate
                # itself, not just the PnP floor (a 6-inlier pose estimate
                # must never move the map)
                if self.loop_correction and \
                        int(pnp_inl) >= max(
                            self.config.ransac.min_pnp_matches,
                            self.loop_min_inliers):
                    fn = self._apply_loop_pgo_fn if self.loop_pgo \
                        else self._apply_loop_fn
                    self.tracker_state, self.map_state = fn(
                        self.tracker_state, self.map_state, q_pnp,
                        t_pnp, jnp.asarray(cand_seq, jnp.int32),
                        jnp.asarray(entry_seq, jnp.int32))
                    rec["applied"] = True
                    self.stats["loops_applied"] = \
                        self.stats.get("loops_applied", 0) + 1
                    # a loop correction just moved the live tracker pose; a
                    # relocalization in flight froze the pre-correction pose
                    # at dispatch, so its T_pnp ∘ T_frozen⁻¹ math is now
                    # stale — drop it (it re-dispatches on the next lost
                    # frame, the streak persists until tracking recovers)
                    if self._pending_reloc is not None:
                        _, _, _, rrec = self._pending_reloc
                        rrec["applied"] = False
                        rrec["invalidated_by_loop"] = True
                        self.reloc_log.append(rrec)
                        self._pending_reloc = None
        self._pending_loops = []

    def finalize(self) -> None:
        """Flush deferred work (pending frame results / loop verifications /
        BA telemetry) — call once after the last frame."""
        self._drain_results()
        for res, ts in self._pending_ba_results:
            self._record_ba(res, ts)
        self._pending_ba_results = []
        self._harvest_queries()
        self._harvest_loops()
        self._harvest_reloc()

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        """Full-system checkpoint: core device states (pipeline/snapshot.py)
        plus the place-recognition database, so a resumed system can close
        loops against pre-snapshot keyframes."""
        from dynamic_visual_slam_tpu.pipeline import snapshot
        snapshot.save(path, self.tracker_state, self.map_state, self.config)
        if self._bow_db is not None:
            extra = dict(
                vectors=np.asarray(self._bow_db.vectors),
                used=np.asarray(self._bow_db.used),
                count=self._bow_db.count,
                word_weights=np.asarray(self._bow_db.vocabulary.word_weights),
                voc_k=np.asarray(self._bow_db.vocabulary.k),
                voc_depth=np.asarray(self._bow_db.vocabulary.depth),
                kfseq_counter=self._kf_seq)
            for l, (lv, va) in enumerate(zip(self._bow_db.vocabulary.levels,
                                             self._bow_db.vocabulary.valid)):
                extra[f"voc_level_{l}"] = np.asarray(lv)
                extra[f"voc_valid_{l}"] = np.asarray(va)
            for slot, (seq, d, uv, m, xyz, q, t) in self._kf_store.items():
                extra[f"kf_{slot}_seq"] = np.asarray(seq)
                extra[f"kf_{slot}_desc"] = np.asarray(d)
                extra[f"kf_{slot}_uv"] = np.asarray(uv)
                extra[f"kf_{slot}_mask"] = np.asarray(m)
                extra[f"kf_{slot}_xyz"] = np.asarray(xyz)
                extra[f"kf_{slot}_q"] = np.asarray(q)
                extra[f"kf_{slot}_t"] = np.asarray(t)
            np.savez_compressed(path + ".place", **extra)

    def restore(self, path: str) -> None:
        """Load a save() checkpoint into this system (config must match)."""
        import os

        from dynamic_visual_slam_tpu.pipeline import snapshot
        from dynamic_visual_slam_tpu.place import bow
        ts, ms, cfg = snapshot.load(path)
        if cfg != self.config:
            diff = [f.name for f in dataclass_fields(cfg)
                    if getattr(cfg, f.name) != getattr(self.config, f.name)]
            raise ValueError(
                "snapshot config mismatch — the checkpoint was written "
                f"with different settings (sections differing: {diff}); "
                "construct the system with the checkpoint's config "
                "(snapshot.load returns it) or rerun with matching flags")
        self.tracker_state = ts
        self.map_state = ms
        self._n_kf_host = int(ms.keyframes.count)
        # drop in-flight recovery state: a pending reloc verdict was
        # computed against the pre-restore pose and must not re-anchor the
        # restored one; in-flight BoW queries reference pre-restore slots;
        # in-flight loop verdicts were computed against pre-restore poses
        # and would apply a correction anchored to stale seq ids
        self._pending_reloc = None
        self._pending_queries = []
        self._pending_loops = []
        self._lost_streak = 0
        # Keep the host seq counter aligned with the device ring: apply_loop
        # anchors corrections by seq == next_slot-derived ids, so a restore
        # without place data must resume the counter from the ring, not 0.
        self._kf_seq = int(ms.keyframes.count)
        place_path = path + ".place.npz"
        if os.path.exists(place_path):
            data = np.load(place_path)
            # vocabulary dims come from the snapshot itself (a pretrained
            # vocab_path vocabulary need not match config.place's online-
            # training dims); fall back to config for older snapshots
            depth = int(data["voc_depth"]) if "voc_depth" in data.files \
                else self.config.place.depth
            voc_k = int(data["voc_k"]) if "voc_k" in data.files \
                else self.config.place.branching
            voc = bow.Vocabulary(
                k=voc_k, depth=depth,
                levels=[jnp.asarray(data[f"voc_level_{l}"])
                        for l in range(depth)],
                valid=[jnp.asarray(data[f"voc_valid_{l}"])
                       for l in range(depth)],
                word_weights=jnp.asarray(data["word_weights"]))
            self._bow_db = bow.Database(
                voc, capacity=self.config.place.max_db_entries,
                vectors=jnp.asarray(data["vectors"]),
                used=jnp.asarray(data["used"]), count=int(data["count"]))
            self._kf_seq = int(data["kfseq_counter"])
            self._kf_store = {}
            for key in data.files:
                if key.endswith("_seq") and key.startswith("kf_"):
                    slot = int(key.split("_")[1])
                    cap = self.config.map.max_obs_per_keyframe
                    xyz = data[f"kf_{slot}_xyz"] \
                        if f"kf_{slot}_xyz" in data.files \
                        else np.zeros((cap, 3), np.float32)
                    self._kf_store[slot] = (
                        int(data[key]),
                        jnp.asarray(data[f"kf_{slot}_desc"]),
                        jnp.asarray(data[f"kf_{slot}_uv"]),
                        jnp.asarray(data[f"kf_{slot}_mask"]),
                        jnp.asarray(xyz),
                        jnp.asarray(data[f"kf_{slot}_q"])
                        if f"kf_{slot}_q" in data.files else
                        jnp.asarray([1., 0., 0., 0.], jnp.float32),
                        jnp.asarray(data[f"kf_{slot}_t"])
                        if f"kf_{slot}_t" in data.files else
                        jnp.zeros(3, jnp.float32))

    def _record_ba(self, res, ts) -> None:
        conv = bool(res.converged)
        self.stats["ba_converged"] += int(conv)
        self.ba_log.append(dict(
            timestamp=ts, converged=conv,
            initial_cost=float(res.initial_cost),
            final_cost=float(res.final_cost),
            iterations=int(res.iterations),
            n_residuals=int(res.n_residuals)))

    # ------------------------------------------------------------------
    def keyframe_trajectory(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """BA-refined keyframe poses (stamps, R_wc (N,3,3), t_wc (N,3)),
        oldest→newest — the reference's (never-implemented) /backend/trajectory
        output (SURVEY.md §7 quirk 5), done for real."""
        kdb = self.map_state.keyframes
        f_cap = kdb.q.shape[0]
        n = int(kdb.count)
        k = min(n, f_cap)
        slots = [(int(kdb.next_slot) - k + i) % f_cap for i in range(k)]
        # float64 BEFORE adding t0: numpy keeps f32 when adding a python
        # float, which would collapse epoch stamps onto the 128 s f32 grid
        stamps = np.asarray(kdb.stamp).astype(np.float64)[slots] \
            + (self._t0 or 0.0)
        rs = np.asarray(lie.quat_to_mat(kdb.q[jnp.asarray(slots)]))
        ts = np.asarray(kdb.t)[slots]
        return stamps, rs, ts

    def landmarks_world(self) -> Dict[str, np.ndarray]:
        """Active landmark snapshot (positions, categories, observation
        counts) — the marker-array equivalent (backend.cpp:1437-1510)."""
        lm = self.map_state.landmarks
        act = np.asarray(lm.active)
        return dict(xyz=np.asarray(lm.xyz)[act],
                    category=np.asarray(lm.category)[act],
                    n_obs=np.asarray(lm.n_obs)[act])

    def frontend_trajectory(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Per-frame tracked poses (the reference's /tf stream)."""
        stamps = np.asarray([f.timestamp for f in self.trajectory])
        rs = np.stack([np.asarray(lie.quat_to_mat(jnp.asarray(f.q_wc)))
                       for f in self.trajectory]) if self.trajectory else \
            np.zeros((0, 3, 3))
        ts = np.stack([f.t_wc for f in self.trajectory]) if self.trajectory \
            else np.zeros((0, 3))
        return stamps, rs, ts
