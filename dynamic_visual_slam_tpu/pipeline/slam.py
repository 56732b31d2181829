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

from dataclasses import dataclass
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


@dataclass
class SLAMSystem:
    """Host-side orchestrator over jitted device stages."""

    config: SLAMConfig
    ba_async: bool = True
    # place recognition: build a BoW database of keyframes and surface
    # loop-closure candidates (the reference links DBoW2 as "loop-closure
    # ready" but never calls it, SURVEY.md C7 — here it actually runs)
    enable_place_recognition: bool = True
    vocab_train_keyframes: int = 4     # train vocabulary after N keyframes
    loop_min_gap: int = 10             # ignore the most recent N keyframes
    loop_min_score: float = 0.12
    # geometric verification of BoW candidates: descriptor matching +
    # fundamental-matrix RANSAC between the two keyframes (the step DBoW2
    # deployments run before trusting a candidate; small online-trained
    # vocabularies especially need it)
    loop_geometric_check: bool = True
    loop_min_inliers: int = 30

    def __post_init__(self):
        cfg = self.config
        self._k = Intrinsics.from_config(cfg.camera)
        self._track = tracker.make_jitted_step(cfg)
        self._insert = jax.jit(
            lambda s, kf, det: mapping.insert_keyframe(
                cfg, s, kf, det, self._filtered))
        self._run_ba = jax.jit(lambda s: ba_mod.run_ba(cfg, self._k, s))
        self._prune = jax.jit(
            lambda lm, now: mapping.prune(cfg, lm, now))
        self._filtered = filtered_mask(cfg)
        self.tracker_state = tracker.init_state(cfg)
        self.map_state = mapping.init_map(cfg)
        self._empty_det = mapping.Detections.empty(cfg.semantic.max_detections)
        self._last_ba_t: Optional[float] = None
        self._pending_ba = None
        self.trajectory: List[FrameResult] = []
        self.ba_log: List[Dict[str, Any]] = []
        self.loop_candidates: List[Dict[str, Any]] = []
        self._bow_db = None
        self._kf_descs: List[Any] = []   # pre-vocabulary descriptor buffer
        self._kf_store: Dict[int, Any] = {}  # DB slot → (desc_bits, uv) arrays
        self._verify_loop_fn = None
        self.stats = dict(frames=0, keyframes=0, ba_runs=0, ba_converged=0,
                          loop_candidates=0)

    # ------------------------------------------------------------------
    def process(self, gray: np.ndarray, depth_m: np.ndarray, timestamp: float,
                detections: Optional[mapping.Detections] = None) -> FrameResult:
        """One RGB-D frame (+ optional synced detections) through the system."""
        det = detections if detections is not None else self._empty_det
        self.tracker_state, out = self._track(
            self.tracker_state, jnp.asarray(gray, jnp.float32),
            jnp.asarray(depth_m, jnp.float32),
            jnp.asarray(timestamp, jnp.float32))

        # keyframe → backend insert (device-async; host reads only the flag)
        is_kf = bool(out.is_keyframe)
        if is_kf:
            self.map_state, _ = self._insert(self.map_state, out.keyframe, det)
            self.stats["keyframes"] += 1
            if self.enable_place_recognition:
                self._place_recognition(out.keyframe, timestamp)

        # periodic BA (2 s wall-timer equivalent, backend.cpp:207-209); the
        # jitted call is dispatched asynchronously, so the device overlaps it
        # with subsequent tracking steps — the ba_running_-flag concurrency of
        # the reference without a mutex
        if self._pending_ba is not None:
            # harvest the previous BA's scalars (it has had a full period to
            # finish; reading now rarely blocks)
            res, ts = self._pending_ba
            self._record_ba(res, ts)
            self._pending_ba = None
        if self._last_ba_t is None:
            self._last_ba_t = timestamp
        if (timestamp - self._last_ba_t >= self.config.ba.period_s
                and int(self.map_state.keyframes.count) >= 2):
            self._last_ba_t = timestamp
            self.map_state, res = self._run_ba(self.map_state)
            self.map_state = self.map_state._replace(
                landmarks=self._prune(self.map_state.landmarks,
                                      jnp.asarray(timestamp, jnp.float32)))
            self.stats["ba_runs"] += 1
            if self.ba_async:
                self._pending_ba = (res, timestamp)
            else:
                self._record_ba(res, timestamp)

        fr = FrameResult(
            timestamp=timestamp,
            q_wc=np.asarray(out.q_wc), t_wc=np.asarray(out.t_wc),
            tracking_ok=bool(out.tracking_ok), is_keyframe=is_kf,
            n_features=int(out.n_features), n_matches=int(out.n_matches),
            n_inliers=int(out.n_inliers))
        self.trajectory.append(fr)
        self.stats["frames"] += 1
        return fr

    def _place_recognition(self, kf, timestamp: float) -> None:
        """Add the keyframe to the BoW database; report revisit candidates.

        The vocabulary is trained online from the first few keyframes'
        descriptors (DBoW2-style create()); drop in load_orbvoc_text for the
        pretrained ORB vocabulary instead.
        """
        from dynamic_visual_slam_tpu.place import bow
        m = np.asarray(kf.mask)
        desc = np.asarray(kf.desc_bits)[m]
        uv = np.asarray(kf.uv)[m]
        if self._bow_db is None:
            self._kf_descs.append((desc, uv))
            if len(self._kf_descs) < self.vocab_train_keyframes:
                return
            voc = bow.train_vocabulary(
                np.concatenate([d for d, _ in self._kf_descs]),
                k=self.config.place.branching,
                depth=self.config.place.depth, seed=0)
            self._bow_db = bow.Database(
                voc, capacity=self.config.place.max_db_entries)
            for d, u in self._kf_descs:
                slot = self._bow_db.add(jnp.asarray(d))
                self._kf_store[slot] = (d, u)
            self._kf_descs = []
            return
        res = self._bow_db.query(jnp.asarray(desc), top_k=3)
        entry = self._bow_db.add(jnp.asarray(desc))
        self._kf_store[entry] = (desc, uv)
        for i in range(3):
            if not bool(res.valid[i]):
                continue
            cand, score = int(res.entry_ids[i]), float(res.scores[i])
            if entry - cand < self.loop_min_gap or score < self.loop_min_score:
                continue
            rec = dict(keyframe=entry, candidate=cand, score=round(score, 4),
                       timestamp=timestamp)
            if self.loop_geometric_check:
                n_inl = self._verify_loop(entry, cand)
                rec["inliers"] = n_inl
                if n_inl < self.loop_min_inliers:
                    continue
            self.loop_candidates.append(rec)
            self.stats["loop_candidates"] += 1
            break

    def _verify_loop(self, entry: int, cand: int) -> int:
        """Geometric consistency: mutual descriptor matches between the two
        keyframes + fundamental RANSAC; returns the inlier count."""
        from dynamic_visual_slam_tpu.frontend import ransac
        from dynamic_visual_slam_tpu.ops import hamming
        cap = self.config.map.max_obs_per_keyframe

        if self._verify_loop_fn is None:
            cfg = self.config

            def fn(d1, uv1, m1, d2, uv2, m2, key):
                res = hamming.match(d1, d2, m1, m2,
                                    max_distance=float(cfg.match.max_hamming),
                                    cross_check=True)
                fm = ransac.fundamental_ransac(
                    uv2[res.train_idx], uv1, res.valid & m1, key,
                    n_hyp=cfg.ransac.fm_iterations,
                    threshold=cfg.ransac.fm_threshold_px)
                return jnp.sum((fm.inliers & fm.valid).astype(jnp.int32))

            self._verify_loop_fn = jax.jit(fn)

        def padded(arrs):
            d, uv = arrs
            n = min(len(d), cap)
            dd = np.zeros((cap, 256), np.uint8)
            uu = np.zeros((cap, 2), np.float32)
            dd[:n] = d[:n]
            uu[:n] = uv[:n]
            return (jnp.asarray(dd), jnp.asarray(uu),
                    jnp.arange(cap) < n)
        d1, uv1, m1 = padded(self._kf_store[entry])
        d2, uv2, m2 = padded(self._kf_store[cand])
        key = jax.random.key(entry * 9973 + cand)
        return int(self._verify_loop_fn(d1, uv1, m1, d2, uv2, m2, key))

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
        stamps = np.asarray(kdb.stamp)[slots]
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
