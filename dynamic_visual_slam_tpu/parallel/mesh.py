"""Multi-chip scaling via jax.sharding — the parallelism layer.

The reference has no distributed story (SURVEY.md §2: two OS processes over
DDS, a BA wall timer, Ceres num_threads=4); single-chip is the parity
target.  This module is the scale-OUT axis the TPU rebuild adds:

- data-parallel multi-stream SLAM: a fleet of independent camera streams,
  one TrackerState/MapState per stream, batch dim sharded over the 'dp'
  mesh axis — production serving of many robots from one pod slice;
- sharded detector inference: YOLO batches split over 'dp';
- all built with NamedSharding + jit: XLA inserts the (trivially absent)
  collectives; per-stream state stays resident on its device, so scaling is
  embarrassingly parallel over ICI with zero cross-chip traffic on the hot
  path (keyframe/BA work included — it shards with the stream).

The batched step functions are also what `__graft_entry__.dryrun_multichip`
compiles on a virtual device mesh.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynamic_visual_slam_tpu.backend import ba as ba_mod
from dynamic_visual_slam_tpu.backend import mapping
from dynamic_visual_slam_tpu.config import SLAMConfig
from dynamic_visual_slam_tpu.core.camera import Intrinsics
from dynamic_visual_slam_tpu.frontend import tracker


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), axis_names=(axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(tree: Any, mesh: Mesh, axis: str = "dp") -> Any:
    """Place every leaf with its leading (batch) dim split over `axis`."""
    def place(x):
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(place, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


# ---------------------------------------------------------------------------
# Multi-stream SLAM fleet
# ---------------------------------------------------------------------------

class SLAMFleet:
    """B independent SLAM streams, data-parallel over the mesh.

    All per-stream state (tracker + map) lives sharded on device; step() and
    keyframe/BA processing are one jitted SPMD program each.
    """

    def __init__(self, cfg: SLAMConfig, batch: int,
                 mesh: Optional[Mesh] = None,
                 kf_slots: Optional[int] = None):
        self.cfg = cfg
        self.batch = batch
        self.mesh = mesh or make_mesh()
        # keyframe-insert slots per step_batch microbatch (None → ceil(T/4)+2
        # at trace time — ~5x the reference's ~1/20-frame keyframe cadence).
        # Raise (up to T) for degenerate configs whose keyframe policy fires
        # every frame, e.g. payload caps below min_matches_to_last_kf.
        self.kf_slots = kf_slots
        k = Intrinsics.from_config(cfg.camera)
        from dynamic_visual_slam_tpu.semantic.classes import filtered_mask
        filt = filtered_mask(cfg)

        def one_step(tstate, mstate, gray, depth, ts, det, kps):
            tstate, out = tracker.track_step(cfg, tstate, gray, depth, ts,
                                             det=det, filtered=filt, kps=kps)
            mstate2, _ = mapping.insert_keyframe(cfg, mstate, out.keyframe,
                                                 det, filt)
            mstate = jax.tree_util.tree_map(
                lambda a, b: jnp.where(out.is_keyframe, b, a), mstate, mstate2)
            return tstate, mstate, out

        from dynamic_visual_slam_tpu.frontend import orb

        n_mesh = int(self.mesh.size)
        shard_ok = batch % n_mesh == 0

        def extract_streams(grays):
            # ONE batched Pallas extraction across the whole fleet (a single
            # score-atlas call + a single descriptor call for all streams —
            # orb.extract_batch; replaced the lax.map-over-streams version,
            # which serialized ~3 ms/stream of kernel latency per step).
            # Under a multi-device dp mesh the call runs inside shard_map so
            # EACH DEVICE builds its local shard's score atlas / descriptor
            # batch (grid programs don't batch across devices on their own);
            # the same wrapper runs on the one-real-chip serving shape and
            # the CPU dryrun (where extract_batch falls back to vmapped XLA
            # ops), so the partitioning logic is always exercised.
            if not shard_ok:
                return orb.extract_batch(grays, cfg.orb)
            # check_vma=False: pallas_call outputs carry no vma annotation
            return jax.shard_map(
                lambda g: orb.extract_batch(g, cfg.orb),
                mesh=self.mesh, in_specs=P("dp"), out_specs=P("dp"),
                check_vma=False)(grays)

        def extract_fleet_tb(grays_tb):
            # (T, B, H, W) → Keypoints with leaves (T, B, ...): one
            # extraction dispatch for the WHOLE microbatch (T×B frames).
            # Sharded over streams; time stays local to each device, so the
            # per-device batch is T×(B/n) frames — grid-step sequencing
            # amortizes over the full microbatch instead of per scan step.
            t_dim, b_dim = grays_tb.shape[0], grays_tb.shape[1]

            def local(g):
                tl, bl = g.shape[0], g.shape[1]
                n = tl * bl
                flat = g.reshape((n,) + g.shape[2:])
                # chunk the Pallas dispatches: one atlas over ALL n frames
                # overflows SMEM at 720p (the grid's scalar metadata scales
                # with batch — measured 3 MB vs the 1 MB budget at n=192),
                # so lax.map runs extract_batch at the proven ~24-frame
                # size; chunks sequence device-side with no host gaps
                cs = next(c for c in range(min(n, 24), 0, -1) if n % c == 0)
                chunks = flat.reshape((n // cs, cs) + flat.shape[1:])
                kps = jax.lax.map(
                    lambda ch: orb.extract_batch(ch, cfg.orb), chunks)
                return jax.tree_util.tree_map(
                    lambda a: a.reshape((tl, bl) + a.shape[2:]), kps)

            if not shard_ok:
                return local(grays_tb)
            return jax.shard_map(local, mesh=self.mesh,
                                 in_specs=P(None, "dp"),
                                 out_specs=P(None, "dp"),
                                 check_vma=False)(grays_tb)

        # REJECTED alternative, kept for profiling only (profile_fleet.py
        # stage F): one T×B extraction dispatch for the whole microbatch.
        # Measured SLOWER than the shipped per-scan-step extract_streams
        # (docs/PERF.md stage F) — batch_step does NOT call this. The
        # shipped shard_map program batch_step embeds is extract_streams,
        # exposed below for the shard-shape test (tests/test_parallel.py).
        self._extract_fleet_tb = jax.jit(extract_fleet_tb)
        self._extract_streams = jax.jit(extract_streams)

        def one_ba(mstate, now):
            new_state, res = ba_mod.run_ba(cfg, k, mstate)
            new_state = new_state._replace(
                landmarks=mapping.prune(cfg, new_state.landmarks, now))
            return new_state, res.final_cost

        one_step_v = jax.vmap(one_step)

        def fleet_step(tstates, mstates, grays, depths, stamps, dets):
            kps = extract_streams(grays)
            return one_step_v(tstates, mstates, grays, depths, stamps,
                              dets, kps)

        self._step = jax.jit(fleet_step, donate_argnums=(0, 1))
        self._ba = jax.jit(jax.vmap(one_ba, in_axes=(0, None)),
                           donate_argnums=(0,))

        def track_only_v(tstate, gray, depth, ts, det, kps):
            tstate, out = tracker.track_step(cfg, tstate, gray, depth, ts,
                                             det=det, filtered=filt, kps=kps)
            return tstate, out
        track_only_v = jax.vmap(track_only_v)

        def batch_step(tstates, mstates, grays, depths, stamps, dets):
            """T frames × B streams in ONE dispatch — the fleet analogue of
            SLAMSystem.process_batch (pipeline/slam.py), restructured for
            throughput (VERDICT r3 next #1; the r3 formulation ran the
            full track step + a masked keyframe insert inside EVERY scan
            step — measured 5.3 ms/step of insert+where for ~1/20-frame
            keyframes, profile_fleet.py stage E):

            - tracking: per-scan-step vmapped track_step over streams.
              (A (B,T)-batched track_batch variant was measured SLOWER —
              56 vs 44 ms/step — because batching the pair stages across
              T×B materializes (T,B,1024,1024) match intermediates and
              vmap turns the anchor-recompute lax.cond into both-branch
              selects; the per-step formulation keeps intermediates at
              (B,1024,1024) and is what ships);
            - keyframe inserts: DEFERRED — each stream's flagged frames
              are gathered into K = ceil(T/4)+2 slots and applied in a
              K-step scan of vmapped masked inserts instead of T of them.
              Flags beyond K in one microbatch are DROPPED — the stable
              argsort keeps the FIRST K flagged frames per microbatch,
              i.e. drop-NEWEST (a bounded queue that rejects arrivals
              when full, like a ROS depth-N subscription under overrun);
              the (B,) drop count is returned so the host can account
              for it (stats()["keyframes_dropped"]). When dropped > 0,
              telemetry still reports the dropped frames with
              is_keyframe=True (the tracker flagged and anchored them)
              even though the map never stored them — consumers counting
              inserted keyframes must subtract keyframes_dropped. At the
              reference keyframe cadence (~1/20 frames,
              frontend.cpp:651-655) K slots never fill.

            Returns (tstates, mstates, telems (T,B,10), dropped (B,))."""
            t_dim = stamps.shape[0]

            def body(ts_, x):
                g, d, s, de = x
                kps = extract_streams(g)
                ts_, out = track_only_v(ts_, g, d, s, de, kps)
                return ts_, out
            tstates, outs = jax.lax.scan(
                body, tstates, (grays, depths, stamps, dets))
            # outs leaves are (T, B, ...)

            k_slots = min(t_dim, self.kf_slots or (t_dim // 4 + 2))
            flags = jnp.swapaxes(outs.is_keyframe, 0, 1)      # (B, T)
            order = jnp.argsort(jnp.where(flags, 0, 1), axis=1,
                                stable=True)[:, :k_slots]     # (B, K)
            valid = jnp.take_along_axis(flags, order, axis=1)  # (B, K)
            dropped = jnp.maximum(
                jnp.sum(flags.astype(jnp.int32), axis=1) - k_slots, 0)

            def gather_kb(tree_tb):
                # leaves (T, B, ...) → (K, B, ...): per stream b, slot k
                # picks frame order[b, k]
                return jax.tree_util.tree_map(
                    lambda a: jax.vmap(
                        lambda at, ib: at[ib],
                        in_axes=(1, 0), out_axes=1)(a, order), tree_tb)
            kfs_kb = gather_kb(outs.keyframe)
            dets_kb = gather_kb(dets)

            def insert_body(ms_, x):
                kf_k, det_k, val_k = x
                ms2 = jax.vmap(lambda m, kf, de: mapping.insert_keyframe(
                    cfg, m, kf, de, filt)[0])(ms_, kf_k, det_k)
                ms_ = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(
                        val_k.reshape(val_k.shape + (1,) * (a.ndim - 1)),
                        b, a), ms_, ms2)
                return ms_, None
            mstates, _ = jax.lax.scan(
                insert_body, mstates, (kfs_kb, dets_kb, valid.T))

            telems = jnp.concatenate([
                outs.q_wc, outs.t_wc,
                jnp.stack([outs.tracking_ok.astype(jnp.float32),
                           outs.is_keyframe.astype(jnp.float32),
                           outs.n_inliers.astype(jnp.float32)],
                          axis=-1)], axis=-1)                 # (T, B, 10)
            return tstates, mstates, telems, dropped

        self._batch_step = jax.jit(batch_step, donate_argnums=(0, 1))

        self.tracker_states = shard_batch(jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape),
            tracker.init_state(cfg)), self.mesh)
        # decorrelate per-stream RANSAC sampling: stream i's rng is
        # fold_in(key, i) — also what the solo-equivalence test reproduces
        keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(0), i)
                        )(jnp.arange(batch))
        self.tracker_states = self.tracker_states._replace(
            rng=shard_batch(keys, self.mesh))
        self.map_states = shard_batch(jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape),
            mapping.init_map(cfg)), self.mesh)
        # BA cadence (the reference's 2 s wall timer, backend.cpp:207-209):
        # one fleet-wide decision per step() from the input stamps
        self._last_ba_t: Optional[float] = None
        self.ba_runs = 0
        self._ba_costs = None
        # keyframes dropped by step_batch's K-slot insert cap (per stream;
        # device-accumulated, surfaced by stats())
        self._dropped_kf = jnp.zeros(batch, jnp.int32)

    def step(self, grays: jnp.ndarray, depths: jnp.ndarray,
             stamps: jnp.ndarray,
             detections: Optional[mapping.Detections] = None,
             auto_ba: bool = True):
        """(B,H,W) gray + depth + (B,) stamps (+ optional per-stream
        Detections with leading dim B — e.g. from detect_batch) →
        per-stream TrackOutput.  With auto_ba, a vmapped BA round (+ prune)
        fires for all streams when cfg.ba.period_s of input time elapsed."""
        now = float(np.max(np.asarray(stamps)))
        if detections is None:
            det1 = mapping.Detections.empty(
                self.cfg.semantic.max_detections)
            detections = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (self.batch,) + x.shape),
                det1)
        grays, depths, stamps, detections = (
            shard_batch(x, self.mesh)
            for x in (grays, depths, stamps, detections))
        self.tracker_states, self.map_states, out = self._step(
            self.tracker_states, self.map_states, grays, depths, stamps,
            detections)
        if auto_ba:
            if self._last_ba_t is None:
                self._last_ba_t = now
            elif now - self._last_ba_t >= self.cfg.ba.period_s:
                self._last_ba_t = now
                self.run_ba(now)
        return out

    def step_batch(self, grays: jnp.ndarray, depths: jnp.ndarray,
                   stamps: jnp.ndarray,
                   detections: Optional[mapping.Detections] = None,
                   auto_ba: bool = True) -> jnp.ndarray:
        """(T,B,H,W) grays/depths + (T,B) stamps (+ optional Detections with
        leading dims (T,B)) → (T,B,10) packed telemetry, in ONE dispatch —
        the fleet throughput mode. BA cadence is evaluated once per batch
        (granularity = batch length of input time), like the solo
        process_batch's per-batch _ba_tick."""
        now = float(np.max(np.asarray(stamps)))
        t_dim, b_dim = np.asarray(stamps).shape
        if detections is None:
            det1 = mapping.Detections.empty(self.cfg.semantic.max_detections)
            detections = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (t_dim, b_dim) + x.shape),
                det1)

        def place(x):
            # (T, B, ...): time unsharded, streams over 'dp'
            spec = P(None, "dp", *([None] * (x.ndim - 2)))
            return jax.device_put(x, NamedSharding(self.mesh, spec))
        grays, depths, stamps, detections = (
            jax.tree_util.tree_map(place, x)
            for x in (grays, depths, stamps, detections))
        self.tracker_states, self.map_states, telems, dropped = \
            self._batch_step(self.tracker_states, self.map_states, grays,
                             depths, stamps, detections)
        self._dropped_kf = self._dropped_kf + dropped
        if auto_ba:
            if self._last_ba_t is None:
                self._last_ba_t = now
            elif now - self._last_ba_t >= self.cfg.ba.period_s:
                self._last_ba_t = now
                self.run_ba(now)
        return telems

    def stats(self) -> dict:
        """Per-stream observability (ONE device_get): keyframe counts,
        active landmarks, BA rounds and the last per-stream final costs."""
        kf_counts, lm_active, dropped = jax.device_get((
            self.map_states.keyframes.count,
            jnp.sum(self.map_states.landmarks.active.astype(jnp.int32),
                    axis=-1), self._dropped_kf))
        out = dict(streams=self.batch, ba_runs=self.ba_runs,
                   keyframes=kf_counts.tolist(),
                   landmarks_active=lm_active.tolist(),
                   keyframes_dropped=dropped.tolist())
        if self._ba_costs is not None:
            out["last_ba_costs"] = np.asarray(
                jax.device_get(self._ba_costs)).tolist()
        return out

    def make_detector(self, params: Any, input_size: int = 640):
        """Sharded semantic stage for the fleet: returns fn mapping
        (B, H, W) gray frames → per-stream Detections (dp-sharded), ready
        to feed step(). Composes sharded YOLO inference with the same
        letterbox/unletterbox + class-shift postprocessing the
        single-stream pipeline uses (semantic/detector.py)."""
        from dynamic_visual_slam_tpu.models import yolov8
        cfg = self.cfg
        h, w = cfg.camera.height, cfg.camera.width
        s = input_size
        scale = min(s / w, s / h)
        nw, nh = int(round(w * scale)), int(round(h * scale))
        px, py = (s - nw) // 2, (s - nh) // 2
        p_repl = replicate(params, self.mesh)

        @jax.jit
        def detect(grays):
            def one(gray):
                rgb = jnp.stack([gray] * 3, axis=-1).astype(jnp.float32)
                img = jax.image.resize(rgb, (nh, nw, 3), "linear")
                canvas = jnp.full((s, s, 3), 114.0, jnp.float32)
                canvas = jax.lax.dynamic_update_slice(canvas, img,
                                                      (py, px, 0))
                raw = yolov8.detect(p_repl, canvas, s, 32)
                boxes = (raw.boxes - jnp.asarray(
                    [px, py, px, py], jnp.float32)) / scale
                boxes = jnp.clip(boxes, 0.0, jnp.asarray(
                    [w - 1, h - 1, w - 1, h - 1], jnp.float32))
                return mapping.Detections(
                    boxes=boxes,
                    category=(raw.classes + 1).astype(jnp.int32),
                    score=raw.scores, mask=raw.valid)
            return jax.vmap(one)(grays)
        return detect

    def run_ba(self, now: float = 0.0):
        """Vmapped BA + prune across all streams (async dispatch)."""
        self.map_states, costs = self._ba(self.map_states,
                                          jnp.asarray(now, jnp.float32))
        self.ba_runs += 1
        self._ba_costs = costs
        return costs


# ---------------------------------------------------------------------------
# Sharded detector inference
# ---------------------------------------------------------------------------

def sharded_detector_apply(params: Any, mesh: Mesh, input_size: int = 640):
    """Returns jitted fn: (B, S, S, 3) images (B sharded over dp) →
    batched RawDetections — the multi-chip YOLO serving path."""
    from dynamic_visual_slam_tpu.models import yolov8
    p_repl = replicate(params, mesh)

    @jax.jit
    def apply(imgs):
        return jax.vmap(lambda im: yolov8.detect(p_repl, im, input_size, 32)
                        )(imgs)
    return apply
