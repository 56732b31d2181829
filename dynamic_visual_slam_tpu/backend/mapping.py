"""Mapping backend: semantic labeling, data association, landmark database,
multi-view triangulation, pruning — the reference Backend node
(backend.cpp:709-831, 1011-1322) as pure jitted updates on a fixed-capacity
arena.

Reference structures replaced:
- std::map<uint64, LandmarkInfo> per category (backend.cpp:619-621) → one
  (L,) slot arena with category ids, active mask, and free-slot allocation by
  prefix-sum (static shapes; unbounded growth replaced by explicit capacity +
  the reference's own pruning policy).
- per-landmark std::vector of observations → (L, M) ring of recent
  observations (keyframe slot + pixel), M = cfg.map.max_obs_per_landmark.
- sequential per-observation association loop (backend.cpp:1064-1120) → one
  (C, L) Hamming matmul + reprojection-gated argmin.

Quirk fixes (SURVEY.md §7): landmark id sentinel is -1, not 0; triangulation
uses the correct world→camera projection P = K[Rᵀ|−Rᵀt] (the reference
builds K[R|t] from camera-to-world poses — a frame-convention slip whose
wrong reprojection check self-validates, backend.cpp:468-475).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dynamic_visual_slam_tpu.config import SLAMConfig
from dynamic_visual_slam_tpu.core import camera as cam
from dynamic_visual_slam_tpu.core import lie
from dynamic_visual_slam_tpu.core.camera import Intrinsics
from dynamic_visual_slam_tpu.frontend import tracker as tracker_mod
from dynamic_visual_slam_tpu.frontend.tracker import KeyframeBlock
from dynamic_visual_slam_tpu.ops import hamming, linalg_small as ls

UNLABELED = 0  # category id for observations outside every detection bbox


class Detections(NamedTuple):
    """Fixed-capacity 2D detections (yolo DetectionArray equivalent)."""

    boxes: jnp.ndarray      # (D, 4) x1,y1,x2,y2 pixels
    category: jnp.ndarray   # (D,) int32 — semantic class id (>0)
    score: jnp.ndarray      # (D,)
    mask: jnp.ndarray       # (D,) bool

    @classmethod
    def empty(cls, capacity: int) -> "Detections":
        return cls(jnp.zeros((capacity, 4), jnp.float32),
                   jnp.zeros(capacity, jnp.int32),
                   jnp.zeros(capacity, jnp.float32),
                   jnp.zeros(capacity, bool))


class KeyframeDB(NamedTuple):
    """Ring of recent keyframes (poses later refined by BA)."""

    q: jnp.ndarray          # (F, 4) camera-to-world
    t: jnp.ndarray          # (F, 3)
    stamp: jnp.ndarray      # (F,)
    frame_idx: jnp.ndarray  # (F,) int32
    active: jnp.ndarray     # (F,) bool
    next_slot: jnp.ndarray  # () int32 — monotone counter; slot = n % F
    count: jnp.ndarray      # () int32 — total keyframes ever inserted


class LandmarkMap(NamedTuple):
    xyz: jnp.ndarray         # (L, 3) world positions
    desc_bits: jnp.ndarray   # (L, 256) newest matched descriptor
    desc_anchor: jnp.ndarray  # (L, 256) first (creation-time) descriptor.
    #                           The reference stores EVERY observation's
    #                           descriptor and matches 1-vs-all
    #                           (backend.cpp:1064-1120); keeping the two
    #                           appearance extremes — creation view + newest
    #                           view — bounds the memory at 2 descriptors
    #                           while covering both ends of appearance drift
    #                           (association takes the min Hamming of the two)
    category: jnp.ndarray    # (L,) int32
    n_obs: jnp.ndarray       # (L,) int32
    last_seen: jnp.ndarray   # (L,) f32 seconds
    active: jnp.ndarray      # (L,) bool
    obs_uv: jnp.ndarray      # (L, M, 2) ring of observed pixels
    obs_kf: jnp.ndarray      # (L, M) int32 MONOTONE keyframe sequence number
    #                           (ring slot = seq % max_keyframes; monotone ids
    #                           let stale observations of recycled slots be
    #                           masked out instead of silently attaching to
    #                           the wrong pose)
    obs_valid: jnp.ndarray   # (L, M) bool
    obs_head: jnp.ndarray    # (L,) int32 ring write position
    next_id: jnp.ndarray     # () int64-ish global landmark id counter


class MapState(NamedTuple):
    landmarks: LandmarkMap
    keyframes: KeyframeDB


def init_map(cfg: SLAMConfig) -> MapState:
    l = cfg.map.max_landmarks
    m = cfg.map.max_obs_per_landmark
    f = cfg.map.max_keyframes
    return MapState(
        LandmarkMap(
            xyz=jnp.zeros((l, 3), jnp.float32),
            desc_bits=jnp.zeros((l, 256), jnp.uint8),
            desc_anchor=jnp.zeros((l, 256), jnp.uint8),
            category=jnp.zeros(l, jnp.int32),
            n_obs=jnp.zeros(l, jnp.int32),
            last_seen=jnp.zeros(l, jnp.float32),
            active=jnp.zeros(l, bool),
            obs_uv=jnp.zeros((l, m, 2), jnp.float32),
            obs_kf=jnp.zeros((l, m), jnp.int32),
            obs_valid=jnp.zeros((l, m), bool),
            obs_head=jnp.zeros(l, jnp.int32),
            next_id=jnp.asarray(0, jnp.int32)),
        KeyframeDB(
            q=jnp.tile(lie.quat_identity()[None], (f, 1)),
            t=jnp.zeros((f, 3), jnp.float32),
            stamp=jnp.zeros(f, jnp.float32),
            frame_idx=jnp.zeros(f, jnp.int32),
            active=jnp.zeros(f, bool),
            next_slot=jnp.asarray(0, jnp.int32),
            count=jnp.asarray(0, jnp.int32)))


# ---------------------------------------------------------------------------
# Semantic categorization (categorizeObservation, backend.cpp:1011-1029)
# ---------------------------------------------------------------------------

def categorize(uv: jnp.ndarray, det: Detections) -> jnp.ndarray:
    """(C,2) pixels → (C,) category ids: first detection bbox containing the
    pixel wins; UNLABELED outside all boxes."""
    inside = tracker_mod.points_in_boxes(uv, det.boxes, det.mask)  # (C, D)
    first = jnp.argmax(inside, axis=1)                  # first True (or 0)
    any_hit = jnp.any(inside, axis=1)
    return jnp.where(any_hit, det.category[first], UNLABELED)


# ---------------------------------------------------------------------------
# Association (associateObservation, backend.cpp:1064-1120)
# ---------------------------------------------------------------------------

def associate(cfg: SLAMConfig, k: Intrinsics, lm: LandmarkMap,
              kf: KeyframeBlock, obs_cat: jnp.ndarray,
              obs_keep: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (assoc_idx (C,), matched (C,)): best same-category landmark with
    Hamming < 50 and reprojection < 5 px, by lowest reprojection error.

    Hamming distance is the min over the landmark's two stored descriptors
    (creation anchor + newest match) — the bounded-memory stand-in for the
    reference's 1-vs-all-observations matching (backend.cpp:1064-1120); one
    (C, 2L) MXU contraction instead of (C, L)."""
    d2 = hamming.hamming_matrix(
        kf.desc_bits, jnp.concatenate([lm.desc_bits, lm.desc_anchor], axis=0))
    l_cap = lm.desc_bits.shape[0]
    d = jnp.minimum(d2[:, :l_cap], d2[:, l_cap:])                # (C, L)
    uv_proj = cam.reproject_world(k, kf.q_wc, kf.t_wc, lm.xyz)   # (L, 2)
    xyz_c = cam.world_to_camera(kf.q_wc, kf.t_wc, lm.xyz)
    reproj = jnp.linalg.norm(kf.uv[:, None, :] - uv_proj[None, :, :], axis=-1)
    cand = (d < cfg.association.max_hamming) \
        & (reproj < cfg.association.max_reprojection_px) \
        & (xyz_c[None, :, 2] > 0.0) \
        & (obs_cat[:, None] == lm.category[None, :]) \
        & lm.active[None, :] & obs_keep[:, None]
    cost = jnp.where(cand, reproj, jnp.inf)
    idx = jnp.argmin(cost, axis=1).astype(jnp.int32)
    matched = jnp.isfinite(jnp.min(cost, axis=1))
    # one observation per landmark: keep the lowest-cost observation when
    # several pick the same landmark (the reference's sequential loop would
    # have taken the first; lowest-cost is strictly better)
    best_cost_per_lm = jax.ops.segment_min(
        jnp.where(matched, jnp.min(cost, axis=1), jnp.inf), idx,
        num_segments=lm.xyz.shape[0])
    is_best = matched & (jnp.min(cost, axis=1) <= best_cost_per_lm[idx] + 1e-9)
    # tie-break exact duplicates by slot order
    first_with_cost = jax.ops.segment_min(
        jnp.where(is_best, jnp.arange(idx.shape[0]), jnp.iinfo(jnp.int32).max),
        idx, num_segments=lm.xyz.shape[0])
    matched = is_best & (jnp.arange(idx.shape[0]) == first_with_cost[idx])
    return idx, matched


# ---------------------------------------------------------------------------
# Multi-view triangulation (LandmarkInfo::triangulate, backend.cpp:439-613)
# ---------------------------------------------------------------------------

def triangulate_rings(cfg: SLAMConfig, k: Intrinsics, obs_uv: jnp.ndarray,
                      obs_kf: jnp.ndarray, obs_valid: jnp.ndarray,
                      active: jnp.ndarray, kdb: KeyframeDB
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched N-view DLT over (N, M) observation rings.

    → (xyz (N,3), accept (N,)).  Gates (backend.cpp:517,599,610): max pairwise
    parallax >= 5°, mean reprojection <= 2 px, 0.1 < z_cam < 10 in the newest
    observing keyframe.  Uses the CORRECT projection P = K[Rᵀ|−Rᵀt].
    """
    l, m = obs_kf.shape
    f_cap = kdb.q.shape[0]
    slots = obs_kf % f_cap
    q_kf = kdb.q[slots]                     # (L, M, 4)
    t_kf = kdb.t[slots]                     # (L, M, 3)
    # exclude observations whose keyframe slot has been recycled by the ring
    live = obs_kf >= (kdb.next_slot - f_cap)
    valid = obs_valid & live                 # (L, M)

    # normalized image coords of each observation
    xn = (obs_uv[..., 0] - k.cx) / k.fx
    yn = (obs_uv[..., 1] - k.cy) / k.fy

    # world→camera rows: Rᵀ, −Rᵀt
    r_wc = lie.quat_to_mat(q_kf)            # (L, M, 3, 3) camera-to-world
    r_cw = jnp.swapaxes(r_wc, -2, -1)
    t_cw = -jnp.einsum("lmij,lmj->lmi", r_cw, t_kf)
    # projection rows p0,p1,p2 of [R_cw | t_cw] in normalized coords
    p = jnp.concatenate([r_cw, t_cw[..., None]], axis=-1)  # (L, M, 3, 4)

    # DLT rows: xn*p2 - p0, yn*p2 - p1, masked
    row_u = xn[..., None] * p[..., 2, :] - p[..., 0, :]
    row_v = yn[..., None] * p[..., 2, :] - p[..., 1, :]
    w = valid[..., None].astype(jnp.float32)
    a = jnp.concatenate([row_u * w, row_v * w], axis=1)    # (L, 2M, 4)
    ata = jnp.einsum("lri,lrj->lij", a, a)                 # (L, 4, 4)
    h = ls.smallest_eigvec(ata)                            # (L, 4)
    xyz = h[..., :3] / jnp.where(jnp.abs(h[..., 3:]) < 1e-12, 1e-12, h[..., 3:])

    # parallax: max pairwise angle between viewing rays (camera centers → X)
    centers = t_kf                                          # camera origin in world
    rays = xyz[:, None, :] - centers                        # (L, M, 3)
    rays = rays / jnp.maximum(jnp.linalg.norm(rays, axis=-1, keepdims=True), 1e-9)
    cosang = jnp.einsum("lmi,lni->lmn", rays, rays)
    pair_ok = valid[:, :, None] & valid[:, None, :]
    min_cos = jnp.min(jnp.where(pair_ok, cosang, 1.0), axis=(1, 2))
    parallax_ok = min_cos < jnp.cos(jnp.deg2rad(cfg.triangulation.min_parallax_deg))

    # mean reprojection error over valid observations
    xc = jnp.einsum("lmij,lmj->lmi", r_cw, xyz[:, None, :].repeat(m, 1)) + t_cw
    z = xc[..., 2]
    up = k.fx * xc[..., 0] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z) + k.cx
    vp = k.fy * xc[..., 1] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z) + k.cy
    err = jnp.sqrt((up - obs_uv[..., 0]) ** 2 + (vp - obs_uv[..., 1]) ** 2)
    nv = jnp.maximum(jnp.sum(valid, axis=1), 1)
    mean_err = jnp.sum(jnp.where(valid, err, 0.0), axis=1) / nv
    behind = jnp.any(valid & (z <= 0.0), axis=1)

    # depth gate in the newest observing keyframe
    newest = jnp.argmax(jnp.where(valid, obs_kf, -1), axis=1)
    z_new = jnp.take_along_axis(z, newest[:, None], axis=1)[:, 0]
    depth_ok = (z_new > cfg.triangulation.min_depth) & \
        (z_new < cfg.triangulation.max_depth)

    accept = active & (jnp.sum(valid, axis=1) >= 2) & parallax_ok \
        & (mean_err <= cfg.triangulation.max_reprojection_px) \
        & depth_ok & ~behind
    return xyz, accept


def triangulate_all(cfg: SLAMConfig, k: Intrinsics, lm: LandmarkMap,
                    kdb: KeyframeDB) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-map N-view DLT (every landmark's ring) — see triangulate_rings."""
    return triangulate_rings(cfg, k, lm.obs_uv, lm.obs_kf, lm.obs_valid,
                             lm.active, kdb)


# ---------------------------------------------------------------------------
# Pruning (pruneLandmarks, backend.cpp:1249-1322)
# ---------------------------------------------------------------------------

def prune(cfg: SLAMConfig, lm: LandmarkMap, now: jnp.ndarray) -> LandmarkMap:
    """Deactivate landmarks with < min_observations that haven't been seen
    for max_age_s (backend.cpp:1251-1252); their slots become reallocatable."""
    stale = (lm.n_obs < cfg.prune.min_observations) & \
        ((now - lm.last_seen) > cfg.prune.max_age_s)
    keep = lm.active & ~stale
    return lm._replace(active=keep,
                       obs_valid=lm.obs_valid & keep[:, None],
                       n_obs=jnp.where(keep, lm.n_obs, 0),
                       obs_head=jnp.where(keep, lm.obs_head, 0))


# ---------------------------------------------------------------------------
# Keyframe ingestion — Backend::syncCallback (backend.cpp:709-831)
# ---------------------------------------------------------------------------

def insert_keyframe(cfg: SLAMConfig, state: MapState, kf: KeyframeBlock,
                    det: Detections, filtered_mask: jnp.ndarray
                    ) -> Tuple[MapState, dict]:
    """Pure update: categorize → semantic-filter → associate → update/insert
    landmarks → append keyframe → triangulate.

    filtered_mask: (n_categories,) bool — True for category ids to drop
    (the reference's filtered_objects_={"person"}, backend.cpp:233).
    """
    k = Intrinsics.from_config(cfg.camera)
    lm, kdb = state.landmarks, state.keyframes
    l_cap = lm.xyz.shape[0]
    m_ring = lm.obs_uv.shape[1]
    c_cap = kf.uv.shape[0]

    # semantic labeling + dynamic-object culling (backend.cpp:746-751)
    obs_cat = categorize(kf.uv, det)
    obs_keep = kf.mask & ~filtered_mask[obs_cat]

    # this keyframe's monotone sequence id + ring slot
    f_cap = kdb.q.shape[0]
    kf_seq = kdb.next_slot                 # monotone; stored in obs rings
    slot = kdb.next_slot % f_cap

    # association against current landmark set
    assoc_idx, matched = associate(cfg, k, lm, kf, obs_cat, obs_keep)

    # --- update matched landmarks --------------------------------------
    upd_idx = jnp.where(matched, assoc_idx, l_cap)       # OOB writes dropped
    ins = lambda arr, vals: arr.at[upd_idx].set(vals, mode="drop")
    new_n_obs = lm.n_obs.at[upd_idx].add(jnp.where(matched, 1, 0), mode="drop")
    head = lm.obs_head[assoc_idx] % m_ring
    obs_uv = lm.obs_uv.at[upd_idx, head].set(kf.uv, mode="drop")
    obs_kf_arr = lm.obs_kf.at[upd_idx, head].set(kf_seq, mode="drop")
    obs_val = lm.obs_valid.at[upd_idx, head].set(True, mode="drop")
    lm = lm._replace(
        desc_bits=ins(lm.desc_bits, kf.desc_bits),
        last_seen=ins(lm.last_seen, jnp.full(c_cap, kf.timestamp)),
        n_obs=new_n_obs, obs_uv=obs_uv, obs_kf=obs_kf_arr, obs_valid=obs_val,
        obs_head=lm.obs_head.at[upd_idx].add(jnp.where(matched, 1, 0),
                                             mode="drop"))

    # --- insert unmatched as new landmarks ------------------------------
    # free slot allocation by prefix sums (static shape replacement for
    # next_global_landmark_id_++, backend.cpp:778-797)
    is_new = obs_keep & ~matched
    free = ~lm.active
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1       # rank among free
    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1      # rank among new
    n_free = jnp.sum(free.astype(jnp.int32))
    # slot of the r-th free entry: invert the rank permutation
    free_slots = jnp.full(l_cap, l_cap, jnp.int32)
    free_slots = free_slots.at[jnp.where(free, free_rank, l_cap)].set(
        jnp.arange(l_cap, dtype=jnp.int32), mode="drop")
    can_alloc = is_new & (new_rank < n_free)
    dest = jnp.where(can_alloc, free_slots[jnp.clip(new_rank, 0, l_cap - 1)],
                     l_cap)
    lm = lm._replace(
        xyz=lm.xyz.at[dest].set(kf.xyz_w, mode="drop"),
        desc_bits=lm.desc_bits.at[dest].set(kf.desc_bits, mode="drop"),
        desc_anchor=lm.desc_anchor.at[dest].set(kf.desc_bits, mode="drop"),
        category=lm.category.at[dest].set(obs_cat, mode="drop"),
        n_obs=lm.n_obs.at[dest].set(jnp.where(can_alloc, 1, 0), mode="drop"),
        last_seen=lm.last_seen.at[dest].set(
            jnp.full(c_cap, kf.timestamp), mode="drop"),
        active=lm.active.at[dest].set(True, mode="drop"),
        obs_uv=lm.obs_uv.at[dest, 0].set(kf.uv, mode="drop"),
        obs_kf=lm.obs_kf.at[dest, 0].set(kf_seq, mode="drop"),
        obs_valid=lm.obs_valid.at[dest, 0].set(can_alloc, mode="drop"),
        obs_head=lm.obs_head.at[dest].set(1, mode="drop"),
        next_id=lm.next_id + jnp.sum(can_alloc.astype(jnp.int32)))

    # --- append keyframe -------------------------------------------------
    kdb = kdb._replace(
        q=kdb.q.at[slot].set(kf.q_wc), t=kdb.t.at[slot].set(kf.t_wc),
        stamp=kdb.stamp.at[slot].set(kf.timestamp),
        frame_idx=kdb.frame_idx.at[slot].set(kf.frame_idx),
        active=kdb.active.at[slot].set(True),
        next_slot=kdb.next_slot + 1, count=kdb.count + 1)

    # --- triangulation refinement (backend.cpp:763-772) ------------------
    # The reference triangulates ONLY the landmark each observation touched
    # (per-observation triangulate call); mirroring that keeps the DLT batch
    # at (C, M) instead of (L, M) — ~L/C times less work per insert for
    # identical results (untouched landmarks' rings and the keyframe poses
    # they reference are unchanged, so their DLT solution is unchanged; BA
    # and loop corrections maintain their positions separately).
    touched = jnp.where(matched, assoc_idx,
                        jnp.where(can_alloc, dest, l_cap))    # (C,)
    tg = jnp.clip(touched, 0, l_cap - 1)                      # safe gather
    new_xyz, tri_ok = triangulate_rings(
        cfg, k, lm.obs_uv[tg], lm.obs_kf[tg], lm.obs_valid[tg],
        lm.active[tg] & (touched < l_cap), kdb)
    lm = lm._replace(xyz=lm.xyz.at[jnp.where(tri_ok, touched, l_cap)].set(
        new_xyz, mode="drop"))

    stats = dict(
        n_obs_kept=jnp.sum(obs_keep.astype(jnp.int32)),
        n_matched=jnp.sum(matched.astype(jnp.int32)),
        n_new=jnp.sum(can_alloc.astype(jnp.int32)),
        n_triangulated=jnp.sum(tri_ok.astype(jnp.int32)),
        n_active=jnp.sum(lm.active.astype(jnp.int32)),
        dropped_no_capacity=jnp.sum((is_new & ~can_alloc).astype(jnp.int32)))
    return MapState(lm, kdb), stats
