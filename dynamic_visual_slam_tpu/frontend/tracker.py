"""Per-frame RGB-D tracking — the reference frontend's hot loop as ONE jitted
step function.

Reference: Frontend::syncCallback (frontend.cpp:1068-1334): ORB extraction →
depth filter → descriptor match to previous frame → fundamental-matrix
verification → PnP pose → motion gate → global pose accumulation → keyframe
policy → backend-feature culling → keyframe publication.

TPU redesign: the whole chain is a pure function (TrackerState, gray, depth)
→ (TrackerState, TrackOutput) with static shapes, so XLA compiles one fused
program per camera size; the first-frame / tracking-lost branches are mask
selects, not Python control flow.  Everything downstream (the mapping
backend) consumes the fixed-capacity keyframe block in TrackOutput — the
moral equivalent of Keyframe.msg (dynamic_visual_slam_interfaces/msg/
Keyframe.msg) without the DDS hop.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dynamic_visual_slam_tpu.config import SLAMConfig
from dynamic_visual_slam_tpu.core import camera as cam
from dynamic_visual_slam_tpu.core import containers
from dynamic_visual_slam_tpu.core import lie
from dynamic_visual_slam_tpu.core.camera import Intrinsics
from dynamic_visual_slam_tpu.frontend import ransac
from dynamic_visual_slam_tpu.frontend.orb import Keypoints, extract
from dynamic_visual_slam_tpu.ops import hamming


class KeyframeBlock(NamedTuple):
    """Fixed-capacity keyframe payload — Keyframe.msg equivalent
    (landmark ids are assigned by the backend; slots are local indices)."""

    q_wc: jnp.ndarray        # (4,) camera-to-world rotation (optical frame)
    t_wc: jnp.ndarray        # (3,)
    uv: jnp.ndarray          # (C, 2) pixel observations
    xyz_w: jnp.ndarray       # (C, 3) world positions (frontend triangulation
    #                          = backprojected current depth, frontend.cpp:732-752)
    desc_bits: jnp.ndarray   # (C, 256)
    desc_packed: jnp.ndarray  # (C, 32)
    response: jnp.ndarray    # (C,)
    mask: jnp.ndarray        # (C,)
    frame_idx: jnp.ndarray   # () int32
    timestamp: jnp.ndarray   # () float64-ish seconds (float32 here)


class TrackerState(NamedTuple):
    q_wc: jnp.ndarray            # (4,) accumulated camera-to-world pose
    t_wc: jnp.ndarray            # (3,)
    prev: Keypoints              # previous frame's depth-valid keypoints
    prev_depth: jnp.ndarray      # (K,) metric depth at prev keypoints
    has_prev: jnp.ndarray        # () bool
    kf_desc_bits: jnp.ndarray    # (C,256) last keyframe descriptors
    kf_mask: jnp.ndarray         # (C,)
    kf_xyz_w: jnp.ndarray        # (C,3) last keyframe world points — PnP
    #                              anchor when cfg.tracking.anchor_to_keyframe
    #                              (corrections applied to the tracker pose by
    #                              BA feedback / loops / reloc transform these
    #                              too, pipeline/slam.py)
    has_kf: jnp.ndarray          # () bool
    frames_since_kf: jnp.ndarray  # () int32
    frame_idx: jnp.ndarray       # () int32
    rng: jax.Array
    q_rel: jnp.ndarray           # (4,) last accepted prev→curr PnP transform
    t_rel: jnp.ndarray           # (3,) — constant-velocity prior for PnP


class TrackOutput(NamedTuple):
    q_wc: jnp.ndarray
    t_wc: jnp.ndarray
    tracking_ok: jnp.ndarray     # () bool — pose was updated this frame
    n_features: jnp.ndarray      # () int32 depth-valid keypoints
    n_matches: jnp.ndarray       # () int32 hamming-gated matches
    n_inliers: jnp.ndarray       # () int32 fundamental inliers
    n_pnp_inliers: jnp.ndarray
    is_keyframe: jnp.ndarray     # () bool
    keyframe: KeyframeBlock      # built every frame; INSERT iff is_keyframe


def init_state(cfg: SLAMConfig) -> TrackerState:
    k = cfg.orb.max_keypoints
    c = cfg.map.max_obs_per_keyframe
    zkp = Keypoints(
        uv=jnp.zeros((k, 2), jnp.float32), response=jnp.zeros(k, jnp.float32),
        angle=jnp.zeros(k, jnp.float32), octave=jnp.zeros(k, jnp.int32),
        desc_bits=jnp.zeros((k, 256), jnp.uint8),
        desc_packed=jnp.zeros((k, 32), jnp.uint8), mask=jnp.zeros(k, bool))
    return TrackerState(
        q_wc=lie.quat_identity(), t_wc=jnp.zeros(3, jnp.float32),
        prev=zkp, prev_depth=jnp.zeros(k, jnp.float32),
        has_prev=jnp.asarray(False),
        kf_desc_bits=jnp.zeros((c, 256), jnp.uint8),
        kf_mask=jnp.zeros(c, bool),
        kf_xyz_w=jnp.zeros((c, 3), jnp.float32), has_kf=jnp.asarray(False),
        frames_since_kf=jnp.asarray(0, jnp.int32),
        frame_idx=jnp.asarray(0, jnp.int32), rng=jax.random.key(0),
        q_rel=lie.quat_identity(), t_rel=jnp.zeros(3, jnp.float32))


def _depth_at(depth_m: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Nearest-pixel metric depth lookup (isValidDepth, frontend.cpp:457-473)."""
    h, w = depth_m.shape
    x = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, h - 1)
    return depth_m[y, x]


def _select_keyframe_features(cfg: SLAMConfig, kps: Keypoints,
                              fm_inlier_curr: jnp.ndarray) -> jnp.ndarray:
    """Backend-feature culling (frontend.cpp:1171-1219): all fundamental
    inliers + the top cull_top_unmatched unmatched keypoints with response
    >= cull_min_response.  Returns a (K,) keep mask."""
    unmatched = kps.mask & ~fm_inlier_curr & \
        (kps.response >= cfg.keyframe.cull_min_response)
    # histogram top-k (containers.topk_mask_int): responses are integer
    # FAST margins <= 255, and lax.top_k is a full 1024-row sort on TPU —
    # one of two such sorts that sat inside the per-frame tracking scan
    top_mask = containers.topk_mask_int(kps.response, unmatched,
                                        cfg.keyframe.cull_top_unmatched)
    return (fm_inlier_curr & kps.mask) | top_mask


def points_in_boxes(uv: jnp.ndarray, boxes: jnp.ndarray,
                    box_mask: jnp.ndarray) -> jnp.ndarray:
    """(K,2) pixels × (D,4) xyxy boxes (+ (D,) validity) → (K,D) containment.
    The single point-in-detection-bbox predicate shared by frontend culling
    and backend categorization (backend.cpp:1011-1029) — edge-inclusive on
    all four box edges."""
    return ((uv[:, None, 0] >= boxes[None, :, 0])
            & (uv[:, None, 0] <= boxes[None, :, 2])
            & (uv[:, None, 1] >= boxes[None, :, 1])
            & (uv[:, None, 1] <= boxes[None, :, 3])
            & box_mask[None, :])


def _in_filtered_box(uv: jnp.ndarray, det, filtered: jnp.ndarray
                     ) -> jnp.ndarray:
    """(K,2) pixels → (K,) True where the pixel falls inside a detection
    bbox whose class is semantically filtered (person by default)."""
    drop_box = det.mask & filtered[det.category]            # (D,)
    return jnp.any(points_in_boxes(uv, det.boxes, drop_box), axis=1)


def track_step(cfg: SLAMConfig, state: TrackerState, gray: jnp.ndarray,
               depth_m: jnp.ndarray, timestamp: jnp.ndarray,
               det=None, filtered=None, kps=None
               ) -> Tuple[TrackerState, TrackOutput]:
    """One frame.

    gray: (H,W) uint8 or float32 [0,255]; depth_m: (H,W) uint16 MILLIMETRES
    (the native RealSense 16UC1 format, frontend.cpp:1080) or float32
    metres. Integer inputs are converted on device — uploading the camera's
    native 8/16-bit frames is ~4x less host→device traffic than f32.

    det/filtered (optional): synced Detections + (n_categories,) filtered-
    class mask enable FRONTEND semantic culling (cfg.semantic.
    cull_in_frontend): keypoints inside a filtered-class bbox are dropped
    BEFORE matching, so moving objects can never vote in RANSAC/PnP or
    enter a keyframe. Deliberate divergence from the reference, which culls
    only in the backend (backend.cpp:746-751) and leaves its frontend
    odometry exposed to dynamics (docs/PARITY.md) — possible here because
    detections are frame-synced in-process rather than a separate ROS node.

    kps (optional): precomputed Keypoints for this frame, skipping the
    in-step ORB extraction. The fleet path uses this to run the Pallas
    extraction kernels under lax.map over streams (they are grid programs
    that do not batch under vmap on TPU) while vmapping the rest of the
    step (parallel/mesh.py).
    """
    if kps is None and gray.dtype != jnp.float32:
        gray = gray.astype(jnp.float32)
    if depth_m.dtype == jnp.uint16:
        depth_m = depth_m.astype(jnp.float32) * 1e-3
    elif depth_m.dtype != jnp.float32:
        depth_m = depth_m.astype(jnp.float32)
    k = Intrinsics.from_config(cfg.camera)
    rng, k_fm, k_pnp, k_anc = jax.random.split(state.rng, 4)

    # --- extraction + depth filter (frontend.cpp:1094-1100,503-527) ---------
    if kps is None:
        kps = extract(gray, cfg.orb)
    z = _depth_at(depth_m, kps.uv)
    depth_ok = (z > cfg.depth.min_depth) & (z < cfg.depth.max_depth)
    kps = kps._replace(mask=kps.mask & depth_ok)
    if det is not None and filtered is not None \
            and cfg.semantic.cull_in_frontend:
        kps = kps._replace(
            mask=kps.mask & ~_in_filtered_box(kps.uv, det, filtered))
    n_feat = kps.count()
    lost = n_feat == 0   # tracking reset (frontend.cpp:1107-1117)

    # --- match current → previous (frontend.cpp:1123-1127) ------------------
    m = hamming.match(kps.desc_bits, state.prev.desc_bits, kps.mask,
                      state.prev.mask & state.has_prev,
                      max_distance=float(cfg.match.max_hamming))
    n_match = jnp.sum(m.valid.astype(jnp.int32))

    # --- geometric verification (frontend.cpp:1146-1147) --------------------
    uv_prev = state.prev.uv[m.train_idx]
    fm = ransac.fundamental_ransac(uv_prev, kps.uv, m.valid, k_fm,
                                   n_hyp=cfg.ransac.fm_iterations,
                                   threshold=cfg.ransac.fm_threshold_px)
    fm_inlier = fm.inliers & fm.valid
    n_inlier = jnp.sum(fm_inlier.astype(jnp.int32))

    # --- PnP: previous-frame 3D from prev depth → current pixels ------------
    # (estimateCameraPose, frontend.cpp:843-948)
    z_prev = state.prev_depth[m.train_idx]
    pnp_ok_pts = fm_inlier & (z_prev > cfg.depth.min_depth) & \
        (z_prev <= cfg.depth.max_depth)
    xyz_prev = cam.backproject(k, uv_prev, z_prev)
    # constant-velocity prior: last accepted prev→curr transform (plus an
    # identity hypothesis) joins the random hypothesis pool — rescues fast-
    # motion frames whose DLT-6 minimal sets are all noise-biased
    pnp = ransac.pnp_ransac(k, xyz_prev, kps.uv, pnp_ok_pts, k_pnp,
                            n_hyp=cfg.ransac.pnp_iterations,
                            threshold=cfg.ransac.pnp_threshold_px,
                            min_inliers=cfg.ransac.min_pnp_matches,
                            refine_iters=cfg.ransac.refine_iterations,
                            prior_q=state.q_rel, prior_t=state.t_rel)

    # pnp gives T mapping prev-camera coords → current camera; invert to get
    # the current camera's pose in the previous frame (frontend.cpp:930-938)
    q_inv, t_inv = lie.se3_inverse(pnp.q, pnp.t)
    rvec = lie.so3_log(q_inv)
    motion_ok = (jnp.linalg.norm(t_inv) <= cfg.motion.max_translation_m) & \
        (jnp.linalg.norm(rvec) <= cfg.motion.max_rotation_rad)  # frontend.cpp:549-570
    accept = pnp.valid & motion_ok & state.has_prev & ~lost

    # global accumulation T_wc ← T_wc ∘ T_prev←curr (frontend.cpp:947-948)
    q_new, t_new = lie.se3_compose(state.q_wc, state.t_wc, q_inv, t_inv)
    q_wc = jnp.where(accept, q_new, state.q_wc)
    t_wc = jnp.where(accept, t_new, state.t_wc)

    # --- keyframe policy (isKeyframe, frontend.cpp:601-662) -----------------
    kf_m = hamming.match(kps.desc_bits, state.kf_desc_bits, kps.mask,
                         state.kf_mask & state.has_kf,
                         max_distance=float(cfg.match.max_hamming))
    n_kf_matches = jnp.sum(kf_m.valid.astype(jnp.int32))

    # --- keyframe-anchored absolute PnP (cfg.tracking.anchor_to_keyframe) ---
    # The frame-to-frame chain compounds error every frame; PnP against the
    # last keyframe's STORED world points yields an absolute pose whose error
    # compounds per keyframe instead. The kf_m match is already computed for
    # the keyframe policy, so the extra cost is one more batched PnP. The
    # anchored pose replaces the composed one only when it is strong (inlier
    # floor) AND agrees with it (jump gates) — a wrong anchor match must not
    # teleport the tracker.
    tracked = accept
    q_rel_eff, t_rel_eff = pnp.q, pnp.t
    n_pnp_out = pnp.n_inliers
    if cfg.tracking.anchor_to_keyframe:
        q_pred_cw, t_pred_cw = lie.se3_inverse(q_wc, t_wc)
        kfa = ransac.pnp_ransac(
            k, state.kf_xyz_w[kf_m.train_idx], kps.uv,
            kf_m.valid & state.has_kf, k_anc,
            n_hyp=cfg.ransac.pnp_iterations,
            threshold=cfg.ransac.pnp_threshold_px,
            min_inliers=cfg.ransac.min_pnp_matches,
            refine_iters=cfg.ransac.refine_iterations,
            prior_q=q_pred_cw, prior_t=t_pred_cw)
        q_abs, t_abs = lie.se3_inverse(kfa.q, kfa.t)
        dphi = lie.so3_log(lie.quat_mul(q_abs, lie.quat_conj(q_wc)))
        use_anchor = state.has_kf & kfa.valid & ~lost \
            & (kfa.n_inliers >= cfg.tracking.anchor_min_inliers) \
            & (jnp.linalg.norm(t_abs - t_wc)
               <= cfg.tracking.anchor_max_jump_m) \
            & (jnp.linalg.norm(dphi) <= cfg.tracking.anchor_max_jump_rad)
        q_wc = jnp.where(use_anchor, q_abs, q_wc)
        t_wc = jnp.where(use_anchor, t_abs, t_wc)
        tracked = accept | use_anchor
        # effective prev→curr transform of the EMITTED pose (reduces to
        # pnp.q/t when only the frame-to-frame solve accepted) — keeps the
        # constant-velocity prior fresh through anchor-only stretches
        q_rel_eff, t_rel_eff = lie.se3_compose(
            *lie.se3_inverse(q_wc, t_wc), state.q_wc, state.t_wc)
        n_pnp_out = jnp.where(use_anchor, kfa.n_inliers, pnp.n_inliers)
    is_kf = (~state.has_kf) | \
        (n_kf_matches < cfg.keyframe.min_matches_to_last_kf) | \
        (state.frames_since_kf >= cfg.keyframe.max_frames_between_kf)
    # quality deviation from the reference (docs/PARITY.md): the reference
    # publishes keyframes even when PnP failed / the motion gate tripped,
    # backprojecting current pixels through the STALE pose — corrupting the
    # map exactly when tracking is weakest.  Require a tracked pose before
    # emitting a keyframe; the prev-less bootstrap branch applies only
    # before the FIRST keyframe exists (~has_kf), never after a mid-run
    # tracking reset, whose recovery frame would otherwise anchor a
    # keyframe at the stale frozen pose.
    is_kf = is_kf & ~lost & (tracked | (~state.has_prev & ~state.has_kf))

    # --- keyframe payload: culled features + world positions ----------------
    keep = _select_keyframe_features(cfg, kps, fm_inlier)
    # first frame: publish all depth-valid keypoints (frontend.cpp:1277-1316)
    keep = jnp.where(state.has_prev, keep, kps.mask)
    cap = cfg.map.max_obs_per_keyframe
    # top-cap by response without a 1024-row device sort: histogram top-k
    # mask + prefix-sum compaction. Payload rows land in keypoint-index
    # order rather than response-descending — every consumer (association,
    # BoW, BA gathers) is row-order-invariant.
    sel = containers.topk_mask_int(kps.response, keep, cap)
    sel_idx = containers.stable_partition(sel)[:cap]
    sel_valid = jnp.take(sel, sel_idx)
    xyz_c = cam.backproject(k, kps.uv[sel_idx], z[sel_idx])
    xyz_w = cam.camera_to_world(q_wc, t_wc, xyz_c)
    # mask marks this frame's selected features regardless of is_kf (every
    # consumer of the block gates on out.is_keyframe; keeping the payload
    # live on non-keyframes lets relocalization query BoW with the current
    # frame's descriptors after a tracking loss)
    kf_block = KeyframeBlock(
        q_wc=q_wc, t_wc=t_wc, uv=kps.uv[sel_idx], xyz_w=xyz_w,
        desc_bits=kps.desc_bits[sel_idx], desc_packed=kps.desc_packed[sel_idx],
        response=kps.response[sel_idx], mask=sel_valid,
        frame_idx=state.frame_idx, timestamp=timestamp)

    # --- state update (frontend.cpp:1258-1275) ------------------------------
    new_state = TrackerState(
        q_wc=q_wc, t_wc=t_wc, prev=kps, prev_depth=z,
        has_prev=~lost,
        kf_desc_bits=jnp.where(is_kf, kf_block.desc_bits, state.kf_desc_bits),
        kf_mask=jnp.where(is_kf, kf_block.mask, state.kf_mask),
        kf_xyz_w=jnp.where(is_kf, kf_block.xyz_w, state.kf_xyz_w),
        # reference quirk: the first-frame branch publishes a keyframe without
        # arming the policy (has_last_keyframe_ is only set inside isKeyframe,
        # frontend.cpp:603-605), so frames 0 AND 1 both become keyframes
        has_kf=state.has_kf | (is_kf & state.has_prev),
        frames_since_kf=jnp.where(is_kf, 0, state.frames_since_kf + 1),
        frame_idx=state.frame_idx + 1, rng=rng,
        # constant-velocity prior: the EFFECTIVE prev→curr transform of the
        # pose actually emitted (inv(T_curr)∘T_prev) — equals pnp.q/t when
        # only frame-to-frame accepted, and stays fresh through anchor-only
        # stretches where the frame-to-frame solve failed
        q_rel=jnp.where(tracked, q_rel_eff, state.q_rel),
        t_rel=jnp.where(tracked, t_rel_eff, state.t_rel))

    out = TrackOutput(
        q_wc=q_wc, t_wc=t_wc, tracking_ok=tracked, n_features=n_feat,
        n_matches=n_match, n_inliers=n_inlier,
        # support of the EMITTED pose: the anchored solve's inliers on
        # frames where it replaced the frame-to-frame composition
        n_pnp_inliers=n_pnp_out,
        is_keyframe=is_kf, keyframe=kf_block)
    return new_state, out


def make_jitted_step(cfg: SLAMConfig):
    """Returns a donated-state jitted step closed over the config."""
    def step(state, gray, depth_m, timestamp):
        return track_step(cfg, state, gray, depth_m, timestamp)
    return jax.jit(step, donate_argnums=(0,))


def track_batch(cfg: SLAMConfig, state: TrackerState, kps_b: Keypoints,
                depths: jnp.ndarray, timestamps: jnp.ndarray,
                dets=None, filtered=None
                ) -> Tuple[TrackerState, TrackOutput]:
    """B frames through the tracker with the state-free work VMAPPED.

    The per-frame scan in process_batch was launch-bound: ~3.5 ms/frame of
    device time spread over hundreds of tiny kernels (trace_scan.py), most
    of them in stages whose inputs do not depend on the previous frame's
    OUTPUT at all — depth gating, semantic culling, frame-to-(i-1) matching,
    F-RANSAC, frame-to-frame PnP, payload candidate selection.  Here those
    run as (B, …) batched ops; the sequential lax.scan keeps only the truly
    state-dependent core: pose-chain composition + gates, the keyframe
    policy, and the keyframe-anchored PnP.

    Two deliberate approximations vs the frame-by-frame track_step (both
    affect only RANSAC hypothesis PRIORS, never the scoring or gates;
    tests/test_dynamic.py bounds the trajectory divergence):
    - the constant-velocity prior for pair i is pair i-1's prior-less PnP
      solution (two vmapped passes) instead of the sequential effective
      rel — equal whenever frame i-1's frame-to-frame solve succeeded;
    - the keyframe-anchored PnP is evaluated SPECULATIVELY for all frames
      against the batch-start keyframe (vmapped, with a composed-rel-chain
      pose prediction as prior); frames after a mid-batch keyframe
      insertion recompute it exactly inside the scan under lax.cond — the
      expensive branch runs only for the post-insertion tail, and its
      result is identical to the sequential path's.
    """
    k = Intrinsics.from_config(cfg.camera)
    b = timestamps.shape[0]
    if depths.dtype == jnp.uint16:
        depths = depths.astype(jnp.float32) * 1e-3
    elif depths.dtype != jnp.float32:
        depths = depths.astype(jnp.float32)

    # --- rng chain: exactly the keys the sequential path would draw -------
    def split_body(r, _):
        r2, k_fm, k_pnp, k_anc = jax.random.split(r, 4)
        return r2, (k_fm, k_pnp, k_anc)
    rng_out, (k_fm_b, k_pnp_b, k_anc_b) = jax.lax.scan(
        split_body, state.rng, None, length=b)

    # --- per-frame prep: depth gate + semantic cull (vmapped) -------------
    z_b = jax.vmap(_depth_at)(depths, kps_b.uv)
    depth_ok = (z_b > cfg.depth.min_depth) & (z_b < cfg.depth.max_depth)
    mask_b = kps_b.mask & depth_ok
    if dets is not None and filtered is not None \
            and cfg.semantic.cull_in_frontend:
        drop = jax.vmap(lambda uv, det: _in_filtered_box(uv, det, filtered)
                        )(kps_b.uv, dets)
        mask_b = mask_b & ~drop
    kps_b = kps_b._replace(mask=mask_b)
    n_feat = jnp.sum(mask_b.astype(jnp.int32), axis=1)       # (B,)
    lost = n_feat == 0

    # --- previous-frame chain (frame 0 ← carry state) ----------------------
    shift = lambda carry0, a: jnp.concatenate([carry0[None], a[:-1]], axis=0)
    prev_b = jax.tree_util.tree_map(shift, state.prev, kps_b)
    prev_z = shift(state.prev_depth, z_b)
    has_prev = shift(state.has_prev, ~lost)

    # --- match + F-RANSAC + frame-to-frame PnP (vmapped pairs) -------------
    def pair_stage(kps, prev, pz, hp, key_fm, key_pnp, prior_q, prior_t):
        m = hamming.match(kps.desc_bits, prev.desc_bits, kps.mask,
                          prev.mask & hp,
                          max_distance=float(cfg.match.max_hamming))
        uv_prev = prev.uv[m.train_idx]
        fm = ransac.fundamental_ransac(uv_prev, kps.uv, m.valid, key_fm,
                                       n_hyp=cfg.ransac.fm_iterations,
                                       threshold=cfg.ransac.fm_threshold_px)
        fm_inlier = fm.inliers & fm.valid
        z_prev = pz[m.train_idx]
        pnp_ok = fm_inlier & (z_prev > cfg.depth.min_depth) & \
            (z_prev <= cfg.depth.max_depth)
        xyz_prev = cam.backproject(k, uv_prev, z_prev)
        pnp = ransac.pnp_ransac(k, xyz_prev, kps.uv, pnp_ok, key_pnp,
                                n_hyp=cfg.ransac.pnp_iterations,
                                threshold=cfg.ransac.pnp_threshold_px,
                                min_inliers=cfg.ransac.min_pnp_matches,
                                refine_iters=cfg.ransac.refine_iterations,
                                prior_q=prior_q, prior_t=prior_t)
        n_match = jnp.sum(m.valid.astype(jnp.int32))
        n_inlier = jnp.sum(fm_inlier.astype(jnp.int32))
        return pnp, fm_inlier, n_match, n_inlier

    # pass 1: prior-less (identity stands in, keeping the pool layout)
    iq = jnp.broadcast_to(lie.quat_identity(), (b, 4))
    it = jnp.zeros((b, 3), jnp.float32)
    pnp1, _, _, _ = jax.vmap(pair_stage)(
        kps_b, prev_b, prev_z, has_prev, k_fm_b, k_pnp_b, iq, it)
    # pass 2: constant-velocity prior = previous pair's pass-1 solution
    # (frame 0 ← the carried effective rel), same keys → same random pool
    pq1 = jnp.where(pnp1.valid[:, None], pnp1.q, iq)
    pt1 = jnp.where(pnp1.valid[:, None], pnp1.t, it)
    prior_q = shift(state.q_rel, pq1)
    prior_t = shift(state.t_rel, pt1)
    pnp, fm_inlier_b, n_match, n_inlier = jax.vmap(pair_stage)(
        kps_b, prev_b, prev_z, has_prev, k_fm_b, k_pnp_b, prior_q, prior_t)

    # relative motion + gate (vmapped)
    q_inv, t_inv = jax.vmap(lie.se3_inverse)(pnp.q, pnp.t)
    rvec = jax.vmap(lie.so3_log)(q_inv)
    motion_ok = (jnp.linalg.norm(t_inv, axis=1)
                 <= cfg.motion.max_translation_m) & \
        (jnp.linalg.norm(rvec, axis=1) <= cfg.motion.max_rotation_rad)
    accept_pnp = pnp.valid & motion_ok & has_prev & ~lost

    # --- pose-chain PREDICTION for the speculative anchor prior -----------
    # prefix compose of the accepted-or-identity rels (associative scan);
    # ignores in-scan gate outcomes — it only seeds the anchor's hypothesis
    # pool, the exact in-scan recompute path builds its own exact prior
    rel_q = jnp.where(accept_pnp[:, None], q_inv, iq)
    rel_t = jnp.where(accept_pnp[:, None], t_inv, it)

    def se3_chain(a, c):
        qa, ta = a
        qc, tc = c
        return lie.quat_mul(qa, qc), lie.quat_rotate(qa, tc) + ta
    pre_q, pre_t = jax.lax.associative_scan(se3_chain, (rel_q, rel_t))
    q_pred = lie.quat_normalize(
        jax.vmap(lambda qq: lie.quat_mul(state.q_wc, qq))(pre_q))
    t_pred = jax.vmap(lambda tt: lie.quat_rotate(state.q_wc, tt)
                      + state.t_wc)(pre_t)

    # --- keyframe-policy match + anchored PnP vs the batch-start keyframe --
    def kf_stage(kps, key_anc, pq, pt, kf_desc, kf_mask, kf_xyz, has_kf):
        kf_m = hamming.match(kps.desc_bits, kf_desc, kps.mask,
                             kf_mask & has_kf,
                             max_distance=float(cfg.match.max_hamming))
        n_kf = jnp.sum(kf_m.valid.astype(jnp.int32))
        if not cfg.tracking.anchor_to_keyframe:
            zq = lie.quat_identity()
            return (n_kf, zq, jnp.zeros(3), jnp.asarray(False),
                    jnp.asarray(0, jnp.int32))
        q_cw, t_cw = lie.se3_inverse(pq, pt)
        kfa = ransac.pnp_ransac(k, kf_xyz[kf_m.train_idx], kps.uv,
                                kf_m.valid & has_kf, key_anc,
                                n_hyp=cfg.ransac.pnp_iterations,
                                threshold=cfg.ransac.pnp_threshold_px,
                                min_inliers=cfg.ransac.min_pnp_matches,
                                refine_iters=cfg.ransac.refine_iterations,
                                prior_q=q_cw, prior_t=t_cw)
        return n_kf, kfa.q, kfa.t, kfa.valid, kfa.n_inliers

    spec = jax.vmap(kf_stage, in_axes=(0, 0, 0, 0) + (None,) * 4)(
        kps_b, k_anc_b, q_pred, t_pred, state.kf_desc_bits, state.kf_mask,
        state.kf_xyz_w, state.has_kf)

    # --- payload candidates (vmapped; world lift happens in the scan) ------
    def payload_stage(kps, fm_inlier, hp, z):
        keep = _select_keyframe_features(cfg, kps, fm_inlier)
        keep = jnp.where(hp, keep, kps.mask)
        cap = cfg.map.max_obs_per_keyframe
        sel = containers.topk_mask_int(kps.response, keep, cap)
        sel_idx = containers.stable_partition(sel)[:cap]
        xyz_c = cam.backproject(k, kps.uv[sel_idx], z[sel_idx])
        return (sel_idx, jnp.take(sel, sel_idx), xyz_c, kps.uv[sel_idx],
                kps.desc_bits[sel_idx], kps.desc_packed[sel_idx],
                kps.response[sel_idx])
    (sel_idx_b, sel_valid_b, xyz_c_b, sel_uv_b, sel_bits_b, sel_packed_b,
     sel_resp_b) = jax.vmap(payload_stage)(kps_b, fm_inlier_b, has_prev, z_b)

    # --- the sequential core ------------------------------------------------
    def body(carry, x):
        (q_wc0, t_wc0, kf_desc, kf_mask, kf_xyz, has_kf, since_kf,
         frame_idx, q_rel0, t_rel0, kf_dirty) = carry
        (qi, ti, ok_pnp, lost_i, hp_i, spec_i, desc_i, uvm_i,
         mask_i, key_anc_i, xyz_c_i, sel_valid_i, sel_bits_i, n_pnp2_i) = x

        q_new, t_new = lie.se3_compose(q_wc0, t_wc0, qi, ti)
        q_wc = jnp.where(ok_pnp, q_new, q_wc0)
        t_wc = jnp.where(ok_pnp, t_new, t_wc0)

        def recompute(_):
            kf_m = hamming.match(desc_i, kf_desc, mask_i,
                                 kf_mask & has_kf,
                                 max_distance=float(cfg.match.max_hamming))
            n_kf = jnp.sum(kf_m.valid.astype(jnp.int32))
            if not cfg.tracking.anchor_to_keyframe:
                return (n_kf, lie.quat_identity(), jnp.zeros(3),
                        jnp.asarray(False), jnp.asarray(0, jnp.int32))
            q_cw, t_cw = lie.se3_inverse(q_wc, t_wc)
            kfa = ransac.pnp_ransac(
                k, kf_xyz[kf_m.train_idx], uvm_i,
                kf_m.valid & has_kf, key_anc_i,
                n_hyp=cfg.ransac.pnp_iterations,
                threshold=cfg.ransac.pnp_threshold_px,
                min_inliers=cfg.ransac.min_pnp_matches,
                refine_iters=cfg.ransac.refine_iterations,
                prior_q=q_cw, prior_t=t_cw)
            return n_kf, kfa.q, kfa.t, kfa.valid, kfa.n_inliers

        n_kf_matches, kfa_q, kfa_t, kfa_valid, kfa_n = jax.lax.cond(
            kf_dirty, recompute, lambda _: spec_i, None)

        tracked = ok_pnp
        n_pnp_out = n_pnp2_i
        if cfg.tracking.anchor_to_keyframe:
            q_abs, t_abs = lie.se3_inverse(kfa_q, kfa_t)
            dphi = lie.so3_log(lie.quat_mul(q_abs, lie.quat_conj(q_wc)))
            use_anchor = has_kf & kfa_valid & ~lost_i \
                & (kfa_n >= cfg.tracking.anchor_min_inliers) \
                & (jnp.linalg.norm(t_abs - t_wc)
                   <= cfg.tracking.anchor_max_jump_m) \
                & (jnp.linalg.norm(dphi) <= cfg.tracking.anchor_max_jump_rad)
            q_wc = jnp.where(use_anchor, q_abs, q_wc)
            t_wc = jnp.where(use_anchor, t_abs, t_wc)
            tracked = ok_pnp | use_anchor
            q_rel_eff, t_rel_eff = lie.se3_compose(
                *lie.se3_inverse(q_wc, t_wc), q_wc0, t_wc0)
            n_pnp_out = jnp.where(use_anchor, kfa_n, n_pnp2_i)
        else:
            q_rel_eff, t_rel_eff = qi, ti

        is_kf = (~has_kf) | \
            (n_kf_matches < cfg.keyframe.min_matches_to_last_kf) | \
            (since_kf >= cfg.keyframe.max_frames_between_kf)
        is_kf = is_kf & ~lost_i & (tracked | (~hp_i & ~has_kf))

        xyz_w = cam.camera_to_world(q_wc, t_wc, xyz_c_i)
        new_carry = (
            q_wc, t_wc,
            jnp.where(is_kf, sel_bits_i, kf_desc),
            jnp.where(is_kf, sel_valid_i, kf_mask),
            jnp.where(is_kf, xyz_w, kf_xyz),
            has_kf | (is_kf & hp_i),
            jnp.where(is_kf, 0, since_kf + 1),
            frame_idx + 1,
            jnp.where(tracked, q_rel_eff, q_rel0),
            jnp.where(tracked, t_rel_eff, t_rel0),
            kf_dirty | is_kf)
        return new_carry, (q_wc, t_wc, tracked, is_kf, xyz_w, n_pnp_out)

    xs = (pnp.q, pnp.t, accept_pnp, lost, has_prev, spec,
          kps_b.desc_bits, kps_b.uv, kps_b.mask, k_anc_b, xyz_c_b,
          sel_valid_b, sel_bits_b, pnp.n_inliers)

    carry0 = (state.q_wc, state.t_wc, state.kf_desc_bits, state.kf_mask,
              state.kf_xyz_w, state.has_kf, state.frames_since_kf,
              state.frame_idx, state.q_rel, state.t_rel,
              jnp.asarray(False))
    carry, (q_wc_b, t_wc_b, tracked_b, is_kf_b, xyz_w_b, n_pnp_b) = \
        jax.lax.scan(body, carry0, xs)
    (q_wc_f, t_wc_f, kf_desc_f, kf_mask_f, kf_xyz_f, has_kf_f, since_f,
     fidx_f, q_rel_f, t_rel_f, _) = carry

    last = jax.tree_util.tree_map(lambda a: a[-1], kps_b)
    new_state = TrackerState(
        q_wc=q_wc_f, t_wc=t_wc_f, prev=last, prev_depth=z_b[-1],
        has_prev=~lost[-1], kf_desc_bits=kf_desc_f, kf_mask=kf_mask_f,
        kf_xyz_w=kf_xyz_f, has_kf=has_kf_f, frames_since_kf=since_f,
        frame_idx=fidx_f, rng=rng_out, q_rel=q_rel_f, t_rel=t_rel_f)

    frame_idx_b = state.frame_idx + jnp.arange(b, dtype=jnp.int32)
    kf_blocks = KeyframeBlock(
        q_wc=q_wc_b, t_wc=t_wc_b, uv=sel_uv_b, xyz_w=xyz_w_b,
        desc_bits=sel_bits_b, desc_packed=sel_packed_b,
        response=sel_resp_b, mask=sel_valid_b,
        frame_idx=frame_idx_b, timestamp=timestamps)
    out = TrackOutput(
        q_wc=q_wc_b, t_wc=t_wc_b, tracking_ok=tracked_b,
        n_features=n_feat, n_matches=n_match, n_inliers=n_inlier,
        n_pnp_inliers=n_pnp_b, is_keyframe=is_kf_b, keyframe=kf_blocks)
    return new_state, out
