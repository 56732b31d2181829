"""TPU-native ORB extractor: pyramid → FAST score → spread top-k → IC-angle →
rBRIEF, all static shapes, one XLA program per image size.

Reference: the vendored ORB-SLAM3 extractor (ORBextractor.cpp):
- 8-level x1.2 pyramid (1169-1194), per-35px-cell FAST th=20→7 fallback
  (781-896), quadtree spatial distribution keeping the max-response keypoint
  per node (555-779), intensity-centroid orientation (76-103), 7x7 sigma=2
  blur + 256-pair rotated-BRIEF (107-146, table at 149-407).

TPU redesign decisions:
- cv::FAST per cell → one dense corner-score map per level (ops/fast.py);
  threshold tests and the per-cell fallback become mask algebra.
- DistributeOctTree (sequential quadtree) → "spread top-k": 3x3 NMS, then the
  best keypoint of every 35-px cell is priority-boosted before a global
  response top-k at the level's quota.  This reproduces the quadtree's
  *selection distribution* (at most the quota, spatially spread, max-response
  per region) without data-dependent control flow (SURVEY.md §7 "hard parts").
- Orientation is a (K, 961) x (961, 2) matmul of gathered patches against
  fixed intensity-centroid weights — MXU work instead of per-keypoint loops.
- rBRIEF is a single (K, 512) gather from the blurred, reflect-padded level
  image at rotated pattern offsets; bit packing is a (K,32,8)·weights matmul.

The 256-pair sampling pattern is the standard public ORB constant table
(identical in OpenCV and ORB-SLAM), stored as data in orb_pattern.npy.
"""

from __future__ import annotations

import functools
import math
import os
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_visual_slam_tpu.config import ORBConfig
from dynamic_visual_slam_tpu.ops import fast, hamming
from dynamic_visual_slam_tpu.ops import image as imops

HALF_PATCH = 15
SAMPLE_PAD = 19   # reference EDGE_THRESHOLD: covers rotated-BRIEF reach (≤ |13|·√2)
CELL = 35         # FAST grid cell (ORBextractor.cpp:785)
PER_CELL_K = 8    # candidates kept per cell before the global top-k


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set. All arrays have leading dim K (capacity)."""

    uv: jnp.ndarray          # (K, 2) float32 — (x, y) in level-0 pixel coords
    response: jnp.ndarray    # (K,)  float32 — FAST corner score
    angle: jnp.ndarray       # (K,)  float32 — radians, IC orientation
    octave: jnp.ndarray      # (K,)  int32   — pyramid level
    desc_bits: jnp.ndarray   # (K, 256) uint8 {0,1} — matching layout (MXU)
    desc_packed: jnp.ndarray  # (K, 32) uint8 — OpenCV wire layout
    mask: jnp.ndarray        # (K,) bool

    @property
    def capacity(self) -> int:
        return self.uv.shape[0]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32))


# --------------------------------------------------------------------------
# Constant tables (host-side, cached)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def brief_pattern() -> np.ndarray:
    """(256, 4) int32 — x1,y1,x2,y2 per comparison (public ORB constant)."""
    path = os.path.join(os.path.dirname(__file__), "orb_pattern.npy")
    pat = np.load(path)
    assert pat.shape == (256, 4)
    return pat.astype(np.float32)


@functools.lru_cache(maxsize=None)
def ic_umax() -> np.ndarray:
    """Per-row max column offset of the radius-15 disc, with the exact
    symmetry-correction of the reference (ORBextractor.cpp:431-452)."""
    umax = np.zeros(HALF_PATCH + 2, dtype=np.int32)
    vmax = int(math.floor(HALF_PATCH * math.sqrt(2.0) / 2 + 1))
    vmin = int(math.ceil(HALF_PATCH * math.sqrt(2.0) / 2))
    hp2 = HALF_PATCH * HALF_PATCH
    for v in range(vmax + 1):
        umax[v] = int(round(math.sqrt(hp2 - v * v)))
    v0 = 0
    for v in range(HALF_PATCH, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax[:HALF_PATCH + 1]


@functools.lru_cache(maxsize=None)
def ic_weights() -> np.ndarray:
    """(961, 2) float32 — per-patch-pixel (u, v) moments weights for the
    intensity-centroid angle: m10 = Σ u·I, m01 = Σ v·I over the disc."""
    umax = ic_umax()
    size = 2 * HALF_PATCH + 1
    w = np.zeros((size, size, 2), dtype=np.float32)
    for v in range(-HALF_PATCH, HALF_PATCH + 1):
        for u in range(-HALF_PATCH, HALF_PATCH + 1):
            if abs(u) <= umax[abs(v)]:
                w[v + HALF_PATCH, u + HALF_PATCH, 0] = u
                w[v + HALF_PATCH, u + HALF_PATCH, 1] = v
    return w.reshape(size * size, 2)


def features_per_level(cfg: ORBConfig) -> List[int]:
    """Geometric per-level quotas, remainder to the coarsest level
    (ORBextractor constructor, ORBextractor.cpp:434-445)."""
    factor = 1.0 / cfg.scale_factor
    n_first = cfg.n_features * (1 - factor) / (1 - factor ** cfg.n_levels)
    quotas, acc = [], 0
    for _ in range(cfg.n_levels - 1):
        q = int(round(n_first))
        quotas.append(q)
        acc += q
        n_first *= factor
    quotas.append(max(cfg.n_features - acc, 0))
    return quotas


# --------------------------------------------------------------------------
# Per-level stages
# --------------------------------------------------------------------------

def _topk_per_cell(tiles: jnp.ndarray, k: int
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(C, M) cell scores (> 0 valid, -inf/≤0 invalid) → top-k values and
    in-cell indices per row, identical to jax.lax.top_k(tiles, k) on valid
    slots (descending, ties → lower index; exhausted slots give -inf).

    lax.top_k lowers to a full per-row SORT on TPU — for level 0 that is a
    777-cell × 1225-element sort, ~0.8 ms/frame of device time (the single
    most expensive op in extraction, trace_scan.py). (floor(value), index)
    packs exactly into one int32 — (⌊score⌋+1)·2048 + (2047−idx) ≤ 2.05e9
    for scores ≤ 255 + the 1e6 integer spread boost — so the top-8 become
    8 masked VPU max-reductions instead of a sort.  Values are DECODED from
    the packed integers ((m>>11)−1 — no gather touches the scalar core),
    exact because production scores are integer-valued (uint8 camera frames
    + quantized pyramid levels ⇒ integer FAST margins); ranking matches
    lax.top_k exactly on such scores (index tie-break included).

    Accepts (C, M) rows-of-cells, or the UNRESHAPED (Hc, CELL, Wc, CELL)
    cell grid — the 4D form skips the (Hc, Wc, CELL, CELL) transpose, which
    materialized a ~180 MB layout copy per 720p level at batch 24
    (trace: copy.1502-1505).  In-cell index = row·CELL + col either way."""
    if tiles.ndim == 2:
        m_sz = tiles.shape[1]
        pos = jnp.arange(m_sz, dtype=jnp.int32)[None, :]
        axes = (1,)
        expand = lambda i: i[:, None]
    else:
        cell_w = tiles.shape[3]
        ri = jax.lax.broadcasted_iota(jnp.int32, tiles.shape, 1)
        ci = jax.lax.broadcasted_iota(jnp.int32, tiles.shape, 3)
        pos = ri * cell_w + ci
        axes = (1, 3)
        expand = lambda i: i[:, None, :, None]
    valid = tiles > 0.0
    enc = jnp.where(valid,
                    (tiles.astype(jnp.int32) + 1) * 2048 + (2047 - pos), 0)
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.max(enc, axis=axes)
        got = m > 0
        idx = jnp.where(got, 2047 - (m & 2047), 0)
        vals.append(jnp.where(got, ((m >> 11) - 1).astype(tiles.dtype),
                              -jnp.inf))
        idxs.append(idx)
        enc = jnp.where(pos == expand(idx), 0, enc)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def detect_level(score: jnp.ndarray, quota: int, ini_th: float, min_th: float
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Score map → (ys, xs, responses) of up to `quota` spread keypoints.

    Mask algebra equivalent of per-cell FAST(20)→FAST(7) + DistributeOctTree.
    Returns fixed-size (quota,) arrays; response <= 0 marks invalid slots.
    """
    h, w = score.shape
    is_peak = (score >= imops.maxpool_same(score, 3)) & (score > min_th)
    peak_score = jnp.where(is_peak, score, -jnp.inf)

    # per-cell fallback: cells that have a th=20 peak use only those; others
    # fall back to th=7 peaks (ORBextractor.cpp:826-859)
    cell_max = imops.cell_reduce_max(peak_score, CELL)
    cell_has_strong = imops.cell_broadcast(cell_max > ini_th, CELL, h, w)
    keep = is_peak & ((score > ini_th) | ~cell_has_strong)
    kept_score = jnp.where(keep, score, -jnp.inf)

    # spread priority: best peak of each cell outranks everything else
    cell_best = imops.cell_broadcast(imops.cell_reduce_max(kept_score, CELL),
                                     CELL, h, w)
    is_cell_best = keep & (kept_score >= cell_best)

    # bound the candidate set: top PER_CELL_K per cell, then global top-quota
    hc, wc = -(-h // CELL), -(-w // CELL)
    padded = jnp.full((hc * CELL, wc * CELL), -jnp.inf, score.dtype)
    padded = padded.at[:h, :w].set(
        jnp.where(keep, kept_score + 1e6 * is_cell_best, -jnp.inf))
    tiles = padded.reshape(hc, CELL, wc, CELL)   # pure reshape, no transpose
    cand_val, cand_in_cell = _topk_per_cell(tiles, PER_CELL_K)  # (Hc,Wc,K)

    cy = jax.lax.broadcasted_iota(jnp.int32, cand_in_cell.shape, 0) * CELL \
        + cand_in_cell // CELL
    cx = jax.lax.broadcasted_iota(jnp.int32, cand_in_cell.shape, 1) * CELL \
        + cand_in_cell % CELL

    flat_val = cand_val.reshape(-1)
    flat_y = cy.reshape(-1)
    flat_x = cx.reshape(-1)
    k_eff = min(quota, flat_val.shape[0])   # tiny coarse levels on small images
    top_val, top_idx = jax.lax.top_k(flat_val, k_eff)
    if k_eff < quota:
        top_val = jnp.concatenate([top_val, jnp.full(quota - k_eff, -jnp.inf)])
        top_idx = jnp.concatenate([top_idx, jnp.zeros(quota - k_eff, top_idx.dtype)])
    ys = flat_y[top_idx]
    xs = flat_x[top_idx]
    # strip the spread boost to recover the raw score
    resp = jnp.where(top_val > 5e5, top_val - 1e6, top_val)
    resp = jnp.where(jnp.isfinite(top_val), resp, -1.0)
    return ys.astype(jnp.int32), xs.astype(jnp.int32), resp.astype(jnp.float32)


def compute_angles(level_img_padded: jnp.ndarray, ys: jnp.ndarray,
                   xs: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation (IC_Angle, ORBextractor.cpp:76-103)
    via per-keypoint patch gather + (K,961)x(961,2) moment matmul.

    Kept as the simple reference path; the tracker uses moment_maps() +
    point sampling, which computes the same values without gathers."""
    k = ys.shape[0]
    offs = jnp.arange(-HALF_PATCH, HALF_PATCH + 1)
    rows = ys[:, None] + SAMPLE_PAD + offs[None, :]          # (K, 31)
    cols = xs[:, None] + SAMPLE_PAD + offs[None, :]
    patches = level_img_padded[rows[:, :, None], cols[:, None, :]]  # (K,31,31)
    moments = jnp.dot(patches.reshape(k, -1), jnp.asarray(ic_weights()),
                      preferred_element_type=jnp.float32)    # (K, 2) = m10, m01
    return jnp.arctan2(moments[:, 1], moments[:, 0])


def moment_maps(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense (m10, m01) intensity-centroid moment maps, same-shape as img.

    TPU redesign of IC_Angle: the disc mask is, per row offset dy, a box
    |dx| ≤ umax(|dy|) — so each row's contribution is a box filter
    computable from one x-prefix-sum (S) and one first-moment prefix sum
    (T, with centered x-index for f32 safety):

        m01(y,x) = Σ_dy dy · [S(y+dy, x+u) − S(y+dy, x−u−1)]
        m10(y,x) = Σ_dy [T-diff + (x_c window shift) · S-diff](y+dy)

    i.e. 2 cumsums + ~60 shifted adds — pure VPU streaming, no gathers;
    angles are then single-pixel lookups.  Matches compute_angles to f32
    rounding (tests assert < 0.01°).
    """
    h, w = img.shape
    umax = ic_umax()
    pad = HALF_PATCH + 1
    p = jnp.pad(img, pad, mode="reflect")
    hp, wp = p.shape
    # m01 via horizontal box sums: prefix values are integers ≤ 255·W,
    # exactly representable in f32 for any sane W
    s = jnp.concatenate([jnp.zeros((hp, 1)), jnp.cumsum(p, axis=1)], axis=1)
    m01 = jnp.zeros((h, w), jnp.float32)
    base_x = jnp.arange(w) + pad
    for dy in range(-HALF_PATCH, HALF_PATCH + 1):
        if dy == 0:
            continue
        u = int(umax[abs(dy)])
        row = slice(pad + dy, pad + dy + h)
        s_diff = s[row][:, base_x + u + 1] - s[row][:, base_x - u]
        m01 = m01 + float(dy) * s_diff

    # m10 via the TRANSPOSED decomposition (vertical box sums per column
    # offset): a horizontal first-moment prefix exceeds f32's exact-integer
    # range on wide images (measured ±29 at W=1280); vertical sums stay exact
    from dynamic_visual_slam_tpu.ops.fields import _vmax_table
    vmax = _vmax_table(umax)
    sv = jnp.concatenate([jnp.zeros((1, wp)), jnp.cumsum(p, axis=0)], axis=0)
    m10 = jnp.zeros((h, w), jnp.float32)
    base_y = jnp.arange(h) + pad
    for dx in range(1, HALF_PATCH + 1):
        v = int(vmax[dx])
        col_p = slice(pad + dx, pad + dx + w)
        col_n = slice(pad - dx, pad - dx + w)
        v_pos = sv[base_y + v + 1][:, col_p] - sv[base_y - v][:, col_p]
        v_neg = sv[base_y + v + 1][:, col_n] - sv[base_y - v][:, col_n]
        m10 = m10 + float(dx) * (v_pos - v_neg)
    return m10, m01


def angles_from_maps(m10: jnp.ndarray, m01: jnp.ndarray, ys: jnp.ndarray,
                     xs: jnp.ndarray) -> jnp.ndarray:
    a = m10[ys, xs]
    b = m01[ys, xs]
    return jnp.arctan2(b, a)


def compute_descriptors(blurred_padded: jnp.ndarray, ys: jnp.ndarray,
                        xs: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Rotated BRIEF bits (K, 256) — computeOrbDescriptor equivalent
    (ORBextractor.cpp:107-146): sample offsets rotated by the keypoint angle,
    rounded to integer pixels; bit = I(p1) < I(p2)."""
    pat = jnp.asarray(brief_pattern())           # (256, 4) x1 y1 x2 y2
    px = jnp.concatenate([pat[:, 0], pat[:, 2]])  # (512,)
    py = jnp.concatenate([pat[:, 1], pat[:, 3]])
    a = jnp.cos(angles)[:, None]                 # (K, 1)
    b = jnp.sin(angles)[:, None]
    col_off = jnp.round(px[None, :] * a - py[None, :] * b).astype(jnp.int32)
    row_off = jnp.round(px[None, :] * b + py[None, :] * a).astype(jnp.int32)
    hp, wp = blurred_padded.shape
    rows = jnp.clip(ys[:, None] + SAMPLE_PAD + row_off, 0, hp - 1)
    cols = jnp.clip(xs[:, None] + SAMPLE_PAD + col_off, 0, wp - 1)
    flat = blurred_padded.reshape(-1)
    samples = jnp.take(flat, rows * wp + cols, axis=0)       # (K, 512)
    t1, t2 = samples[:, :256], samples[:, 256:]
    return (t1 < t2).astype(jnp.uint8)


# --------------------------------------------------------------------------
# Full extractor
# --------------------------------------------------------------------------

ATLAS_GAP = 24  # zero rows between stacked levels (> rBRIEF reach)


def extract(img: jnp.ndarray, cfg: ORBConfig) -> Keypoints:
    """(H, W) float32 grayscale [0,255] → Keypoints with capacity
    cfg.max_keypoints.  Jit-compatible; shapes depend only on (H, W, cfg).

    Detection/orientation run per level via the fused field kernel; the
    descriptor stage is ONE batched call over a vertical atlas of all
    blurred levels (per-keypoint Pallas DMA kernel on TPU, gather on CPU).
    """
    levels = imops.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    quotas = features_per_level(cfg)

    from dynamic_visual_slam_tpu.ops import descriptors as desc_k
    from dynamic_visual_slam_tpu.ops.fields import (fast_score_atlas,
                                                    frontend_fields)

    pallas_path = desc_k.use_pallas()
    if pallas_path:
        # TPU: dense FAST scores only (one fused call); IC moments are
        # computed per-keypoint inside the descriptor kernel
        scores = fast_score_atlas(list(levels))
        fields = [(s, None, None) for s in scores]
    else:
        fields = [frontend_fields(img_l) for img_l in levels]

    parts = []
    blurred_padded = []
    raw_padded = []
    row_offsets = []
    row = 0
    max_w = levels[0].shape[1] + 2 * SAMPLE_PAD
    for lvl, (img_l, quota) in enumerate(zip(levels, quotas)):
        score, m10, m01 = fields[lvl]
        ys, xs, resp = detect_level(score, quota, float(cfg.ini_th_fast),
                                    float(cfg.min_th_fast))
        valid = resp > 0
        if pallas_path:
            angles = jnp.zeros_like(resp)     # filled from kernel moments
        else:
            angles = angles_from_maps(m10, m01, ys, xs)
        # round: the reference blurs uint8→uint8; integer quantization matters
        # for BRIEF near-tie comparisons (descriptor-parity tests)
        blurred = jnp.clip(jnp.round(imops.gaussian_blur(img_l, 7, 2.0)),
                           0.0, 255.0)
        blurred_padded.append(imops.reflect_pad(blurred, SAMPLE_PAD))
        raw_padded.append(imops.reflect_pad(img_l, SAMPLE_PAD))
        row_offsets.append(row)
        row += blurred_padded[-1].shape[0] + ATLAS_GAP
        scale = cfg.scale_factor ** lvl   # coords → level 0 (ORBextractor.cpp:1148)
        uv = jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32)], -1) * scale
        parts.append(dict(
            uv=uv, response=resp, angle=angles, ys=ys, xs=xs,
            row_off=jnp.full_like(ys, row_offsets[-1]),
            octave=jnp.full_like(ys, lvl), mask=valid))

    # vertical atlas of all blurred+padded levels (zero gaps isolate levels)
    atlas = jnp.zeros((row, max_w), jnp.float32)
    for off, bp in zip(row_offsets, blurred_padded):
        atlas = jax.lax.dynamic_update_slice(atlas, bp, (off, 0))

    cat = {k: jnp.concatenate([p[k] for p in parts]) for k in parts[0]}
    k_cap = cfg.max_keypoints
    n = cat["mask"].shape[0]
    if n < k_cap:
        pad = k_cap - n
        cat = {k: jnp.concatenate([v, jnp.zeros((pad,) + v.shape[1:], v.dtype)])
               for k, v in cat.items()}
    elif n > k_cap:
        # keep highest-response overall if quotas exceed capacity
        _, keep_idx = jax.lax.top_k(jnp.where(cat["mask"], cat["response"], -1.0),
                                    k_cap)
        cat = {k: v[keep_idx] for k, v in cat.items()}

    # one batched descriptor pass over the atlas (coords: atlas rows are the
    # level's padded frame, so the per-level reflect pad is already included
    # in row_off; compute_descriptors/pallas both expect unpadded coords)
    atlas_ys = cat["ys"] + cat["row_off"]
    if pallas_path:
        raw_atlas = jnp.zeros((row, max_w), jnp.float32)
        for off, rp in zip(row_offsets, raw_padded):
            raw_atlas = jax.lax.dynamic_update_slice(raw_atlas, rp, (off, 0))
        bits, m10k, m01k = desc_k.descriptors_moments_pallas(
            atlas, raw_atlas, atlas_ys, cat["xs"], brief_pattern(),
            SAMPLE_PAD)
        cat["angle"] = jnp.arctan2(m01k, m10k)
    else:
        bits = compute_descriptors(atlas, atlas_ys, cat["xs"], cat["angle"])

    mask = cat.pop("mask")
    return Keypoints(uv=cat["uv"], response=cat["response"], angle=cat["angle"],
                     octave=cat["octave"].astype(jnp.int32),
                     desc_bits=bits,
                     desc_packed=hamming.pack_bits(bits),
                     mask=mask)


def extract_batch(imgs: jnp.ndarray, cfg: ORBConfig) -> Keypoints:
    """(B, H, W) grayscale stack → Keypoints with leading dim B.

    Produces the same keypoints/descriptors as running extract() on each
    frame, but batches the two Pallas stages across ALL frames: one FAST
    score-atlas call over B×n_levels pyramid levels and one descriptor/
    moments call over B×max_keypoints patches.  Extraction is state-free,
    so the microbatched pipeline (pipeline/slam.process_batch) and the
    fleet (parallel/mesh.py) hoist it OUT of their sequential per-frame
    scan — grid-step sequencing amortizes over the whole batch instead of
    sitting on every frame's latency critical path (docs/PERF.md: extract
    was ~3.4 ms of the ~10.8 ms serialized step, yet only ~0.2 ms/frame of
    throughput).

    Atlases are level-major ((B, Hp_l, wp) stacks reshaped to contiguous
    rows — no dynamic_update_slice chains); each level block keeps its own
    reflect pad, and rotated-BRIEF one-hot sampling never selects rows
    outside the keypoint's own padded level block, so values are
    bit-identical to the per-frame path (scripts/check_batch_extract_tpu.py
    asserts this on the chip; tests/test_orb.py on the CPU fallback).
    """
    from dynamic_visual_slam_tpu.ops import descriptors as desc_k
    from dynamic_visual_slam_tpu.ops.fields import fast_score_atlas_batch

    if imgs.dtype != jnp.float32:
        imgs = imgs.astype(jnp.float32)
    if not desc_k.use_pallas():
        # the XLA fallback path is plain vmappable ops
        return jax.vmap(lambda im: extract(im, cfg))(imgs)

    b = imgs.shape[0]
    quotas = features_per_level(cfg)
    levels_b = jax.vmap(
        lambda im: imops.build_pyramid(im, cfg.n_levels, cfg.scale_factor)
    )(imgs)                                    # tuple of (B, H_l, W_l)
    scores_b = fast_score_atlas_batch(list(levels_b))

    max_w = levels_b[0].shape[2] + 2 * SAMPLE_PAD
    parts, blur_blocks, raw_blocks = [], [], []
    row = 0
    for lvl, (lv, score, quota) in enumerate(zip(levels_b, scores_b, quotas)):
        ys, xs, resp = jax.vmap(
            lambda s: detect_level(s, quota, float(cfg.ini_th_fast),
                                   float(cfg.min_th_fast)))(score)
        blur = jax.vmap(lambda im: imops.reflect_pad(
            jnp.clip(jnp.round(imops.gaussian_blur(im, 7, 2.0)), 0.0, 255.0),
            SAMPLE_PAD))(lv)
        raw = jax.vmap(lambda im: imops.reflect_pad(im, SAMPLE_PAD))(lv)
        _, hp, wl = blur.shape
        blur_blocks.append(
            jnp.pad(blur, ((0, 0), (0, 0), (0, max_w - wl))
                    ).reshape(b * hp, max_w))
        raw_blocks.append(
            jnp.pad(raw, ((0, 0), (0, 0), (0, max_w - wl))
                    ).reshape(b * hp, max_w))
        scale = cfg.scale_factor ** lvl
        uv = jnp.stack([xs.astype(jnp.float32),
                        ys.astype(jnp.float32)], -1) * scale
        frame_off = row + jnp.arange(b, dtype=jnp.int32)[:, None] * hp
        parts.append(dict(
            uv=uv, response=resp, ys=ys, xs=xs,
            row_off=jnp.broadcast_to(frame_off, ys.shape),
            octave=jnp.full_like(ys, lvl), mask=resp > 0))
        row += b * hp
    blur_atlas = jnp.concatenate(blur_blocks, axis=0)
    raw_atlas = jnp.concatenate(raw_blocks, axis=0)

    cat = {k: jnp.concatenate([p[k] for p in parts], axis=1)
           for k in parts[0]}                  # (B, n, ...)
    k_cap = cfg.max_keypoints
    n = cat["mask"].shape[1]
    if n < k_cap:
        pad = k_cap - n
        cat = {k: jnp.concatenate(
            [v, jnp.zeros((b, pad) + v.shape[2:], v.dtype)], axis=1)
            for k, v in cat.items()}
    elif n > k_cap:
        _, keep_idx = jax.lax.top_k(
            jnp.where(cat["mask"], cat["response"], -1.0), k_cap)  # (B, k_cap)
        cat = {k: (jnp.take_along_axis(v, keep_idx, axis=1) if v.ndim == 2
                   else jnp.take_along_axis(v, keep_idx[..., None], axis=1))
               for k, v in cat.items()}

    atlas_ys = (cat["ys"] + cat["row_off"]).reshape(-1)
    bits, m10k, m01k = desc_k.descriptors_moments_pallas(
        blur_atlas, raw_atlas, atlas_ys, cat["xs"].reshape(-1),
        brief_pattern(), SAMPLE_PAD)
    bits = bits.reshape(b, k_cap, 256)
    return Keypoints(
        uv=cat["uv"], response=cat["response"],
        angle=jnp.arctan2(m01k, m10k).reshape(b, k_cap),
        octave=cat["octave"].astype(jnp.int32), desc_bits=bits,
        desc_packed=hamming.pack_bits(bits.reshape(-1, 256)
                                      ).reshape(b, k_cap, 32),
        mask=cat["mask"])
