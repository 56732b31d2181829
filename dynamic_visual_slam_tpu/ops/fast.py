"""FAST-9/16 corner score — fully vectorized over the whole image.

The reference calls cv::FAST per 35-px cell with threshold 20 and a per-cell
fallback to 7 (ORBextractor.cpp:785-859).  On TPU the natural formulation is a
single dense *corner-score map*: score(p) = the maximum threshold t at which p
is still a FAST-9 corner (OpenCV's cornerScore).  Then

    detected at threshold t  ⇔  score > t

so one score map serves both thresholds and the per-cell fallback becomes pure
mask algebra (see frontend/orb.py).  The arc-of-9 minimum is computed with a
log-step rolled-min (4 elementwise passes over a (16,H,W) stack) — everything
fuses into a handful of VPU passes under XLA.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3, OpenCV pixel order (dy=row, dx=col), index 0 at
# 12 o'clock going clockwise.
CIRCLE_DYDX = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
ARC_LEN = 9  # FAST-9/16


def _circle_stack(padded: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(H+6, W+6) padded image → (16, H, W) circle-neighbor values."""
    return jnp.stack([padded[3 + dy:3 + dy + h, 3 + dx:3 + dx + w]
                      for dy, dx in CIRCLE_DYDX])


def _windowed_min9(d: jnp.ndarray) -> jnp.ndarray:
    """Min over each of the 16 circular windows of length 9 along axis 0.

    log-step: min9[k] = min(d[k..k+8 mod 16]) built from rolled partial mins.
    """
    m = d
    m = jnp.minimum(m, jnp.roll(m, -1, axis=0))   # len-2 mins
    m = jnp.minimum(m, jnp.roll(m, -2, axis=0))   # len-4
    m = jnp.minimum(m, jnp.roll(m, -4, axis=0))   # len-8
    return jnp.minimum(m, jnp.roll(d, -8, axis=0))  # len-9


def corner_score(img: jnp.ndarray) -> jnp.ndarray:
    """Dense FAST-9 corner score map (H, W), float32.

    score(p) = max(max_k min(v_i - p over arc k), max_k min(p - v_i over arc k))

    OpenCV's FAST-9 detects p at threshold t iff some 9-arc is entirely
    brighter than p+t or darker than p-t (strict), which is exactly
    ``score(p) > t`` — verified bit-exact against cv2 in tests/test_orb.py.
    (cv2's reported cornerScore is this minus one; the offset is irrelevant
    for NMS ordering.)  The image border (3 px) is scored against reflected
    pixels, so callers get detections up to the edge (the reference's
    bordered pyramid has the same effect).
    """
    img = img.astype(jnp.float32)
    h, w = img.shape
    padded = jnp.pad(img, 3, mode="reflect")
    v = _circle_stack(padded, h, w)          # (16, H, W)
    d = v - img[None]                         # brighter-than-center diffs
    bright = jnp.max(_windowed_min9(d), axis=0)
    dark = jnp.max(_windowed_min9(-d), axis=0)
    return jnp.maximum(bright, dark)


# ---------------------------------------------------------------------------
# Pallas kernel: the fused FAST score (the XLA formulation materializes the
# (16, H, W) neighbor stack through HBM; this computes everything from one
# VMEM-resident halo tile — a single streaming pass).
# ---------------------------------------------------------------------------

def _score_block(tile: jnp.ndarray, rows: int, cols: int) -> jnp.ndarray:
    """(rows+6, cols+6) halo tile → (rows, cols) scores; pure VPU ops.

    The 16 length-9 window mins/maxes use the same log-step doubling as the
    XLA corner_score (len-2 → len-4 → len-8 partials, then combine with the
    +8 element): 64 VPU ops per reduction instead of the naive 16×8=128 —
    the kernel is VPU-compute-bound (~13 µs per 32-row tile at 720p), so
    this is a direct ~40 % cut.  min/max are exact and order-independent,
    so scores stay bit-identical (cv2 golden tests).  dark via
    min9(−d) = −max9(d) ⇒ dark = −min_k max9_k(d).
    """
    center = tile[3:3 + rows, 3:3 + cols]
    d = [tile[3 + dy:3 + dy + rows, 3 + dx:3 + dx + cols] - center
         for dy, dx in CIRCLE_DYDX]

    def win9(op):
        p = [op(d[k], d[(k + 1) % 16]) for k in range(16)]
        q = [op(p[k], p[(k + 2) % 16]) for k in range(16)]
        o = [op(q[k], q[(k + 4) % 16]) for k in range(16)]
        return [op(o[k], d[(k + 8) % 16]) for k in range(16)]

    mn9 = win9(jnp.minimum)
    bright = mn9[0]
    for k in range(1, 16):
        bright = jnp.maximum(bright, mn9[k])
    mx9 = win9(jnp.maximum)
    dark_neg = mx9[0]
    for k in range(1, 16):
        dark_neg = jnp.minimum(dark_neg, mx9[k])
    return jnp.maximum(bright, -dark_neg)


def corner_score_pallas(img: jnp.ndarray, tile_rows: int = 32) -> jnp.ndarray:
    """Pallas TPU version of corner_score (bit-identical; see tests)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = img.shape
    assert tile_rows % 8 == 0
    halo = tile_rows + 8          # DMA slices must be 8-row aligned (Mosaic)
    n_tiles = -(-h // tile_rows)
    hp = n_tiles * tile_rows + 8
    wp = -(-(w + 6) // 128) * 128  # lane dim must be 128-aligned for the DMA
    padded = jnp.pad(img.astype(jnp.float32), 3, mode="reflect")
    padded = jnp.pad(padded, ((0, hp - padded.shape[0]),
                              (0, wp - padded.shape[1])))

    def kernel(img_hbm, out_ref, scratch, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            img_hbm.at[pl.ds(i * tile_rows, halo), :], scratch, sem)
        dma.start()
        dma.wait()
        out_ref[...] = _score_block(scratch[...], tile_rows, w)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_rows, w), jnp.float32),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((tile_rows, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((halo, wp), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(padded)
    return out[:h]


def corner_score_auto(img: jnp.ndarray) -> jnp.ndarray:
    """Pallas on TPU (unless DVS_DISABLE_PALLAS=1), XLA elsewhere."""
    from dynamic_visual_slam_tpu.ops.descriptors import use_pallas
    if use_pallas():
        return corner_score_pallas(img)
    return corner_score(img)
