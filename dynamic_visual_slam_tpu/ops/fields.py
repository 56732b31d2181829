"""Fused frontend field kernel: FAST-9 score + intensity-centroid moment
maps (m10, m01) in ONE Pallas pass per pyramid level.

Motivation (measured on v5e): the XLA moment-map formulation spends ~8 ms on
lane-wise cumsums + 62 unaligned shifted adds through HBM, and the FAST score
another ~2 ms.  Everything reads the same pixels — so compute all three
fields from one VMEM-resident halo tile:

  - score: 16 circle diffs + two-accumulator windowed min/max (ops/fast.py);
  - moments: in-kernel log-shift prefix sums P = Σx I and T = Σx (x_c·I),
    then per row-offset dy the disc row is the box |dx| ≤ umax(|dy|):
        m01 += dy · (P[x+u] − P[x−u−1])
        m10 += (T[x+u] − T[x−u−1]) − x_c·(P[x+u] − P[x−u−1])

Bit-compatibility: score is identical to ops/fast.corner_score; moments match
frontend/orb.moment_maps to f32 rounding (same box-sum decomposition).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_visual_slam_tpu.ops.fast import CIRCLE_DYDX, ARC_LEN

HALF_PATCH = 15
HALO = 16          # moment reach (±15) rounded to the 8-row DMA alignment


def _prefix_lanes(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inclusive prefix sum along the lane (last) axis via log-shift adds."""
    shift = 1
    while shift < n:
        shifted = jnp.pad(x, ((0, 0), (shift, 0)))[:, :-shift]
        x = x + shifted
        shift *= 2
    return x


def _prefix_rows(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inclusive prefix sum along the sublane (row) axis via log-shift adds."""
    shift = 1
    while shift < n:
        shifted = jnp.pad(x, ((shift, 0), (0, 0)))[:-shift, :]
        x = x + shifted
        shift *= 2
    return x


def _vmax_table(umax: np.ndarray) -> np.ndarray:
    """vmax(|dx|) = max |dy| with |dx| ≤ umax(|dy|) — the transposed disc
    bound (valid because umax is non-increasing)."""
    out = np.zeros(HALF_PATCH + 1, np.int32)
    for a in range(HALF_PATCH + 1):
        vs = [v for v in range(HALF_PATCH + 1) if umax[v] >= a]
        out[a] = max(vs) if vs else -1
    return out


def frontend_fields_pallas(img: jnp.ndarray, tile_rows: int = 16
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(H, W) float32 → (score, m10, m01), each (H, W) float32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from dynamic_visual_slam_tpu.frontend.orb import ic_umax

    h, w = img.shape
    assert tile_rows % 8 == 0
    halo = tile_rows + 2 * HALO                  # 8-aligned (HALO=16)
    n_tiles = -(-h // tile_rows)
    hp = n_tiles * tile_rows + 2 * HALO
    wp = -(-(w + 2 * HALO) // 128) * 128
    padded = jnp.pad(img.astype(jnp.float32), HALO, mode="reflect")
    padded = jnp.pad(padded, ((0, hp - padded.shape[0]),
                              (0, wp - padded.shape[1])))
    umax = ic_umax()
    vmax = _vmax_table(umax)

    def kernel(img_hbm, score_ref, m10_ref, m01_ref, scratch, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            img_hbm.at[pl.ds(i * tile_rows, halo), :], scratch, sem)
        dma.start()
        dma.wait()
        tile = scratch[...]

        # ---- FAST score (center at row offset HALO, col offset HALO) ----
        c0 = HALO
        center = tile[c0:c0 + tile_rows, c0:c0 + w]
        d = [tile[c0 + dy:c0 + dy + tile_rows, c0 + dx:c0 + dx + w] - center
             for dy, dx in CIRCLE_DYDX]
        bright = None
        dark_neg = None
        for k in range(16):
            mn = d[k]
            mx = d[k]
            for j in range(1, ARC_LEN):
                mn = jnp.minimum(mn, d[(k + j) % 16])
                mx = jnp.maximum(mx, d[(k + j) % 16])
            bright = mn if bright is None else jnp.maximum(bright, mn)
            dark_neg = mx if dark_neg is None else jnp.minimum(dark_neg, mx)
        score_ref[...] = jnp.maximum(bright, -dark_neg)

        # ---- m01: horizontal box sums via lane prefix (values ≤ 255·W,
        # f32-exact at this scale) ----
        p = _prefix_lanes(tile, wp)
        m01 = jnp.zeros((tile_rows, w), jnp.float32)
        for dy in range(-HALF_PATCH, HALF_PATCH + 1):
            if dy == 0:
                continue
            u = int(umax[abs(dy)])
            r0 = c0 + dy
            sdiff = p[r0:r0 + tile_rows, c0 + u:c0 + u + w] \
                - p[r0:r0 + tile_rows, c0 - u - 1:c0 - u - 1 + w]
            m01 = m01 + float(dy) * sdiff
        m01_ref[...] = m01

        # ---- m10: transposed decomposition — vertical box sums per column
        # offset, m10 = Σ_dx dx·(V₊dx − V₋dx).  Vertical prefixes stay small
        # (≤ 255·halo), avoiding the cancellation a horizontal first-moment
        # prefix would have at f32 ----
        pv = _prefix_rows(tile, halo)
        m10 = jnp.zeros((tile_rows, w), jnp.float32)
        for dx in range(1, HALF_PATCH + 1):
            v = int(vmax[dx])
            hi = c0 + v
            lo = c0 - v - 1
            v_pos = pv[hi:hi + tile_rows, c0 + dx:c0 + dx + w] \
                - pv[lo:lo + tile_rows, c0 + dx:c0 + dx + w]
            v_neg = pv[hi:hi + tile_rows, c0 - dx:c0 - dx + w] \
                - pv[lo:lo + tile_rows, c0 - dx:c0 - dx + w]
            m10 = m10 + float(dx) * (v_pos - v_neg)
        m10_ref[...] = m10

    out_shape = jax.ShapeDtypeStruct((n_tiles * tile_rows, w), jnp.float32)
    spec = pl.BlockSpec((tile_rows, w), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    score, m10, m01 = pl.pallas_call(
        kernel,
        out_shape=(out_shape, out_shape, out_shape),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(spec, spec, spec),
        scratch_shapes=[pltpu.VMEM((halo, wp), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(padded)
    return score[:h], m10[:h], m01[:h]


def frontend_fields(img: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused Pallas path on TPU; XLA fallback elsewhere."""
    from dynamic_visual_slam_tpu.ops.descriptors import use_pallas
    if use_pallas():
        return frontend_fields_pallas(img)
    from dynamic_visual_slam_tpu.frontend.orb import moment_maps
    from dynamic_visual_slam_tpu.ops.fast import corner_score
    score = corner_score(img)
    m10, m01 = moment_maps(img)
    return score, m10, m01


def _fields_kernel_body(tile_rows, halo, w, wp, n_tiles):
    """Shared Pallas kernel body (see frontend_fields_pallas docstring).

    Perf notes (v5e, measured):
    - DMA is double-buffered: tile i+1 streams into the other scratch slot
      while tile i computes (the serial start/wait version was
      latency-bound at ~107 grid steps for the 8-level atlas);
    - prefix sums stay as log-shift adds: an MXU ones-triangular matmul
      variant OOMs scoped VMEM (wp x wp operand ~8 MB vs the 16 MB limit)
      and the double-buffered DMA is the dominant win.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from dynamic_visual_slam_tpu.frontend.orb import ic_umax

    umax = ic_umax()
    vmax = _vmax_table(umax)
    rows = tile_rows + 2 * HALO

    def start_copy(img_hbm, scratch, sems, tile_idx, slot):
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(tile_idx * tile_rows, rows), :],
            scratch.at[slot], sems.at[slot])

    def kernel(img_hbm, score_ref, m10_ref, m01_ref, scratch, sems):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)

        @pl.when(i == 0)
        def _first():
            start_copy(img_hbm, scratch, sems, 0, 0).start()

        @pl.when(i + 1 < n_tiles)
        def _prefetch():
            start_copy(img_hbm, scratch, sems, i + 1,
                       jax.lax.rem(i + 1, 2)).start()

        start_copy(img_hbm, scratch, sems, i, slot).wait()
        tile = scratch[slot]

        c0 = HALO
        center = tile[c0:c0 + tile_rows, c0:c0 + w]
        d = [tile[c0 + dy:c0 + dy + tile_rows, c0 + dx:c0 + dx + w] - center
             for dy, dx in CIRCLE_DYDX]
        bright = None
        dark_neg = None
        for k in range(16):
            mn = d[k]
            mx = d[k]
            for j in range(1, ARC_LEN):
                mn = jnp.minimum(mn, d[(k + j) % 16])
                mx = jnp.maximum(mx, d[(k + j) % 16])
            bright = mn if bright is None else jnp.maximum(bright, mn)
            dark_neg = mx if dark_neg is None else jnp.minimum(dark_neg, mx)
        score_ref[...] = jnp.maximum(bright, -dark_neg)

        p = _prefix_lanes(tile, wp)
        m01 = jnp.zeros((tile_rows, w), jnp.float32)
        for dy in range(-HALF_PATCH, HALF_PATCH + 1):
            if dy == 0:
                continue
            u = int(umax[abs(dy)])
            r0 = c0 + dy
            sdiff = p[r0:r0 + tile_rows, c0 + u:c0 + u + w] \
                - p[r0:r0 + tile_rows, c0 - u - 1:c0 - u - 1 + w]
            m01 = m01 + float(dy) * sdiff
        m01_ref[...] = m01

        pv = _prefix_rows(tile, rows)
        m10 = jnp.zeros((tile_rows, w), jnp.float32)
        for dx in range(1, HALF_PATCH + 1):
            v = int(vmax[dx])
            hi = c0 + v
            lo = c0 - v - 1
            v_pos = pv[hi:hi + tile_rows, c0 + dx:c0 + dx + w] \
                - pv[lo:lo + tile_rows, c0 + dx:c0 + dx + w]
            v_neg = pv[hi:hi + tile_rows, c0 - dx:c0 - dx + w] \
                - pv[lo:lo + tile_rows, c0 - dx:c0 - dx + w]
            m10 = m10 + float(dx) * (v_pos - v_neg)
        m10_ref[...] = m10

    return kernel


def frontend_fields_atlas(levels, tile_rows: int = 24):
    """ALL pyramid levels through ONE fused Pallas call.

    Levels are reflect-padded (HALO) and stacked into a vertical atlas;
    the kernel computes the three fields over the whole atlas in one grid
    (per-level pallas_call dispatch overhead dominated the 8-level pyramid:
    2.7 ms/frame → one call over ~3.4k atlas rows). Returns a list of
    (score, m10, m01) per level, each (H_l, W_l).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not use_pallas_fields():
        return [frontend_fields(l) for l in levels]

    w0 = levels[0].shape[1]
    wp = -(-(w0 + 2 * HALO) // 128) * 128
    # stack reflect-padded levels at 8-aligned row offsets
    offs = []
    row = 0
    padded_levels = []
    for img_l in levels:
        p = jnp.pad(img_l.astype(jnp.float32), HALO, mode="reflect")
        offs.append(row)
        padded_levels.append(p)
        row += -(-p.shape[0] // 8) * 8
    n_tiles = -(-(row - 2 * HALO) // tile_rows)
    total_rows = n_tiles * tile_rows + 2 * HALO
    atlas = jnp.zeros((total_rows, wp), jnp.float32)
    for off, p in zip(offs, padded_levels):
        atlas = jax.lax.dynamic_update_slice(atlas, p, (off, 0))

    w_out = wp - 2 * HALO
    kernel = _fields_kernel_body(tile_rows, HALO, w_out, wp, n_tiles)
    out_shape = jax.ShapeDtypeStruct((n_tiles * tile_rows, w_out), jnp.float32)
    spec = pl.BlockSpec((tile_rows, w_out), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    score, m10, m01 = pl.pallas_call(
        kernel,
        out_shape=(out_shape, out_shape, out_shape),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(spec, spec, spec),
        scratch_shapes=[pltpu.VMEM((2, tile_rows + 2 * HALO, wp),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )(atlas)
    # out row y corresponds to atlas row y+HALO: level l interior starts at
    # atlas row offs[l]+HALO -> out row offs[l]
    results = []
    for off, img_l in zip(offs, levels):
        h_l, w_l = img_l.shape
        results.append((score[off:off + h_l, :w_l],
                        m10[off:off + h_l, :w_l],
                        m01[off:off + h_l, :w_l]))
    return results


def use_pallas_fields() -> bool:
    from dynamic_visual_slam_tpu.ops.descriptors import use_pallas
    return use_pallas()


def fast_score_atlas(levels, tile_rows: int = 32):
    """FAST-9 score maps for ALL pyramid levels in ONE Pallas call —
    detection only; IC moments moved into the per-keypoint descriptor
    kernel (ops/descriptors.descriptors_moments_pallas), so the dense
    moment fields (the bulk of the fused kernel's VMEM/compute) are gone.
    Returns a list of (H_l, W_l) score maps."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w0 = levels[0].shape[1]
    wp = -(-(w0 + 2 * HALO) // 128) * 128
    offs = []
    row = 0
    padded_levels = []
    for img_l in levels:
        p = jnp.pad(img_l.astype(jnp.float32), HALO, mode="reflect")
        offs.append(row)
        padded_levels.append(p)
        row += -(-p.shape[0] // 8) * 8
    n_tiles = -(-(row - 2 * HALO) // tile_rows)
    total_rows = n_tiles * tile_rows + 2 * HALO
    atlas = jnp.zeros((total_rows, wp), jnp.float32)
    for off, p in zip(offs, padded_levels):
        atlas = jax.lax.dynamic_update_slice(atlas, p, (off, 0))

    w = wp - 2 * HALO
    rows = tile_rows + 2 * HALO

    def start_copy(img_hbm, scratch, sems, tile_idx, slot):
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(tile_idx * tile_rows, rows), :],
            scratch.at[slot], sems.at[slot])

    def kernel(img_hbm, score_ref, scratch, sems):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)

        @pl.when(i == 0)
        def _first():
            start_copy(img_hbm, scratch, sems, 0, 0).start()

        @pl.when(i + 1 < n_tiles)
        def _prefetch():
            start_copy(img_hbm, scratch, sems, i + 1,
                       jax.lax.rem(i + 1, 2)).start()

        start_copy(img_hbm, scratch, sems, i, slot).wait()
        tile = scratch[slot]
        c0 = HALO
        center = tile[c0:c0 + tile_rows, c0:c0 + w]
        d = [tile[c0 + dy:c0 + dy + tile_rows, c0 + dx:c0 + dx + w] - center
             for dy, dx in CIRCLE_DYDX]
        bright = None
        dark_neg = None
        for k in range(16):
            mn = d[k]
            mx = d[k]
            for j in range(1, ARC_LEN):
                mn = jnp.minimum(mn, d[(k + j) % 16])
                mx = jnp.maximum(mx, d[(k + j) % 16])
            bright = mn if bright is None else jnp.maximum(bright, mn)
            dark_neg = mx if dark_neg is None else jnp.minimum(dark_neg, mx)
        score_ref[...] = jnp.maximum(bright, -dark_neg)

    out_shape = jax.ShapeDtypeStruct((n_tiles * tile_rows, w), jnp.float32)
    spec = pl.BlockSpec((tile_rows, w), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    score = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((2, rows, wp), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )(atlas)
    return [score[off:off + img_l.shape[0], :img_l.shape[1]]
            for off, img_l in zip(offs, levels)]
