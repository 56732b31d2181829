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
