"""Dense frontend fields: the FAST-9 score atlas kernel (TPU hot path) and
the XLA fallback that also produces intensity-centroid moment maps.

Production paths (frontend/orb.extract):
  - TPU: fast_score_atlas — FAST-9 scores for ALL pyramid levels in ONE
    Pallas call over a vertical atlas (per-level dispatch overhead dominated
    the 8-level pyramid: 2.7 ms/frame → one call over ~3.4k atlas rows);
    IC moments are computed per-keypoint inside the descriptor kernel
    (ops/descriptors.descriptors_moments_pallas), so no dense moment fields
    are needed.
  - CPU/fallback: frontend_fields — dense score + moment maps via XLA.

The 16-arc FAST min/max body lives in ONE place: ops/fast._score_block
(shared with corner_score_pallas; bit-exact vs cv2, tests/test_orb.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_visual_slam_tpu.ops.fast import _score_block

HALF_PATCH = 15
HALO = 16          # moment reach (±15) rounded to the 8-row DMA alignment


def _vmax_table(umax: np.ndarray) -> np.ndarray:
    """vmax(|dx|) = max |dy| with |dx| ≤ umax(|dy|) — the transposed disc
    bound (valid because umax is non-increasing).  Used by the XLA moment
    maps (frontend/orb.moment_maps)."""
    out = np.zeros(HALF_PATCH + 1, np.int32)
    for a in range(HALF_PATCH + 1):
        vs = [v for v in range(HALF_PATCH + 1) if umax[v] >= a]
        out[a] = max(vs) if vs else -1
    return out


def frontend_fields(img: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(H, W) float32 → (score, m10, m01) dense fields — the XLA fallback
    path (CPU tests, non-TPU backends)."""
    from dynamic_visual_slam_tpu.frontend.orb import moment_maps
    from dynamic_visual_slam_tpu.ops.fast import corner_score
    score = corner_score(img)
    m10, m01 = moment_maps(img)
    return score, m10, m01


def fast_score_atlas(levels, tile_rows: int = 32):
    """FAST-9 score maps for ALL pyramid levels in ONE Pallas call.

    Levels are reflect-padded (HALO) and stacked into a vertical atlas; the
    kernel streams tile_rows-row tiles through double-buffered DMA (tile
    i+1 copies into the other scratch slot while tile i computes — the
    serial start/wait version was latency-bound) and scores each via the
    shared ops/fast._score_block body.  Returns a list of (H_l, W_l) score
    maps.

    tile_rows=32 is the VMEM ceiling: the 16-arc score body's live
    temporaries scale with the tile area and Mosaic's scoped-VMEM stack
    overflows the 16 MB/core budget at tile_rows=40 already (measured:
    32 compiles + is cv2-bit-exact, 40/48/56/64/128 all OOM), so the
    ~105-grid-step sequencing cost of the 720p 8-level atlas cannot be
    bought down by fatter tiles without restructuring the score body."""
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

    score = _score_atlas_rows(atlas, n_tiles, tile_rows, wp)
    return [score[off:off + img_l.shape[0], :img_l.shape[1]]
            for off, img_l in zip(offs, levels)]


def fast_score_atlas_batch(levels_b, tile_rows: int = 128):
    """Batched fast_score_atlas: FAST-9 scores for B frames' full pyramids
    in ONE Pallas call.

    levels_b is a list (per pyramid level) of (B, H_l, W_l) stacks.  The
    atlas is laid out LEVEL-MAJOR (all B frames of level 0, then level 1,
    …): each level stack is vmap-reflect-padded, rounded up to 8 rows, and
    reshaped (B, Hp_l, wp) → (B·Hp_l, wp) — no per-frame Python loop, no
    dynamic_update_slice chain.  Scores are bit-identical to per-frame
    fast_score_atlas: the 16-arc body reads a 3-px halo and every level
    block carries its own 16-row reflect pad, so neighboring frames in the
    atlas never influence extracted rows.  Returns a list (per level) of
    (B, H_l, W_l) score stacks."""
    b = levels_b[0].shape[0]
    w0 = levels_b[0].shape[2]
    wp = -(-(w0 + 2 * HALO) // 128) * 128
    blocks, meta = [], []
    row = 0
    for lv in levels_b:
        p = jax.vmap(lambda im: jnp.pad(im.astype(jnp.float32), HALO,
                                        mode="reflect"))(lv)
        hp = -(-p.shape[1] // 8) * 8
        p = jnp.pad(p, ((0, 0), (0, hp - p.shape[1]), (0, wp - p.shape[2])))
        blocks.append(p.reshape(b * hp, wp))
        meta.append((row, hp, lv.shape[1], lv.shape[2]))
        row += b * hp
    # score full `row` rows (not row-2·HALO as in the per-frame variant):
    # the per-level (B, hp, w) reshape below needs every block's padding
    # rows present in the score array, including the last frame's
    n_tiles = -(-row // tile_rows)
    total_rows = n_tiles * tile_rows + 2 * HALO
    blocks.append(jnp.zeros((total_rows - row, wp), jnp.float32))
    atlas = jnp.concatenate(blocks, axis=0)

    score = _score_atlas_rows(atlas, n_tiles, tile_rows, wp)
    w = wp - 2 * HALO
    return [score[off:off + b * hp].reshape(b, hp, w)[:, :h_l, :w_l]
            for off, hp, h_l, w_l in meta]


def _score_atlas_rows(atlas: jnp.ndarray, n_tiles: int, tile_rows: int,
                      wp: int) -> jnp.ndarray:
    """Shared Pallas dispatch: tile the (rows, wp) atlas into tile_rows-row
    stripes, double-buffer the DMA, score each stripe via ops/fast's
    16-arc body.  Score row r corresponds to atlas row r + HALO."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w = wp - 2 * HALO
    rows = tile_rows + 2 * HALO
    # bf16 atlas: pyramid levels are integer-valued ≤ 255 (uint8 camera
    # frames; build_pyramid quantizes resized levels), so diffs, the arc
    # min/max tree and the final score are all integers ≤ 255 in magnitude
    # — EXACT in bf16 — while DMA bytes and VPU op width halve.  (Exotic
    # fractional float inputs would score on bf16-rounded values here;
    # the XLA fallback path stays f32.)
    atlas = atlas.astype(jnp.bfloat16)

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
        # the scored tile center sits at offset HALO; _score_block expects a
        # 3-px halo, so hand it the sub-tile starting at HALO-3
        tile = scratch[slot]
        score_ref[...] = _score_block(
            tile[HALO - 3:, HALO - 3:], tile_rows, w).astype(jnp.float32)

    out_shape = jax.ShapeDtypeStruct((n_tiles * tile_rows, w), jnp.float32)
    spec = pl.BlockSpec((tile_rows, w), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((2, rows, wp), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2,))],
        # the log-step score body holds ~3 generations of 16 arc arrays
        # live (~17 MB at 32 rows in f32) — past Mosaic's 16 MB default
        # scoped budget but well inside the chip's physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(atlas)
