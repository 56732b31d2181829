"""Image ops: pyramid, Gaussian blur, reflect padding — XLA-native.

Reference behavior being reproduced:
- 8-level pyramid, scale 1.2, bilinear resize, BORDER_REFLECT_101 borders
  (ORBextractor.cpp:1169-1194);
- 7x7 Gaussian sigma=2 blur before descriptor sampling
  (ORBextractor.cpp:1131-1138).

Images are (H, W) float32 grayscale in [0, 255].  All functions are jittable
with static shapes; the pyramid returns a tuple of per-level arrays (each
level has its own static shape).
"""

from __future__ import annotations

import functools

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pyramid_shapes(h: int, w: int, n_levels: int, scale_factor: float
                   ) -> List[Tuple[int, int]]:
    """Per-level (H, W), matching cv::resize(round(size/scale^l)) semantics."""
    return [(int(round(h / scale_factor ** l)), int(round(w / scale_factor ** l)))
            for l in range(n_levels)]


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers (cv::INTER_LINEAR convention)."""
    h, w = img.shape
    # OpenCV maps dst x -> (x + 0.5) * scale - 0.5
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (h / out_h) - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (w / out_w) - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)
    # two-pass separable gather keeps it a pair of cheap gathers
    top = img[y0i, :]      # (out_h, w)
    bot = img[y1i, :]
    rows = top * (1 - wy)[:, None] + bot * wy[:, None]
    left = rows[:, x0i]    # (out_h, out_w)
    right = rows[:, x1i]
    return left * (1 - wx)[None, :] + right * wx[None, :]


def build_pyramid(img: jnp.ndarray, n_levels: int, scale_factor: float,
                  quantize: bool = True) -> Tuple[jnp.ndarray, ...]:
    """Level 0 is the input; each level resized from the previous
    (ORBextractor.cpp:1182 resizes level l-1 -> l).

    quantize rounds each level to integral values, reproducing the
    reference's uint8 pipeline (affects FAST thresholds and BRIEF
    comparisons; see tests/test_orb.py descriptor-parity evidence).
    """
    h, w = img.shape
    shapes = pyramid_shapes(h, w, n_levels, scale_factor)
    levels = [img]
    for l in range(1, n_levels):
        nxt = resize_bilinear(levels[-1], *shapes[l])
        if quantize:
            nxt = jnp.clip(jnp.round(nxt), 0.0, 255.0)
        levels.append(nxt)
    return tuple(levels)


def reflect_pad(img: jnp.ndarray, pad: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 (edge pixel not duplicated) — jnp 'reflect' mode."""
    return jnp.pad(img, pad, mode="reflect")


@functools.lru_cache(maxsize=None)
def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """cv::getGaussianKernel equivalent."""
    xs = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _blur_band_matrix(n: int, ksize: int, sigma: float) -> np.ndarray:
    """(n, n) banded matrix applying the 1D Gaussian with REFLECT_101
    boundary folded in: out = B @ signal."""
    k = gaussian_kernel_1d(ksize, sigma)
    half = ksize // 2
    b = np.zeros((n, n), dtype=np.float32)
    for i in range(n):
        for j, w in enumerate(k):
            src = i + j - half
            if src < 0:
                src = -src              # REFLECT_101: edge not duplicated
            elif src >= n:
                src = 2 * (n - 1) - src
            b[i, src] += w
    return b


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian with REFLECT_101 borders (cv::GaussianBlur equivalent).

    TPU note: a C=1 convolution lowers badly on TPU (measured ~15 ms for the
    8-level 720p pyramid); expressed instead as two banded matmuls
    out = B_H · img · B_Wᵀ that run on the MXU (<1 ms).  The band matrices are
    small compile-time constants with the reflect boundary baked in.
    """
    h, w = img.shape
    bh = jnp.asarray(_blur_band_matrix(h, ksize, sigma))
    bw = jnp.asarray(_blur_band_matrix(w, ksize, sigma))
    rows = jnp.dot(bh, img, preferred_element_type=jnp.float32)
    return jnp.dot(rows, bw.T, preferred_element_type=jnp.float32)


def maxpool_same(x: jnp.ndarray, size: int = 3) -> jnp.ndarray:
    """3x3 (size x size) max filter, same-shape, -inf padded — for NMS."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (size, size), (1, 1), "SAME")


def cell_reduce_max(x: jnp.ndarray, cell: int) -> jnp.ndarray:
    """Max over non-overlapping cell x cell tiles anchored at (0,0)
    → (ceil(H/c), ceil(W/c)).

    NOTE: reduce_window "SAME" would CENTER its padding, silently shifting
    the cell grid by pad//2 relative to cell_broadcast/reshape tilings —
    pad at the end only and use VALID so all cell ops share the same grid.
    """
    h, w = x.shape
    hp = -(-h // cell) * cell
    wp = -(-w // cell) * cell
    xpad = jnp.pad(x, ((0, hp - h), (0, wp - w)),
                   constant_values=-jnp.inf)
    return jax.lax.reduce_window(
        xpad, -jnp.inf, jax.lax.max, (cell, cell), (cell, cell), "VALID")


def cell_broadcast(cells: jnp.ndarray, cell: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of cell_reduce_max's shape: repeat each cell value over its tile."""
    up = jnp.repeat(jnp.repeat(cells, cell, axis=0), cell, axis=1)
    return up[:h, :w]


def to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """(H,W,3) uint8/float RGB → (H,W) float32 gray, BT.601 (cv::cvtColor)."""
    rgb = rgb.astype(jnp.float32)
    return rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114
