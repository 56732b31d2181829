"""Fixed-capacity masked-set utilities.

The reference freely resizes std::vector/std::map (keypoints, matches,
landmarks, observations).  Under ``jit`` every shape must be static, so all
variable-size sets here are (capacity, ...) arrays plus a boolean validity
mask, and these helpers implement the usual set operations without dynamic
shapes.  This is the foundation SURVEY.md §7 calls "dynamic → static shapes
everywhere".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def masked_topk(scores: jnp.ndarray, mask: jnp.ndarray, k: int):
    """Top-k by score among valid entries.

    Returns (indices (k,), valid (k,)) — `valid[i]` false when fewer than k
    valid entries exist.  Invalid slots point at index 0; callers must gate on
    `valid`.
    """
    s = jnp.where(mask, scores, NEG_INF)
    vals, idx = jax.lax.top_k(s, k)
    return idx, vals > NEG_INF / 2


def stable_partition(mask: jnp.ndarray) -> jnp.ndarray:
    """(N,) bool → (N,) int32 permutation putting valid rows first, stable.

    Identical to ``jnp.argsort(jnp.where(mask, 0, 1), stable=True)`` but via
    two prefix sums + one scatter instead of a sort: on TPU a stable 1024-row
    sort lowers to a ~0.5 ms sequential while loop, and the tracking step
    latency is kernel-sequencing-bound (docs/PERF.md) — three of these sat on
    the per-frame critical path before this helper existed."""
    n = mask.shape[0]
    pos_valid = jnp.cumsum(mask.astype(jnp.int32)) - 1
    n_valid = jnp.sum(mask.astype(jnp.int32))
    pos_invalid = n_valid + jnp.cumsum((~mask).astype(jnp.int32)) - 1
    pos = jnp.where(mask, pos_valid, pos_invalid)      # target slot of row i
    return jnp.zeros(n, jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32))


def topk_mask_int(scores: jnp.ndarray, valid: jnp.ndarray, k: int,
                  max_score: int = 255) -> jnp.ndarray:
    """Mask of the k highest-scoring valid rows, for scores whose integer
    part lies in [0, max_score] (FAST responses are integer-valued ≤ 255
    in the uint8 production pipeline).

    jax.lax.top_k lowers to a full per-row SORT on TPU (~0.4 ms for 1024
    rows) and two of them sat inside the per-frame tracking scan (keyframe
    feature culling + payload selection).  Histogram equivalent: bucket
    counts → threshold t = lowest bucket that still fits in k → keep all
    rows above t plus the first (by index) tie rows at t.  Selects exactly
    min(k, n_valid) rows — the same SET as top_k for integer scores (for
    fractional scores, ranking is by integer part with index tie-break)."""
    n = scores.shape[0]
    s = jnp.where(valid, jnp.clip(scores, 0, max_score), -1.0
                  ).astype(jnp.int32)                     # -1 = invalid
    bins = jnp.arange(max_score + 1, dtype=jnp.int32)
    hist = jnp.sum((s[None, :] == bins[:, None]).astype(jnp.int32), axis=1)
    # count of valid rows with score >= v, per bucket v
    cnt_ge = jnp.cumsum(hist[::-1])[::-1]
    # threshold: smallest v with cnt_ge[v] <= k still admitting ties below;
    # formally t = min v such that count(> v) < k  (then ties at t fill up)
    cnt_gt = jnp.concatenate([cnt_ge[1:], jnp.zeros(1, jnp.int32)])
    t = jnp.argmax((cnt_gt < k).astype(jnp.int32))        # first True
    sel_hi = s > t
    n_hi = jnp.sum(sel_hi.astype(jnp.int32))
    ties = s == t
    tie_rank = jnp.cumsum(ties.astype(jnp.int32)) - 1
    return sel_hi | (ties & (tie_rank < k - n_hi) & valid)


def compress_to_capacity(values, mask: jnp.ndarray, capacity: int, fill=0):
    """Stable-compact valid rows to the front, padded/truncated to capacity.

    values: pytree of arrays with matching leading dim N.
    Returns (pytree with leading dim `capacity`, newmask (capacity,)).
    """
    n = mask.shape[0]
    order = stable_partition(mask)                     # valid first, stable
    count = jnp.sum(mask.astype(jnp.int32))
    if capacity <= n:
        sel = order[:capacity]
    else:
        sel = jnp.concatenate([order, jnp.zeros(capacity - n, jnp.int32)])
    newmask = jnp.arange(capacity) < count
    out = jax.tree_util.tree_map(lambda v: jnp.where(
        _expand(newmask, v[sel].ndim), v[sel], jnp.asarray(fill, v.dtype)), values)
    return out, newmask


def _expand(mask: jnp.ndarray, ndim: int) -> jnp.ndarray:
    return mask.reshape(mask.shape + (1,) * (ndim - mask.ndim))


def masked_argmin(costs: jnp.ndarray, mask: jnp.ndarray, axis: int = -1):
    """(argmin index, min value, any-valid) along axis with invalid = +inf."""
    c = jnp.where(mask, costs, -NEG_INF)
    idx = jnp.argmin(c, axis=axis)
    val = jnp.min(c, axis=axis)
    return idx, val, val < -NEG_INF / 2


def scatter_set(arr: jnp.ndarray, idx: jnp.ndarray, updates: jnp.ndarray,
                valid: jnp.ndarray) -> jnp.ndarray:
    """arr[idx] = updates where valid; invalid writes are dropped (sent to a
    dummy out-of-range row via clamping against a guard)."""
    safe_idx = jnp.where(valid, idx, arr.shape[0])  # OOB drops under scatter
    dims = jax.lax.ScatterDimensionNumbers(
        update_window_dims=tuple(range(1, updates.ndim)),
        inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,))
    return jax.lax.scatter(arr, safe_idx[:, None], updates, dims,
                           mode=jax.lax.GatherScatterMode.FILL_OR_DROP)


def count(mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(mask.astype(jnp.int32))
