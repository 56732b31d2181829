"""Pallas rBRIEF descriptor kernel — per-keypoint patch DMA + two-stage
one-hot sampling.

The XLA formulation (frontend/orb.compute_descriptors) is a (K, 512) random
gather, which lowers to scalar-core loads (~4.7 ms for 1024 keypoints at
720p).  Here each grid step processes 8 keypoints: their patches are DMA'd
from HBM at tile-aligned origins (8 in flight), and the 512 rotated samples
per keypoint become two tiny MXU/VPU ops:

    Y = onehot(rows) @ patch          (512, PH) x (PH, PW)
    s = Σ_c Y ∘ onehot(cols)          (512, PW) elementwise + reduce

which replaces the gather entirely.  Bit-exact vs the XLA path (tests).

Alignment bookkeeping: Mosaic requires DMA origins divisible by (8, 128), so
patch origins are rounded down and the residual offset is added to the
rotated indices; the source image is padded so no clipping is ever needed.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

PH, PW = 56, 256      # patch tile (rows ≥ 8+reach·2+8, lanes ≥ 128+reach·2)
CY = 24               # nominal in-patch keypoint row before alignment shift
CX = 64
KPB = 32              # keypoints per grid step: the per-grid-step fixed cost
#                       (DMA issue/wait + sequencing) dominated the tiny
#                       per-keypoint compute at 8 — 128 sequential steps was
#                       ~1.5 ms of latency on the tracking step's critical
#                       path; 32 keypoints/step needs ~7 MB of
#                       double-buffered scratch (blur + raw, both bf16)
PAD_T, PAD_L = 32, 128   # generous margins so origins never clip
REACH = 20            # max |rotated offset| + rounding (13·√2 ≈ 18.4 → 20)
# patch bounds: in-patch keypoint row ∈ [CY, CY+7], col ∈ [CX, CX+127]
# (alignment residue), plus the rotated-sample reach each side
assert CY - REACH >= 0 and CY + 7 + REACH < PH
assert CX - REACH >= 0 and CX + 127 + REACH < PW


def _pad_image(img_plus_reflect: jnp.ndarray) -> jnp.ndarray:
    """img already reflect-padded by SAMPLE_PAD(19); add alignment margins."""
    h, w = img_plus_reflect.shape
    bottom = PH + 8
    right = PW + 128
    hp = -(-(PAD_T + h + bottom) // 8) * 8
    wp = -(-(PAD_L + w + right) // 128) * 128
    return jnp.pad(img_plus_reflect,
                   ((PAD_T, hp - h - PAD_T), (PAD_L, wp - w - PAD_L)))


def _kernel_with_moments(umax_list, n_grid):
    """Kernel computing IC moments + rBRIEF per keypoint.

    Two patch DMAs per keypoint — the RAW level patch (intensity-centroid
    moments are computed pre-blur, ORBextractor.cpp:471-478,76-103) and
    the BLURRED patch (rBRIEF sampling, :1131-1138). The angle never
    exists as a dense field: cos/sin come straight from the in-kernel
    moments, eliminating the dense m10/m01 maps that dominated the fused
    frontend-fields kernel (~3 ms/frame at 720p). Patch DMAs are
    double-buffered ACROSS grid steps: step i+1's 16 copies stream while
    step i computes."""

    def kern(ys_ref, xs_ref, oy_ref, ox_ref, pxy_ref,
             img_hbm, raw_hbm, out_ref, mom_ref, patches, raws, sems,
             rsems):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        px = pxy_ref[0, :]
        py = pxy_ref[1, :]

        def start_step(step_idx, sslot):
            for j in range(KPB):
                k = step_idx * KPB + j
                y0 = pl.multiple_of(ys_ref[k], 8)
                x0 = pl.multiple_of(xs_ref[k], 128)
                pltpu.make_async_copy(
                    img_hbm.at[pl.ds(y0, PH), pl.ds(x0, PW)],
                    patches.at[sslot, j], sems.at[sslot, j]).start()
                pltpu.make_async_copy(
                    raw_hbm.at[pl.ds(y0, PH), pl.ds(x0, PW)],
                    raws.at[sslot, j], rsems.at[sslot, j]).start()

        @pl.when(i == 0)
        def _first():
            start_step(0, 0)

        @pl.when(i + 1 < n_grid)
        def _prefetch():
            start_step(i + 1, jax.lax.rem(i + 1, 2))

        for j in range(KPB):
            k = i * KPB + j
            y0 = pl.multiple_of(ys_ref[k], 8)
            x0 = pl.multiple_of(xs_ref[k], 128)
            pltpu.make_async_copy(img_hbm.at[pl.ds(y0, PH), pl.ds(x0, PW)],
                                  patches.at[slot, j],
                                  sems.at[slot, j]).wait()
            pltpu.make_async_copy(raw_hbm.at[pl.ds(y0, PH), pl.ds(x0, PW)],
                                  raws.at[slot, j],
                                  rsems.at[slot, j]).wait()
        for j in range(KPB):
            k = i * KPB + j
            # --- IC moments over the umax disc around (oy, ox) ---
            # the disc half-width u depends only on the ROW distance, so the
            # umax where-chain runs over a (PH, 1) column and broadcasts —
            # not over the full (PH, PW) patch (31 fewer full-patch passes)
            ry1 = jax.lax.broadcasted_iota(jnp.int32, (PH, 1), 0) - oy_ref[k]
            rx = jax.lax.broadcasted_iota(jnp.int32, (PH, PW), 1) - ox_ref[k]
            ady1 = jnp.abs(ry1)
            u1 = jnp.zeros((PH, 1), jnp.int32)
            for dyv, uv in enumerate(umax_list):
                u1 = jnp.where(ady1 == dyv, int(uv), u1)
            inside = ((ady1 <= HALF_PATCH_IC)
                      & (jnp.abs(rx) <= u1)).astype(jnp.float32)
            w = raws[slot, j].astype(jnp.float32) * inside
            m10 = jnp.sum(w * rx.astype(jnp.float32))
            m01 = jnp.sum(w * ry1.astype(jnp.float32))
            n2 = m10 * m10 + m01 * m01
            inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-18))
            a = jnp.where(n2 > 0, m10 * inv, 1.0)   # cos(theta)
            b = jnp.where(n2 > 0, m01 * inv, 0.0)   # sin(theta)

            col = jnp.round(px * a - py * b).astype(jnp.int32) + ox_ref[k]
            row = jnp.round(px * b + py * a).astype(jnp.int32) + oy_ref[k]
            # column select as ONE (PH,PW)x(PW,512) matmul, row select as a
            # small (PH,512) elementwise+reduce — sampling z[p,r] =
            # patch[p,col[r]], s[r] = z[row[r],r].  One-hot matmuls are
            # bit-exact (each sum has exactly one nonzero term).
            # blurred patches live in bf16 scratch: the blur output is
            # rounded to integers <= 255 (orb.extract), which bf16
            # represents exactly, so the one-hot sample and the < compare
            # are BIT-EXACT while the patch DMA/VMEM cost halves.  The
            # matmul upcasts to f32 — this Mosaic rejects a bf16 lhs for
            # tpu.matmul ("Bad lhs type", verified) — so the win is the
            # DMA/VMEM halving, not MXU rate.
            ciota = jax.lax.broadcasted_iota(jnp.int32, (PW, 512), 0)
            cselT = (ciota == col[None, :]).astype(jnp.float32)
            z = jnp.dot(patches[slot, j].astype(jnp.float32), cselT,
                        preferred_element_type=jnp.float32)
            piota = jax.lax.broadcasted_iota(jnp.int32, (PH, 512), 0)
            rselT = (piota == row[None, :]).astype(jnp.float32)
            s = jnp.sum(z * rselT, axis=0)
            out_ref[j, :] = (s[:256] < s[256:]).astype(jnp.float32)
            lane = jax.lax.broadcasted_iota(jnp.int32, (128,), 0)
            mom_ref[j, :] = jnp.where(lane == 0, m10,
                                      jnp.where(lane == 1, m01, 0.0))

    return kern


HALF_PATCH_IC = 15


def descriptors_moments_pallas(img_blur_padded: jnp.ndarray,
                               img_raw_padded: jnp.ndarray,
                               ys: jnp.ndarray, xs: jnp.ndarray,
                               pattern: np.ndarray, sample_pad: int
                               ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                          jnp.ndarray]:
    """Blurred + raw reflect-padded level atlases + K keypoints → (bits
    (K,256) uint8, m10 (K,), m01 (K,)). K must be a multiple of KPB."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from dynamic_visual_slam_tpu.frontend.orb import ic_umax

    k = ys.shape[0]
    assert k % KPB == 0, k
    # BOTH atlases DMA as bf16: blur outputs are rounded integers <= 255
    # (orb.extract) and pyramid levels are quantized integers <= 255
    # (ops/image.build_pyramid quantize=True) — exactly representable in
    # bf16.  Moment products/sums happen in f32 on integer values < 2^24,
    # so IC moments stay bitwise equal to the XLA fallback.  (A caller
    # feeding fractional float images would get bf16-rounded values here;
    # the XLA fallback path stays f32.)
    img = _pad_image(img_blur_padded).astype(jnp.bfloat16)
    raw = _pad_image(img_raw_padded).astype(jnp.bfloat16)
    pat = jnp.asarray(pattern)
    pxy = jnp.stack([jnp.concatenate([pat[:, 0], pat[:, 2]]),
                     jnp.concatenate([pat[:, 1], pat[:, 3]])])
    yk = ys + sample_pad + PAD_T
    xk = xs + sample_pad + PAD_L
    y0a = ((yk - CY) // 8) * 8
    x0a = ((xk - CX) // 128) * 128
    oy = yk - y0a
    ox = xk - x0a

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(k // KPB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec((KPB, 256), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((KPB, 128), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((2, KPB, PH, PW), jnp.bfloat16),
                        pltpu.VMEM((2, KPB, PH, PW), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2, KPB)),
                        pltpu.SemaphoreType.DMA((2, KPB))])
    bits, moments = pl.pallas_call(
        _kernel_with_moments([int(v) for v in ic_umax()], k // KPB),
        out_shape=(jax.ShapeDtypeStruct((k, 256), jnp.float32),
                   jax.ShapeDtypeStruct((k, 128), jnp.float32)),
        grid_spec=grid_spec,
    )(y0a.astype(jnp.int32), x0a.astype(jnp.int32),
      oy.astype(jnp.int32), ox.astype(jnp.int32), pxy, img, raw)
    return bits.astype(jnp.uint8), moments[:, 0], moments[:, 1]


def use_pallas() -> bool:
    return (jax.default_backend() == "tpu"
            and os.environ.get("DVS_DISABLE_PALLAS") != "1")
