"""One-off TPU parity check: descriptors_moments_pallas vs the XLA fallback
path (compute_descriptors + moment_maps angles) on a real extraction atlas.

The bf16 blurred-patch optimization claims bit-exactness (blur outputs are
rounded integers <= 255, exactly representable in bf16); this verifies it on
the chip. Run:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_desc_parity_tpu.py
"""
import jax
import jax.numpy as jnp
import numpy as np

from dynamic_visual_slam_tpu.config import SLAMConfig
from dynamic_visual_slam_tpu.frontend import orb
from dynamic_visual_slam_tpu.io import synthetic
from dynamic_visual_slam_tpu.ops import descriptors as desc_k

cfg = SLAMConfig()
assert desc_k.use_pallas(), "must run on TPU"
frames = list(synthetic.generate_sequence(cfg.camera, 2, seed=3))
img = jnp.asarray(frames[1][0]).astype(jnp.float32)

kps = jax.jit(lambda im: orb.extract(im, cfg.orb))(img)
kps = jax.tree_util.tree_map(np.asarray, kps)
n = int(kps.mask.sum())
print(f"extracted {n} keypoints")

# rebuild the same atlas the extractor uses, then run the fallback path
from dynamic_visual_slam_tpu.ops import image as imops

levels = imops.build_pyramid(img, cfg.orb.n_levels, cfg.orb.scale_factor)
row_offsets, blurred_padded, raw_padded = [], [], []
row = 0
max_w = levels[0].shape[1] + 2 * orb.SAMPLE_PAD
for img_l in levels:
    blurred = jnp.clip(jnp.round(imops.gaussian_blur(img_l, 7, 2.0)), 0, 255)
    blurred_padded.append(imops.reflect_pad(blurred, orb.SAMPLE_PAD))
    raw_padded.append(imops.reflect_pad(img_l, orb.SAMPLE_PAD))
    row_offsets.append(row)
    row += blurred_padded[-1].shape[0] + orb.ATLAS_GAP
atlas = jnp.zeros((row, max_w), jnp.float32)
raw_atlas = jnp.zeros((row, max_w), jnp.float32)
for off, bp, rp in zip(row_offsets, blurred_padded, raw_padded):
    atlas = jax.lax.dynamic_update_slice(atlas, bp, (off, 0))
    raw_atlas = jax.lax.dynamic_update_slice(raw_atlas, rp, (off, 0))

# recover per-keypoint level-local integer coords from uv/octave
scale = np.power(cfg.orb.scale_factor, kps.octave.astype(np.float64))
xs = np.round(kps.uv[:, 0] / scale).astype(np.int32)
ys = np.round(kps.uv[:, 1] / scale).astype(np.int32)
atlas_ys = ys + np.asarray(row_offsets, np.int32)[kps.octave]

bits_p, m10_p, m01_p = jax.jit(desc_k.descriptors_moments_pallas,
                               static_argnums=(5,))(
    atlas, raw_atlas, jnp.asarray(atlas_ys), jnp.asarray(xs),
    orb.brief_pattern(), orb.SAMPLE_PAD)
ang_p = np.arctan2(np.asarray(m01_p), np.asarray(m10_p))

# fallback: XLA gather descriptors with the SAME angles + per-level moments
bits_f = jax.jit(orb.compute_descriptors)(
    atlas, jnp.asarray(atlas_ys), jnp.asarray(xs), jnp.asarray(ang_p))
bits_f = np.asarray(bits_f)
bits_p = np.asarray(bits_p)
m = np.asarray(kps.mask)
diff = (bits_p[m] != bits_f[m]).sum(axis=1)
print(f"descriptor bit diffs (given kernel angles): max={diff.max()} "
      f"mean={diff.mean():.4f}")

# angle parity vs per-level moment maps
ang_ref = np.zeros(len(xs), np.float32)
for lvl, img_l in enumerate(levels):
    sel = np.asarray(kps.octave) == lvl
    if not sel.any():
        continue
    m10, m01 = jax.jit(orb.moment_maps)(img_l)
    ang_ref[sel] = np.asarray(orb.angles_from_maps(
        m10, m01, jnp.asarray(ys[sel]), jnp.asarray(xs[sel])))
dang = np.abs(np.angle(np.exp(1j * (ang_p[m] - ang_ref[m]))))
print(f"angle diff vs moment maps: max={np.degrees(dang.max()):.6f} deg")
assert diff.max() == 0, "descriptor bits must be bit-exact"
assert np.degrees(dang.max()) < 0.01, "angles must match to <0.01 deg"
print("PARITY OK")
