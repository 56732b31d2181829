"""Decompose orb.extract() device time stage by stage on the real chip.

Times each stage as its own jitted program (warm, REPS loop, block until
ready) at 1280x720 with the default config, plus the full extract() and a
full tracker.track_step for context. Run:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_extract.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_visual_slam_tpu.config import SLAMConfig
from dynamic_visual_slam_tpu.frontend import orb, tracker
from dynamic_visual_slam_tpu.io import synthetic
from dynamic_visual_slam_tpu.ops import descriptors as desc_k
from dynamic_visual_slam_tpu.ops import image as imops
from dynamic_visual_slam_tpu.ops.fields import fast_score_atlas

REPS = 20
cfg = SLAMConfig()
ocfg = cfg.orb
frames = list(synthetic.generate_sequence(cfg.camera, 4, seed=0))
img = jnp.asarray(frames[0][0]).astype(jnp.float32)
depth = jnp.asarray(frames[0][1])
print(f"device={jax.devices()[0]} img={img.shape} pallas={desc_k.use_pallas()}")


def timeit(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:>30}: {dt * 1e3:8.3f} ms")
    return out


# --- stages ---
levels = timeit("pyramid", lambda im: imops.build_pyramid(
    im, ocfg.n_levels, ocfg.scale_factor), img)
levels = [jnp.asarray(l) for l in levels]

scores = timeit("fast_score_atlas", lambda ls: fast_score_atlas(list(ls)),
                tuple(levels))
scores = [jnp.asarray(s) for s in scores]

quotas = orb.features_per_level(ocfg)


def all_detect(ss):
    return [orb.detect_level(s, q, float(ocfg.ini_th_fast),
                             float(ocfg.min_th_fast))
            for s, q in zip(ss, quotas)]


det = timeit("detect_level x8", all_detect, tuple(scores))

det0 = timeit("detect_level L0 only", lambda s: orb.detect_level(
    s, quotas[0], float(ocfg.ini_th_fast), float(ocfg.min_th_fast)),
    scores[0])


def blur_pad(ls):
    outs = []
    for img_l in ls:
        blurred = jnp.clip(jnp.round(imops.gaussian_blur(img_l, 7, 2.0)),
                           0.0, 255.0)
        outs.append(imops.reflect_pad(blurred, orb.SAMPLE_PAD))
        outs.append(imops.reflect_pad(img_l, orb.SAMPLE_PAD))
    return outs


padded = timeit("blur+reflect_pad x8", blur_pad, tuple(levels))


def assemble(ps):
    bps = ps[0::2]
    rps = ps[1::2]
    max_w = levels[0].shape[1] + 2 * orb.SAMPLE_PAD
    row = sum(bp.shape[0] + orb.ATLAS_GAP for bp in bps)
    atlas = jnp.zeros((row, max_w), jnp.float32)
    raw = jnp.zeros((row, max_w), jnp.float32)
    off = 0
    for bp, rp in zip(bps, rps):
        atlas = jax.lax.dynamic_update_slice(atlas, bp, (off, 0))
        raw = jax.lax.dynamic_update_slice(raw, rp, (off, 0))
        off += bp.shape[0] + orb.ATLAS_GAP
    return atlas, raw


atlas, raw_atlas = timeit("atlas assembly x2", assemble, tuple(padded))

k_cap = ocfg.max_keypoints
ys = jnp.clip(jnp.arange(k_cap, dtype=jnp.int32) * 7 % 700, 20, 690)
xs = jnp.clip(jnp.arange(k_cap, dtype=jnp.int32) * 13 % 1260, 20, 1250)
if desc_k.use_pallas():
    timeit("descriptor+moments kernel", lambda a, r, y, x:
           desc_k.descriptors_moments_pallas(
               a, r, y, x, orb.brief_pattern(), orb.SAMPLE_PAD),
           atlas, raw_atlas, ys, xs)

timeit("FULL extract", lambda im: orb.extract(im, ocfg), img)

# --- tracker step for context ---
step = tracker.make_jitted_step(cfg)
state = tracker.init_state(cfg)
for i in range(2):
    state, out = step(state, jnp.asarray(frames[i][0]),
                      jnp.asarray(frames[i][1]),
                      jnp.asarray(i / 30.0, jnp.float32))
jax.block_until_ready(out.q_wc)
t0 = time.perf_counter()
for i in range(REPS):
    state, out = step(state, jnp.asarray(frames[2 + i % 2][0]),
                      jnp.asarray(frames[2 + i % 2][1]),
                      jnp.asarray((2 + i) / 30.0, jnp.float32))
jax.block_until_ready(out.q_wc)
print(f"{'FULL track_step (pipelined)':>30}: "
      f"{(time.perf_counter() - t0) / REPS * 1e3:8.3f} ms")

# serialized (block every step): true per-step latency, no dispatch overlap
t0 = time.perf_counter()
for i in range(REPS):
    state, out = step(state, jnp.asarray(frames[2 + i % 2][0]),
                      jnp.asarray(frames[2 + i % 2][1]),
                      jnp.asarray((2 + i) / 30.0, jnp.float32))
    jax.block_until_ready(out.q_wc)
print(f"{'FULL track_step (serialized)':>30}: "
      f"{(time.perf_counter() - t0) / REPS * 1e3:8.3f} ms")

# full-block serialized: q_wc is an EARLY output — blocking only on it still
# lets the tail of step i overlap step i+1. Block the whole result tree for
# the true end-to-end step latency (what a lax.scan iteration costs).
t0 = time.perf_counter()
for i in range(REPS):
    state, out = step(state, jnp.asarray(frames[2 + i % 2][0]),
                      jnp.asarray(frames[2 + i % 2][1]),
                      jnp.asarray((2 + i) / 30.0, jnp.float32))
    jax.block_until_ready((state, out))
print(f"{'FULL track_step (full block)':>30}: "
      f"{(time.perf_counter() - t0) / REPS * 1e3:8.3f} ms")
