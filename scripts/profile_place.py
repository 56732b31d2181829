"""Find where the shipped-defaults (place recognition ON) pipeline spends
host time on the real chip: cProfile over a 240-frame process_batch run
with the pretrained vocabulary, printing the top cumulative-time calls.
Run: python scripts/profile_place.py [n_frames]
"""
import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import numpy as np
import jax

from dynamic_visual_slam_tpu.config import SLAMConfig
from dynamic_visual_slam_tpu.io import synthetic
from dynamic_visual_slam_tpu.pipeline.slam import SLAMSystem

N = int(sys.argv[1]) if len(sys.argv) > 1 else 240
BATCH = 24
cfg = SLAMConfig()
frames = []
for gray, depth, _, _, ts in synthetic.generate_sequence(cfg.camera, 6,
                                                         seed=3):
    frames.append((np.asarray(gray, np.float32).astype(np.uint8),
                   (np.asarray(depth) * 1000.0).astype(np.uint16)))

vocab = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "orbvoc_synth.npz")
sys_ = SLAMSystem(cfg, ba_async=True, enable_place_recognition=True,
                  vocab_path=vocab, sync_every=3)


def batch_at(i0):
    gs = np.stack([frames[(i0 + j) % len(frames)][0] for j in range(BATCH)])
    ds = np.stack([frames[(i0 + j) % len(frames)][1] for j in range(BATCH)])
    return gs, ds, (i0 + np.arange(BATCH)) / 30.0


sys_.warmup_place()
for i0 in range(0, 144, BATCH):          # warmup/compile
    sys_.process_batch(*batch_at(i0))
sys_.finalize()

staged = [(jax.device_put(g), jax.device_put(d), t)
          for g, d, t in (batch_at(144 + k * BATCH)
                          for k in range(N // BATCH))]
jax.block_until_ready([s[:2] for s in staged])

prof = cProfile.Profile()
t0 = time.perf_counter()
prof.enable()
for b in staged:
    sys_.process_batch(*b)
sys_.finalize()
jax.block_until_ready(sys_.map_state.landmarks.xyz)
prof.disable()
dt = time.perf_counter() - t0
print(f"\n{N} frames in {dt:.2f}s = {N / dt:.2f} FPS "
      f"(keyframes={sys_.stats['keyframes']}, "
      f"loop_checks={len(sys_.loop_candidates)})")
st = pstats.Stats(prof)
st.sort_stats("cumulative").print_stats(28)
