"""Isolate the solo process_batch scan cost from tunnel/drain effects.

Times, device-resident and blocked per dispatch:
  A. SLAMSystem._batch_step: scan of track+cond-insert over T frames
  B. track-only scan (no insert, no telemetry concat)
  C. serialized per-frame jitted step (reference latency)
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_scan.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_visual_slam_tpu.backend import mapping
from dynamic_visual_slam_tpu.config import SLAMConfig
from dynamic_visual_slam_tpu.frontend import tracker
from dynamic_visual_slam_tpu.io import synthetic
from dynamic_visual_slam_tpu.pipeline import slam as slam_mod

T = int(sys.argv[1]) if len(sys.argv) > 1 else 24
REPS = 5
cfg = SLAMConfig()
frames = list(synthetic.generate_sequence(cfg.camera, 32, seed=0))
gs = jnp.stack([jnp.asarray(frames[i % 32][0]) for i in range(T)])
ds = jnp.stack([jnp.asarray(frames[i % 32][1]) for i in range(T)])
tss = jnp.asarray(np.arange(T) / 30.0, jnp.float32)
det1 = mapping.Detections.empty(cfg.semantic.max_detections)
dets = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (T,) + x.shape),
                              det1)
jax.block_until_ready((gs, ds))
print(f"device={jax.devices()[0]} T={T}")

sys_ = slam_mod.SLAMSystem(cfg, enable_place_recognition=False)
tstate = tracker.init_state(cfg)
mstate = mapping.init_map(cfg)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:>26}: {dt * 1e3:8.2f} ms/dispatch  "
          f"{dt * 1e3 / T:6.3f} ms/frame  ({T / dt:.0f} FPS)")


# A. the bench's scan (no donation so reps reuse states)
batch_fn = sys_._batch_step.__wrapped__
timeit("A track+cond-insert scan", jax.jit(batch_fn), tstate, mstate, gs, ds,
       tss, dets)


# B. track-only scan
def track_scan(ts_, g, d, s):
    def body(c, x):
        c, out = tracker.track_step(cfg, c, x[0], x[1], x[2])
        return c, (out.q_wc, out.is_keyframe)
    return jax.lax.scan(body, ts_, (g, d, s))


timeit("B track-only scan", jax.jit(track_scan), tstate, gs, ds, tss)

# C. serialized per-frame step
step = tracker.make_jitted_step(cfg)
st = tracker.init_state(cfg)
for i in range(2):
    st, out = step(st, gs[i], ds[i], tss[i])
jax.block_until_ready(out.q_wc)
t0 = time.perf_counter()
n = 0
for _ in range(REPS):
    for i in range(T):
        st, out = step(st, gs[i], ds[i], tss[i])
        jax.block_until_ready(out.q_wc)
        n += 1
dt = (time.perf_counter() - t0) / n
print(f"{'C serialized step':>26}: {'':>8}        {dt * 1e3:6.3f} ms/frame  "
      f"({1 / dt:.0f} FPS)")
