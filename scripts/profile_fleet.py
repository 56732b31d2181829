"""Decompose the SLAMFleet.step_batch cost on the real chip.

Times, normalized per scan step over B streams (720p, default config):
  A. full batch_step — the SHIPPED pipeline (scan over T steps; each step
     runs one sharded extract_streams dispatch over B streams + vmapped
     track_step; keyframe inserts are deferred into K slots)
  B. OLD-style track-only scan (full vmapped track_step per scan step) —
     kept as the r3 baseline the redesign is measured against
  C. OLD-style extraction per scan step (extract_batch over B per step)
  D. vmapped insert alone (on a fixed KeyframeBlock)
  E. vmapped insert + masked where-select (the old per-frame insert cost)
  F. extract_fleet_tb: T×B-frame extraction in ONE dispatch — measured
     SLOWER than A's per-step extract_streams and REJECTED (docs/PERF.md);
     kept only as this profiling stage, batch_step does not call it
so the fleet bench number (bench.py _fleet_bench) is attributable stage by
stage (docs/PERF.md quotes these). Run: python scripts/profile_fleet.py [B] [T]
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
from dynamic_visual_slam_tpu.parallel import mesh as pmesh
from dynamic_visual_slam_tpu.semantic.classes import filtered_mask

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
T = int(sys.argv[2]) if len(sys.argv) > 2 else 24
REPS = 5

cfg = SLAMConfig()
cam = cfg.camera
frames = list(synthetic.generate_sequence(cam, 32, seed=0))
print(f"devices={jax.devices()} B={B} T={T} cam={cam.width}x{cam.height}")

gs = jnp.asarray(np.stack([np.stack([frames[(j + s) % 32][0]
                                     for s in range(B)]) for j in range(T)]))
ds = jnp.asarray(np.stack([np.stack([frames[(j + s) % 32][1]
                                     for s in range(B)]) for j in range(T)]))
tss = jnp.asarray(np.broadcast_to((np.arange(T) / 30.0)[:, None],
                                  (T, B)).astype(np.float32))
det1 = mapping.Detections.empty(cfg.semantic.max_detections)
dets = jax.tree_util.tree_map(
    lambda x: jnp.broadcast_to(x, (T, B) + x.shape), det1)
jax.block_until_ready((gs, ds))

fleet = pmesh.SLAMFleet(cfg, batch=B, mesh=pmesh.make_mesh(1))
filt = filtered_mask(cfg)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:>28}: {dt * 1e3 / T:8.3f} ms/scan-step   "
          f"({dt * 1e3:.1f} ms / {T}-step dispatch, "
          f"{T * B / dt:.0f} agg FPS)")
    return dt


# --- A. full batch_step (states NOT donated here: re-used across reps) ---
full = jax.jit(lambda ts_, ms_, g, d, s, de: fleet._batch_step.__wrapped__(
    ts_, ms_, g, d, s, de))
timeit("A full batch_step", full, fleet.tracker_states, fleet.map_states,
       gs, ds, tss, dets)

# --- B. track-only scan ---
extract_streams = None
from dynamic_visual_slam_tpu.frontend import orb
from dynamic_visual_slam_tpu.ops import descriptors as desc_k


def extract_one(gray):
    g = gray.astype(jnp.float32)
    return orb.extract(g, cfg.orb)


if desc_k.use_pallas():
    def extract_streams(grays):
        return jax.lax.map(extract_one, grays)
else:
    extract_streams = jax.vmap(extract_one)


def one_track(tstate, gray, depth, ts, det, kps):
    tstate, out = tracker.track_step(cfg, tstate, gray, depth, ts,
                                     det=det, filtered=filt, kps=kps)
    return tstate, out


track_v = jax.vmap(one_track)


@jax.jit
def track_scan(tstates, g, d, s, de):
    def body(ts_, x):
        kps = extract_streams(x[0])
        ts_, out = track_v(ts_, x[0], x[1], x[2], x[3], kps)
        return ts_, (out.q_wc, out.is_keyframe)
    return jax.lax.scan(body, tstates, (g, d, s, de))


timeit("B track-only scan", track_scan, fleet.tracker_states, gs, ds, tss,
       dets)


# --- C. extraction only ---
@jax.jit
def extract_scan(g):
    def body(c, gray_row):
        kps = extract_streams(gray_row)
        return c, kps.uv
    return jax.lax.scan(body, 0, g)


timeit("C extract-only scan", extract_scan, gs)


# --- D. vmapped insert, T reps ---
tstates2 = fleet.tracker_states
det0 = jax.tree_util.tree_map(lambda x: x[0], dets)   # time-slice the tree
kps0 = extract_streams(gs[0])
_, out0 = jax.jit(track_v)(tstates2, gs[0], ds[0], tss[0], det0, kps0)
kf0 = out0.keyframe
jax.block_until_ready(kf0.uv)


def one_insert(ms_, kf, det):
    ms2, _ = mapping.insert_keyframe(cfg, ms_, kf, det, filt)
    return ms2


insert_v = jax.vmap(one_insert)


@jax.jit
def insert_scan(ms_, kf, det):
    def body(m, _):
        return insert_v(m, kf, det), 0
    return jax.lax.scan(body, ms_, None, length=T)[0]


timeit("D vmapped insert scan", insert_scan, fleet.map_states, kf0, det0)


# --- E. vmapped insert + masked where-select of map state, T reps ---
# (mask is data-dependent so XLA cannot dead-code the insert branch)
@jax.jit
def select_scan(ms_, kf, det, mask):
    def body(m, _):
        m2 = insert_v(m, kf, det)
        m3 = jax.tree_util.tree_map(
            lambda a, b: jnp.where(mask.reshape(
                (B,) + (1,) * (a.ndim - 1)), b, a), m, m2)
        return m3, 0
    return jax.lax.scan(body, ms_, None, length=T)[0]


timeit("E insert+where scan", select_scan, fleet.map_states, kf0, det0,
       out0.is_keyframe)

# --- F. fleet-wide extraction in ONE dispatch (T*B frames) — the
# extraction stage batch_step actually embeds (A minus F minus the insert
# scan is the vmapped-track_batch residue) ---
timeit("F extract_fleet_tb", jax.jit(fleet._extract_fleet_tb), gs)
