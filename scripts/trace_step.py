"""Capture a jax.profiler device trace of serialized track_step frames and
print the top ops by total device time plus the idle-gap total.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_step.py
Writes the trace under /tmp/dvs_trace (inspect in xprof/tensorboard), then
parses the .trace.json.gz to aggregate op durations host-side.
"""
import glob
import gzip
import json
import os
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

from dynamic_visual_slam_tpu.config import SLAMConfig
from dynamic_visual_slam_tpu.frontend import tracker
from dynamic_visual_slam_tpu.io import synthetic

cfg = SLAMConfig()
frames = list(synthetic.generate_sequence(cfg.camera, 6, seed=0))
step = tracker.make_jitted_step(cfg)
state = tracker.init_state(cfg)
gs = [jnp.asarray(f[0]) for f in frames]
ds = [jnp.asarray(f[1]) for f in frames]
for i in range(2):
    state, out = step(state, gs[i], ds[i], jnp.asarray(i / 30.0, jnp.float32))
jax.block_until_ready(out.q_wc)

os.makedirs("/tmp/dvs_trace", exist_ok=True)
with jax.profiler.trace("/tmp/dvs_trace"):
    for i in range(2, 6):
        state, out = step(state, gs[i], ds[i],
                          jnp.asarray(i / 30.0, jnp.float32))
        jax.block_until_ready(out.q_wc)

# --- parse newest trace.json.gz ---
paths = sorted(glob.glob("/tmp/dvs_trace/**/*.trace.json.gz", recursive=True),
               key=os.path.getmtime)
assert paths, "no trace written"
with gzip.open(paths[-1], "rt") as f:
    trace = json.load(f)

events = [e for e in trace.get("traceEvents", [])
          if e.get("ph") == "X" and "dur" in e]
# find TPU/device track pids by name
pid_names = {}
for e in trace.get("traceEvents", []):
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, n in pid_names.items()
            if "TPU" in n or "/device" in n.lower() or "Chip" in n}
print("process tracks:", sorted(pid_names.values()))

dev_events = [e for e in events if e["pid"] in dev_pids] or events
by_name = defaultdict(float)
cnt = defaultdict(int)
total = 0.0
t_min, t_max = float("inf"), 0.0
for e in dev_events:
    by_name[e["name"]] += e["dur"]
    cnt[e["name"]] += 1
    total += e["dur"]
    t_min = min(t_min, e["ts"])
    t_max = max(t_max, e["ts"] + e["dur"])

span = t_max - t_min
print(f"\ndevice events: {len(dev_events)}  busy {total / 1e3:.2f} ms  "
      f"span {span / 1e3:.2f} ms  idle {(span - total) / 1e3:.2f} ms "
      f"(over 4 frames)")
print(f"{'op':<64}{'count':>6}{'total ms':>10}")
for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{name[:63]:<64}{cnt[name]:>6}{dur / 1e3:>10.3f}")
