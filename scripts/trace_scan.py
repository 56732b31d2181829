"""Trace ONE device-resident _batch_step scan dispatch (T frames) and print
device busy time per frame + top ops. The scan is the bench headline's
execution mode, so this is the authoritative per-frame device cost.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_scan.py [T]
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_visual_slam_tpu.backend import mapping
from dynamic_visual_slam_tpu.config import SLAMConfig
from dynamic_visual_slam_tpu.frontend import tracker
from dynamic_visual_slam_tpu.io import synthetic
from dynamic_visual_slam_tpu.pipeline import slam as slam_mod

T = int(sys.argv[1]) if len(sys.argv) > 1 else 24
cfg = SLAMConfig()
frames = list(synthetic.generate_sequence(cfg.camera, 32, seed=0))
gs = jnp.stack([jnp.asarray(frames[i % 32][0]) for i in range(T)])
ds = jnp.stack([jnp.asarray(frames[i % 32][1]) for i in range(T)])
tss = jnp.asarray(np.arange(T) / 30.0, jnp.float32)
det1 = mapping.Detections.empty(cfg.semantic.max_detections)
dets = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (T,) + x.shape),
                              det1)
jax.block_until_ready((gs, ds))

sys_ = slam_mod.SLAMSystem(cfg, enable_place_recognition=False)
fn = jax.jit(sys_._batch_step.__wrapped__)
tstate = tracker.init_state(cfg)
mstate = mapping.init_map(cfg)
out = fn(tstate, mstate, gs, ds, tss, dets)
jax.block_until_ready(out)

os.makedirs("/tmp/dvs_trace_scan", exist_ok=True)
with jax.profiler.trace("/tmp/dvs_trace_scan"):
    out = fn(tstate, mstate, gs, ds, tss, dets)
    jax.block_until_ready(out)

paths = sorted(glob.glob("/tmp/dvs_trace_scan/**/*.trace.json.gz",
                         recursive=True), key=os.path.getmtime)
with gzip.open(paths[-1], "rt") as f:
    trace = json.load(f)
events = [e for e in trace.get("traceEvents", [])
          if e.get("ph") == "X" and "dur" in e]
pid_names = {}
for e in trace.get("traceEvents", []):
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "Chip" in n}
dev_events = [e for e in events if e["pid"] in dev_pids] or events

# exclude the top-level jit event (it nests everything)
inner = [e for e in dev_events if not e["name"].startswith("jit_")]
by_name = defaultdict(float)
cnt = defaultdict(int)
for e in inner:
    by_name[e["name"]] += e["dur"]
    cnt[e["name"]] += 1
top = [e for e in dev_events if e["name"].startswith("jit_")]
span = sum(e["dur"] for e in top)
busy = sum(by_name.values())
print(f"jit span {span / 1e3:.2f} ms for {T} frames = "
      f"{span / 1e3 / T:.3f} ms/frame; inner-op busy sum {busy / 1e3:.2f} ms "
      f"(nesting may double-count)")
print(f"{'op':<64}{'count':>6}{'total ms':>10}{'/frame us':>10}")
for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:35]:
    print(f"{name[:63]:<64}{cnt[name]:>6}{dur / 1e3:>10.3f}"
          f"{dur / T:>10.1f}")
