"""Out-of-distribution detector efficacy (VERDICT r3 next #6): run the
checked-in TPU-trained YOLOv8n (assets/yolov8n_synth.npz) in the SLAM loop
on the HARD walker set — approach/recede scale change, stop-and-go, mutual
occlusion — behaviors the training family (semantic/train._random_walkers:
constant z, constant velocity, no occlusion pressure by construction)
deliberately does not generate. Reports culling OFF vs GT bboxes vs the
learned detector on ATE + walker-contaminated landmarks; results go into
PARITY_RESULTS.md verbatim.

Run: python scripts/ood_eval.py [n_frames] [weights_path]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:  # noqa: BLE001
    pass

from dynamic_visual_slam_tpu.io import synthetic
from dynamic_visual_slam_tpu.models.convert_ultralytics import load_params
from dynamic_visual_slam_tpu.semantic import train as T

N = int(sys.argv[1]) if len(sys.argv) > 1 else 180
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
weights = sys.argv[2] if len(sys.argv) > 2 \
    else os.path.join(repo, "assets", "yolov8n_synth.npz")
params = load_params(weights)
print(f"weights: {weights}", flush=True)

print("== in-distribution (default_walkers) ==", flush=True)
res_id = T.in_loop_eval(params, n_frames=N, seed=0)
print("== OUT-of-distribution (hard_walkers) ==", flush=True)
res_ood = T.in_loop_eval(params, n_frames=N, seed=0,
                         objects=synthetic.hard_walkers(N))
print(json.dumps(dict(in_distribution=res_id, out_of_distribution=res_ood),
                 indent=2))
