"""TPU bit-exactness check: orb.extract_batch vs per-frame orb.extract.

The batched path reorders the score/descriptor atlases level-major across
frames; this asserts the extracted keypoints, responses, angles and
descriptor bits are IDENTICAL on masked slots (unmasked slots hold junk
patches at different atlas origins by construction). Also times both.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_batch_extract_tpu.py [B]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_visual_slam_tpu.config import SLAMConfig
from dynamic_visual_slam_tpu.frontend import orb
from dynamic_visual_slam_tpu.io import synthetic
from dynamic_visual_slam_tpu.ops import descriptors as desc_k

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
cfg = SLAMConfig()
assert desc_k.use_pallas(), "must run on TPU"
frames = list(synthetic.generate_sequence(cfg.camera, B, seed=1))
imgs = jnp.asarray(np.stack([f[0] for f in frames])).astype(jnp.float32)

ex1 = jax.jit(lambda im: orb.extract(im, cfg.orb))
exb = jax.jit(lambda ims: orb.extract_batch(ims, cfg.orb))

solo = [jax.tree_util.tree_map(np.asarray, ex1(imgs[i])) for i in range(B)]
batch = jax.tree_util.tree_map(np.asarray, exb(imgs))

worst_bits = 0
for i in range(B):
    s = solo[i]
    m = s.mask
    assert (batch.mask[i] == m).all(), f"frame {i}: mask mismatch"
    assert (batch.uv[i][m] == s.uv[m]).all(), f"frame {i}: uv mismatch"
    assert (batch.response[i][m] == s.response[m]).all(), f"frame {i}: resp"
    assert (batch.octave[i][m] == s.octave[m]).all(), f"frame {i}: octave"
    da = np.abs(np.angle(np.exp(1j * (batch.angle[i][m] - s.angle[m]))))
    assert da.max() == 0.0, f"frame {i}: angle diff {np.degrees(da.max())}"
    nb = int((batch.desc_bits[i][m] != s.desc_bits[m]).sum())
    worst_bits = max(worst_bits, nb)
    assert nb == 0, f"frame {i}: {nb} descriptor bit diffs"
print(f"B={B}: batch == per-frame on all masked slots (bit-exact)")

# timing: per-frame loop vs one batched call (warm)
jax.block_until_ready(exb(imgs))
t0 = time.perf_counter()
for _ in range(5):
    jax.block_until_ready(exb(imgs))
tb = (time.perf_counter() - t0) / 5
t0 = time.perf_counter()
for _ in range(5):
    outs = [ex1(imgs[i]) for i in range(B)]
    jax.block_until_ready(outs)
ts = (time.perf_counter() - t0) / 5
print(f"batched: {tb * 1e3:.2f} ms ({tb / B * 1e3:.2f} ms/frame)   "
      f"per-frame pipelined: {ts * 1e3:.2f} ms ({ts / B * 1e3:.2f} ms/frame)")
