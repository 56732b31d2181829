"""YOLOv8 trainer on the synthetic dynamic world (semantic/train.py).

The reference consumes externally-pretrained YOLO weights
(/root/reference/dynamic_visual_slam/README.md:87-104); this environment has
zero egress, so the rebuild trains its own detector on the synthetic
renderer's exact walker bboxes.  These tests pin the training formulation:
the FCOS-style assignment, the DFL target math, the dataset letterboxing
(must match the runtime detector's), and that a short optimization run
actually reduces the loss on a fixed batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_visual_slam_tpu.models import yolov8
from dynamic_visual_slam_tpu.models.yolov8 import REG_MAX
from dynamic_visual_slam_tpu.semantic import train as T


def test_assign_positive_inside_center_negative_outside():
    points, strides = T._anchor_grid(128)
    gt = jnp.asarray([[32.0, 32.0, 96.0, 96.0]] + [[0.0] * 4] * (T.MAX_GT - 1))
    mask = jnp.asarray([True] + [False] * (T.MAX_GT - 1))
    gt_idx, pos = T._assign(points, strides, gt, mask)
    pos = np.asarray(pos)
    pts = np.asarray(points)
    # every positive anchor lies inside the box, near its center
    assert pos.any()
    inside = ((pts[:, 0] > 32) & (pts[:, 0] < 96)
              & (pts[:, 1] > 32) & (pts[:, 1] < 96))
    assert not (pos & ~inside).any()
    # all matched GT indices are 0 (the only real box)
    assert (np.asarray(gt_idx)[pos] == 0).all()
    # far corner anchors are negative
    far = (pts[:, 0] < 16) | (pts[:, 1] < 16)
    assert not (pos & far).any()


def test_assign_ambiguous_anchor_takes_smaller_box():
    points, strides = T._anchor_grid(128)
    big = [8.0, 8.0, 120.0, 120.0]
    small = [48.0, 48.0, 80.0, 80.0]
    gt = jnp.asarray([big, small] + [[0.0] * 4] * (T.MAX_GT - 2))
    mask = jnp.asarray([True, True] + [False] * (T.MAX_GT - 2))
    gt_idx, pos = T._assign(points, strides, gt, mask)
    pts, gi = np.asarray(points), np.asarray(gt_idx)
    in_small = ((pts[:, 0] > 50) & (pts[:, 0] < 78)
                & (pts[:, 1] > 50) & (pts[:, 1] < 78))
    covered = in_small & np.asarray(pos)
    assert covered.any()
    assert (gi[covered] == 1).all()


def test_dfl_loss_integer_target_is_bin_nll():
    logits = jnp.asarray([0.3, 2.0, -1.0, 0.0] + [0.0] * (REG_MAX - 4))
    target = jnp.asarray(2.0)       # exactly bin 2
    got = float(T._dfl_loss(logits[None], target[None])[0])
    want = float(-jax.nn.log_softmax(logits)[2])
    assert abs(got - want) < 1e-5


def test_dfl_loss_fractional_target_interpolates():
    logits = jnp.zeros(REG_MAX)     # uniform: every bin same log-prob
    got = float(T._dfl_loss(logits[None], jnp.asarray([2.7]))[0])
    want = float(np.log(REG_MAX))   # weighted CE of uniform = log K
    assert abs(got - want) < 1e-5


def test_letterbox_matches_runtime_detector():
    from dynamic_visual_slam_tpu.semantic.detector import YoloDetector

    class _Shim:            # duck-typed self: letterbox only reads .size
        size = 64

    rng = np.random.default_rng(0)
    gray = rng.integers(0, 255, (96, 128), np.uint8)
    host, sc_h, pad_h = T.letterbox_np(gray, 64)
    rgb = np.repeat(gray[..., None], 3, axis=-1)
    dev, sc_d, pad_d = YoloDetector.letterbox(_Shim(), rgb)
    assert abs(sc_h - float(sc_d)) < 1e-6
    assert pad_h == tuple(int(p) for p in pad_d)
    np.testing.assert_allclose(host, np.asarray(dev), atol=2e-2)


def test_render_pool_boxes_in_bounds():
    imgs, boxes, mask = T.render_pool(6, input_size=96, seed=3)
    assert imgs.shape == (6, 96, 96, 3) and imgs.dtype == np.float32
    b = boxes[mask]
    if len(b):
        assert (b[:, 0] < b[:, 2]).all() and (b[:, 1] < b[:, 3]).all()
        assert (b >= -1.0).all() and (b <= 97.0).all()


def test_loss_grads_flow_and_short_run_reduces_loss():
    """One fixed batch, 25 Adam steps on a tiny graph: total loss must drop
    materially (overfit sanity — the standard can-it-learn check)."""
    import optax
    imgs, boxes, mask = T.render_pool(4, input_size=128, seed=1)
    params = T._to_f32(yolov8.init_params(jax.random.key(0)))
    params.pop("num_classes")
    bi, bb, bm = jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(mask)

    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        (l, aux), g = jax.value_and_grad(T.detection_loss, has_aux=True)(
            p, bi, bb, bm, 128)
        up, o = tx.update(g, o)
        return optax.apply_updates(p, up), o, l, g

    params, opt, l0, g0 = step(params, opt)
    # gradients reach the deepest backbone conv
    gnorm = float(jnp.linalg.norm(g0["stem"]["w"]))
    assert np.isfinite(gnorm) and gnorm > 0
    for _ in range(24):
        params, opt, l1, _ = step(params, opt)
    assert np.isfinite(float(l1))
    assert float(l1) < 0.5 * float(l0), (float(l0), float(l1))


@pytest.mark.slow
def test_in_loop_eval_reports_all_conditions():
    """in_loop_eval plumbing at toy scale: random-init detector (meaningless
    boxes) through the full SLAM loop alongside the culling-off baseline —
    pins the report schema and that a learned-detector condition actually
    drives the pipeline's Detections path end to end."""
    params = T._to_bf16(yolov8.init_params(jax.random.key(0)))
    params["input_size"] = 64      # tiny letterbox → cheap CPU compile
    res = T.in_loop_eval(params, n_frames=12, width=160, height=120,
                         conditions=("off", "learned"), verbose=False)
    assert set(res) == {"off", "learned"}
    for cond in res:
        for key in ("ate_m", "walker_landmarks_confirmed",
                    "walker_landmarks_any", "landmarks", "keyframes"):
            assert key in res[cond], (cond, key)
        assert np.isfinite(res[cond]["ate_m"])
    assert "detections_total" in res["learned"]


@pytest.mark.slow
def test_train_end_to_end_detects_walkers():
    """Full loop at toy scale: train() → bf16 params → evaluate() recall on
    held-out scenes beats the random-init baseline by a wide margin."""
    params, hist = T.train(steps=160, batch=8, input_size=128,
                           pool_images=48, lr=2e-3, seed=0, verbose=False,
                           log_every=40)
    leaves = [l for l in jax.tree_util.tree_leaves(params)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    assert all(l.dtype == jnp.bfloat16 for l in leaves)
    assert hist[-1] < hist[0]
    m = T.evaluate(params, input_size=128, n_images=12, seed=77)
    base = T.evaluate(T._to_bf16(yolov8.init_params(jax.random.key(9))),
                      input_size=128, n_images=12, seed=77)
    assert m["mean_best_iou"] > base["mean_best_iou"] + 0.05, (m, base)
