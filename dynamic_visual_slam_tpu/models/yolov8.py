"""YOLOv8 object detection in pure JAX — in-process replacement for the
reference's external `yolo_ros` node (README.md:87-104; consumed at
backend.cpp:183-190 as /yolo/tracking).

Reference deployment runs ultralytics YOLOv8 in a separate Python process and
ships DetectionArrays over DDS; here the detector is one jitted NHWC network
whose outputs feed the semantic culling stage directly on device.

TPU-first choices:
- inference-fused: BatchNorm is folded into conv weights at load time
  (models/convert_ultralytics.py), so the graph is conv+SiLU only;
- bf16 activations/weights end to end (detection tolerates it; the MXU runs
  bf16 natively) with f32 box/class decode;
- static-shape post-processing: top-K candidate prefilter + fixed-trip-count
  class-aware NMS (jit-compatible; capacity = SemanticConfig.max_detections).

Architecture (YOLOv8n scaling d=0.33, w=0.25): CSP backbone with C2f blocks
+ SPPF, PAN-FPN neck, decoupled anchor-free head with DFL box regression.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

REG_MAX = 16          # DFL bins
NUM_CLASSES = 80
STRIDES = (8, 16, 32)


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------

def _depth(n: int, d: float = 0.33) -> int:
    return max(1, round(n * d))


def _width(c: int, w: float = 0.25, max_c: int = 1024) -> int:
    return int(math.ceil(min(c, max_c) * w / 8) * 8)


def yolov8n_spec() -> Dict[str, Any]:
    """Channel/depth layout for the 'n' scale."""
    w, d = 0.25, 0.33
    c = [_width(64, w), _width(128, w), _width(256, w), _width(512, w),
         _width(1024, w)]
    return dict(channels=c, n1=_depth(3, d), n2=_depth(6, d))


def _conv_param(key, cin, cout, k) -> Dict[str, jnp.ndarray]:
    fan_in = cin * k * k
    w = jax.random.normal(key, (k, k, cin, cout), jnp.float32)
    w = w * (2.0 / fan_in) ** 0.5
    return dict(w=w.astype(jnp.bfloat16),
                b=jnp.zeros((cout,), jnp.bfloat16))


def init_params(key: jax.Array, num_classes: int = NUM_CLASSES
                ) -> Dict[str, Any]:
    """Random-initialized parameter pytree with ultralytics-compatible
    structure (BN pre-folded).  Real weights come from convert_ultralytics."""
    spec = yolov8n_spec()
    c = spec["channels"]
    n1, n2 = spec["n1"], spec["n2"]
    keys = iter(jax.random.split(key, 256))

    def conv(cin, cout, k=1):
        return _conv_param(next(keys), cin, cout, k)

    def c2f(cin, cout, n):
        h = cout // 2
        return dict(
            cv1=conv(cin, cout, 1),
            cv2=conv(cout + n * h, cout, 1),
            m=[dict(cv1=conv(h, h, 3), cv2=conv(h, h, 3)) for _ in range(n)])

    params: Dict[str, Any] = dict(
        stem=conv(3, c[0], 3),
        down1=conv(c[0], c[1], 3), c2f1=c2f(c[1], c[1], n1),
        down2=conv(c[1], c[2], 3), c2f2=c2f(c[2], c[2], n2),
        down3=conv(c[2], c[3], 3), c2f3=c2f(c[3], c[3], n2),
        down4=conv(c[3], c[4], 3), c2f4=c2f(c[4], c[4], n1),
        sppf=dict(cv1=conv(c[4], c[4] // 2, 1),
                  cv2=conv(c[4] * 2, c[4], 1)),
        # PAN neck
        up_c2f1=c2f(c[4] + c[3], c[3], n1),
        up_c2f2=c2f(c[3] + c[2], c[2], n1),
        down_conv1=conv(c[2], c[2], 3),
        down_c2f1=c2f(c[2] + c[3], c[3], n1),
        down_conv2=conv(c[3], c[3], 3),
        down_c2f2=c2f(c[3] + c[4], c[4], n1),
    )
    # decoupled heads per scale
    ch_box = max(16, c[2] // 4, REG_MAX * 4)
    ch_cls = max(c[2], min(num_classes, 100))
    heads = []
    for ci in (c[2], c[3], c[4]):
        heads.append(dict(
            box1=conv(ci, ch_box, 3), box2=conv(ch_box, ch_box, 3),
            box3=conv(ch_box, 4 * REG_MAX, 1),
            cls1=conv(ci, ch_cls, 3), cls2=conv(ch_cls, ch_cls, 3),
            cls3=conv(ch_cls, num_classes, 1)))
    params["heads"] = heads
    params["num_classes"] = num_classes
    return params


# ---------------------------------------------------------------------------
# Forward graph
# ---------------------------------------------------------------------------

def _conv(p, x, stride=1):
    # weights cast to bf16 at use: a no-op for inference params (stored
    # bf16) and the mixed-precision path for f32 training masters
    # (semantic/train.py) — the MXU runs bf16 either way
    k = p["w"].shape[0]
    pad = (k - 1) // 2
    # no preferred_element_type: its transpose rule rejects mixed
    # bf16-input/f32-cotangent convs under grad (the MXU still accumulates
    # in f32 internally; only the conv OUTPUT rounds through bf16)
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), p["w"].astype(jnp.bfloat16),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    y = y + p["b"].astype(jnp.float32)
    return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)    # SiLU


def _c2f(p, x, shortcut: bool):
    """ultralytics C2f: cv2 input is [y0, y1, m1..mn] in that order; the
    bottleneck residual applies only when shortcut=True (backbone blocks —
    the PAN-neck C2f blocks are built with shortcut=False)."""
    y = _conv(p["cv1"], x)
    h = y.shape[-1] // 2
    parts = [y[..., :h], y[..., h:]]
    for m in p["m"]:
        z = _conv(m["cv2"], _conv(m["cv1"], parts[-1]))
        parts.append(parts[-1] + z if shortcut else z)
    return _conv(p["cv2"], jnp.concatenate(parts, axis=-1))


def _sppf(p, x):
    y = _conv(p["cv1"], x)
    pools = [y]
    for _ in range(3):
        pools.append(jax.lax.reduce_window(
            pools[-1], -jnp.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
            "SAME"))
    return _conv(p["cv2"], jnp.concatenate(pools, axis=-1))


def _upsample2(x):
    n, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _head(p, x):
    box = _conv(p["box2"], _conv(p["box1"], x))
    cls = _conv(p["cls2"], _conv(p["cls1"], x))
    # final 1x1 convs are linear (no act)
    def lin(q, z):
        y = jax.lax.conv_general_dilated(
            z.astype(jnp.bfloat16), q["w"].astype(jnp.bfloat16), (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
        return y + q["b"].astype(jnp.float32)
    return lin(p["box3"], box), lin(p["cls3"], cls)


def forward(params: Dict[str, Any], img: jnp.ndarray
            ) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """img: (N, H, W, 3) float32 in [0,1] → per-scale (box_logits, cls_logits)."""
    x = _conv(params["stem"], img, stride=2)
    x = _conv(params["down1"], x, stride=2)
    x = _c2f(params["c2f1"], x, shortcut=True)
    x = _conv(params["down2"], x, stride=2)
    p3 = _c2f(params["c2f2"], x, shortcut=True)                     # stride 8
    x = _conv(params["down3"], p3, stride=2)
    p4 = _c2f(params["c2f3"], x, shortcut=True)                     # stride 16
    x = _conv(params["down4"], p4, stride=2)
    x = _c2f(params["c2f4"], x, shortcut=True)
    p5 = _sppf(params["sppf"], x)                    # stride 32

    # top-down
    u4 = _c2f(params["up_c2f1"], jnp.concatenate([_upsample2(p5), p4], -1),
              shortcut=False)
    u3 = _c2f(params["up_c2f2"], jnp.concatenate([_upsample2(u4), p3], -1),
              shortcut=False)
    # bottom-up
    d4 = _c2f(params["down_c2f1"], jnp.concatenate(
        [_conv(params["down_conv1"], u3, stride=2), u4], -1), shortcut=False)
    d5 = _c2f(params["down_c2f2"], jnp.concatenate(
        [_conv(params["down_conv2"], d4, stride=2), p5], -1), shortcut=False)

    return [_head(params["heads"][0], u3),
            _head(params["heads"][1], d4),
            _head(params["heads"][2], d5)]


# ---------------------------------------------------------------------------
# Decode + NMS (static shapes)
# ---------------------------------------------------------------------------

class RawDetections(NamedTuple):
    boxes: jnp.ndarray     # (D, 4) xyxy in input pixels
    scores: jnp.ndarray    # (D,)
    classes: jnp.ndarray   # (D,) int32
    valid: jnp.ndarray     # (D,) bool


def decode(outputs) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-scale head outputs → (boxes (A,4) xyxy, class scores (A,C))."""
    boxes_all, cls_all = [], []
    for (box, cls), stride in zip(outputs, STRIDES):
        n, h, w, _ = box.shape
        dfl = box.reshape(n, h, w, 4, REG_MAX)
        bins = jnp.arange(REG_MAX, dtype=jnp.float32)
        dist = jnp.sum(jax.nn.softmax(dfl, axis=-1) * bins, axis=-1)  # (n,h,w,4)
        cy, cx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32) + 0.5,
                              jnp.arange(w, dtype=jnp.float32) + 0.5,
                              indexing="ij")
        x1 = (cx - dist[..., 0]) * stride
        y1 = (cy - dist[..., 1]) * stride
        x2 = (cx + dist[..., 2]) * stride
        y2 = (cy + dist[..., 3]) * stride
        boxes_all.append(jnp.stack([x1, y1, x2, y2], -1).reshape(n, -1, 4))
        cls_all.append(jax.nn.sigmoid(cls).reshape(n, -1, cls.shape[-1]))
    return (jnp.concatenate(boxes_all, axis=1)[0],
            jnp.concatenate(cls_all, axis=1)[0])


def _iou(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    x1 = jnp.maximum(box[0], boxes[:, 0])
    y1 = jnp.maximum(box[1], boxes[:, 1])
    x2 = jnp.minimum(box[2], boxes[:, 2])
    y2 = jnp.minimum(box[3], boxes[:, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    a1 = jnp.maximum(box[2] - box[0], 0) * jnp.maximum(box[3] - box[1], 0)
    a2 = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
        jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
    return inter / jnp.maximum(a1 + a2 - inter, 1e-9)


def nms(boxes: jnp.ndarray, cls_scores: jnp.ndarray, max_out: int,
        score_thr: float = 0.25, iou_thr: float = 0.45,
        prefilter: int = 256) -> RawDetections:
    """Class-aware NMS with static shapes: top-`prefilter` candidates by best
    class score, then `max_out` rounds of select-max + suppress."""
    best_cls = jnp.argmax(cls_scores, axis=1).astype(jnp.int32)
    best_score = jnp.max(cls_scores, axis=1)
    prefilter = min(prefilter, best_score.shape[0])   # small inputs
    top_score, top_idx = jax.lax.top_k(best_score, prefilter)
    cand_boxes = boxes[top_idx]
    cand_cls = best_cls[top_idx]
    alive = top_score >= score_thr

    def body(carry, _):
        alive, out_i = carry
        s = jnp.where(alive, top_score, -1.0)
        i = jnp.argmax(s)
        ok = s[i] > 0
        box = cand_boxes[i]
        same = cand_cls == cand_cls[i]
        sup = (_iou(box, cand_boxes) > iou_thr) & same
        alive = alive & ~sup & (jnp.arange(prefilter) != i)
        det = (box, top_score[i], cand_cls[i], ok)
        return (alive, out_i + 1), det

    (_, _), (b, s, c, v) = jax.lax.scan(body, (alive, 0), None, length=max_out)
    return RawDetections(boxes=b, scores=s, classes=c, valid=v)


@functools.partial(jax.jit, static_argnums=(2, 3))
def detect(params: Dict[str, Any], img: jnp.ndarray, input_size: int = 640,
           max_out: int = 32, score_thr: float = 0.25,
           iou_thr: float = 0.45) -> RawDetections:
    """img: (H=input_size, W=input_size, 3) float32 [0,1] → detections in
    input pixels."""
    outs = forward(params, img[None])
    boxes, cls_scores = decode(outs)
    return nms(boxes, cls_scores, max_out, score_thr, iou_thr)
