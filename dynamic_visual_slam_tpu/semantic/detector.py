"""Pipeline-facing detector: YOLOv8 inference → mapping.Detections.

Replaces the reference's /yolo/tracking subscription (backend.cpp:71-72,
183-190): letterbox the RGB frame to the network size, run the jitted
detector, undo the letterbox on the boxes, shift class ids by +1 (id 0 is
the 'unlabeled' category, semantic/classes.py).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_visual_slam_tpu.backend.mapping import Detections
from dynamic_visual_slam_tpu.config import SLAMConfig
from dynamic_visual_slam_tpu.models import yolov8


class YoloDetector:
    def __init__(self, cfg: SLAMConfig,
                 weights_path: Optional[str] = None,
                 params: Optional[Dict[str, Any]] = None,
                 seed: int = 0):
        self.cfg = cfg
        self.size = cfg.semantic.input_size
        if params is not None:
            self.params = params
        elif weights_path and os.path.exists(weights_path):
            from dynamic_visual_slam_tpu.models.convert_ultralytics import (
                convert, load_params)
            if weights_path.endswith(".pt"):
                self.params = convert(weights_path)
            else:
                self.params = load_params(weights_path)
        else:
            # no pretrained weights in the image (zero egress): random init —
            # exercises the full compute path; detections are meaningless
            self.params = yolov8.init_params(jax.random.key(seed))
        # weights trained by semantic/train.py embed their native input
        # size; honor it over the config default (a 256-trained net fed
        # 640-px letterboxes is out-of-distribution). Read without mutating:
        # the caller may still own this dict (and save_params it later).
        if isinstance(self.params, dict) and "input_size" in self.params:
            self.size = int(np.asarray(self.params["input_size"], np.float32))
            self.params = {k: v for k, v in self.params.items()
                           if k != "input_size"}
        s = self.size
        d = cfg.semantic.max_detections
        self._detect = jax.jit(lambda p, img: yolov8.detect(
            p, img, s, d, cfg.semantic.score_threshold,
            cfg.semantic.iou_threshold))
        self._recent = []   # (boxes, category, score) of recent frames

    def letterbox(self, rgb: np.ndarray):
        """(H,W,3) uint8/float → ((S,S,3) float32 [0,1], scale, (pad_x, pad_y))."""
        h, w = rgb.shape[:2]
        s = self.size
        scale = min(s / h, s / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        img = jax.image.resize(jnp.asarray(rgb, jnp.float32) / 255.0,
                               (nh, nw, 3), "bilinear")
        px, py = (s - nw) // 2, (s - nh) // 2
        canvas = jnp.full((s, s, 3), 0.447, jnp.float32)
        canvas = jax.lax.dynamic_update_slice(canvas, img, (py, px, 0))
        return canvas, scale, (px, py)

    def __call__(self, rgb: np.ndarray) -> Detections:
        canvas, scale, (px, py) = self.letterbox(rgb)
        raw = self._detect(self.params, canvas)
        boxes = (raw.boxes - jnp.asarray([px, py, px, py], jnp.float32)) / scale
        h, w = rgb.shape[:2]
        boxes = jnp.clip(boxes, 0.0, jnp.asarray([w - 1, h - 1, w - 1, h - 1],
                                                 jnp.float32))
        return self._postprocess(np.asarray(boxes),
                                 np.asarray(raw.classes) + 1,
                                 np.asarray(raw.scores),
                                 np.asarray(raw.valid), (h, w))

    def _update_tracks(self, b: np.ndarray, c: np.ndarray, s: np.ndarray,
                       hw) -> tuple:
        """Velocity-extrapolated box tracking (SemanticConfig
        track_ttl_frames / track_inflate): the in-process analogue of the
        reference's /yolo/tracking stream — the backend there consumes
        TRACKED detections, not raw per-frame ones (backend.cpp:183-190).
        Greedy IoU matching to live tracks; missed tracks coast on their
        EMA velocity, inflate per stale frame, and expire after the TTL.
        Serves the union of current detections and coasting tracks, so a
        13-20 frame detector miss-run on a moving/stopped walker (the
        measured OOD failure mode) no longer uncovers it."""
        sc = self.cfg.semantic
        h, w = hw
        tracks = getattr(self, "_tracks", [])

        def iou(a, bb):
            x1 = np.maximum(a[0], bb[0]); y1 = np.maximum(a[1], bb[1])
            x2 = np.minimum(a[2], bb[2]); y2 = np.minimum(a[3], bb[3])
            inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
            ua = (a[2] - a[0]) * (a[3] - a[1]) \
                + (bb[2] - bb[0]) * (bb[3] - bb[1]) - inter
            return inter / max(ua, 1e-9)

        used = np.zeros(len(b), bool)
        for tr in tracks:
            best, bi = 0.30, -1          # match floor
            for i in range(len(b)):
                if used[i] or c[i] != tr["cat"]:
                    continue
                v = iou(tr["box"], b[i])
                if v > best:
                    best, bi = v, i
            if bi >= 0:
                used[bi] = True
                nc = np.asarray([(b[bi][0] + b[bi][2]) / 2,
                                 (b[bi][1] + b[bi][3]) / 2])
                oc = np.asarray([(tr["box"][0] + tr["box"][2]) / 2,
                                 (tr["box"][1] + tr["box"][3]) / 2])
                if tr["age"] == 0:
                    # seen last frame: (nc - oc) IS the per-frame motion
                    tr["vel"] = 0.6 * tr["vel"] + 0.4 * (nc - oc)
                else:
                    # re-acquired after coasting: the box already moved by
                    # vel each stale frame, so (nc - oc) is the residual —
                    # apply it as a per-frame velocity correction
                    tr["vel"] = tr["vel"] + 0.4 * (nc - oc) / (tr["age"] + 1)
                tr["box"] = b[bi].copy()
                tr["score"] = float(s[bi])
                tr["age"] = 0
            else:
                tr["age"] += 1
                vx, vy = tr["vel"]
                g = sc.track_inflate * 0.5 * (
                    (tr["box"][2] - tr["box"][0])
                    + (tr["box"][3] - tr["box"][1]))
                tr["box"] = tr["box"] + np.asarray(
                    [vx - g, vy - g, vx + g, vy + g], np.float32)
        tracks = [t for t in tracks if t["age"] <= sc.track_ttl_frames]
        for i in range(len(b)):
            if not used[i]:
                tracks.append(dict(box=b[i].copy(),
                                   vel=np.zeros(2, np.float64),
                                   cat=int(c[i]), score=float(s[i]), age=0))
        self._tracks = tracks
        if not tracks:
            return b, c, s
        tb = np.clip(np.stack([t["box"] for t in tracks]),
                     [0, 0, 0, 0], [w - 1, h - 1, w - 1, h - 1]
                     ).astype(np.float32)
        keep = (tb[:, 2] - tb[:, 0] > 1) & (tb[:, 3] - tb[:, 1] > 1)
        tb = tb[keep]
        tc = np.asarray([t["cat"] for t in tracks], np.int32)[keep]
        ts_ = np.asarray([t["score"] for t in tracks], np.float32)[keep]
        return tb, tc, ts_

    def _postprocess(self, boxes: np.ndarray, category: np.ndarray,
                     score: np.ndarray, valid: np.ndarray,
                     hw) -> Detections:
        """Culling-robustness post-processing (SemanticConfig.box_margin /
        persist_frames): dilate each box by margin × its size, then serve
        the union of the last persist_frames frames' dilated boxes.  A
        learned detector with recall < 1 misses a walker for a frame here
        and there; without this, every miss leaks its keypoints past the
        semantic stage and a handful of leaks is enough to confirm walker
        landmarks (measured: 62 confirmed walker landmarks at recall 0.78
        without persistence vs ~GT-level with it)."""
        sc = self.cfg.semantic
        h, w = hw
        k = int(np.sum(valid))
        order = np.argsort(~valid)          # valid rows first
        b = boxes[order][:k].astype(np.float32)
        c = category[order][:k].astype(np.int32)
        s = score[order][:k].astype(np.float32)
        if sc.box_margin > 0 and k:
            mw = (b[:, 2] - b[:, 0]) * sc.box_margin
            mh = (b[:, 3] - b[:, 1]) * sc.box_margin
            b = np.stack([np.maximum(b[:, 0] - mw, 0.0),
                          np.maximum(b[:, 1] - mh, 0.0),
                          np.minimum(b[:, 2] + mw, w - 1.0),
                          np.minimum(b[:, 3] + mh, h - 1.0)], axis=1)
        if getattr(sc, "track_ttl_frames", 0) > 0:
            b, c, s = self._update_tracks(b, c, s, (h, w))
        elif sc.persist_frames > 1:
            self._recent.append((b, c, s))
            if len(self._recent) > sc.persist_frames:
                self._recent.pop(0)
            b = np.concatenate([x[0] for x in self._recent])
            c = np.concatenate([x[1] for x in self._recent])
            s = np.concatenate([x[2] for x in self._recent])
        cap = sc.max_detections
        if len(b) > cap:                    # newest frames win the slots
            b, c, s = b[-cap:], c[-cap:], s[-cap:]
        out_b = np.zeros((cap, 4), np.float32)
        out_c = np.zeros(cap, np.int32)
        out_s = np.zeros(cap, np.float32)
        n = len(b)
        out_b[:n], out_c[:n], out_s[:n] = b, c, s
        return Detections(boxes=jnp.asarray(out_b),
                          category=jnp.asarray(out_c),
                          score=jnp.asarray(out_s),
                          mask=jnp.asarray(np.arange(cap) < n))


def boxes_to_detections(boxes: np.ndarray, capacity: int,
                        category: str = "person",
                        score: float = 1.0) -> Detections:
    """(K,4) [x1,y1,x2,y2] pixel boxes → a padded Detections pytree — the
    adapter between ground-truth bboxes (io/synthetic.object_bboxes) and the
    mapping stage's /yolo/tracking-equivalent input."""
    from dynamic_visual_slam_tpu.semantic.classes import category_id
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    k = min(len(boxes), capacity)
    b = np.zeros((capacity, 4), np.float32)
    b[:k] = boxes[:k]
    cat = np.zeros(capacity, np.int32)
    cat[:k] = category_id(category)
    return Detections(boxes=jnp.asarray(b), category=jnp.asarray(cat),
                      score=jnp.full(capacity, score, jnp.float32),
                      mask=jnp.asarray(np.arange(capacity) < k))


class GTDetector:
    """Ground-truth 'detector': serves the exact bboxes recorded for each
    frame timestamp (filled by the frame source).  Same call surface as
    YoloDetector plus an optional stamp, so it drops into the threaded
    pipeline's detector thread — detector-in-loop with meaningful boxes and
    zero pretrained weights."""

    def __init__(self, cfg: SLAMConfig):
        self.capacity = cfg.semantic.max_detections
        self._by_stamp: Dict[float, np.ndarray] = {}

    def record(self, stamp: float, boxes: np.ndarray) -> None:
        self._by_stamp[round(float(stamp), 6)] = np.asarray(boxes, np.float32)

    def __call__(self, rgb: np.ndarray,
                 stamp: Optional[float] = None) -> Detections:
        boxes = self._by_stamp.get(round(float(stamp), 6),
                                   np.zeros((0, 4), np.float32)) \
            if stamp is not None else np.zeros((0, 4), np.float32)
        return boxes_to_detections(boxes, self.capacity)
