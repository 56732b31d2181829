"""YOLOv8 model: shape/architecture sanity, decode/NMS correctness on
crafted logits, detector wrapper integration.  Pretrained weights are not
available in this environment (zero egress); the converter is structure-
tested against the documented ultralytics layout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_visual_slam_tpu.config import SLAMConfig
from dynamic_visual_slam_tpu.models import yolov8
from dynamic_visual_slam_tpu.semantic.detector import YoloDetector


@pytest.fixture(scope="module")
def params():
    return yolov8.init_params(jax.random.key(0))


class TestArchitecture:
    def test_forward_shapes(self, params):
        img = jnp.zeros((1, 320, 320, 3), jnp.float32)
        outs = yolov8.forward(params, img)
        assert len(outs) == 3
        for (box, cls), stride in zip(outs, yolov8.STRIDES):
            assert box.shape == (1, 320 // stride, 320 // stride, 64)
            assert cls.shape == (1, 320 // stride, 320 // stride, 80)

    def test_decode_anchor_geometry(self, params):
        """A DFL distribution peaked at bin k must decode to k*stride around
        the anchor center."""
        h = w = 4
        stride_outs = []
        for stride in yolov8.STRIDES:
            box = jnp.full((1, h, w, 4, yolov8.REG_MAX), -20.0)
            box = box.at[..., 2].set(20.0)       # all sides = bin 2
            cls = jnp.full((1, h, w, 80), -10.0)
            stride_outs.append((box.reshape(1, h, w, -1), cls))
        boxes, scores = yolov8.decode(stride_outs)
        b0 = np.asarray(boxes[0])                # first anchor of stride 8
        np.testing.assert_allclose(b0, [(0.5 - 2) * 8, (0.5 - 2) * 8,
                                        (0.5 + 2) * 8, (0.5 + 2) * 8],
                                   atol=1e-3)

    def test_param_count_reasonable(self, params):
        n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)
                if hasattr(p, "shape"))
        # yolov8n ≈ 3.2M params; inference-fused (BN folded) is slightly less
        assert 2.5e6 < n < 4.0e6, n


class TestNMS:
    def test_suppresses_overlaps_keeps_distinct(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60],
                             [0, 0, 10, 10]], jnp.float32)
        cls = jnp.zeros((4, 80)).at[0, 3].set(0.9).at[1, 3].set(0.8) \
            .at[2, 3].set(0.7).at[3, 5].set(0.6)   # box 3 other class
        res = yolov8.nms(boxes, cls, max_out=8, prefilter=4)
        v = np.asarray(res.valid)
        assert v.sum() == 3                        # overlap same-class gone
        kept = np.asarray(res.scores)[v]
        np.testing.assert_allclose(sorted(kept, reverse=True),
                                   [0.9, 0.7, 0.6], atol=1e-6)

    def test_score_threshold(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32)
        cls = jnp.zeros((2, 80)).at[0, 0].set(0.9).at[1, 0].set(0.1)
        res = yolov8.nms(boxes, cls, max_out=4, score_thr=0.25, prefilter=2)
        assert int(np.asarray(res.valid).sum()) == 1


class TestDetectorWrapper:
    def test_end_to_end_shapes(self):
        cfg = SLAMConfig().replace(
            semantic=SLAMConfig().semantic.__class__(input_size=320))
        det = YoloDetector(cfg, seed=0)
        rgb = np.random.default_rng(0).integers(0, 255, (240, 424, 3),
                                                dtype=np.uint8)
        d = det(rgb)
        assert d.boxes.shape == (cfg.semantic.max_detections, 4)
        assert d.category.shape == (cfg.semantic.max_detections,)
        b = np.asarray(d.boxes)
        assert (b >= 0).all() and (b[:, [0, 2]] <= 423).all() \
            and (b[:, [1, 3]] <= 239).all()
        # class ids shifted: 0 reserved for unlabeled (padded slots are 0
        # and masked off)
        m = np.asarray(d.mask)
        assert (np.asarray(d.category)[m] >= 1).all()

    def test_postprocess_dilates_and_persists(self):
        """SemanticConfig.box_margin / persist_frames: a detection is
        dilated by margin × size and keeps being served for persist_frames
        frames after the detector last saw it — the recall<1 leak guard
        the in-loop efficacy eval depends on."""
        import dataclasses as _dc
        base = SLAMConfig()
        # pin the persistence horizon: this test checks the MECHANISM
        # (serve + age-out), not the shipped default — tracking (the r5
        # default mechanism, tested separately below) is disabled so the
        # persist_frames fallback path is the one exercised
        cfg = base.replace(semantic=_dc.replace(base.semantic,
                                                persist_frames=3,
                                                track_ttl_frames=0))
        cap = cfg.semantic.max_detections

        class _Shim:         # _postprocess only reads .cfg and ._recent
            pass
        shim = _Shim()
        shim.cfg = cfg
        shim._recent = []

        boxes = np.zeros((cap, 4), np.float32)
        boxes[0] = [20.0, 20.0, 60.0, 100.0]     # w=40, h=80
        cat = np.full(cap, 1, np.int32)
        score = np.full(cap, 0.9, np.float32)
        valid = np.zeros(cap, bool)
        valid[0] = True
        d1 = YoloDetector._postprocess(shim, boxes, cat, score, valid,
                                       (240, 424))
        m1 = np.asarray(d1.mask)
        assert m1.sum() == 1
        np.testing.assert_allclose(np.asarray(d1.boxes)[0],
                                   [14.0, 8.0, 66.0, 112.0])  # ±15 %
        # two empty frames: the dilated box is still served (persistence)
        none = np.zeros(cap, bool)
        for _ in range(2):
            d = YoloDetector._postprocess(shim, boxes, cat, score, none,
                                          (240, 424))
        assert int(np.asarray(d.mask).sum()) == 1
        np.testing.assert_allclose(np.asarray(d.boxes)[0],
                                   [14.0, 8.0, 66.0, 112.0])
        # third empty frame: the original detection ages out
        d = YoloDetector._postprocess(shim, boxes, cat, score, none,
                                      (240, 424))
        assert int(np.asarray(d.mask).sum()) == 0

    def test_letterbox_geometry(self):
        cfg = SLAMConfig().replace(
            semantic=SLAMConfig().semantic.__class__(input_size=320))
        det = YoloDetector(cfg, seed=0)
        rgb = np.zeros((240, 424, 3), np.uint8)
        canvas, scale, (px, py) = det.letterbox(rgb)
        assert canvas.shape == (320, 320, 3)
        assert abs(scale - 320 / 424) < 1e-6
        assert px == 0 and py == (320 - int(round(240 * scale))) // 2


class TestBoxTracking:
    def test_tracks_coast_through_miss_runs(self):
        """SemanticConfig.track_ttl_frames (the r5 default mechanism — the
        in-process /yolo/tracking equivalent, backend.cpp:183-190): a
        detected box that the detector then MISSES keeps being served,
        extrapolated by its estimated velocity and inflated per stale
        frame, until the TTL expires. This is what bridges the measured
        13-20 frame OOD miss-runs (scripts/ood_eval.py)."""
        import dataclasses as _dc

        import numpy as np

        from dynamic_visual_slam_tpu.config import SLAMConfig
        from dynamic_visual_slam_tpu.semantic.detector import YoloDetector

        base = SLAMConfig()
        cfg = base.replace(semantic=_dc.replace(
            base.semantic, box_margin=0.0, track_ttl_frames=4,
            track_inflate=0.02))
        cap = cfg.semantic.max_detections

        # an uninitialized detector instance: the tracking/postprocess
        # methods only read .cfg and the track state they create
        shim = object.__new__(YoloDetector)
        shim.cfg = cfg
        shim._recent = []

        def feed(box=None):
            boxes = np.zeros((cap, 4), np.float32)
            valid = np.zeros(cap, bool)
            if box is not None:
                boxes[0] = box
                valid[0] = True
            cat = np.full(cap, 1, np.int32)
            score = np.full(cap, 0.9, np.float32)
            return YoloDetector._postprocess(shim, boxes, cat, score,
                                             valid, (240, 424))

        # two frames moving +5 px/frame in x establish the velocity
        feed([20.0, 20.0, 60.0, 100.0])
        d = feed([25.0, 20.0, 65.0, 100.0])
        assert int(np.asarray(d.mask).sum()) == 1
        # detector goes blind: the track coasts at ~+5 px/frame and is
        # still served (inflated), for up to ttl frames
        for k in range(1, 5):
            d = feed(None)
            m = np.asarray(d.mask)
            assert m.sum() == 1, (k, m.sum())
            b = np.asarray(d.boxes)[0]
            cx = (b[0] + b[2]) / 2.0
            # coasted center ≈ 45 + 5k * (velocity EMA fraction)
            assert cx > 45.0 + 1.0 * k, (k, cx)
            assert b[2] - b[0] > 40.0   # inflation keeps it covering
        # TTL expiry: one more blind frame and the track is gone
        d = feed(None)
        assert int(np.asarray(d.mask).sum()) == 0
