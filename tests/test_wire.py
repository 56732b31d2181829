"""Keyframe wire format: encode/decode roundtrip, including through the
native C++ queue (the process-boundary path, Keyframe.msg equivalent)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_visual_slam_tpu import native
from dynamic_visual_slam_tpu.frontend.tracker import KeyframeBlock
from dynamic_visual_slam_tpu.ops.hamming import pack_bits
from dynamic_visual_slam_tpu.pipeline import wire


def make_kf(n_valid=50, cap=128, seed=0):
    rng = np.random.default_rng(seed)
    bits = (rng.random((cap, 256)) < 0.5).astype(np.uint8)
    return KeyframeBlock(
        q_wc=jnp.asarray([0.9, 0.1, 0.2, 0.38], jnp.float32),
        t_wc=jnp.asarray([1.0, -2.0, 0.5], jnp.float32),
        uv=jnp.asarray(rng.uniform(0, 640, (cap, 2)).astype(np.float32)),
        xyz_w=jnp.asarray(rng.normal(size=(cap, 3)).astype(np.float32)),
        desc_bits=jnp.asarray(bits),
        desc_packed=pack_bits(jnp.asarray(bits)),
        response=jnp.asarray(rng.uniform(0, 100, cap).astype(np.float32)),
        mask=jnp.arange(cap) < n_valid,
        frame_idx=jnp.asarray(42, jnp.int32),
        timestamp=jnp.asarray(1.25, jnp.float32))


class TestWire:
    def test_roundtrip(self):
        kf = make_kf()
        buf = wire.encode(kf)
        kf2 = wire.decode(buf, capacity=128)
        assert int(kf2.frame_idx) == 42
        assert float(kf2.timestamp) == 1.25
        np.testing.assert_allclose(kf2.q_wc, kf.q_wc, atol=1e-6)
        m = np.asarray(kf.mask)
        np.testing.assert_allclose(np.asarray(kf2.uv)[:50],
                                   np.asarray(kf.uv)[m], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(kf2.desc_packed)[:50],
                                      np.asarray(kf.desc_packed)[m])
        np.testing.assert_array_equal(np.asarray(kf2.desc_bits)[:50],
                                      np.asarray(kf.desc_bits)[m])
        assert int(kf2.mask.sum()) == 50

    def test_truncation_to_capacity(self):
        kf = make_kf(n_valid=100)
        kf2 = wire.decode(wire.encode(kf), capacity=64)
        assert int(kf2.mask.sum()) == 64

    def test_bad_magic_rejected(self):
        with pytest.raises(ValueError, match="magic"):
            wire.decode(b"\x00" * 64, capacity=8)

    @pytest.mark.skipif(not native.available(), reason="no native toolchain")
    def test_through_native_queue(self):
        q = native.NativeQueue(depth=4)
        kf = make_kf(seed=3)
        q.push(float(kf.timestamp), wire.encode(kf))
        stamp, payload = q.pop(timeout=1.0)
        kf2 = wire.decode(payload, capacity=128)
        assert stamp == 1.25
        np.testing.assert_allclose(np.asarray(kf2.xyz_w)[:50],
                                   np.asarray(kf.xyz_w)[np.asarray(kf.mask)],
                                   atol=1e-6)
