"""Keyframe wire format — the Keyframe.msg serialization contract (C5).

The reference ships keyframes between processes as DDS-serialized
Keyframe.msg (header + frame id + Transform pose + parallel landmark/
observation arrays with 32-byte ORB descriptors,
dynamic_visual_slam_interfaces/msg/Keyframe.msg).  In-process the rebuild
passes device pytrees directly; for multi-process or logging deployments
this module gives KeyframeBlock a compact, versioned byte encoding suitable
for the native bounded queues (native.NativeQueue carries (stamp, bytes)).

Layout (little-endian):
    magic  u32 = 0x4B46_5631 ("KFV1")
    frame_idx i32, timestamp f32
    q_wc 4*f32, t_wc 3*f32
    n u32 — number of VALID observations (compacted)
    uv        n*2*f32
    xyz_w     n*3*f32
    response  n*f32
    desc      n*32*u8  (packed OpenCV layout, Observation.msg's uint8[])
"""

from __future__ import annotations

import struct

import numpy as np

from dynamic_visual_slam_tpu.frontend.tracker import KeyframeBlock

MAGIC = 0x4B465631


def encode(kf: KeyframeBlock) -> bytes:
    m = np.asarray(kf.mask)
    uv = np.asarray(kf.uv, np.float32)[m]
    xyz = np.asarray(kf.xyz_w, np.float32)[m]
    resp = np.asarray(kf.response, np.float32)[m]
    desc = np.asarray(kf.desc_packed, np.uint8)[m]
    n = len(uv)
    head = struct.pack("<Iif4f3fI", MAGIC, int(kf.frame_idx),
                       float(kf.timestamp),
                       *np.asarray(kf.q_wc, np.float32).tolist(),
                       *np.asarray(kf.t_wc, np.float32).tolist(), n)
    return head + uv.tobytes() + xyz.tobytes() + resp.tobytes() + desc.tobytes()


def decode(buf: bytes, capacity: int) -> KeyframeBlock:
    """→ KeyframeBlock with the given fixed capacity (padded + masked)."""
    import jax.numpy as jnp

    from dynamic_visual_slam_tpu.ops.hamming import unpack_bits

    head_fmt = "<Iif4f3fI"
    head_size = struct.calcsize(head_fmt)
    vals = struct.unpack(head_fmt, buf[:head_size])
    if vals[0] != MAGIC:
        raise ValueError(f"bad keyframe magic 0x{vals[0]:08x}")
    frame_idx, ts = vals[1], vals[2]
    q = np.asarray(vals[3:7], np.float32)
    t = np.asarray(vals[7:10], np.float32)
    n = vals[10]
    off = head_size
    uv = np.frombuffer(buf, np.float32, n * 2, off).reshape(n, 2)
    off += n * 8
    xyz = np.frombuffer(buf, np.float32, n * 3, off).reshape(n, 3)
    off += n * 12
    resp = np.frombuffer(buf, np.float32, n, off)
    off += n * 4
    desc = np.frombuffer(buf, np.uint8, n * 32, off).reshape(n, 32)

    def pad(a, fill=0):
        out = np.full((capacity,) + a.shape[1:], fill, a.dtype)
        out[:min(n, capacity)] = a[:capacity]
        return jnp.asarray(out)

    packed = pad(desc)
    return KeyframeBlock(
        q_wc=jnp.asarray(q), t_wc=jnp.asarray(t),
        uv=pad(uv), xyz_w=pad(xyz),
        desc_bits=unpack_bits(packed).astype(jnp.uint8),
        desc_packed=packed, response=pad(resp),
        mask=jnp.arange(capacity) < n,
        frame_idx=jnp.asarray(frame_idx, jnp.int32),
        timestamp=jnp.asarray(ts, jnp.float32))
