"""ctypes bindings for the native runtime (queues, approximate-time sync,
tracer).  Falls back to None when the toolchain is unavailable; callers use
the pure-Python equivalents in pipeline/sync.py in that case."""

from __future__ import annotations

import ctypes
import json
from typing import List, Optional, Tuple


class _SyncPair(ctypes.Structure):
    _fields_ = [("stamp_a", ctypes.c_double),
                ("id_a", ctypes.c_int64),
                ("id_b", ctypes.c_int64)]


class _TraceEvent(ctypes.Structure):
    _fields_ = [("t", ctypes.c_double),
                ("kind", ctypes.c_int32),
                ("tid", ctypes.c_int32),
                ("name", ctypes.c_char * 48)]


_lib = None
_lib_err: Optional[str] = None


def load() -> Optional[ctypes.CDLL]:
    """Load (building on demand) the native library; None on failure."""
    global _lib, _lib_err
    if _lib is not None or _lib_err is not None:
        return _lib
    try:
        from dynamic_visual_slam_tpu.native.build import ensure_built
        path = ensure_built()
        lib = ctypes.CDLL(path)
        lib.dvs_queue_create.restype = ctypes.c_void_p
        lib.dvs_queue_create.argtypes = [ctypes.c_uint64]
        lib.dvs_queue_push.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                       ctypes.POINTER(ctypes.c_uint8),
                                       ctypes.c_uint64]
        lib.dvs_queue_pop.restype = ctypes.c_int64
        lib.dvs_queue_pop.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                      ctypes.POINTER(ctypes.c_double),
                                      ctypes.POINTER(ctypes.c_uint8),
                                      ctypes.c_uint64]
        lib.dvs_queue_size.restype = ctypes.c_uint64
        lib.dvs_queue_size.argtypes = [ctypes.c_void_p]
        lib.dvs_queue_dropped.restype = ctypes.c_uint64
        lib.dvs_queue_dropped.argtypes = [ctypes.c_void_p]
        lib.dvs_queue_close.argtypes = [ctypes.c_void_p]
        lib.dvs_queue_destroy.argtypes = [ctypes.c_void_p]
        lib.dvs_sync_create.restype = ctypes.c_void_p
        lib.dvs_sync_create.argtypes = [ctypes.c_uint64, ctypes.c_double,
                                        ctypes.c_int, ctypes.c_int]
        lib.dvs_sync_push_a.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                        ctypes.c_int64]
        lib.dvs_sync_push_b.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                        ctypes.c_int64]
        lib.dvs_sync_poll.restype = ctypes.c_int64
        lib.dvs_sync_poll.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(_SyncPair),
                                      ctypes.c_int64]
        lib.dvs_sync_destroy.argtypes = [ctypes.c_void_p]
        lib.dvs_trace_create.restype = ctypes.c_void_p
        lib.dvs_trace_create.argtypes = [ctypes.c_uint64]
        lib.dvs_trace_record.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_char_p]
        lib.dvs_trace_dump.restype = ctypes.c_int64
        lib.dvs_trace_dump.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(_TraceEvent),
                                       ctypes.c_int64]
        lib.dvs_trace_destroy.argtypes = [ctypes.c_void_p]
        lib.dvs_now.restype = ctypes.c_double
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        _lib_err = str(e)
    return _lib


def available() -> bool:
    return load() is not None


class NativeQueue:
    """Bounded drop-oldest byte queue (thread-safe, blocking pop)."""

    def __init__(self, depth: int = 30, max_item: int = 1 << 20):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError(f"native runtime unavailable: {_lib_err}")
        self._h = ctypes.c_void_p(self._lib.dvs_queue_create(depth))
        self._buf = (ctypes.c_uint8 * max_item)()

    def push(self, stamp: float, payload: bytes) -> None:
        arr = (ctypes.c_uint8 * len(payload)).from_buffer_copy(payload)
        self._lib.dvs_queue_push(self._h, stamp, arr, len(payload))

    def pop(self, timeout: float = 1.0) -> Optional[Tuple[float, bytes]]:
        stamp = ctypes.c_double()
        n = self._lib.dvs_queue_pop(self._h, timeout, ctypes.byref(stamp),
                                    self._buf, len(self._buf))
        if n < 0:
            return None
        return stamp.value, bytes(self._buf[:n])

    def __len__(self) -> int:
        return int(self._lib.dvs_queue_size(self._h))

    @property
    def dropped(self) -> int:
        return int(self._lib.dvs_queue_dropped(self._h))

    def close(self) -> None:
        self._lib.dvs_queue_close(self._h)

    def __del__(self):
        try:
            self._lib.dvs_queue_destroy(self._h)
        except Exception:
            pass


class NativeSync:
    """Two-stream approximate-time pairing (ids in, matched id pairs out)."""

    def __init__(self, queue_size: int = 10, slop: float = 0.05,
                 b_optional: bool = False, timeout_entries: int = 2):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError(f"native runtime unavailable: {_lib_err}")
        self._h = ctypes.c_void_p(self._lib.dvs_sync_create(
            queue_size, slop, int(b_optional), timeout_entries))
        self._out = (_SyncPair * 64)()

    def push_a(self, stamp: float, ident: int) -> None:
        self._lib.dvs_sync_push_a(self._h, stamp, ident)

    def push_b(self, stamp: float, ident: int) -> None:
        self._lib.dvs_sync_push_b(self._h, stamp, ident)

    def poll(self) -> List[Tuple[float, int, Optional[int]]]:
        n = self._lib.dvs_sync_poll(self._h, self._out, 64)
        return [(p.stamp_a, p.id_a, None if p.id_b < 0 else p.id_b)
                for p in self._out[:n]]

    def __del__(self):
        try:
            self._lib.dvs_sync_destroy(self._h)
        except Exception:
            pass


class NativeTracer:
    """Chrome-trace event recorder backed by the native ring buffer."""

    BEGIN, END, INSTANT = 0, 1, 2

    def __init__(self, capacity: int = 65536):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError(f"native runtime unavailable: {_lib_err}")
        self._h = ctypes.c_void_p(self._lib.dvs_trace_create(capacity))
        self._cap = capacity

    def begin(self, name: str, tid: int = 0) -> None:
        self._lib.dvs_trace_record(self._h, self.BEGIN, tid, name.encode())

    def end(self, name: str, tid: int = 0) -> None:
        self._lib.dvs_trace_record(self._h, self.END, tid, name.encode())

    def instant(self, name: str, tid: int = 0) -> None:
        self._lib.dvs_trace_record(self._h, self.INSTANT, tid, name.encode())

    def span(self, name: str, tid: int = 0):
        tracer = self

        class _Span:
            def __enter__(self):
                tracer.begin(name, tid)

            def __exit__(self, *a):
                tracer.end(name, tid)
        return _Span()

    def dump_chrome_trace(self, path: str) -> int:
        out = (_TraceEvent * self._cap)()
        n = self._lib.dvs_trace_dump(self._h, out, self._cap)
        phases = {0: "B", 1: "E", 2: "i"}
        events = [dict(name=e.name.decode(errors="replace"),
                       ph=phases[e.kind], ts=e.t * 1e6, pid=0, tid=e.tid)
                  for e in out[:n]]
        with open(path, "w") as f:
            json.dump({"traceEvents": events}, f)
        return n

    def __del__(self):
        try:
            self._lib.dvs_trace_destroy(self._h)
        except Exception:
            pass
