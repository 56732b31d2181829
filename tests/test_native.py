"""Native runtime (C++ queues / approximate-time sync / tracer) through the
ctypes surface, including cross-thread behavior and parity with the Python
sync policy."""

import json
import os
import threading
import time

import pytest

from dynamic_visual_slam_tpu import native
from dynamic_visual_slam_tpu.pipeline.sync import ApproximateTimeSync

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


class TestNativeQueue:
    def test_push_pop_roundtrip(self):
        q = native.NativeQueue(depth=4)
        q.push(1.5, b"hello")
        out = q.pop(timeout=0.5)
        assert out == (1.5, b"hello")

    def test_drop_oldest(self):
        q = native.NativeQueue(depth=2)
        for i in range(4):
            q.push(float(i), bytes([i]))
        assert q.dropped == 2
        assert q.pop(0.2)[1] == bytes([2])

    def test_pop_timeout(self):
        q = native.NativeQueue(depth=2)
        t0 = time.time()
        assert q.pop(timeout=0.15) is None
        assert 0.1 < time.time() - t0 < 1.0

    def test_cross_thread(self):
        q = native.NativeQueue(depth=8)
        got = []

        def consumer():
            for _ in range(10):
                item = q.pop(timeout=2.0)
                if item:
                    got.append(item)

        t = threading.Thread(target=consumer)
        t.start()
        for i in range(10):
            q.push(i * 0.1, f"frame{i}".encode())
            time.sleep(0.002)
        t.join()
        assert len(got) == 10
        assert got[0][1] == b"frame0" and got[-1][1] == b"frame9"


class TestNativeSync:
    def test_matches_python_policy(self):
        """Same push sequence through both implementations → same pairs."""
        seq = [("a", 1.00, 0), ("b", 1.02, 100), ("a", 1.05, 1),
               ("b", 1.30, 101), ("a", 1.31, 2), ("a", 1.40, 3),
               ("a", 1.55, 4), ("b", 1.56, 102)]
        ns = native.NativeSync(slop=0.05, b_optional=True)
        ps = ApproximateTimeSync(slop=0.05, b_optional=True)
        n_out, p_out = [], []
        payloads = {}
        for kind, stamp, ident in seq:
            if kind == "a":
                ns.push_a(stamp, ident)
                ps.push_a(stamp, ident)
            else:
                ns.push_b(stamp, ident)
                ps.push_b(stamp, ident)
            n_out += ns.poll()
            p_out += [(s, a, b) for s, a, b in ps.poll()]
        assert n_out == p_out, (n_out, p_out)
        # at least one matched pair and one emitted-alone
        assert any(b is not None for _, _, b in n_out)
        assert any(b is None for _, _, b in n_out)

    def test_mandatory_b_waits(self):
        ns = native.NativeSync(slop=0.05, b_optional=False)
        ns.push_a(1.0, 0)
        ns.push_b(9.0, 5)
        assert ns.poll() == []


class TestNativeTracer:
    def test_spans_dump_chrome_trace(self, tmp_path):
        tr = native.NativeTracer(capacity=128)
        with tr.span("track"):
            time.sleep(0.001)
            with tr.span("orb", tid=1):
                pass
        tr.instant("keyframe")
        path = str(tmp_path / "trace.json")
        n = tr.dump_chrome_trace(path)
        assert n == 5
        data = json.load(open(path))
        names = [e["name"] for e in data["traceEvents"]]
        assert names.count("track") == 2 and names.count("orb") == 2
        phases = {e["ph"] for e in data["traceEvents"]}
        assert phases == {"B", "E", "i"}
