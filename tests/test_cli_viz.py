"""CLI run command end-to-end (launch-file equivalent) + visualization
exports + profiling utils."""

import json
import os

import numpy as np
import pytest

from dynamic_visual_slam_tpu import cli
from dynamic_visual_slam_tpu.utils import profiling, viz


class TestCLI:
    @pytest.mark.slow
    def test_run_synthetic_writes_outputs(self, tmp_path):
        out = str(tmp_path / "out")
        rc = cli.main(["run", "--frames", "10", "--width", "160",
                       "--height", "120", "--out-dir", out, "--seed", "3"])
        assert rc == 0
        stats = json.load(open(os.path.join(out, "stats.json")))
        assert stats["frames"] == 10
        assert stats["keyframes"] >= 2
        assert "ate_rmse_m" in stats
        for f in ("frontend.tum", "keyframes.tum", "landmarks.ply",
                  "trajectory.ply"):
            assert os.path.getsize(os.path.join(out, f)) > 0
        # trajectory file parses back
        from dynamic_visual_slam_tpu.io.trajectory import read_tum
        stamps, txyz = read_tum(os.path.join(out, "frontend.tum"))
        assert len(stamps) == 10

    def test_info_prints_config(self, capsys):
        rc = cli.main(["info", "--preset", "tum_fr3"])
        assert rc == 0
        cfg = json.loads(capsys.readouterr().out)
        assert cfg["camera"]["width"] == 640


class TestViz:
    def test_annotate_features(self):
        gray = np.zeros((60, 80), np.float32)
        uv = np.asarray([[10.0, 10.0], [40.0, 30.0], [70.0, 50.0]])
        img = viz.annotate_features(gray, uv, np.asarray([True, False, True]))
        assert img.shape == (60, 80, 3)
        assert img.sum() > 0                     # circles drawn
        # non-inlier location untouched
        assert img[30, 40].tolist() == [0, 0, 0]

    def test_landmark_ply_roundtrip(self, tmp_path):
        path = str(tmp_path / "lm.ply")
        xyz = np.asarray([[0.0, 0.0, 2.0], [1.0, 0.5, 3.0]])
        viz.landmarks_to_ply(path, xyz, np.asarray([1, 3]))
        lines = open(path).read().splitlines()
        assert lines[0] == "ply"
        assert "element vertex 2" in lines[2]
        body = [l.split() for l in lines[-2:]]
        # colors: first single-obs green, second multi-obs cyan
        assert body[0][3:] == ["0", "255", "0"]
        assert body[1][3:] == ["0", "255", "255"]
        # optical→ROS: z-forward 2.0 becomes x-forward 2.0
        assert abs(float(body[0][0]) - 2.0) < 1e-4

    def test_trajectory_ply(self, tmp_path):
        path = str(tmp_path / "tr.ply")
        viz.trajectory_to_ply(path, np.zeros((5, 3)))
        content = open(path).read()
        assert "element vertex 5" in content and "element edge 4" in content


class TestProfiling:
    def test_stage_timer(self):
        t = profiling.StageTimer()
        with t.stage("a"):
            pass
        with t.stage("a"):
            pass
        s = t.summary()
        assert s["a"]["count"] == 2 and s["a"]["ema_ms"] >= 0


class TestLiveView:
    def test_serve_endpoints(self):
        """The --serve operator view (utils/serve.LiveView — the RViz-loop
        equivalent, SURVEY.md C9): page, JPEG frame, stats, and map all
        served from the snapshot the pipeline publishes."""
        import json as _json
        import urllib.request

        from dynamic_visual_slam_tpu.utils.serve import LiveView

        lv = LiveView(port=0)    # ephemeral port
        try:
            gray = (np.random.default_rng(0).uniform(0, 255, (60, 80))
                    ).astype(np.uint8)
            uv = np.asarray([[10.0, 12.0], [40.0, 30.0]])
            lv.update(gray, uv,
                      dict(frames=7, keyframes=2),
                      traj_xyz=np.asarray([[0, 0, 0], [0.1, 0, 0.2]]),
                      landmarks_xyz=np.asarray([[1.0, 0.0, 2.0]]))
            base = f"http://127.0.0.1:{lv.port}"
            page = urllib.request.urlopen(base + "/", timeout=5).read()
            assert b"live view" in page
            st = _json.loads(urllib.request.urlopen(
                base + "/stats.json", timeout=5).read())
            assert st["frames"] == 7 and st["keyframes"] == 2
            mp = _json.loads(urllib.request.urlopen(
                base + "/map.json", timeout=5).read())
            assert mp["trajectory_xz"] == [[0.0, 0.0], [0.1, 0.2]]
            assert mp["landmarks_xz"] == [[1.0, 2.0]]
            fr = urllib.request.urlopen(base + "/frame.jpg", timeout=5)
            body = fr.read()
            assert fr.headers["Content-Type"] == "image/jpeg"
            assert body[:2] == b"\xff\xd8"    # JPEG SOI
        finally:
            lv.close()
