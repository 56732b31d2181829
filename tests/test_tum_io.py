"""TUM RGB-D dataset reader on a synthetic TUM-format directory (the
bag-playback path, exercised end-to-end through the CLI)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dynamic_visual_slam_tpu import cli
from dynamic_visual_slam_tpu.config import CameraConfig
from dynamic_visual_slam_tpu.io import synthetic, tum


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    """Render a synthetic sequence into TUM RGB-D directory format."""
    root = tmp_path_factory.mktemp("tum_seq")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    cam = CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                       cx=79.5, cy=59.5)
    rgb_lines, depth_lines, gt_lines = [], [], []
    for gray, depth, r, t, ts in synthetic.generate_sequence(cam, 12, seed=21):
        stamp = f"{1000 + ts:.6f}"
        cv2.imwrite(str(root / "rgb" / f"{stamp}.png"),
                    np.stack([gray.astype(np.uint8)] * 3, -1))
        d16 = np.clip(depth / tum.TUM_DEPTH_SCALE, 0, 65535).astype(np.uint16)
        cv2.imwrite(str(root / "depth" / f"{stamp}.png"), d16)
        rgb_lines.append(f"{stamp} rgb/{stamp}.png")
        depth_lines.append(f"{stamp} depth/{stamp}.png")
        from dynamic_visual_slam_tpu.io.trajectory import quat_from_mat
        q = quat_from_mat(r)
        gt_lines.append(f"{stamp} {t[0]} {t[1]} {t[2]} "
                        f"{q[0]} {q[1]} {q[2]} {q[3]}")
    (root / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("# depth\n" + "\n".join(depth_lines) + "\n")
    (root / "groundtruth.txt").write_text("# gt\n" + "\n".join(gt_lines) + "\n")
    return str(root), cam


class TestTUMReader:
    def test_association_and_frames(self, tum_dir):
        root, cam = tum_dir
        ds = tum.TUMDataset(root)
        assert len(ds) == 12
        frames = list(ds.frames(limit=3))
        gray, depth, ts = frames[0]
        assert gray.shape == (120, 160) and depth.shape == (120, 160)
        assert gray.dtype == np.float32
        # depth decodes back to metres
        assert 0.3 < np.median(depth[depth > 0]) < 3.5
        assert abs(ts - 1000.0) < 1e-3

    def test_groundtruth_interpolation(self, tum_dir):
        root, _ = tum_dir
        ds = tum.TUMDataset(root)
        pos = ds.gt_positions_at(np.asarray([1000.0, 1000.1]))
        assert pos.shape == (2, 3)
        assert np.isfinite(pos).all()

    @pytest.mark.slow
    def test_cli_runs_on_tum_dir(self, tum_dir, tmp_path):
        root, cam = tum_dir
        out = str(tmp_path / "out")
        rc = cli.main(["run", "--source", root, "--frames", "8",
                       "--width", str(cam.width), "--height", str(cam.height),
                       "--out-dir", out])
        assert rc == 0
        stats = json.load(open(os.path.join(out, "stats.json")))
        assert stats["frames"] == 8
        assert "ate_rmse_m" in stats       # groundtruth.txt picked up
        assert stats["ate_rmse_m"] < 0.2
