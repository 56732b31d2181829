import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_visual_slam_tpu.config import SLAMConfig
from dynamic_visual_slam_tpu.core import camera, containers, lie


def rand_quat(rng, n=()):
    q = rng.normal(size=n + (4,)).astype(np.float32)
    return np.asarray(lie.quat_normalize(jnp.asarray(q)))


class TestLie:
    def test_quat_rotate_matches_matrix(self):
        rng = np.random.default_rng(0)
        q = rand_quat(rng, (32,))
        v = rng.normal(size=(32, 3)).astype(np.float32)
        got = lie.quat_rotate(jnp.asarray(q), jnp.asarray(v))
        want = jnp.einsum("nij,nj->ni", lie.quat_to_mat(jnp.asarray(q)), jnp.asarray(v))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_mat_quat_roundtrip(self):
        rng = np.random.default_rng(1)
        q = rand_quat(rng, (64,))
        q2 = lie.mat_to_quat(lie.quat_to_mat(jnp.asarray(q)))
        np.testing.assert_allclose(np.abs(np.sum(q * np.asarray(q2), -1)), 1.0, atol=1e-4)

    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(2)
        phi = rng.normal(size=(32, 3)).astype(np.float32) * 0.5
        phi2 = lie.so3_log(lie.so3_exp(jnp.asarray(phi)))
        np.testing.assert_allclose(phi2, phi, atol=1e-4)

    def test_exp_small_angle(self):
        phi = jnp.array([1e-10, 0.0, 0.0])
        q = lie.so3_exp(phi)
        np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-7)

    def test_se3_inverse_compose(self):
        rng = np.random.default_rng(3)
        q = jnp.asarray(rand_quat(rng))
        t = jnp.asarray(rng.normal(size=3).astype(np.float32))
        qi, ti = lie.se3_inverse(q, t)
        qc, tc = lie.se3_compose(q, t, qi, ti)
        np.testing.assert_allclose(np.abs(qc[0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(tc, 0.0, atol=1e-5)

    def test_optical_to_ros_involution(self):
        # C is orthonormal: converting R twice by C then C^T returns R
        rng = np.random.default_rng(4)
        r = np.asarray(lie.quat_to_mat(jnp.asarray(rand_quat(rng))))
        r2 = lie.optical_to_ros_rotation(jnp.asarray(r))
        c = np.asarray(lie.OPTICAL_TO_ROS)
        np.testing.assert_allclose(np.asarray(r2), c @ r @ c.T, atol=1e-6)
        # z-forward optical maps to x-forward ROS
        np.testing.assert_allclose(lie.optical_to_ros_point(jnp.array([0.0, 0, 1])),
                                   [1, 0, 0], atol=1e-6)


class TestCamera:
    def setup_method(self):
        self.k = camera.Intrinsics.from_config(SLAMConfig().camera)

    def test_project_backproject_roundtrip(self):
        rng = np.random.default_rng(5)
        uv = jnp.asarray(rng.uniform(0, 600, size=(100, 2)).astype(np.float32))
        d = jnp.asarray(rng.uniform(0.5, 3.0, size=100).astype(np.float32))
        xyz = camera.backproject(self.k, uv, d)
        uv2 = camera.project(self.k, xyz)
        np.testing.assert_allclose(uv2, uv, atol=1e-3)

    def test_world_camera_roundtrip(self):
        rng = np.random.default_rng(6)
        q = jnp.asarray(rand_quat(rng))
        t = jnp.asarray(rng.normal(size=3).astype(np.float32))
        xw = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        xc = camera.world_to_camera(q, t, xw)
        xw2 = camera.camera_to_world(q, t, xc)
        np.testing.assert_allclose(xw2, xw, atol=1e-5)


class TestContainers:
    def test_masked_topk(self):
        scores = jnp.array([5.0, 3.0, 9.0, 1.0])
        mask = jnp.array([True, True, False, True])
        idx, valid = containers.masked_topk(scores, mask, 3)
        assert list(idx) == [0, 1, 3]
        assert valid.all()
        idx, valid = containers.masked_topk(scores, mask, 4)
        assert not bool(valid[3])

    def test_compress_to_capacity(self):
        vals = jnp.arange(6)
        mask = jnp.array([False, True, False, True, True, False])
        out, m = containers.compress_to_capacity(vals, mask, 4, fill=-1)
        assert list(out) == [1, 3, 4, -1]
        assert list(m) == [True, True, True, False]

    def test_scatter_set_drops_invalid(self):
        arr = jnp.zeros(4)
        out = containers.scatter_set(arr, jnp.array([1, 2]), jnp.array([5.0, 7.0]),
                                     jnp.array([True, False]))
        assert list(out) == [0.0, 5.0, 0.0, 0.0]


class TestConfig:
    def test_roundtrip(self):
        c = SLAMConfig()
        c2 = SLAMConfig.from_json(c.to_json())
        assert c == c2

    def test_presets(self):
        assert SLAMConfig.preset("tum_fr3").camera.width == 640
        assert SLAMConfig.preset("yolo_slam").semantic.filtered_classes == ("person",)
        with pytest.raises(ValueError):
            SLAMConfig.preset("nope")

    def test_reference_defaults(self):
        c = SLAMConfig()
        assert c.orb.n_features == 1000 and c.orb.n_levels == 8
        assert c.match.max_hamming == 50
        assert c.ba.huber_delta == 1.345
        assert c.prune.min_observations == 2


class TestSortFreeTopK:
    """The sort replacements on the per-frame critical path must select the
    same SET as jax.lax.top_k for integer-valued scores (FAST responses)."""

    def test_topk_mask_int_matches_top_k(self):
        rng = np.random.default_rng(7)
        for trial in range(20):
            n = 256
            k = int(rng.integers(1, 200))
            scores = rng.integers(0, 256, n).astype(np.float32)
            valid = rng.random(n) < rng.uniform(0.05, 1.0)
            mask = np.asarray(containers.topk_mask_int(
                jnp.asarray(scores), jnp.asarray(valid), k))
            n_valid = int(valid.sum())
            assert mask.sum() == min(k, n_valid), (trial, k, n_valid)
            assert not (mask & ~valid).any()
            # reference: top_k over masked scores (ties → lower index)
            s = np.where(valid, scores, -1.0)
            ref_idx = np.argsort(-s, kind="stable")[:min(k, n_valid)]
            ref = np.zeros(n, bool)
            ref[ref_idx] = True
            np.testing.assert_array_equal(mask, ref)

    def test_topk_per_cell_matches_top_k(self):
        from dynamic_visual_slam_tpu.frontend.orb import _topk_per_cell
        rng = np.random.default_rng(3)
        tiles = rng.integers(1, 256, (40, 77)).astype(np.float32)
        tiles[rng.random((40, 77)) < 0.8] = -np.inf   # sparse valid peaks
        tiles[5] = -np.inf                             # an empty cell
        vals, idxs = jax.jit(lambda t: _topk_per_cell(t, 8))(
            jnp.asarray(tiles))
        rv, ri = jax.lax.top_k(jnp.asarray(tiles), 8)
        np.testing.assert_array_equal(np.asarray(vals), np.asarray(rv))
        got_i, ref_i = np.asarray(idxs), np.asarray(ri)
        finite = np.isfinite(np.asarray(vals))
        np.testing.assert_array_equal(got_i[finite], ref_i[finite])


def test_eight_cpu_devices():
    assert len(jax.devices()) == 8
