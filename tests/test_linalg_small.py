import jax.numpy as jnp
import numpy as np

from dynamic_visual_slam_tpu.ops import linalg_small as ls


def rand_sym(rng, n, batch=()):
    a = rng.normal(size=batch + (n, n)).astype(np.float32)
    return a @ np.swapaxes(a, -2, -1)


class TestSmallestEigvec:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        m = rand_sym(rng, 9, (64,))
        v = np.asarray(ls.smallest_eigvec(jnp.asarray(m)))
        # residual ||Mv - λv|| with λ = vᵀMv must be tiny relative to spectrum
        lam = np.einsum("bi,bij,bj->b", v, m, v)
        res = np.linalg.norm(np.einsum("bij,bj->bi", m, v) - lam[:, None] * v,
                             axis=1)
        w = np.linalg.eigvalsh(m)
        # power iteration converges to the smallest eigenpair
        assert np.median(np.abs(lam - w[:, 0]) / (w[:, -1] + 1e-9)) < 1e-3
        assert np.median(res / (w[:, -1] + 1e-9)) < 1e-3

    def test_nullspace_recovery(self):
        rng = np.random.default_rng(1)
        # rank-deficient: A = B Bᵀ with B (12, 11)
        b = rng.normal(size=(32, 12, 11)).astype(np.float32)
        m = b @ np.swapaxes(b, -2, -1)
        v = np.asarray(ls.smallest_eigvec(jnp.asarray(m)))
        res = np.linalg.norm(np.einsum("bij,bj->bi", m, v), axis=1)
        scale = np.linalg.norm(m, axis=(1, 2))
        assert np.max(res / scale) < 1e-3


class TestEigh3:
    def test_matches_numpy(self):
        rng = np.random.default_rng(2)
        m = rand_sym(rng, 3, (128,))
        vals, vecs = ls.eigh3x3(jnp.asarray(m))
        want_vals = np.linalg.eigvalsh(m)
        np.testing.assert_allclose(np.asarray(vals), want_vals,
                                   rtol=1e-3, atol=1e-3)
        # eigvec property: ||M v - λ v|| small
        mv = np.einsum("bij,bjk->bik", m, np.asarray(vecs))
        lv = np.asarray(vals)[:, None, :] * np.asarray(vecs)
        scale = np.abs(want_vals).max(1)[:, None, None] + 1e-6
        assert np.quantile(np.abs(mv - lv) / scale, 0.99) < 1e-2


class TestSVD3:
    def test_reconstruction(self):
        rng = np.random.default_rng(3)
        m = rng.normal(size=(128, 3, 3)).astype(np.float32)
        u, s, vt = ls.svd3x3(jnp.asarray(m))
        rec = np.einsum("bij,bj,bjk->bik", np.asarray(u), np.asarray(s),
                        np.asarray(vt))
        np.testing.assert_allclose(rec, m, atol=5e-3)
        # singular values match numpy, descending
        want = np.linalg.svd(m, compute_uv=False)
        np.testing.assert_allclose(np.asarray(s), want, rtol=1e-3, atol=1e-3)

    def test_procrustes(self):
        rng = np.random.default_rng(4)
        # noisy rotations in
        from dynamic_visual_slam_tpu.core import lie
        q = lie.quat_normalize(jnp.asarray(rng.normal(size=(64, 4)), jnp.float32))
        r_true = np.asarray(lie.quat_to_mat(q))
        noisy = r_true + rng.normal(size=r_true.shape).astype(np.float32) * 0.02
        r = np.asarray(ls.procrustes_rotation(jnp.asarray(noisy)))
        # proper rotations
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-3)
        err = np.linalg.norm(r - r_true, axis=(1, 2))
        assert np.median(err) < 0.05


class TestSolvePSD:
    def test_matches_numpy(self):
        rng = np.random.default_rng(5)
        a = rand_sym(rng, 6, (32,)) + 0.1 * np.eye(6, dtype=np.float32)
        b = rng.normal(size=(32, 6)).astype(np.float32)
        x = np.asarray(ls.solve_psd(jnp.asarray(a), jnp.asarray(b)))
        want = np.linalg.solve(a, b[..., None])[..., 0]
        np.testing.assert_allclose(x, want, rtol=1e-3, atol=1e-3)
