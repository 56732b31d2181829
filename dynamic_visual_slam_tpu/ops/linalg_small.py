"""Small-matrix linear algebra that maps well to TPU.

XLA lowers jnp.linalg.{svd,eigh,qr} on TPU to sequential LAPACK-style loops —
catastrophic for RANSAC's thousands of tiny decompositions.  These
replacements are branch-free, fully batched, and made of plain VPU/MXU ops:

- smallest_eigvec: shifted power iteration for the null/smallest eigenvector
  of small symmetric PSD systems (the 8-point and DLT nullspaces);
- eigh3x3 / svd3x3: closed-form symmetric 3x3 eigendecomposition
  (trigonometric Cardano) + SVD built from it (for rank-2 projection of F
  and Procrustes orthogonalization in PnP).

All functions accept arbitrary leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def smallest_eigvec(m: jnp.ndarray, squarings: int = 8) -> jnp.ndarray:
    """Smallest-eigenvalue unit eigenvector of symmetric PSD m (..., n, n).

    Power method on B = (λ_max I − M) accelerated by repeated squaring:
    k squarings ⇒ B^(2^k) in k batched matmuls, i.e. 2^k effective power
    steps (256 for the default) — pure MXU work, no LAPACK loops.
    Frobenius renormalization at each squaring keeps f32 in range.
    """
    n = m.shape[-1]
    shift = jnp.trace(m, axis1=-2, axis2=-1)[..., None, None]
    b = shift * jnp.eye(n, dtype=m.dtype) - m
    for _ in range(squarings):
        b = b / jnp.maximum(
            jnp.linalg.norm(b, axis=(-2, -1), keepdims=True), 1e-30)
        b = b @ b
    v = jnp.ones(m.shape[:-2] + (n, 1), m.dtype) \
        + 0.1 * jnp.arange(n, dtype=m.dtype)[:, None]
    v = b @ (b @ v)
    nrm = jnp.linalg.norm(v, axis=-2, keepdims=True)
    # if the start vector was (numerically) orthogonal to the target, retry
    # with a different deterministic vector
    v2 = b @ (b @ jnp.cos(jnp.arange(n, dtype=m.dtype))[:, None])
    v = jnp.where(nrm > 1e-25, v, v2)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-2, keepdims=True), 1e-30)
    v = v[..., 0]
    # polish with two inverse-iteration steps: f32 matmul squaring tops out
    # around 5e-3 vector error; (M + εI)⁻¹ application via unrolled
    # Gauss-Jordan squeezes that to ~1e-6 without any LAPACK loop
    eps = 1e-7 * shift[..., 0, 0] + 1e-30
    for _ in range(2):
        v = solve_psd(m + eps[..., None, None] * jnp.eye(n, dtype=m.dtype), v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    return v


def _offdiag_norm(m):
    n = m.shape[-1]
    mask = 1.0 - jnp.eye(n, dtype=m.dtype)
    return jnp.sqrt(jnp.sum((m * mask) ** 2, axis=(-2, -1)))


def eigh3x3(a: jnp.ndarray):
    """Symmetric (...,3,3) → (eigvals ascending (...,3), eigvecs (...,3,3)
    columns).  Closed-form eigenvalues (Cardano/trigonometric); eigenvectors
    via cross products of shifted rows, branch-free with degeneracy fallback.
    """
    dtype = a.dtype
    a = a.astype(jnp.float32)
    q = jnp.trace(a, axis1=-2, axis2=-1) / 3.0
    b = a - q[..., None, None] * jnp.eye(3, dtype=a.dtype)
    p2 = jnp.sum(b * b, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detb = jnp.linalg.det(b)
    r = detb / (2.0 * jnp.maximum(p, 1e-30) ** 3)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)                       # largest
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    e2 = 3.0 * q - e1 - e3
    vals = jnp.stack([e3, e2, e1], axis=-1)               # ascending

    def eigvec(ev):
        # rows of (a - ev I) span the orthogonal complement of the eigvec;
        # the largest cross product of two rows is the eigvec
        m = a - ev[..., None, None] * jnp.eye(3, dtype=a.dtype)
        c01 = jnp.cross(m[..., 0, :], m[..., 1, :])
        c02 = jnp.cross(m[..., 0, :], m[..., 2, :])
        c12 = jnp.cross(m[..., 1, :], m[..., 2, :])
        cands = jnp.stack([c01, c02, c12], axis=-2)       # (...,3cand,3)
        norms = jnp.sum(cands * cands, axis=-1)
        best = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(
            cands, best[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
        nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
        # degenerate (repeated eigenvalue): fall back to any unit vector
        # orthogonalized later by the caller's use
        fallback = jnp.broadcast_to(
            jnp.array([1.0, 0.0, 0.0], a.dtype), v.shape)
        return jnp.where(nrm > 1e-20, v / jnp.maximum(nrm, 1e-30), fallback)

    v1 = eigvec(e3)
    v3 = eigvec(e1)
    # middle eigenvector: orthogonality beats a third cross-product solve
    v2 = jnp.cross(v3, v1)
    v2 = v2 / jnp.maximum(jnp.linalg.norm(v2, axis=-1, keepdims=True), 1e-30)
    vecs = jnp.stack([v1, v2, v3], axis=-1)               # columns
    return vals.astype(dtype), vecs.astype(dtype)


def svd3x3(m: jnp.ndarray):
    """(...,3,3) → (u, s, vt) with s descending, u/vt proper for Procrustes
    use.  Built on eigh3x3(mᵀm); u columns recovered as m v / σ with a
    Gram-Schmidt fallback for (near-)zero singular values."""
    mtm = jnp.einsum("...ji,...jk->...ik", m, m)
    vals, v = eigh3x3(mtm)                        # ascending
    s = jnp.sqrt(jnp.maximum(vals[..., ::-1], 0.0))  # descending
    v = v[..., ::-1]                              # matching column order
    u_raw = jnp.einsum("...ij,...jk->...ik", m, v)
    # normalize columns; for tiny σ rebuild via cross product (rank-2 case)
    nrm = jnp.linalg.norm(u_raw, axis=-2, keepdims=True)
    u = u_raw / jnp.maximum(nrm, 1e-30)
    u2 = jnp.cross(u[..., :, 0], u[..., :, 1])
    u_fixed_col2 = jnp.where((nrm[..., 0, 2:3] > 1e-12), u[..., :, 2], u2)
    u = jnp.concatenate([u[..., :, :2], u_fixed_col2[..., :, None]], axis=-1)
    return u, s, jnp.swapaxes(v, -2, -1)


def procrustes_rotation(m: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation matrix to m (...,3,3): U diag(1,1,det(UVᵀ)) Vᵀ."""
    u, _, vt = svd3x3(m)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", u, vt))
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    return jnp.einsum("...ij,...j,...jk->...ik", u, d, vt)


def solve_psd(a: jnp.ndarray, b: jnp.ndarray, damping: float = 0.0,
              refine: int = 0) -> jnp.ndarray:
    """Cholesky-free solve for small symmetric positive-definite systems via
    unrolled Gauss-Jordan elimination (pivot-free — fine for PSD, like
    Cholesky).  For the 6x6 Gauss-Newton systems this stays on the VPU.

    refine > 0 adds rounds of iterative refinement (x += solve(a, b − a x)),
    recovering ~f64-quality solutions from the f32 elimination on the
    ill-conditioned Schur systems BA produces (cond ~1e5-1e6).

    a: (..., n, n), b: (..., n) → (..., n).
    """
    n = a.shape[-1]
    if damping:
        a = a + damping * jnp.eye(n, dtype=a.dtype)

    def gj(rhs):
        aug = jnp.concatenate([a, rhs[..., None]], axis=-1)  # (..., n, n+1)
        for i in range(n):
            piv = aug[..., i, i:i + 1]
            piv = jnp.where(jnp.abs(piv) < 1e-20, 1e-20, piv)
            row = aug[..., i, :] / piv
            factors = aug[..., :, i:i + 1]
            aug = aug - factors * row[..., None, :]
            aug = aug.at[..., i, :].set(row)
        return aug[..., :, -1]

    x = gj(b)
    for _ in range(refine):
        resid = b - jnp.einsum("...ij,...j->...i", a, x)
        x = x + gj(resid)
    return x
