"""Batched 2x2 / 3x3 SVD and polar decomposition, pure JAX.

The reference gets SVD/polar from the taichi math library (used by every
plasticity return map, ``/root/reference/src/particles.cpp:222-242,639-647``).
LAPACK-style SVD is a poor fit for a per-particle inner loop on TPU, so this
module implements the graphics-standard *rotation-variant* SVD, fully
vectorized over a leading batch:

    F = U @ diag(sigma) @ V.T,  U, V in SO(d) (det = +1),
    sigma[0] >= sigma[1] >= |sigma[d-1]|,
    sign(sigma[d-1]) = sign(det F).

Built from a fixed-sweep cyclic Jacobi eigensolver on F^T F (unrolled —
no data-dependent control flow, so it vectorizes onto the VPU), followed
by a Gram-Schmidt construction of U with degenerate-case fallbacks.

All functions accept arrays shaped (..., d, d) and are vmap/jit friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from taichi_mpm_tpu.utils import mm

_EPS = 1e-20


def _normalize(v, eps=1e-12):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps), n[..., 0]


# ---------------------------------------------------------------------------
# 3x3
# ---------------------------------------------------------------------------

_JACOBI_PAIRS = ((0, 1), (0, 2), (1, 2))


def _jacobi_rotation(app, aqq, apq):
    """Givens rotation (c, s) annihilating the (p, q) entry."""
    safe_apq = jnp.where(jnp.abs(apq) < _EPS, 1.0, apq)
    tau = (aqq - app) / (2.0 * safe_apq)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0.0, 1.0, t)
    c = jax.lax.rsqrt(1.0 + t * t)
    s = t * c
    trivial = jnp.abs(apq) < _EPS
    c = jnp.where(trivial, 1.0, c)
    s = jnp.where(trivial, 0.0, s)
    return c, s


def _symmetric_eig3(A, sweeps: int = 6):
    """Eigendecomposition of a batched symmetric 3x3 via cyclic Jacobi.

    Represented as 6 unique entries + 3 eigenvector columns; each rotation
    is a handful of fused elementwise ops (VPU-friendly, no matmuls, no
    matmul-precision loss). Returns (eigvals (...,3), eigvecs (...,3,3)
    with columns as vectors), unsorted.
    """
    a = {
        (0, 0): A[..., 0, 0],
        (1, 1): A[..., 1, 1],
        (2, 2): A[..., 2, 2],
        (0, 1): A[..., 0, 1],
        (0, 2): A[..., 0, 2],
        (1, 2): A[..., 1, 2],
    }

    def get(i, j):
        return a[(i, j)] if (i, j) in a else a[(j, i)]

    ones = jnp.ones_like(a[(0, 0)])
    zeros = jnp.zeros_like(ones)
    # V columns: vcol[k][i] = V[i, k]
    vcol = [
        [ones, zeros, zeros],
        [zeros, ones, zeros],
        [zeros, zeros, ones],
    ]

    for _ in range(sweeps):
        for (p, q) in _JACOBI_PAIRS:
            r = 3 - p - q  # the untouched index
            app, aqq, apq = get(p, p), get(q, q), get(p, q)
            c, s = _jacobi_rotation(app, aqq, apq)
            arp, arq = get(r, p), get(r, q)
            cc, ss, cs = c * c, s * s, c * s
            a[(p, p)] = cc * app - 2.0 * cs * apq + ss * aqq
            a[(q, q)] = ss * app + 2.0 * cs * apq + cc * aqq
            a[(p, q) if (p, q) in a else (q, p)] = zeros
            key_rp = (r, p) if (r, p) in a else (p, r)
            key_rq = (r, q) if (r, q) in a else (q, r)
            a[key_rp] = c * arp - s * arq
            a[key_rq] = s * arp + c * arq
            # V <- V @ J: columns p and q rotate.
            vp, vq = vcol[p], vcol[q]
            vcol[p] = [c * vp[i] - s * vq[i] for i in range(3)]
            vcol[q] = [s * vp[i] + c * vq[i] for i in range(3)]

    eig = jnp.stack([a[(0, 0)], a[(1, 1)], a[(2, 2)]], axis=-1)
    V = jnp.stack(
        [jnp.stack(col, axis=-1) for col in vcol], axis=-1
    )  # (..., i, k)
    return eig, V


def svd3x3(F, sweeps: int = 6):
    """Rotation-variant SVD of batched 3x3 matrices. See module docstring."""
    FT = jnp.swapaxes(F, -1, -2)
    A = mm(FT, F)
    eig, V = _symmetric_eig3(A, sweeps=sweeps)

    # Sort eigenvalues descending; permute V columns to match.
    order = jnp.argsort(-eig, axis=-1)
    eig = jnp.take_along_axis(eig, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)

    # Force det(V) = +1 by flipping the last column if needed.
    detV = jnp.linalg.det(V)
    V = V.at[..., :, 2].multiply(jnp.where(detV < 0, -1.0, 1.0)[..., None])

    # U via Gram-Schmidt on F @ V with degenerate fallbacks.
    B = mm(F, V)
    b0 = B[..., :, 0]
    b1 = B[..., :, 1]
    u0, n0 = _normalize(b0)
    # Fallback when F v0 ~ 0 (F ~ 0): use e0.
    e0 = jnp.zeros_like(u0).at[..., 0].set(1.0)
    u0 = jnp.where((n0 > 1e-12)[..., None], u0, e0)

    b1p = b1 - jnp.sum(u0 * b1, axis=-1, keepdims=True) * u0
    u1, n1 = _normalize(b1p)
    # Fallback: any unit vector orthogonal to u0.
    alt = jnp.zeros_like(u0).at[..., 1].set(1.0)
    alt = jnp.where(
        (jnp.abs(u0[..., 1]) > 0.9)[..., None],
        jnp.zeros_like(u0).at[..., 2].set(1.0),
        alt,
    )
    fb1, _ = _normalize(jnp.cross(u0, alt))
    u1 = jnp.where((n1 > 1e-12)[..., None], u1, fb1)

    u2 = jnp.cross(u0, u1)  # guarantees det(U) = +1

    U = jnp.stack([u0, u1, u2], axis=-1)
    # Signed singular values: sigma_i = u_i . (F v_i). The first two are
    # >= 0 by construction; the sign of det(F) lands in sigma_2.
    sigma = jnp.einsum("...ij,...ij->...j", U, B)
    return U, sigma, V


# ---------------------------------------------------------------------------
# 2x2
# ---------------------------------------------------------------------------


def svd2x2(F):
    """Rotation-variant SVD of batched 2x2 matrices (closed form)."""
    FT = jnp.swapaxes(F, -1, -2)
    A = mm(FT, F)
    a, b, d = A[..., 0, 0], A[..., 0, 1], A[..., 1, 1]
    # Eigen of symmetric 2x2.
    tr = a + d
    disc = jnp.sqrt(jnp.maximum((a - d) ** 2 + 4.0 * b * b, 0.0))
    lam0 = 0.5 * (tr + disc)  # larger eigenvalue
    # Eigenvector for lam0: (b, lam0 - a) or (lam0 - d, b), pick stable one.
    v0a = jnp.stack([b, lam0 - a], axis=-1)
    v0b = jnp.stack([lam0 - d, b], axis=-1)
    use_a = jnp.abs(lam0 - a) > jnp.abs(lam0 - d)
    v0 = jnp.where(use_a[..., None], v0a, v0b)
    v0n, nv = _normalize(v0)
    e0 = jnp.zeros_like(v0n).at[..., 0].set(1.0)
    v0n = jnp.where((nv > 1e-12)[..., None], v0n, e0)
    # v1 = perp(v0): det(V) = +1.
    v1 = jnp.stack([-v0n[..., 1], v0n[..., 0]], axis=-1)
    V = jnp.stack([v0n, v1], axis=-1)

    B = mm(F, V)
    u0, n0 = _normalize(B[..., :, 0])
    eu = jnp.zeros_like(u0).at[..., 0].set(1.0)
    u0 = jnp.where((n0 > 1e-12)[..., None], u0, eu)
    u1 = jnp.stack([-u0[..., 1], u0[..., 0]], axis=-1)  # det(U) = +1
    U = jnp.stack([u0, u1], axis=-1)
    sigma = jnp.einsum("...ij,...ij->...j", U, B)
    return U, sigma, V


def svd(F, sweeps: int = 6):
    """Dispatch on the (static) matrix dimension."""
    d = F.shape[-1]
    if d == 2:
        return svd2x2(F)
    if d == 3:
        return svd3x3(F, sweeps=sweeps)
    raise ValueError(f"svd supports 2x2/3x3, got {d}x{d}")


def polar_decomp(F, sweeps: int = 6):
    """Polar decomposition F = R @ S with R in SO(d), S symmetric."""
    U, sigma, V = svd(F, sweeps=sweeps)
    VT = jnp.swapaxes(V, -1, -2)
    R = jnp.matmul(U, VT, precision=jax.lax.Precision.HIGHEST)
    S = jnp.matmul(V, sigma[..., :, None] * VT, precision=jax.lax.Precision.HIGHEST)
    return R, S


def _inv_transpose(F):
    """Closed-form batched inverse-transpose of 2x2/3x3 (adjugate/det),
    fully unrolled elementwise."""
    d = F.shape[-1]
    if d == 2:
        det = F[..., 0, 0] * F[..., 1, 1] - F[..., 0, 1] * F[..., 1, 0]
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
        row0 = jnp.stack([F[..., 1, 1], -F[..., 1, 0]], -1)
        row1 = jnp.stack([-F[..., 0, 1], F[..., 0, 0]], -1)
        return jnp.stack([row0, row1], -2) * inv_det[..., None, None]
    a, b, c = F[..., 0, 0], F[..., 0, 1], F[..., 0, 2]
    d_, e, f = F[..., 1, 0], F[..., 1, 1], F[..., 1, 2]
    g, h, i = F[..., 2, 0], F[..., 2, 1], F[..., 2, 2]
    A = e * i - f * h
    B = f * g - d_ * i
    C = d_ * h - e * g
    D = c * h - b * i
    E = a * i - c * g
    Fc = b * g - a * h
    G = b * f - c * e
    H = c * d_ - a * f
    I = a * e - b * d_
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    # inverse = adj^T/det; inverse-transpose = adj/det (adj as laid out here)
    adj = jnp.stack(
        [
            jnp.stack([A, B, C], -1),
            jnp.stack([D, E, Fc], -1),
            jnp.stack([G, H, I], -1),
        ],
        -2,
    )
    return adj * inv_det[..., None, None]


def polar_newton(F, iters: int = 6):
    """Rotation factor of F by scaled Newton iteration
    X <- (g X + X^{-T}/g)/2 — a handful of unrolled elementwise ops per
    step, far cheaper than the full Jacobi SVD when only R is needed
    (the corotated force path runs this per particle per substep).
    Quadratically convergent; the determinant-based scaling g gives
    fast convergence even for large stretches (Higham 1986)."""
    X = F
    for _ in range(iters):
        Xit = _inv_transpose(X)
        # scaling factor from determinants: g = |det(X)|^(-1/3)... use
        # Frobenius-norm scaling which is cheap and robust
        nx = jnp.sqrt(jnp.sum(X * X, axis=(-2, -1), keepdims=True))
        ni = jnp.sqrt(jnp.sum(Xit * Xit, axis=(-2, -1), keepdims=True))
        g = jnp.sqrt(jnp.maximum(ni, 1e-20) / jnp.maximum(nx, 1e-20))
        X = 0.5 * (g * X + Xit / g)
    return X
