"""SVD / polar decomposition tests against numpy.linalg ground truth."""

import numpy as np
import jax.numpy as jnp
import pytest

from taichi_mpm_tpu.math.svd import polar_decomp, svd2x2, svd3x3


def _random_batch(rng, d, n, scale=1.0, near_identity=False):
    if near_identity:
        return np.eye(d) + 0.1 * rng.standard_normal((n, d, d))
    return scale * rng.standard_normal((n, d, d))


def _check_svd(F, U, sigma, V, d, atol=1e-4):
    F, U, sigma, V = map(np.asarray, (F, U, sigma, V))
    eye = np.eye(d)
    # Orthogonality + special-orthogonality.
    np.testing.assert_allclose(U @ np.swapaxes(U, -1, -2), np.broadcast_to(eye, U.shape), atol=atol)
    np.testing.assert_allclose(V @ np.swapaxes(V, -1, -2), np.broadcast_to(eye, V.shape), atol=atol)
    np.testing.assert_allclose(np.linalg.det(U), 1.0, atol=atol)
    np.testing.assert_allclose(np.linalg.det(V), 1.0, atol=atol)
    # Reconstruction.
    recon = U @ (sigma[..., :, None] * np.swapaxes(V, -1, -2))
    np.testing.assert_allclose(recon, F, atol=10 * atol)
    # Ordering and sign conventions.
    assert np.all(sigma[..., 0] + 1e-6 >= sigma[..., 1])
    assert np.all(sigma[..., :-1] >= -1e-6)
    detF = np.linalg.det(F)
    assert np.all(np.sign(sigma[..., -1]) * np.sign(detF) >= -1e-6)
    # Singular values match LAPACK (absolute values, sorted).
    s_ref = np.linalg.svd(F, compute_uv=False)
    np.testing.assert_allclose(np.abs(sigma), s_ref, atol=10 * atol)


@pytest.mark.parametrize("near_identity", [True, False])
def test_svd3x3_random(near_identity):
    rng = np.random.default_rng(0)
    F = _random_batch(rng, 3, 512, near_identity=near_identity).astype(np.float32)
    U, s, V = svd3x3(jnp.asarray(F))
    _check_svd(F, U, s, V, 3, atol=2e-4)


@pytest.mark.parametrize("near_identity", [True, False])
def test_svd2x2_random(near_identity):
    rng = np.random.default_rng(1)
    F = _random_batch(rng, 2, 512, near_identity=near_identity).astype(np.float32)
    U, s, V = svd2x2(jnp.asarray(F))
    _check_svd(F, U, s, V, 2, atol=1e-4)


def test_svd3x3_negative_det():
    rng = np.random.default_rng(2)
    F = _random_batch(rng, 3, 128).astype(np.float32)
    F[:, 0] *= -1  # force det flips in many samples
    U, s, V = svd3x3(jnp.asarray(F))
    _check_svd(F, U, s, V, 3, atol=2e-4)


def test_svd_degenerate_cases():
    F = np.zeros((5, 3, 3), np.float32)
    F[0] = np.eye(3)
    F[1] = np.diag([1.0, 1.0, 0.0])  # rank 2
    F[2] = np.diag([1.0, 0.0, 0.0])  # rank 1
    F[3] = 0.0  # rank 0
    F[4] = np.diag([2.0, 2.0, 2.0])
    U, s, V = svd3x3(jnp.asarray(F))
    U, s, V = map(np.asarray, (U, s, V))
    recon = U @ (s[..., :, None] * np.swapaxes(V, -1, -2))
    np.testing.assert_allclose(recon, F, atol=1e-5)
    np.testing.assert_allclose(
        U @ np.swapaxes(U, -1, -2), np.broadcast_to(np.eye(3), U.shape), atol=1e-5
    )


def test_polar_decomp():
    rng = np.random.default_rng(3)
    for d in (2, 3):
        F = (np.eye(d) + 0.3 * rng.standard_normal((256, d, d))).astype(np.float32)
        R, S = polar_decomp(jnp.asarray(F))
        R, S = np.asarray(R), np.asarray(S)
        np.testing.assert_allclose(R @ S, F, atol=2e-4)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)
        np.testing.assert_allclose(S, np.swapaxes(S, -1, -2), atol=1e-4)
        # Compare against scipy-style polar via numpy SVD.
        u, s, vt = np.linalg.svd(F)
        # fix improper rotations to compare with rotation-variant convention
        det = np.linalg.det(u @ vt)
        R_ref = u @ vt
        # only compare where det(F)>0 (unambiguous case)
        pos = np.linalg.det(F) > 0.05
        np.testing.assert_allclose(R[pos], R_ref[pos], atol=1e-3)


def test_polar_identity_rotation():
    """polar(R0 @ stretch) recovers R0 for a known rotation."""
    th = 0.7
    R0 = np.array(
        [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32
    )
    S0 = np.array([[1.5, 0.2], [0.2, 0.8]], np.float32)
    F = (R0 @ S0)[None]
    R, S = polar_decomp(jnp.asarray(F))
    np.testing.assert_allclose(np.asarray(R)[0], R0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(S)[0], S0, atol=1e-5)
