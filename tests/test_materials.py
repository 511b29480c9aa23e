"""Constitutive model tests.

Strategy (mirrors SURVEY.md §4's implication): unit tests per return map
against independent numpy oracles, plus energy-consistency via autodiff
(force == -vol * dPsi/dF @ F^T for the hyperelastic models).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taichi_mpm_tpu.materials import models as M

RNG = np.random.default_rng(0)


def _rand_F(n, d=3, spread=0.2):
    return (np.eye(d) + spread * RNG.standard_normal((n, d, d))).astype(np.float32)


def _pp(material, n, **kw):
    mid, params, aux0 = M.pack_params(material, **kw)
    params = jnp.broadcast_to(jnp.asarray(params, jnp.float32), (n, 8))
    aux = jnp.full((n,), aux0, jnp.float32)
    return mid, params, aux


ALL_MATS = list(M.MATERIAL_NAMES)


@pytest.mark.parametrize("material", ALL_MATS)
def test_zero_stress_at_rest(material):
    n = 4
    mid, params, aux = _pp(material, n)
    F = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    vol = jnp.ones((n,), jnp.float32)
    f = M.FORCE_FNS[mid](F, aux, params, vol)
    np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-3)


@pytest.mark.parametrize("material", ALL_MATS)
def test_stress_finite_under_deformation(material):
    n = 64
    mid, params, aux = _pp(material, n)
    F = jnp.asarray(_rand_F(n))
    vol = jnp.ones((n,), jnp.float32)
    f = M.FORCE_FNS[mid](F, aux, params, vol)
    assert np.all(np.isfinite(np.asarray(f)))


@pytest.mark.parametrize("material", ALL_MATS)
def test_plasticity_finite_and_shapes(material):
    n = 64
    mid, params, aux = _pp(material, n)
    F = jnp.asarray(_rand_F(n, spread=0.1))
    cdg = jnp.asarray(_rand_F(n, spread=0.02))
    F2, aux2, cnt = M.PLASTICITY_FNS[mid](F, cdg, aux, params, 1e-4)
    assert F2.shape == F.shape and aux2.shape == aux.shape
    assert np.all(np.isfinite(np.asarray(F2)))
    assert np.all(np.isfinite(np.asarray(aux2)))


def test_energy_consistency_hyperelastic():
    """force == -vol * dPsi/dF @ F^T via autodiff, for jelly/linear/elastic."""
    n = 16
    for material in ("jelly", "linear", "elastic"):
        mid, params, aux = _pp(material, n)
        F = jnp.asarray(_rand_F(n, spread=0.15))
        vol = jnp.ones((n,), jnp.float32)

        def psi_sum(Fb):
            return jnp.sum(M.potential_energy(mid, Fb, aux, params, vol))

        P = jax.grad(psi_sum)(F)  # vol * dPsi/dF
        force_ref = -jnp.matmul(P, jnp.swapaxes(F, -1, -2),
                                precision=jax.lax.Precision.HIGHEST)
        force = M.FORCE_FNS[mid](F, aux, params, vol)
        np.testing.assert_allclose(
            np.asarray(force), np.asarray(force_ref), rtol=2e-2, atol=2e-1,
            err_msg=material,
        )


def test_snow_plasticity_oracle():
    """Numpy oracle of particles.cpp:222-242."""
    n = 32
    mid, params, aux = _pp("snow", n)
    F = jnp.asarray(_rand_F(n, spread=0.08))
    cdg = jnp.asarray(_rand_F(n, spread=0.02))
    F2, Jp2, _ = M.plast_snow(F, cdg, aux, params, 1e-4)
    F2, Jp2 = np.asarray(F2), np.asarray(Jp2)

    theta_c, theta_s = 2.5e-2, 7.5e-3
    Fb = np.asarray(cdg) @ np.asarray(F)
    for i in range(n):
        u, s, vt = np.linalg.svd(Fb[i])
        sc = np.clip(s, 1 - theta_c, 1 + theta_s)
        F_ref = u @ np.diag(sc) @ vt
        Jp_ref = np.clip(1.0 * s.prod() / sc.prod(), 0.6, 20.0)
        # Compare via invariants (U/V sign conventions differ).
        np.testing.assert_allclose(
            np.linalg.svd(F2[i], compute_uv=False),
            np.linalg.svd(F_ref, compute_uv=False),
            atol=1e-4,
        )
        np.testing.assert_allclose(F2[i], F_ref, atol=1e-4)
        np.testing.assert_allclose(Jp2[i], Jp_ref, rtol=1e-4)


def test_sand_return_map_oracle():
    """Numpy oracle of the Drucker-Prager projection (particles.cpp:599-626)."""
    n = 48
    mid, params, aux = _pp("sand", n, cohesion=0.01)
    F = jnp.asarray(_rand_F(n, spread=0.15))
    cdg = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    F2, logJp2, _ = M.plast_sand(F, cdg, aux, params, 1e-4)
    F2, logJp2 = np.asarray(F2), np.asarray(logJp2)

    p = np.asarray(params[0])
    mu0, lam0, alpha, cohesion, beta = p[0], p[1], p[2], p[3], p[4]
    d = 3.0
    for i in range(n):
        u, s, vt = np.linalg.svd(np.asarray(F)[i])
        eps = np.log(np.maximum(np.abs(s), 1e-4)) - cohesion
        tr = eps.sum() + 0.0
        eps_hat = eps - tr / d
        ehn = np.linalg.norm(eps_hat)
        if tr >= 0:
            sig_ref = np.exp(cohesion) * np.ones(3)
            logJp_ref = beta * eps.sum()
        else:
            logJp_ref = 0.0
            dg = ehn + (d * lam0 + 2 * mu0) / (2 * mu0) * tr * alpha
            if dg <= 0:
                sig_ref = np.exp(eps + cohesion)
            else:
                sig_ref = np.exp(eps - dg / ehn * eps_hat + cohesion)
        F_ref = u @ np.diag(sig_ref) @ vt
        np.testing.assert_allclose(F2[i], F_ref, atol=5e-4)
        np.testing.assert_allclose(logJp2[i], logJp_ref, atol=5e-4)


def test_von_mises_oracle():
    """Numpy oracle of particles.cpp:713-732 (incl. its squared-norm
    comparison)."""
    n = 48
    mid, params, aux = _pp("von_mises", n, yield_stress=1.0)
    F = jnp.asarray(_rand_F(n, spread=0.2))
    cdg = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    F2, _, cnt = M.plast_von_mises(F, cdg, aux, params, 1e-4)
    F2, cnt = np.asarray(F2), np.asarray(cnt)

    p = np.asarray(params[0])
    mu0, yield_stress = p[0], p[2]
    for i in range(n):
        u, s, vt = np.linalg.svd(np.asarray(F)[i])
        eps = np.log(np.maximum(np.abs(s), 1e-6))
        eps_hat = eps - eps.mean()
        n2 = (eps_hat**2).sum()
        dg = n2 - yield_stress / (2 * mu0)
        if dg <= 0:
            F_ref = np.asarray(F)[i]
            assert cnt[i] == 0
        else:
            H = eps - dg / n2 * eps_hat
            F_ref = u @ np.diag(np.exp(H)) @ vt
            assert cnt[i] == 1
        np.testing.assert_allclose(F2[i], F_ref, atol=3e-4)


def test_water_plasticity():
    n = 8
    mid, params, aux = _pp("water", n)
    F = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    cdg = jnp.broadcast_to(
        jnp.eye(3, dtype=jnp.float32) * 0.99, (n, 3, 3)
    )  # compression
    F2, j2, _ = M.plast_water(F, cdg, aux, params, 1e-4)
    np.testing.assert_allclose(np.asarray(j2), 0.99 * 3 - 2, rtol=1e-5)
    # floor at 0.1
    aux_low = jnp.full((n,), 0.100001, jnp.float32)
    _, j3, _ = M.plast_water(F, cdg, aux_low, params, 1e-4)
    np.testing.assert_allclose(np.asarray(j3), 0.1, atol=1e-6)


def test_water_eos_pressure_sign():
    n = 2
    mid, params, aux = _pp("water", n)
    F = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    vol = jnp.ones((n,), jnp.float32)
    # compressed (j < 1): expanding force (positive diagonal)
    f_c = M.force_water(F, jnp.full((n,), 0.9), params, vol)
    assert np.all(np.asarray(f_c)[:, 0, 0] > 0)
    # expanded (j > 1): contracting force
    f_e = M.force_water(F, jnp.full((n,), 1.1), params, vol)
    assert np.all(np.asarray(f_e)[:, 0, 0] < 0)


def test_visco_tau_hardening_and_clamp():
    n = 16
    mid, params, aux = _pp("visco", n, tau=0.0, kappa=1.0, nu=1e6)
    F = jnp.asarray(_rand_F(n, spread=0.3))
    cdg = jnp.asarray(_rand_F(n, spread=0.01))
    F2, tau2, _ = M.plast_visco(F, cdg, aux, params, 1e-3)
    s = np.linalg.svd(np.asarray(F2), compute_uv=False)
    assert np.all(s <= 10.0 + 1e-4) and np.all(s >= 0.1 - 1e-4)
    assert np.all(np.asarray(tau2) >= 0.0)  # kappa hardening only grows tau


def test_dispatch_multi_material():
    n = 32
    mats = np.array([M.ELASTIC] * 16 + [M.WATER] * 16, np.int32)
    params = np.zeros((n, 8), np.float32)
    _, pe, _ = M.pack_params("elastic")
    _, pw, _ = M.pack_params("water")
    params[:16] = pe
    params[16:] = pw
    aux = np.concatenate([np.zeros(16), np.ones(16)]).astype(np.float32)
    F = jnp.asarray(_rand_F(n, spread=0.1))
    vol = jnp.ones((n,), jnp.float32)
    f = M.dispatch_force(
        (M.ELASTIC, M.WATER), jnp.asarray(mats), F, jnp.asarray(aux),
        jnp.asarray(params), vol,
    )
    f_e = M.force_elastic(F[:16], aux[:16], jnp.asarray(params[:16]), vol[:16])
    f_w = M.force_water(F[16:], jnp.asarray(aux[16:]), jnp.asarray(params[16:]), vol[16:])
    np.testing.assert_allclose(np.asarray(f)[:16], np.asarray(f_e), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f)[16:], np.asarray(f_w), atol=1e-6)


def test_allowed_dt_positive():
    n = 16
    for material in ALL_MATS:
        mid, params, aux = _pp(material, n)
        F = jnp.asarray(_rand_F(n, spread=0.05))
        vol = jnp.full((n,), 1e-6, jnp.float32)
        mass = jnp.full((n,), 1e-3, jnp.float32)
        speed = jnp.full((n,), 1.0, jnp.float32)
        dt = M.allowed_dt(mid, F, aux, params, vol, mass, speed, 0.01)
        assert np.all(np.asarray(dt) > 0), material
