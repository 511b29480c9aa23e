"""Constitutive models (8) as pure, batched, vmap-free vectorized functions.

TPU-native re-design of the reference's virtual-dispatch particle classes
(``/root/reference/src/particles.cpp``): instead of placement-new'd
polymorphic 320-byte particles with virtual ``calculate_force`` /
``plasticity`` / ``get_allowed_dt``, materials here are *functions over
SoA arrays* selected by an integer material id. The solver dispatches by
looping over the (static) set of materials present in the scene and
blending with ``jnp.where`` — one material (the common case) costs zero
overhead; everything stays a single fused XLA computation.

Per-particle state shared by all materials:
  F      (..., d, d)  elastic deformation gradient  (reference: ``dg_e``)
  aux    (...,)       one mutable scalar, meaning depends on material:
                      snow: Jp, water: j, sand: logJp, visco: tau
  params (..., 8)     static per-particle parameters (texture-modulable,
                      like the reference's ``cohesion_tex`` etc.)

Parameter slot layout (see ``PARAM_DOC``):
  slot 0: mu_0      (water: k)
  slot 1: lambda_0  (water: gamma)
  slot 2: material-specific (snow hardening / sand alpha / vm yield / visco nu)
  slot 3: material-specific (snow theta_c / sand cohesion / visco kappa)
  slot 4: material-specific (snow theta_s / sand beta)
  slot 5: snow min_Jp
  slot 6: snow max_Jp
  slot 7: reserved

All "force" functions return ``-vol * P(F) @ F^T`` exactly like the
reference's ``calculate_force`` (particles.cpp:82-85,218-220,628-637,...).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from taichi_mpm_tpu.math.svd import polar_decomp, polar_newton, svd

# Material ids (stable ABI for checkpoints).
ELASTIC = 0
JELLY = 1
SNOW = 2
WATER = 3
SAND = 4
VON_MISES = 5
LINEAR = 6
VISCO = 7

MATERIAL_NAMES = {
    "elastic": ELASTIC,
    "jelly": JELLY,
    "snow": SNOW,
    "water": WATER,
    "sand": SAND,
    "von_mises": VON_MISES,
    "linear": LINEAR,
    "visco": VISCO,
}
MATERIAL_IDS = {v: k for k, v in MATERIAL_NAMES.items()}

_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    """Batched small (2x2/3x3) matmul, unrolled to elementwise VPU ops —
    a batched tiny dot_general pads each 3x3 onto the MXU and is ~100x
    slower on TPU for per-particle matrices."""
    d = a.shape[-1]
    if d > 4:
        return jnp.matmul(a, b, precision=_HI)
    rows = [
        jnp.stack(
            [
                sum(a[..., i, k] * b[..., k, j] for k in range(d))
                for j in range(d)
            ],
            -1,
        )
        for i in range(d)
    ]
    return jnp.stack(rows, -2)


def _mt(a):
    return jnp.swapaxes(a, -1, -2)


def _det(F):
    """Closed-form 2x2/3x3 determinant (jnp.linalg.det LU-decomposes)."""
    d = F.shape[-1]
    if d == 2:
        return F[..., 0, 0] * F[..., 1, 1] - F[..., 0, 1] * F[..., 1, 0]
    if d == 3:
        return (
            F[..., 0, 0] * (F[..., 1, 1] * F[..., 2, 2] - F[..., 1, 2] * F[..., 2, 1])
            - F[..., 0, 1] * (F[..., 1, 0] * F[..., 2, 2] - F[..., 1, 2] * F[..., 2, 0])
            + F[..., 0, 2] * (F[..., 1, 0] * F[..., 2, 1] - F[..., 1, 1] * F[..., 2, 0])
        )
    return jnp.linalg.det(F)


def _eye_like(F):
    return jnp.broadcast_to(jnp.eye(F.shape[-1], dtype=F.dtype), F.shape)


def _trace(F):
    return jnp.trace(F, axis1=-2, axis2=-1)


# ---------------------------------------------------------------------------
# Parameter packing (host-side helpers)
# ---------------------------------------------------------------------------


def lame_parameters(E: float, nu: float):
    mu = E / (2.0 * (1.0 + nu))
    lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    return mu, lam


def pack_params(material: str, **kw) -> tuple:
    """Pack a material's config kwargs into the 8-slot param vector + aux0.

    Default values mirror particles.cpp ``initialize`` methods.
    Returns (mat_id, params[8], aux0).
    """
    import math as _m

    p = [0.0] * 8
    m = MATERIAL_NAMES[material]
    aux0 = 0.0
    if m == ELASTIC:
        mu, lam = lame_parameters(kw.get("E", 5e3), kw.get("nu", 0.4))
        p[0], p[1] = kw.get("mu_0", mu), kw.get("lambda_0", lam)
    elif m == JELLY:
        mu, lam = lame_parameters(kw.get("E", 1e5), kw.get("nu", 0.3))
        p[0], p[1] = mu, lam
    elif m == SNOW:
        mu, lam = lame_parameters(
            kw.get("youngs_modulus", 1.4e5), kw.get("poisson_ratio", 0.2)
        )
        p[0] = kw.get("mu_0", mu)
        p[1] = kw.get("lambda_0", lam)
        p[2] = kw.get("hardening", 10.0)
        p[3] = kw.get("theta_c", 2.5e-2)
        p[4] = kw.get("theta_s", 7.5e-3)
        p[5] = kw.get("min_Jp", 0.6)
        p[6] = kw.get("max_Jp", 20.0)
        aux0 = kw.get("Jp", 1.0)
    elif m == WATER:
        p[0] = kw.get("k", 1e4)
        p[1] = kw.get("gamma", 7.0)
        aux0 = 1.0
    elif m == SAND:
        p[0] = kw.get("mu_0", 136038.0)
        p[1] = kw.get("lambda_0", 204057.0)
        phi = kw.get("friction_angle", 30.0) / 180.0 * 3.141592653
        sin_phi = _m.sin(phi)
        p[2] = _m.sqrt(2.0 / 3.0) * 2.0 * sin_phi / (3.0 - sin_phi)
        p[3] = kw.get("cohesion", 0.0)
        p[4] = kw.get("beta", 1.0)
        aux0 = 0.0  # logJp
    elif m == VON_MISES:
        mu, lam = lame_parameters(
            kw.get("youngs_modulus", 5e3), kw.get("poisson_ratio", 0.4)
        )
        p[0], p[1] = mu, lam
        p[2] = kw.get("yield_stress", 1.0)
    elif m == LINEAR:
        mu, lam = lame_parameters(kw.get("E", 1e5), kw.get("nu", 0.3))
        p[0], p[1] = mu, lam
    elif m == VISCO:
        mu, lam = lame_parameters(
            kw.get("youngs_modulus", 4e4), kw.get("poisson_ratio", 0.4)
        )
        p[0], p[1] = mu, lam
        p[2] = kw.get("nu", 1e4)  # visco_nu (plastic flow rate)
        p[3] = kw.get("kappa", 0.0)
        aux0 = kw.get("tau", 1000.0)  # visco_tau (mutable -> aux)
    else:
        raise ValueError(material)
    return m, tuple(p), aux0


def param_slot(material: str, name: str, base_kw=None) -> int:
    """Slot in the 8-wide params vector storing kwarg `name` VERBATIM.

    Backs texture-modulated per-particle material params (reference
    mpm.cpp:100-109 samples cohesion_tex/theta_c_tex/theta_s_tex at
    each seed coordinate): the per-particle texture value can be
    written straight into the slot only if pack_params stores the
    kwarg unchanged. Discovered by probing pack_params with two
    sentinel values; raises for kwargs that are derived (e.g. E feeds
    both Lame slots) or unused by the material."""
    base_kw = dict(base_kw or {})
    probes = (0.1234567, 0.7654321)
    outs = []
    for probe in probes:
        kw = dict(base_kw)
        kw[name] = probe
        _, p, _ = pack_params(material, **kw)
        outs.append(p)
    slots = [i for i in range(8) if outs[0][i] != outs[1][i]]
    if len(slots) != 1 or any(
        outs[j][slots[0]] != probes[j] for j in range(2)
    ):
        raise ValueError(
            f"material {material!r} does not store {name!r} verbatim in "
            f"a single param slot; *_tex modulation unsupported for it"
        )
    return slots[0]


# ---------------------------------------------------------------------------
# Stress ("calculate_force" = -vol * P F^T)
# ---------------------------------------------------------------------------


def _pft_fixed_corotated(F, mu, lam):
    """P F^T for fixed corotated: 2 mu (F - R) F^T + lam (J-1) J I.

    (particles.cpp:207-220, jelly :391-410; the F^{-T} term collapses
    against F^T so no inverse is needed.)
    """
    J = _det(F)
    R = polar_newton(F)
    I = _eye_like(F)
    return (
        2.0 * mu[..., None, None] * _mm(F - R, _mt(F))
        + (lam * (J - 1.0) * J)[..., None, None] * I
    )


def _pft_stvk_hencky(F, mu, lam):
    """P F^T for StVK-with-Hencky-strain (elastic/sand/von_mises force,
    particles.cpp:628-637,701-711,798-807):
    P = U (2 mu S^-1 log S + lam tr(log S) S^-1) V^T."""
    U, sig, V = svd(F)
    s = jnp.maximum(jnp.abs(sig), 1e-6)
    log_s = jnp.log(s)
    inv_s = 1.0 / s
    center = 2.0 * mu[..., None] * inv_s * log_s + (
        lam * jnp.sum(log_s, -1)
    )[..., None] * inv_s
    P = _mm(U * center[..., None, :], _mt(V))
    return _mm(P, _mt(F))


def force_elastic(F, aux, params, vol):
    return -vol[..., None, None] * _pft_stvk_hencky(
        F, params[..., 0], params[..., 1]
    )


def force_jelly(F, aux, params, vol):
    return -vol[..., None, None] * _pft_fixed_corotated(
        F, params[..., 0], params[..., 1]
    )


def force_snow(F, aux, params, vol):
    """Snow: fixed corotated with exponential hardening e^{h(1-Jp)}
    (particles.cpp:207-220,244-252)."""
    e = jnp.exp(params[..., 2] * (1.0 - aux))
    return -vol[..., None, None] * _pft_fixed_corotated(
        F, params[..., 0] * e, params[..., 1] * e
    )


def force_water(F, aux, params, vol):
    """Weakly compressible EOS p = k (j^-gamma - 1) (particles.cpp:463-467).
    calculate_force = -vol * j * (-p I) = vol * j * p * I."""
    k, gamma = params[..., 0], params[..., 1]
    j = aux
    p = k * (jnp.power(jnp.maximum(j, 1e-6), -gamma) - 1.0)
    return (vol * j * p)[..., None, None] * _eye_like(F)


def force_sand(F, aux, params, vol):
    return force_elastic(F, aux, params, vol)


def force_von_mises(F, aux, params, vol):
    return force_elastic(F, aux, params, vol)


def force_linear(F, aux, params, vol):
    """Small-strain linear elasticity (particles.cpp:329-336)."""
    mu, lam = params[..., 0], params[..., 1]
    I = _eye_like(F)
    d = F.shape[-1]
    P = (
        mu[..., None, None] * (F + _mt(F) - 2.0 * I)
        + (lam * (_trace(F) - d))[..., None, None] * I
    )
    return -vol[..., None, None] * _mm(P, _mt(F))


def force_visco(F, aux, params, vol):
    return -vol[..., None, None] * _pft_fixed_corotated(
        F, params[..., 0], params[..., 1]
    )


# ---------------------------------------------------------------------------
# Plasticity / F-update return maps (reference: plasticity(cdg))
# ---------------------------------------------------------------------------


def plast_elastic(F, cdg, aux, params, dt):
    return _mm(cdg, F), aux, jnp.zeros(F.shape[:-2], jnp.int32)


plast_jelly = plast_elastic
plast_linear = plast_elastic


def plast_snow(F, cdg, aux, params, dt):
    """Stomakhin snow clamp [1-theta_c, 1+theta_s] + Jp volume tracking
    (particles.cpp:222-242). NaN-safe clamps replicate the reference's
    ``!(x <= hi)`` pattern."""
    theta_c, theta_s = params[..., 3], params[..., 4]
    min_Jp, max_Jp = params[..., 5], params[..., 6]
    F = _mm(cdg, F)
    U, sig, V = svd(F)
    sig_c = jnp.clip(sig, (1.0 - theta_c)[..., None], (1.0 + theta_s)[..., None])
    det_orig = jnp.prod(sig, -1)
    det_new = jnp.prod(sig_c, -1)
    F_new = _mm(U * sig_c[..., None, :], _mt(V))
    Jp_new = aux * det_orig / det_new
    Jp_new = jnp.where(Jp_new <= max_Jp, Jp_new, max_Jp)
    Jp_new = jnp.where(Jp_new >= min_Jp, Jp_new, min_Jp)
    return F_new, Jp_new, jnp.zeros(F.shape[:-2], jnp.int32)


def plast_water(F, cdg, aux, params, dt):
    """J-only tracking with linearized determinant and a 0.1 floor
    (particles.cpp:469-478). F itself is left untouched (unused)."""
    d = F.shape[-1]
    j = aux * (_trace(cdg) - (d - 1))
    j = jnp.maximum(j, 0.1)
    return F, j, (j > 1.0).astype(jnp.int32)


def plast_sand(F, cdg, aux, params, dt):
    """Drucker-Prager return map with cohesion and logJp volume correction
    (particles.cpp:599-647)."""
    alpha, cohesion, beta = params[..., 2], params[..., 3], params[..., 4]
    mu0, lam0 = params[..., 0], params[..., 1]
    logJp = aux
    d = float(F.shape[-1])
    F = _mm(cdg, F)
    U, sig, V = svd(F)

    eps = jnp.log(jnp.maximum(jnp.abs(sig), 1e-4)) - cohesion[..., None]
    tr = jnp.sum(eps, -1) + logJp
    eps_hat = eps - (tr / d)[..., None]
    eps_hat_norm = jnp.sqrt(jnp.sum(eps_hat * eps_hat, -1))

    # Case A: tr >= 0 -> full projection to the tip.
    sig_tip = jnp.exp(cohesion)[..., None] * jnp.ones_like(sig)
    logJp_A = beta * jnp.sum(eps, -1) + logJp

    # Case B: tr < 0.
    delta_gamma = eps_hat_norm + (d * lam0 + 2.0 * mu0) / (2.0 * mu0) * tr * alpha
    h_elastic = eps + cohesion[..., None]
    safe_norm = jnp.maximum(eps_hat_norm, 1e-20)
    h_yield = (
        eps
        - (delta_gamma / safe_norm)[..., None] * eps_hat
        + cohesion[..., None]
    )
    h = jnp.where((delta_gamma <= 0.0)[..., None], h_elastic, h_yield)
    sig_B = jnp.exp(h)

    case_A = tr >= 0.0
    sig_new = jnp.where(case_A[..., None], sig_tip, sig_B)
    logJp_new = jnp.where(case_A, logJp_A, jnp.zeros_like(logJp))

    F_new = _mm(U * sig_new[..., None, :], _mt(V))
    count = (case_A | (delta_gamma > 0.0)).astype(jnp.int32)
    return F_new, logJp_new, count


def plast_von_mises(F, cdg, aux, params, dt):
    """Von Mises yield on Hencky strain (particles.cpp:713-732).

    Note: the reference compares the *squared* Frobenius norm of the
    deviatoric Hencky strain against yield/(2 mu) (``frobenius_norm2``,
    particles.cpp:721-728); we replicate that behavior exactly.
    """
    mu0 = params[..., 0]
    yield_stress = params[..., 2]
    d = float(F.shape[-1])
    F = _mm(cdg, F)
    U, sig, V = svd(F)
    eps = jnp.log(jnp.maximum(jnp.abs(sig), 1e-6))
    tr = jnp.sum(eps, -1)
    eps_hat = eps - (tr / d)[..., None]
    eps_hat_norm2 = jnp.sum(eps_hat * eps_hat, -1)
    delta_gamma = eps_hat_norm2 - yield_stress / (2.0 * mu0)
    yielded = delta_gamma > 0.0
    safe = jnp.maximum(eps_hat_norm2, 1e-20)
    H = eps - (delta_gamma / safe)[..., None] * eps_hat
    sig_new = jnp.where(yielded[..., None], jnp.exp(H), sig)
    F_new = _mm(U * sig_new[..., None, :], _mt(V))
    return F_new, aux, yielded.astype(jnp.int32)


def _inverse_small(F):
    d = F.shape[-1]
    if d == 2:
        a, b = F[..., 0, 0], F[..., 0, 1]
        c, dd = F[..., 1, 0], F[..., 1, 1]
        det = a * dd - b * c
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
        row0 = jnp.stack([dd, -b], -1)
        row1 = jnp.stack([-c, a], -1)
        return inv_det[..., None, None] * jnp.stack([row0, row1], -2)
    return jnp.linalg.inv(F)


def _visco_pk1_norm(F, mu, lam):
    """Frobenius norm of the fixed-corotated first PK stress
    (particles.cpp:72-80,108)."""
    J = _det(F)
    R = polar_newton(F)
    FinvT = _mt(_inverse_small(F))
    P = 2.0 * mu[..., None, None] * (F - R) + (lam * (J - 1.0) * J)[
        ..., None, None
    ] * FinvT
    return jnp.sqrt(jnp.sum(P * P, axis=(-2, -1)))


def plast_visco(F, cdg, aux, params, dt):
    """Shear-dependent viscoplastic flow (particles.cpp:102-134).

    aux = visco_tau (mutable yield threshold). ``approximate_exponent``'s
    recursive halving (particles.cpp:87-100) is unrolled to 4 fixed levels
    selected by the first positive-determinant quadratic approximant.
    """
    mu0, lam0 = params[..., 0], params[..., 1]
    visco_nu, visco_kappa = params[..., 2], params[..., 3]
    tau = aux
    d = float(F.shape[-1])
    I = _eye_like(F)
    s_full = cdg - I  # = m * dt in the reference

    # approximate_exponent with halving: r_k = (0.5 s_k + I) s_k + I,
    # s_k = s / 2^k, composed result = r_k^(2^k); pick smallest valid k.
    exp_approx = None
    valid_any = None
    for k in range(4):
        s_k = s_full / float(2**k)
        r = _mm(0.5 * s_k + I, s_k) + I
        comp = r
        for _ in range(k):
            comp = _mm(comp, comp)
        ok = _det(r) > 0.0
        if exp_approx is None:
            exp_approx, valid_any = comp, ok
        else:
            take = ok & ~valid_any
            exp_approx = jnp.where(take[..., None, None], comp, exp_approx)
            valid_any = valid_any | ok

    F_hat = _mm(exp_approx, F)
    U, sig, V = svd(F_hat)

    pnorm = _visco_pk1_norm(F, mu0, lam0)
    gamma = jnp.where(
        pnorm > 1e-5,
        jnp.clip(dt * visco_nu * (pnorm - tau) / jnp.maximum(pnorm, 1e-20), 0.0, 1.0),
        0.0,
    )
    det_sig = jnp.prod(sig, -1)
    scale = jnp.where(
        jnp.abs(det_sig) > 1e-5,
        1.0 / jnp.power(jnp.maximum(jnp.abs(det_sig), 1e-20), 1.0 / d),
        1.0,
    )
    middle = jnp.power(
        jnp.maximum(sig * scale[..., None], 1e-20), gamma[..., None]
    )
    middle_inv = jnp.where(jnp.abs(middle) > 1e-5, 1.0 / middle, 1.0)
    F_new = _mm(U * (sig * middle_inv)[..., None, :], _mt(V))

    U2, sig2, V2 = svd(F_new)
    sig2 = jnp.clip(sig2, 0.1, 10.0)
    F_new = _mm(U2 * sig2[..., None, :], _mt(V2))

    tau_new = tau + visco_kappa * gamma * pnorm
    return F_new, tau_new, jnp.zeros(F.shape[:-2], jnp.int32)


# ---------------------------------------------------------------------------
# CFL sound-speed dt limits (reference get_allowed_dt; 0 => unconstrained)
# ---------------------------------------------------------------------------


def allowed_dt(mat_id: int, F, aux, params, vol, mass, speed, dx):
    """Per-particle allowed dt (particles.cpp:136-154,254-278,480-490,...).

    Returns +inf where the reference returns 0 ("no constraint":
    linear & jelly, particles.cpp:343-345,418-420).
    """
    mu0, lam0 = params[..., 0], params[..., 1]
    J = jnp.maximum(_det(F), 1e-8)
    rho0 = mass / jnp.maximum(vol, 1e-20)
    if mat_id in (ELASTIC, SAND, VON_MISES, VISCO):
        rho = rho0 / J
        K = 2.0 * mu0 / 3.0 + lam0
        c2 = 4.0 * mu0 / (3.0 * rho) + K * (1.0 - jnp.log(J)) / rho0
        c = jnp.sqrt(jnp.maximum(c2, 1e-20))
    elif mat_id == SNOW:
        Jt = J * aux
        rho = rho0 / jnp.maximum(Jt, 1e-8)
        e = jnp.exp(params[..., 2] * (1.0 - aux))
        c = jnp.sqrt(jnp.maximum((lam0 * e + 2.0 * mu0 * e) / rho, 1e-20))
    elif mat_id == WATER:
        k, gamma = params[..., 0], params[..., 1]
        c = jnp.sqrt(
            jnp.maximum(k * gamma / jnp.power(jnp.maximum(aux, 0.1), gamma - 1.0), 1e-20)
        )
    else:  # LINEAR, JELLY: unconstrained
        return jnp.full(F.shape[:-2], jnp.inf, F.dtype)
    return dx / (c + speed)


# ---------------------------------------------------------------------------
# Potential energy (for conservation diagnostics, mpm.cpp:1078-1110)
# ---------------------------------------------------------------------------


def potential_energy(mat_id: int, F, aux, params, vol):
    mu, lam = params[..., 0], params[..., 1]
    d = F.shape[-1]
    if mat_id == LINEAR:
        e = 0.5 * (F + _mt(F)) - _eye_like(F)
        return vol * (
            mu * jnp.sum(e * e, (-2, -1)) + 0.5 * lam * _trace(e) ** 2
        )
    if mat_id == JELLY:
        J = _det(F)
        R, _ = polar_decomp(F)
        diff = F - R
        return vol * (
            mu * jnp.sum(diff * diff, (-2, -1)) + 0.5 * lam * (J - 1.0) ** 2
        )
    if mat_id == ELASTIC:
        _, sig, _ = svd(F)
        log_s = jnp.log(jnp.maximum(jnp.abs(sig), 1e-6))
        return vol * (
            mu * jnp.sum(log_s * log_s, -1) + 0.5 * lam * jnp.sum(log_s, -1) ** 2
        )
    return jnp.zeros(F.shape[:-2], F.dtype)


# ---------------------------------------------------------------------------
# Dispatch tables
# ---------------------------------------------------------------------------

FORCE_FNS = {
    ELASTIC: force_elastic,
    JELLY: force_jelly,
    SNOW: force_snow,
    WATER: force_water,
    SAND: force_sand,
    VON_MISES: force_von_mises,
    LINEAR: force_linear,
    VISCO: force_visco,
}

PLASTICITY_FNS = {
    ELASTIC: plast_elastic,
    JELLY: plast_jelly,
    SNOW: plast_snow,
    WATER: plast_water,
    SAND: plast_sand,
    VON_MISES: plast_von_mises,
    LINEAR: plast_linear,
    VISCO: plast_visco,
}


def dispatch_force(active_materials, mat, F, aux, params, vol):
    """Blend per-material forces over the static set of active materials."""
    if len(active_materials) == 1:
        return FORCE_FNS[active_materials[0]](F, aux, params, vol)
    out = jnp.zeros_like(F)
    for m in active_materials:
        fm = FORCE_FNS[m](F, aux, params, vol)
        out = jnp.where((mat == m)[..., None, None], fm, out)
    return out


def dispatch_plasticity(active_materials, mat, F, cdg, aux, params, dt):
    if len(active_materials) == 1:
        return PLASTICITY_FNS[active_materials[0]](F, cdg, aux, params, dt)
    F_out, aux_out = jnp.zeros_like(F), jnp.zeros_like(aux)
    cnt = jnp.zeros(F.shape[:-2], jnp.int32)
    for m in active_materials:
        Fm, am, cm = PLASTICITY_FNS[m](F, cdg, aux, params, dt)
        sel = mat == m
        F_out = jnp.where(sel[..., None, None], Fm, F_out)
        aux_out = jnp.where(sel, am, aux_out)
        cnt = jnp.where(sel, cm, cnt)
    return F_out, aux_out, cnt


def dispatch_allowed_dt(active_materials, mat, F, aux, params, vol, mass, speed, dx):
    out = jnp.full(F.shape[:-2], jnp.inf, F.dtype)
    for m in active_materials:
        dm = allowed_dt(m, F, aux, params, vol, mass, speed, dx)
        out = jnp.where(mat == m, dm, out)
    return out


def dispatch_potential_energy(active_materials, mat, F, aux, params, vol):
    out = jnp.zeros(F.shape[:-2], F.dtype)
    for m in active_materials:
        em = potential_energy(m, F, aux, params, vol)
        out = jnp.where(mat == m, em, out)
    return out
