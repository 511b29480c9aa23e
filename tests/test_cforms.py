"""Component-form math/materials (math/cmat3, materials/cforms) vs the
array-form oracles (math/svd, materials/models).

The packed channel-major particle path computes all per-particle physics
in component form; these tests pin it to the array implementations the
numpy-oracle materials tests already validate (the same differential
strategy the reference uses for its optimized transfers, SURVEY.md §4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from taichi_mpm_tpu.materials import models as am
from taichi_mpm_tpu.materials import cforms as cf
from taichi_mpm_tpu.math import svd as asvd
from taichi_mpm_tpu.math import cmat3 as cm
from taichi_mpm_tpu.math.cmat3 import join33, split33


def _rand_F(n, seed=0, spread=0.3):
    rng = np.random.default_rng(seed)
    F = (np.eye(3) + spread * rng.standard_normal((n, 3, 3))).astype(np.float32)
    F[0] = np.eye(3)
    F[1] = np.diag([2.0, 0.5, 1.0])
    F[2] = np.diag([1.0, 1.0, -1.0])  # inverted
    return F


class TestCmat3:
    def test_svd_reconstruction(self):
        F = _rand_F(2000)
        U, s, V = cm.c_svd(split33(jnp.asarray(F)))
        Ua, sa, Va = join33(U), np.stack([np.asarray(x) for x in s], -1), join33(V)
        rec = np.asarray(Ua) @ np.apply_along_axis(np.diag, -1, sa) @ np.swapaxes(
            np.asarray(Va), -1, -2
        )
        assert np.abs(rec - F).max() < 5e-5
        assert np.abs(np.linalg.det(np.asarray(Ua)) - 1).max() < 1e-4
        assert np.abs(np.linalg.det(np.asarray(Va)) - 1).max() < 1e-4
        # ordering + sign conventions match the array SVD
        _, s_arr, _ = asvd.svd3x3(jnp.asarray(F))
        assert np.abs(sa - np.asarray(s_arr)).max() < 5e-5

    def test_polar_matches_array(self):
        F = _rand_F(500, seed=1)
        R_arr = asvd.polar_newton(jnp.asarray(F))
        R_c = join33(cm.c_polar_newton(split33(jnp.asarray(F))))
        assert np.abs(np.asarray(R_arr) - np.asarray(R_c)).max() < 1e-6

    def test_basic_ops(self):
        rng = np.random.default_rng(2)
        A = rng.standard_normal((100, 3, 3)).astype(np.float32)
        B = rng.standard_normal((100, 3, 3)).astype(np.float32)
        Ac, Bc = split33(jnp.asarray(A)), split33(jnp.asarray(B))
        assert np.allclose(np.asarray(join33(cm.c_mm(Ac, Bc))), A @ B, atol=1e-5)
        assert np.allclose(
            np.asarray(cm.c_det(Ac)), np.linalg.det(A), atol=1e-4
        )
        it = np.swapaxes(np.linalg.inv(A.astype(np.float64)), -1, -2)
        assert np.allclose(
            np.asarray(join33(cm.c_inv_transpose(Ac))), it, atol=1e-2
        )


MAT_KW = {
    "elastic": dict(E=5e3, nu=0.4),
    "jelly": dict(E=1e5, nu=0.3),
    "snow": dict(),
    "water": dict(),
    "sand": dict(),
    "von_mises": dict(yield_stress=100.0),
    "linear": dict(),
    "visco": dict(kappa=10.0),
}


def _aux_for(name, n, rng):
    if name == "snow":
        return rng.uniform(0.7, 1.5, n).astype(np.float32)
    if name == "water":
        return rng.uniform(0.5, 1.5, n).astype(np.float32)
    if name == "sand":
        return rng.uniform(-0.1, 0.1, n).astype(np.float32)
    if name == "visco":
        return np.full(n, 1000.0, np.float32)
    return np.zeros(n, np.float32)


@pytest.mark.parametrize("name", list(MAT_KW))
def test_cform_matches_models(name):
    rng = np.random.default_rng(3)
    n = 2000
    F = _rand_F(n, seed=4)
    cdg = (np.eye(3) + 0.02 * rng.standard_normal((n, 3, 3))).astype(np.float32)
    vol = rng.uniform(0.5, 2.0, n).astype(np.float32)
    mid, params, _ = am.pack_params(name, **MAT_KW[name])
    P = np.broadcast_to(np.asarray(params, np.float32), (n, 8)).copy()
    aux = _aux_for(name, n, rng)
    dt = 1e-4

    Fj, cj, Pj, aj, vj = map(jnp.asarray, (F, cdg, P, aux, vol))
    pt = tuple(Pj[:, k] for k in range(8))
    Fc = split33(Fj)

    f_arr = np.asarray(am.FORCE_FNS[mid](Fj, aj, Pj, vj))
    f_c = np.asarray(join33(cf.FORCE_FNS[mid](Fc, aj, pt, vj)))
    scale = max(np.abs(f_arr).max(), 1.0)
    assert np.abs(f_arr - f_c).max() / scale < 1e-4

    Fa, aa, ca = am.PLASTICITY_FNS[mid](Fj, cj, aj, Pj, dt)
    Fc2, ac, cc = cf.PLASTICITY_FNS[mid](Fc, split33(cj), aj, pt, dt)
    assert np.abs(np.asarray(Fa) - np.asarray(join33(Fc2))).max() < 1e-4
    ascale = max(np.abs(np.asarray(aa)).max(), 1.0)
    assert np.abs(np.asarray(aa) - np.asarray(ac)).max() / ascale < 1e-4
    assert np.array_equal(np.asarray(ca), np.asarray(cc))


def test_dispatch_multi_material():
    rng = np.random.default_rng(5)
    n = 600
    F = _rand_F(n, seed=6)
    cdg = (np.eye(3) + 0.02 * rng.standard_normal((n, 3, 3))).astype(np.float32)
    vol = rng.uniform(0.5, 2.0, n).astype(np.float32)
    mat = rng.integers(0, 3, n).astype(np.int32)  # elastic/jelly/snow mix
    P = np.zeros((n, 8), np.float32)
    aux = np.zeros(n, np.float32)
    for name in ("elastic", "jelly", "snow"):
        mid, params, aux0 = am.pack_params(name, **MAT_KW[name])
        sel = mat == mid
        P[sel] = np.asarray(params, np.float32)
        aux[sel] = 1.0 if name == "snow" else aux0
    Fj, cj, Pj, aj, vj, mj = map(jnp.asarray, (F, cdg, P, aux, vol, mat))
    act = (0, 1, 2)
    f_arr = np.asarray(am.dispatch_force(act, mj, Fj, aj, Pj, vj))
    pt = tuple(Pj[:, k] for k in range(8))
    f_c = np.asarray(join33(cf.dispatch_force(act, mj, split33(Fj), aj, pt, vj)))
    assert np.abs(f_arr - f_c).max() / max(np.abs(f_arr).max(), 1.0) < 1e-4
    Fa, aa, _ = am.dispatch_plasticity(act, mj, Fj, cj, aj, Pj, 1e-4)
    Fc2, ac, _ = cf.dispatch_plasticity(act, mj, split33(Fj), split33(cj), aj, pt, 1e-4)
    assert np.abs(np.asarray(Fa) - np.asarray(join33(Fc2))).max() < 1e-4
    assert np.abs(np.asarray(aa) - np.asarray(ac)).max() < 1e-4
