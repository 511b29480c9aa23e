"""Fully-fused kernels (ops/fused_pallas) vs the unfused packed path.

The fused substep moves prep (force/affine build) into the P2G kernel
and finish (damping, F-update, plasticity, advection, NaN scrub) into
the G2P kernel; these tests pin it to packed_frame(fused=False) the
same way the packed path is pinned to the blocked/oracle paths
(SURVEY.md §4 differential-test strategy)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.core.state import empty_particles
from taichi_mpm_tpu.materials import models as materials
from taichi_mpm_tpu.ops import packed


def _scene(n=2000, seed=0, mats=("jelly",), res=(32, 32, 32), cap_extra=17,
           v_scale=0.5):
    rng = np.random.default_rng(seed)
    cfg = SimConfig(res=res, base_dt=2e-4, gravity=(0.0, -10.0, 0.0))
    cap = n + cap_extra
    p = empty_particles(cap, 3)
    x = rng.uniform(0.25, 0.75, (n, 3)).astype(np.float32)
    v = v_scale * rng.standard_normal((n, 3)).astype(np.float32)
    mids = []
    mat_arr = np.zeros(n, np.int32)
    par_arr = np.zeros((n, 8), np.float32)
    aux_arr = np.zeros(n, np.float32)
    for i, m in enumerate(mats):
        mid, params, aux0 = materials.pack_params(m)
        mids.append(mid)
        sel = np.arange(n) % len(mats) == i
        mat_arr[sel] = mid
        par_arr[sel] = np.asarray(params, np.float32)
        aux_arr[sel] = aux0
    p = dataclasses.replace(
        p,
        x=p.x.at[:n].set(x),
        v=p.v.at[:n].set(v),
        mat=p.mat.at[:n].set(mat_arr),
        params=p.params.at[:n].set(par_arr),
        aux=p.aux.at[:n].set(aux_arr),
        mass=p.mass.at[:n].set(1e-3),
        vol=p.vol.at[:n].set(1e-6),
        active=p.active.at[:n].set(True),
    )
    return p, cfg.with_materials(mids)


def _run_both(p, cfg, colliders, n_sub, K=512, v_atol=5e-5, x_atol=5e-6,
              f_atol=5e-6):
    args = (p, jnp.float32(0.0), cfg, colliders, cfg.base_dt, n_sub, K)
    p1, _, _, ns1, pl1 = packed.packed_frame(*args, interpret=True)
    p2, _, _, ns2, pl2 = packed.packed_frame(*args, interpret=True, fused=True)
    a1, a2 = np.asarray(p1.active), np.asarray(p2.active)
    assert a1.sum() == a2.sum()
    assert int(ns1) == int(ns2)  # same drift accounting -> same resorts
    assert int(pl1) == int(pl2)  # same plasticity/cutting counters
    # identical sort code on both paths -> same particle order
    assert np.allclose(np.asarray(p1.x)[a1], np.asarray(p2.x)[a2],
                       atol=x_atol)
    assert np.allclose(np.asarray(p1.v)[a1], np.asarray(p2.v)[a2],
                       atol=v_atol)
    assert np.allclose(np.asarray(p1.F)[a1], np.asarray(p2.F)[a2],
                       atol=f_atol)
    assert np.allclose(np.asarray(p1.C)[a1], np.asarray(p2.C)[a2],
                       atol=5e-4)
    assert np.allclose(np.asarray(p1.aux)[a1], np.asarray(p2.aux)[a2],
                       atol=5e-6)


@pytest.mark.parametrize(
    "material",
    ["jelly", "sand", "water", "snow", "elastic", "von_mises", "linear",
     "visco"],
)
def test_fused_matches_packed(material):
    p, cfg = _scene(1800, seed=1, mats=(material,))
    colliders = (Collider(sdf=lambda x, t: x[..., 1] - 0.1, friction=0.3),)
    # visco's pow/exp return-map chains round differently between the
    # fused-kernel and XLA fusion contexts (~1e-6 relative on F)
    _run_both(p, cfg, colliders, n_sub=6,
              f_atol=2e-5 if material == "visco" else 5e-6)


def test_fused_multimaterial():
    p, cfg = _scene(2400, seed=2, mats=("jelly", "sand", "water"))
    colliders = (Collider(sdf=lambda x, t: x[..., 1] - 0.1, friction=-1.0),)
    _run_both(p, cfg, colliders, n_sub=6)


def test_fused_midframe_resort():
    """High velocities force drift-triggered re-sorts inside the frame;
    the fused path must track the unfused one across them."""
    p, cfg = _scene(1500, seed=3, mats=("jelly",), v_scale=30.0)
    _run_both(p, cfg, (), n_sub=8, v_atol=5e-4, x_atol=5e-6)


def test_fused_clean_boundary_and_collision():
    p, cfg = _scene(900, seed=4, mats=("jelly",))
    cfg = dataclasses.replace(cfg, clean_boundary=True,
                              particle_collision=True)
    colliders = (Collider(sdf=lambda x, t: x[..., 1] - 0.2, friction=0.0),)
    _run_both(p, cfg, colliders, n_sub=4)


def test_fused_adaptive_frame():
    """Traced dt through the fused kernels (SMEM scalar path)."""
    p, cfg = _scene(1200, seed=5, mats=("jelly",))
    args = dict(
        t=jnp.float32(0.0), cfg=cfg, colliders=(),
        frame_dt=8 * cfg.base_dt, unit_dt=cfg.base_dt / 4,
        max_dt=4 * cfg.base_dt, K=512,
    )
    p1, t1, n1, _ = packed.packed_adaptive_frame(p, interpret=True, **args)
    p2, t2, n2, _ = packed.packed_adaptive_frame(p, interpret=True,
                                                 fused=True, **args)
    assert int(n1) == int(n2)
    a1, a2 = np.asarray(p1.active), np.asarray(p2.active)
    assert a1.sum() == a2.sum()
    assert np.allclose(np.asarray(p1.x)[a1], np.asarray(p2.x)[a2], atol=1e-5)
    assert np.allclose(np.asarray(p1.v)[a1], np.asarray(p2.v)[a2], atol=1e-4)


def test_fused_mosaic_fallback(monkeypatch, recwarn):
    """MPM.step survives a Mosaic compile failure of the fused path:
    it must warn, flip to the unfused pipeline, and produce the frame
    (VERDICT r2 task 3 — the reference's `optimized` flag semantics,
    /root/reference/src/mpm.cpp:510-514). The Mosaic error is simulated
    at the frame-build layer so the test runs on CPU."""
    import warnings

    from taichi_mpm_tpu.core.solver import MPM

    sim = MPM(res=(32, 32, 32), base_delta_t=2e-4, frame_dt=6e-4)
    rng = np.random.default_rng(0)
    sim.add_particles(
        "jelly", pos=rng.uniform(0.3, 0.7, (300, 3)).astype(np.float32),
        E=1e4, nu=0.3, density=1000,
    )
    sim.fused = True
    real_build = MPM._build_jit

    def fake_build(self, n_substeps):
        if self.fused:
            def boom(*a, **k):
                raise RuntimeError(
                    "Mosaic failed to compile TPU kernel: "
                    "infer-vector-layout: unsupported shape cast"
                )

            return boom
        return real_build(self, n_substeps)

    monkeypatch.setattr(MPM, "_build_jit", fake_build)
    with warnings.catch_warnings(record=True) as ws:
        warnings.simplefilter("always")
        sim.step()
        p = sim.particles
    assert sim.fused is False
    assert any("unfused" in str(w.message) for w in ws)
    a = np.asarray(p.active)
    assert a.sum() == 300
    assert np.all(np.isfinite(np.asarray(p.x)[a]))


def test_fused_non_mosaic_errors_propagate(monkeypatch):
    """Unrelated frame errors must NOT be swallowed by the fallback."""
    from taichi_mpm_tpu.core.solver import MPM

    sim = MPM(res=(32, 32, 32), base_delta_t=2e-4, frame_dt=6e-4)
    rng = np.random.default_rng(1)
    sim.add_particles(
        "jelly", pos=rng.uniform(0.3, 0.7, (50, 3)).astype(np.float32),
        E=1e4, nu=0.3, density=1000,
    )
    sim.fused = True

    def fake_build(self, n_substeps):
        def boom(*a, **k):
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")

        return boom

    monkeypatch.setattr(MPM, "_build_jit", fake_build)
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        sim.step()
