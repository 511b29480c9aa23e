"""Packed channel-major pipeline (ops/packed) vs the round-1 blocked
path and the XLA oracle — the packed path is the production fast path,
pinned by differential tests exactly like the reference pins its
optimized transfers to the generic ones (SURVEY.md §4)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.core.solver import frame_fn
from taichi_mpm_tpu.core.state import empty_particles
from taichi_mpm_tpu.materials import models as materials
from taichi_mpm_tpu.ops import packed
from taichi_mpm_tpu.ops.substep import blocked_frame


def _scene(n=3000, seed=0, material="jelly", res=(32, 32, 32), cap_extra=0):
    rng = np.random.default_rng(seed)
    cfg = SimConfig(res=res, base_dt=2e-4, gravity=(0.0, -10.0, 0.0))
    mid, params, aux0 = materials.pack_params(material)
    cap = n + cap_extra
    p = empty_particles(cap, 3)
    x = rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32)
    v = 0.5 * rng.standard_normal((n, 3)).astype(np.float32)
    p = dataclasses.replace(
        p,
        x=p.x.at[:n].set(x),
        v=p.v.at[:n].set(v),
        mat=p.mat.at[:n].set(mid),
        params=p.params.at[:n].set(np.asarray(params, np.float32)),
        aux=p.aux.at[:n].set(aux0),
        mass=p.mass.at[:n].set(1e-3),
        vol=p.vol.at[:n].set(1e-6),
        active=p.active.at[:n].set(True),
    )
    cfg = cfg.with_materials([mid])
    return p, cfg


class TestPackRoundtrip:
    def test_roundtrip(self):
        p, cfg = _scene(777, cap_extra=55)
        st = packed.pack_particles(p)
        q = packed.unpack_particles(st, p.capacity)
        for f in dataclasses.fields(p):
            a, b = getattr(p, f.name), getattr(q, f.name)
            assert np.array_equal(np.asarray(a), np.asarray(b)), f.name

    def test_sort_matches_array_sort(self):
        from taichi_mpm_tpu.ops.blocked import sort_particles

        p, cfg = _scene(2000, cap_extra=31)
        st = packed.pack_particles(p)
        st_s, keys_s = packed.sort_packed(st, cfg)
        p_s, keys_a, _ = sort_particles(p, cfg)
        assert np.array_equal(
            np.asarray(keys_s)[: p.capacity], np.asarray(keys_a)
        )
        q = packed.unpack_particles(st_s, p.capacity)
        # stable sorts over identical keys -> identical permutation
        assert np.allclose(np.asarray(q.x), np.asarray(p_s.x))
        assert np.allclose(np.asarray(q.F), np.asarray(p_s.F))


@pytest.mark.parametrize("material", ["jelly", "sand", "water", "snow"])
def test_packed_frame_matches_blocked(material):
    p, cfg = _scene(2500, seed=1, material=material)
    colliders = (Collider(sdf=lambda x, t: x[..., 1] - 0.1, friction=0.3),)
    K = 512
    n_sub = 8
    p1, t1, _, _ = blocked_frame(
        p, jnp.float32(0.0), cfg, colliders, cfg.base_dt, n_sub, K,
        interpret=True,
    )
    p2, t2, _, _, _ = packed.packed_frame(
        p, jnp.float32(0.0), cfg, colliders, cfg.base_dt, n_sub, K,
        interpret=True,
    )
    assert np.asarray(p2.active).sum() == np.asarray(p1.active).sum()
    # same physics, different op order -> tight but not bitwise
    a1 = np.asarray(p1.active)
    # compare as position multisets via lexicographic sort (the two paths
    # may order particles differently after their internal sorts)
    x1 = np.asarray(p1.x)[a1]
    x2 = np.asarray(p2.x)[np.asarray(p2.active)]
    o1 = np.lexsort(x1.T)
    o2 = np.lexsort(x2.T)
    assert np.allclose(x1[o1], x2[o2], atol=5e-6)
    v1 = np.asarray(p1.v)[a1][o1]
    v2 = np.asarray(p2.v)[np.asarray(p2.active)][o2]
    assert np.allclose(v1, v2, atol=5e-5)


def test_packed_frame_vs_oracle():
    """Packed path vs the dense XLA oracle (core/transfer)."""
    p, cfg = _scene(1500, seed=2)
    colliders = (Collider(sdf=lambda x, t: x[..., 1] - 0.12, friction=-1.0),)
    n_sub = 6
    p1, _ = frame_fn(p, jnp.float32(0.0), cfg, colliders, cfg.base_dt, n_sub)
    p2, _, _, _, _ = packed.packed_frame(
        p, jnp.float32(0.0), cfg, colliders, cfg.base_dt, n_sub, 512,
        interpret=True,
    )
    x1 = np.asarray(p1.x)[np.asarray(p1.active)]
    x2 = np.asarray(p2.x)[np.asarray(p2.active)]
    o1, o2 = np.lexsort(x1.T), np.lexsort(x2.T)
    assert np.allclose(x1[o1], x2[o2], atol=1e-5)


def test_clean_boundary_and_collision_rows():
    p, cfg = _scene(800, seed=3)
    cfg = dataclasses.replace(cfg, clean_boundary=True, particle_collision=True)
    colliders = (Collider(sdf=lambda x, t: x[..., 1] - 0.2, friction=0.0),)
    p1, _, _, _ = blocked_frame(
        p, jnp.float32(0.0), cfg, colliders, cfg.base_dt, 4, 512,
        interpret=True,
    )
    p2, _, _, _, _ = packed.packed_frame(
        p, jnp.float32(0.0), cfg, colliders, cfg.base_dt, 4, 512,
        interpret=True,
    )
    assert np.asarray(p1.active).sum() == np.asarray(p2.active).sum()
    x1 = np.asarray(p1.x)[np.asarray(p1.active)]
    x2 = np.asarray(p2.x)[np.asarray(p2.active)]
    o1, o2 = np.lexsort(x1.T), np.lexsort(x2.T)
    assert np.allclose(x1[o1], x2[o2], atol=5e-6)
