"""MPM solver driver: the user-facing API and the jitted substep loop.

Plays the role of ``MPM<dim>`` (/root/reference/src/mpm.h:56-489 /
mpm.cpp:26-979) redesigned functionally: simulation state is a pytree,
one frame is ``lax.scan`` over substeps, and the whole frame is a single
jitted computation. Scene construction (add_particles / colliders)
happens host-side in numpy before the first step.

Substep pipeline (reference substep, mpm.cpp:452-575, minus CPIC which
lives in taichi_mpm_tpu.rigid):

    P2G scatter -> grid normalize + gravity -> boundary projection
    -> G2P gather + F-update + plasticity + advect
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core import transfer
from taichi_mpm_tpu.core.state import Particles, empty_particles
from taichi_mpm_tpu.materials import models as materials


def substep(p: Particles, t, cfg: SimConfig, colliders, dt):
    grid = transfer.p2g(p, cfg, dt)
    grid_v, _ = transfer.grid_update(grid, cfg, colliders, t, dt)
    p = transfer.g2p(p, grid_v, cfg, dt)
    return p, t + dt


def frame_fn(p: Particles, t, cfg: SimConfig, colliders, dt, n_substeps: int):
    def body(carry, _):
        pp, tt = carry
        pp, tt = substep(pp, tt, cfg, colliders, dt)
        return (pp, tt), None

    (p, t), _ = jax.lax.scan(body, (p, t), None, length=n_substeps)
    return p, t


def mechanical_energy(p: Particles, cfg: SimConfig):
    """Kinetic + elastic potential + gravitational potential.

    The conservation diagnostic used by the benchmark scenes
    (mpm.cpp:1078-1110; scripts/benchmark/colliding_balls_energy.py).
    """
    act = p.active
    m = jnp.where(act, p.mass, 0.0)
    kinetic = 0.5 * jnp.sum(m * jnp.sum(p.v * p.v, -1))
    pot = materials.dispatch_potential_energy(
        cfg.active_materials, p.mat, p.F, p.aux, p.params, p.vol
    )
    elastic = jnp.sum(jnp.where(act, pot, 0.0))
    g = jnp.asarray(cfg.gravity, jnp.float32)
    grav = -jnp.sum(m * jnp.sum(p.x * g, -1))
    return kinetic + elastic + grav


class MPM:
    """Scene-level driver, mirroring the reference Python API
    (README.md:232-377: ``MPM(res=...)``, ``add_particles``, ``step``)."""

    def __init__(
        self,
        res: Sequence[int],
        dx: float = 0.0,
        base_delta_t: float = 1e-4,
        frame_dt: float = 1e-2,
        gravity: Optional[Sequence[float]] = None,
        **cfg_kw,
    ):
        res = tuple(int(r) for r in res)
        if gravity is None:
            gravity = (0.0, -10.0, 0.0)[: len(res)] if len(res) == 3 else (0.0, -10.0)
        self.cfg = SimConfig(
            res=res, dx=dx, base_dt=base_delta_t, gravity=tuple(gravity), **cfg_kw
        )
        self.frame_dt = frame_dt
        self.colliders: List = []
        self._pending: List[dict] = []
        self.particles: Optional[Particles] = None
        self.t = jnp.float32(0.0)
        self._frame_jit = None
        # CPIC rigid-body state (built lazily on the first type='rigid')
        self._rigid_builder = None
        self.bodies = None
        self.rigid_scene = None

    # -- scene construction -------------------------------------------------

    def add_particles(
        self,
        type: str,
        pos: Optional[np.ndarray] = None,
        vel: Optional[np.ndarray] = None,
        density: Optional[float] = None,
        ppc: float = 8.0,
        mass: Optional[float] = None,
        vol: Optional[float] = None,
        **mat_kw,
    ):
        """Seed particles of a material at explicit positions, or add a
        rigid body (type='rigid', reference mpm_rigid_body.cpp:135-271).

        vol = dx^d / ppc and mass = vol * density by default
        (mpm.cpp:134-135). Explicit mass/vol override for oracle scenes.
        """
        if type == "rigid":
            return self._add_rigid(
                density=density,
                initial_velocity=vel,
                **mat_kw,
            )
        if density is None:
            density = 400.0
        pos = np.asarray(pos, np.float32)
        n, d = pos.shape
        assert d == self.cfg.dim
        mat_id, params, aux0 = materials.pack_params(type, **mat_kw)
        v = np.zeros((n, d), np.float32)
        if vel is not None:
            v[:] = np.asarray(vel, np.float32)
        vol_ = float(vol) if vol is not None else self.cfg.dx**d / ppc
        mass_ = float(mass) if mass is not None else vol_ * density
        self._pending.append(
            dict(
                x=pos,
                v=v,
                mat=np.full((n,), mat_id, np.int32),
                params=np.broadcast_to(
                    np.asarray(params, np.float32), (n, 8)
                ).copy(),
                aux=np.full((n,), aux0, np.float32),
                mass=np.full((n,), mass_, np.float32),
                vol=np.full((n,), vol_, np.float32),
            )
        )
        self._frame_jit = None
        return n

    def add_collider(self, collider):
        self.colliders.append(collider)
        self._frame_jit = None

    # -- rigid bodies (CPIC) ---------------------------------------------------

    def _add_rigid(self, mesh=None, mesh_fn: Optional[str] = None, **kw) -> int:
        """Add a rigid body; returns its id (>= 1; 0 is the background)."""
        from taichi_mpm_tpu.rigid.mesh import load_obj
        from taichi_mpm_tpu.rigid.scene import RigidSceneBuilder

        if self._rigid_builder is None:
            self._rigid_builder = RigidSceneBuilder(self.cfg.dim, self.cfg.dx)
        if mesh is None:
            assert mesh_fn, "rigid body needs mesh= (array) or mesh_fn= (obj path)"
            mesh = load_obj(mesh_fn)
        rid = self._rigid_builder.add_rigid(mesh, t0=float(self.t), **kw)
        self._frame_jit = None
        return rid

    def add_articulation(self, type: str, obj0: int, obj1: int = 0, **kw):
        """Constrain two rigid bodies (reference general_action
        'add_articulation', mpm.cpp:921-933)."""
        assert self._rigid_builder is not None, "add rigid bodies first"
        self._rigid_builder.add_articulation(type, obj0, obj1, **kw)
        self._frame_jit = None

    # -- state finalization --------------------------------------------------

    def _finalize(self, capacity: Optional[int] = None):
        assert self._pending, "no particles added"
        cat = {
            k: np.concatenate([b[k] for b in self._pending], 0)
            for k in self._pending[0]
        }
        n = cat["x"].shape[0]
        d = self.cfg.dim
        cap = capacity or n
        p = empty_particles(cap, d)
        sl = slice(0, n)
        p = dataclasses.replace(
            p,
            x=p.x.at[sl].set(cat["x"]),
            v=p.v.at[sl].set(cat["v"]),
            mat=p.mat.at[sl].set(cat["mat"]),
            params=p.params.at[sl].set(cat["params"]),
            aux=p.aux.at[sl].set(cat["aux"]),
            mass=p.mass.at[sl].set(cat["mass"]),
            vol=p.vol.at[sl].set(cat["vol"]),
            active=p.active.at[sl].set(True),
        )
        mats = tuple(int(m) for m in np.unique(cat["mat"]))
        self.cfg = self.cfg.with_materials(mats)
        self.particles = p
        self._pending = []
        if self._rigid_builder is not None:
            self.bodies, self.rigid_scene = self._rigid_builder.build(
                tuple(self.colliders)
            )
            self.cfg = dataclasses.replace(
                self.cfg, num_rigids=self._rigid_builder.num
            )

    def _build_jit(self, n_substeps: int):
        cfg = self.cfg
        colliders = tuple(self.colliders)

        if self.bodies is not None:
            from taichi_mpm_tpu.rigid.cpic import cpic_substep

            scene = self.rigid_scene

            def fn(p, bodies, t):
                def body(carry, _):
                    pp, bb, tt = carry
                    pp, bb, tt = cpic_substep(pp, bb, tt, cfg, scene, cfg.base_dt)
                    return (pp, bb, tt), None

                (p, bodies, t), _ = jax.lax.scan(
                    body, (p, bodies, t), None, length=n_substeps
                )
                return p, bodies, t

            return jax.jit(fn)

        def fn(p, t):
            return frame_fn(p, t, cfg, colliders, cfg.base_dt, n_substeps)

        return jax.jit(fn)

    # -- time stepping --------------------------------------------------------

    def step(self, frame_dt: Optional[float] = None):
        """Advance one frame (reference MPM::step, mpm.cpp:428-450)."""
        if self.particles is None or self._pending:
            self._finalize()
        fdt = frame_dt or self.frame_dt
        n_sub = max(1, int(round(fdt / self.cfg.base_dt)))
        if self._frame_jit is None:
            self._frame_jit = self._build_jit(n_sub)
            self._frame_substeps = n_sub
        assert n_sub == self._frame_substeps, "frame_dt changed mid-run"
        if self.bodies is not None:
            self.particles, self.bodies, self.t = self._frame_jit(
                self.particles, self.bodies, self.t
            )
        else:
            self.particles, self.t = self._frame_jit(self.particles, self.t)
        return self.particles

    def simulate(self, num_frames: int, frame_update=None):
        for f in range(num_frames):
            if frame_update is not None:
                frame_update(self, f)
            self.step()
        return self.particles

    # -- diagnostics ----------------------------------------------------------

    def energy(self) -> float:
        if self.particles is None:
            self._finalize()
        return float(mechanical_energy(self.particles, self.cfg))

    def positions(self) -> np.ndarray:
        p = self.particles
        act = np.asarray(p.active)
        return np.asarray(p.x)[act]

    def velocities(self) -> np.ndarray:
        p = self.particles
        act = np.asarray(p.active)
        return np.asarray(p.v)[act]
