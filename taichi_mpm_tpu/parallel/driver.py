"""DistributedMPM: the MPM scene driver over an N-chip device mesh.

The reference is single-node shared-memory (SURVEY.md:98: its only
"distributed backend" is a vestigial `#ifdef TC_USE_MPI`,
/root/reference/src/mpm.cpp:6-8); the TPU-native framework's scaling
axis is spatial sharding (SURVEY.md §2.3). This module is the USER
surface for it: the same scene API as `MPM` (`add_particles`,
`add_collider`, `step`, `simulate`, `visualize`, ...) with the frame
loop running under `shard_map` on a 1-D slab mesh — plain scenes on the
fully-fused packed pipeline (`parallel.spatial_blocked.
build_spatial_packed_frame`), CPIC scenes on the packed coupled frame
(replicated rigids, psum'd impulses). Load balancing (dynamic slab
bounds, the chip-level analog of the reference's TBB work stealing,
mpm.cpp:919-1014) is on by default.

All budgets (page map K, migration, near-rigid sets) follow the
framework's standard overflow discipline: the frame reports its demand,
the driver re-jits larger and re-runs the frame from the intact
pre-frame state — never dropping particles.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from taichi_mpm_tpu.core.solver import MPM
from taichi_mpm_tpu.parallel import spatial_blocked as sb
from taichi_mpm_tpu.parallel.spatial import shard_spatially


def _round64(n: int) -> int:
    return -(-int(n) // 64) * 64


class DistributedMPM(MPM):
    """Drop-in `MPM` over a 1-D slab mesh of devices.

    Extra constructor args:
      devices:    device list (default: all of `jax.devices()`)
      n_shards:   use the first n devices (default: all)
      mesh_shape: (Sx, Sy) for a 2-D pencil mesh instead of 1-D slabs
                  (the pod shape; per-axis load-balanced bounds unless
                  balanced=False or the grid is too small for slack)
      balanced:   load-balanced slab bounds (default True; falls back
                  to uniform slabs when the grid is too small to give
                  the boundaries any slack)
      r:          balance radius in block columns (default: max allowed)
      slack:      per-shard capacity factor over the initial max shard
                  occupancy (default 2.0)

    Differences from MPM: particle state lives sharded across the mesh;
    `add_particles` after the first step gathers to host and re-shards
    (sources work, but prefer seeding up front); the adaptive/async
    scheduler is single-chip only (use AsyncMPM).
    """

    def __init__(self, res: Sequence[int], *args,
                 devices=None, n_shards: Optional[int] = None,
                 mesh_shape: Optional[tuple] = None,
                 balanced: bool = True, r: Optional[int] = None,
                 slack: float = 2.0, **kw):
        super().__init__(res, *args, **kw)
        assert self.cfg.dim == 3, "DistributedMPM is 3-D only"
        if devices is None:
            devices = jax.devices()
        if n_shards is not None:
            devices = devices[:n_shards]
        self.slack = slack
        self._interpret = jax.default_backend() != "tpu"

        if mesh_shape is not None:
            # 2-D (x, y) pencil mesh — the pod shape. Load balancing is
            # per-axis marginal-histogram rebalanced bounds (the 2-D
            # generalization of the balanced slabs); when an axis's grid
            # is too small to give the boundaries slack, fall back to
            # uniform pencils on both axes.
            Sx, Sy = mesh_shape
            self.mesh = Mesh(
                np.asarray(devices[: Sx * Sy]).reshape(Sx, Sy), ("x", "y")
            )
            self.n_shards = Sx * Sy
            self.mesh2d = True
            self.r = None
            rs = []
            for ax, S in ((0, Sx), (1, Sy)):
                if balanced and self.cfg.res[ax] % 4 == 0:
                    CB = self.cfg.res[ax] // 4
                    u = np.round(np.linspace(0.0, CB, S + 1))
                    r_max = (int((u[1:] - u[:-1]).min()) - sb.MINW) // 2
                    rs.append(min(r_max, r) if r is not None else r_max)
                else:
                    rs.append(0)
            self.balanced = min(rs) >= 1
            self.rx, self.ry = (rs if self.balanced else (None, None))
            if not self.balanced:
                for ax, S in ((0, Sx), (1, Sy)):
                    assert self.cfg.res[ax] % (4 * S) == 0, (
                        f"res[{ax}]={self.cfg.res[ax]} must divide into "
                        f"whole blocks per pencil (4*{S})"
                    )
            self._bal = None
            self._dist_sizes = None
            self._frame_cache = {}
            return

        self.mesh = Mesh(np.asarray(devices), ("x",))
        self.n_shards = len(devices)
        self.axis = "x"
        self.mesh2d = False

        # balance radius: as much slack as the grid allows (bounds move
        # at most DMAX columns per rebalance regardless)
        if balanced and self.cfg.res[0] % 4 == 0:
            CB = self.cfg.res[0] // 4
            u = np.round(np.linspace(0.0, CB, self.n_shards + 1))
            r_max = (int((u[1:] - u[:-1]).min()) - sb.MINW) // 2
            if r is None:
                r = r_max
            assert r <= r_max, f"balance radius {r} > max {r_max}"
            self.r = int(r) if r >= 1 else None
        else:
            self.r = None
        self.balanced = self.r is not None
        if not self.balanced:
            assert self.cfg.res[0] % (4 * self.n_shards) == 0, (
                f"res[0]={self.cfg.res[0]} must divide into whole blocks "
                f"per shard (4*{self.n_shards}); pick a res[0] multiple "
                f"of {4 * self.n_shards} or enable balanced slabs"
            )
        self._bal = None  # balanced-bounds frame state (bounds+hists)
        self._dist_sizes = None  # (K, budget, near, b1, Kr)
        # compiled frames keyed by (n_substeps, sizes): re-sharding
        # (sources) and budget growth re-use earlier executables
        self._frame_cache = {}

    # -- sharding ------------------------------------------------------------

    def _shard(self):
        """Host-side (re)shard of the current particle pytree onto the
        mesh, leaving `slack` headroom per shard for drift/sources."""
        p = jax.tree.map(np.asarray, self.particles)
        if self.mesh2d:
            from taichi_mpm_tpu.parallel import spatial_mesh2d as sm

            shards = (self.mesh.shape["x"], self.mesh.shape["y"])
            if self.balanced:
                bx, by = sm.balanced_bounds2d_host(
                    p, self.cfg, shards, self.rx, self.ry
                )
                CBx, CBy, _, _, _ = sm.balanced_params2d(
                    self.cfg, shards, self.rx, self.ry
                )
                self._bal = (
                    jnp.asarray(bx, jnp.int32), jnp.asarray(by, jnp.int32),
                    jnp.zeros((CBx,), jnp.int32),
                    jnp.zeros((CBy,), jnp.int32),
                )
                self.particles = sm.shard_pencils_bounds(
                    p, self.cfg, self.mesh, bx, by, slack=self.slack
                )
            else:
                self.particles = sm.shard_pencils(
                    p, self.cfg, self.mesh, slack=self.slack
                )
        elif self.balanced:
            bounds = jnp.asarray(
                sb.balanced_bounds_host(p, self.cfg, self.n_shards, self.r),
                jnp.int32,
            )
            self._bal = (
                bounds, jnp.zeros((self.cfg.res[0] // 4,), jnp.int32)
            )
            self.particles = sb.shard_spatially_bounds(
                p, self.cfg, self.mesh, np.asarray(bounds),
                slack=self.slack,
            )
        else:
            self.particles = shard_spatially(
                p, self.cfg, self.mesh, slack=self.slack
            )
        self._frame_jit = None
        self._dist_sizes = None
        self._pcarry = None

    def _finalize(self, capacity: Optional[int] = None):
        super()._finalize(capacity)
        self._shard()

    def _inject(self, batch):
        """Post-finalize emission: gather to host, inject into the
        global pool, re-shard (sources land on their owning shard)."""
        self.particles = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a)), self.particles
        )
        super()._inject(batch)
        self._shard()

    def load(self, path: str):
        """Checkpoint resume: restore the global pytree, then re-shard
        onto the mesh (checkpoints are layout-agnostic — a single-chip
        save resumes distributed and vice versa)."""
        super().load(path)
        self._shard()

    # -- frame loop ----------------------------------------------------------

    def _initial_sizes(self):
        K = _round64(min(
            sb.blocked.total_blocks_padded(self._lcfg()),
            max(256, self._active_block_cap()),
        ))
        budget = _round64(max(256, self.particles.capacity // 64))
        if self.bodies is not None:
            near, b1, Kr = self._near_budget_cap()
            return [K, budget, _round64(near), _round64(b1), _round64(Kr)]
        return [K, budget, 0, 0, 0]

    def _lcfg(self):
        if self.mesh2d:
            from taichi_mpm_tpu.parallel import spatial_mesh2d as sm

            shards = (self.mesh.shape["x"], self.mesh.shape["y"])
            if self.balanced:
                return sm.balanced_params2d(
                    self.cfg, shards, self.rx, self.ry
                )[4]
            return sm.local_config(self.cfg, shards)
        if self.balanced:
            return sb.balanced_params(self.cfg, self.n_shards, self.r)[2]
        return sb.local_config(self.cfg, self.n_shards)

    def _build_dist_jit(self, n_substeps: int):
        # the key must pin everything baked into the compiled frame:
        # sizes, but also the config (a source can add a new material
        # via with_materials) and the collider/rigid-scene identities
        # (add_collider between steps must not reuse a stale frame)
        key = (
            n_substeps, self.bodies is not None,
            tuple(self._dist_sizes), self.cfg,
            tuple(id(c) for c in self.colliders), id(self.rigid_scene),
        )
        if key in self._frame_cache:
            return self._frame_cache[key]
        fn = self._build_dist_jit_uncached(n_substeps)
        self._frame_cache[key] = fn
        return fn

    def _build_dist_jit_uncached(self, n_substeps: int):
        cfg = self.cfg
        K, budget, near, b1, Kr = self._dist_sizes
        kw = dict(interpret=self._interpret)
        if self.mesh2d:
            from taichi_mpm_tpu.parallel import spatial_mesh2d as sm

            if self.bodies is not None:
                if self.balanced and self.fused:
                    return sm.build_spatial_cpic_packed_balanced_mesh2d_frame(
                        cfg, self.rigid_scene, n_substeps, self.mesh, K,
                        budget, near, b1, Kr, self.rx, self.ry, **kw)
                if self.balanced:
                    raise ValueError(
                        "TMT_FUSED=0 routes CPIC pencil scenes to the "
                        "uniform frame; pass balanced=False (or re-enable "
                        "the fused path) for unfused CPIC on a 2-D mesh"
                    )
                build = (sm.build_spatial_cpic_packed_mesh2d_frame
                         if self.fused else sm.build_spatial_cpic_mesh2d_frame)
                return build(cfg, self.rigid_scene, n_substeps, self.mesh,
                             K, budget, near, b1, Kr, **kw)
            if self.balanced:
                build = (sm.build_spatial_packed_balanced_mesh2d_frame
                         if self.fused
                         else sm.build_spatial_balanced_mesh2d_frame)
                return build(cfg, tuple(self.colliders), n_substeps,
                             self.mesh, K, budget, self.rx, self.ry, **kw)
            build = (sm.build_spatial_packed_mesh2d_frame
                     if self.fused else sm.build_spatial_mesh2d_frame)
            return build(cfg, tuple(self.colliders), n_substeps, self.mesh,
                         K, budget, **kw)
        if self.bodies is not None:
            scene = self.rigid_scene
            if self.balanced and self.fused:
                return sb.build_spatial_cpic_packed_balanced_frame(
                    cfg, scene, n_substeps, self.mesh, self.axis, K,
                    budget, near, b1, Kr, self.r, **kw,
                )
            if self.fused:
                return sb.build_spatial_cpic_packed_frame(
                    cfg, scene, n_substeps, self.mesh, self.axis, K,
                    budget, near, b1, Kr, **kw,
                )
            # unfused fallback: pytree CPIC (uniform slabs only)
            if self.cfg.res[0] % (4 * self.n_shards) != 0:
                raise ValueError(
                    "TMT_FUSED=0 routes CPIC scenes to the uniform-slab "
                    f"pytree frame: res[0]={self.cfg.res[0]} must divide "
                    f"into whole blocks per shard (4*{self.n_shards})"
                )
            return sb.build_spatial_cpic_frame(
                cfg, scene, n_substeps, self.mesh, self.axis, K, budget,
                near, b1, Kr, **kw,
            )
        colliders = tuple(self.colliders)
        if self.fused:
            return sb.build_spatial_packed_frame(
                cfg, colliders, n_substeps, self.mesh, self.axis, K,
                budget, self.r, **kw,
            )
        if self.balanced:
            return sb.build_spatial_balanced_frame(
                cfg, colliders, n_substeps, self.mesh, self.axis, K,
                budget, self.r, **kw,
            )
        return sb.build_spatial_blocked_frame(
            cfg, colliders, n_substeps, self.mesh, self.axis, K, budget,
            **kw,
        )

    def step(self, frame_dt: Optional[float] = None):
        """Advance one frame across the mesh (MPM.step semantics,
        mpm.cpp:428-450, with the multichip overflow auto-grow)."""
        if self.particles is None or self._pending:
            self._finalize()
        fdt = frame_dt or self.frame_dt
        n_sub = max(1, int(round(fdt / self.cfg.base_dt)))
        if self._dist_sizes is None:
            self._dist_sizes = self._initial_sizes()
            self._frame_jit = None
        if self._frame_jit is None:
            self._frame_jit = self._build_dist_jit(n_sub)
            self._frame_substeps = n_sub
        assert n_sub == self._frame_substeps, "frame_dt changed mid-run"

        cpic = self.bodies is not None
        bal_state = self.balanced and (self.fused or not cpic)
        local_cap = self.particles.capacity // self.n_shards
        nbt = sb.blocked.total_blocks_padded(self._lcfg())
        while True:
            args = (self.particles,)
            if cpic:
                args += (self.bodies,)
            args += (self.t,)
            if bal_state:
                args += tuple(self._bal)
            out = self._frame_jit(*args)
            out = list(out)
            p2 = out.pop(0)
            b2 = out.pop(0) if cpic else None
            t2 = out.pop(0)
            if bal_state:
                bal2 = tuple(out.pop(0) for _ in self._bal)
            needed, n_act = int(out.pop(0)), int(out.pop(0))
            n_near = int(out.pop(0)) if (cpic and out) else 0
            n_coarse = int(out.pop(0)) if (cpic and out) else 0
            n_r = int(out.pop(0)) if (cpic and out) else 0

            K, budget, near, b1, Kr = self._dist_sizes
            grow = False
            if needed > budget:
                if needed >= local_cap:
                    raise RuntimeError(
                        f"shard capacity exhausted ({needed} arrivals vs "
                        f"{local_cap} local slots); raise slack="
                    )
                budget, grow = _round64(2 * needed), True
            if n_act > K and K < nbt:
                K, grow = min(nbt, _round64(2 * n_act)), True
            if cpic:
                pcap = self.particles.capacity
                if n_coarse > b1 and b1 < pcap:
                    b1, grow = min(pcap, _round64(2 * n_coarse)), True
                elif n_near > near and near < pcap:
                    near, grow = min(pcap, _round64(2 * n_near)), True
                if n_r > Kr and Kr < nbt:
                    Kr, grow = min(nbt, _round64(2 * n_r)), True
            if not grow:
                self.particles, self.t = p2, t2
                if cpic:
                    self.bodies = b2
                if bal_state:
                    self._bal = bal2
                break
            self._dist_sizes = [K, budget, near, max(b1, near), Kr]
            self._frame_jit = self._build_dist_jit(n_sub)
        return self.particles


class DistributedAsyncMPM(DistributedMPM):
    """The per-block bucketed adaptive-dt scheduler (AsyncMPM
    per_block=True, the reference's async_mpm simulation type,
    async_mpm.cpp:426-427) over a 1-D slab device mesh
    (parallel/async_spatial): POT dt level per grid block with
    CROSS-SHARD neighbor monotonicity, lockstep global tick loop,
    budgeted bucket advances per shard.

    Plain (non-CPIC) scenes on uniform slabs; base_delta_t acts as the
    max dt and unit_delta_t as the POT unit, like AsyncMPM. All budgets
    (per-level context, context page map, main page map, migration)
    follow the standard overflow discipline: demand is reported pmax'd,
    the driver re-jits larger and re-runs the frame from the intact
    pre-frame state.
    """

    def __init__(self, res, *args, unit_delta_t: float = 1e-6,
                 strength_dt_mul: float = 1.0, cfl_dt_mul: float = 1.0,
                 budgets=None, K_ctx: Optional[int] = None, **kw):
        kw.setdefault("balanced", False)  # bucketed frames: uniform slabs
        assert not kw["balanced"], (
            "bucketed async runs on uniform slabs (balanced bounds are a "
            "uniform-dt frame feature so far)"
        )
        super().__init__(res, *args, **kw)
        assert not self.mesh2d, "bucketed async is slab-mesh (1-D) only"
        self.unit_delta_t = unit_delta_t
        self.strength_dt_mul = strength_dt_mul
        self.cfl_dt_mul = cfl_dt_mul
        self.update_counter = 0
        self._async_sizes = None
        self._budgets0 = budgets  # optional explicit initial sizes
        self._K_ctx0 = K_ctx

    def _build_async_jit(self):
        from taichi_mpm_tpu.ops.async_bucketed import MAXLEV
        from taichi_mpm_tpu.parallel.async_spatial import (
            build_bucketed_spatial_frame,
        )

        assert self.bodies is None, "adaptive dt + CPIC not supported yet"
        m = max(
            1, round(self.frame_dt / (self.unit_delta_t * (1 << MAXLEV)))
        )
        self._async_unit = self.frame_dt / (m * (1 << MAXLEV))
        K, budgets, K_ctx, mig = self._async_sizes
        return build_bucketed_spatial_frame(
            self.cfg, tuple(self.colliders), self.frame_dt,
            self._async_unit, self.mesh, self.axis, K, tuple(budgets),
            K_ctx, mig, self.strength_dt_mul, self.cfl_dt_mul,
            interpret=self._interpret,
        )

    def step(self, frame_dt: Optional[float] = None):
        from taichi_mpm_tpu.ops.async_bucketed import MAXLEV

        if self.particles is None or self._pending:
            self._finalize()
        assert frame_dt is None or frame_dt == self.frame_dt, (
            "frame_dt is baked into the bucketed tick loop"
        )
        from taichi_mpm_tpu.ops import packed

        local_cap = self.particles.capacity // self.n_shards
        pw = packed.padded_width(local_cap)
        if self._async_sizes is None:
            K = _round64(min(
                sb.blocked.total_blocks_padded(self._lcfg()),
                max(256, self._active_block_cap()),
            ))
            b0 = (list(self._budgets0) if self._budgets0 is not None
                  else [min(pw, 1024)] * (MAXLEV + 1))
            self._async_sizes = [
                K, b0, self._K_ctx0 or 256,
                _round64(max(64, local_cap // 64)),
            ]
            self._frame_jit = None
        if self._frame_jit is None:
            self._frame_jit = self._build_async_jit()

        nbt = sb.blocked.total_blocks_padded(self._lcfg())
        while True:
            (p2, t2, nup, nselmax, namax, namain, needed,
             nsorts) = self._frame_jit(self.particles, self.t)
            K, budgets, K_ctx, mig = self._async_sizes
            nselmax = np.asarray(nselmax)
            grow = False
            for L in range(MAXLEV + 1):
                if int(nselmax[L]) > budgets[L] and budgets[L] < pw:
                    budgets[L] = min(pw, _round64(2 * int(nselmax[L])))
                    grow = True
            if int(namax) > K_ctx:
                K_ctx, grow = _round64(2 * int(namax)), True
            if int(namain) > K and K < nbt:
                K, grow = min(nbt, _round64(2 * int(namain))), True
            if int(needed) > mig:
                if int(needed) >= local_cap:
                    raise RuntimeError(
                        f"shard capacity exhausted ({int(needed)} arrivals "
                        f"vs {local_cap} local slots); raise slack="
                    )
                mig, grow = _round64(2 * int(needed)), True
            if not grow:
                self.particles, self.t = p2, t2
                self.update_counter += int(nup)
                break
            self._async_sizes = [K, budgets, K_ctx, mig]
            self._frame_jit = self._build_async_jit()
        return self.particles
