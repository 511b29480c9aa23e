"""Adaptive time stepping: the TPU-native redesign of AsyncMPM.

The reference's async scheduler (/root/reference/src/async/async_mpm.cpp)
gives every 4^3 grid block its own power-of-two dt bucket and advances
buckets independently — inherently serial and allocation-heavy, hostile
to SPMD. The TPU redesign keeps the two ingredients that buy the
speedup while staying a single jitted program:

  * the same per-particle dt limits — material sound-speed CFL
    (get_allowed_dt, particles.cpp:254-280: dt <= cfl*dx/(c+|v|)) times
    ``strength_dt_mul``, and the advection CFL dx/|v| times
    ``cfl_dt_mul`` (update_dt_limits, async_mpm.cpp:90-254);
  * power-of-two snapping to multiples of ``unit_delta_t``
    (async_mpm.h:85-103), so dt stays stable between substeps instead of
    chattering with the velocity field.

The min-reduce over particles is global instead of per-block (one pmax
across shards in SPMD mode); the frame loop is a ``lax.while_loop``
whose substep count is data-dependent. Scenes dominated by one stiff
region lose the reference's locality advantage, but every substep runs
at full chip utilization, which is the trade the hardware wants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core.solver import MPM, substep
from taichi_mpm_tpu.core.state import Particles
from taichi_mpm_tpu.materials import models as materials


def dt_limit(
    p: Particles,
    cfg: SimConfig,
    strength_dt_mul: float = 1.0,
    cfl_dt_mul: float = 1.0,
    axis: str | None = None,
):
    """Global allowed dt: min over active particles of the material
    sound-speed limit and the advection CFL limit."""
    speed = jnp.linalg.norm(p.v, axis=-1)
    a_dt = materials.dispatch_allowed_dt(
        cfg.active_materials, p.mat, p.F, p.aux, p.params, p.vol, p.mass, speed, cfg.dx
    )
    big = jnp.float32(1e30)
    strength = jnp.min(jnp.where(p.active, a_dt, big)) * strength_dt_mul
    vmax = jnp.max(jnp.where(p.active, speed, 0.0))
    cfl = cfl_dt_mul * cfg.dx / jnp.maximum(vmax, 1e-30)
    limit = jnp.minimum(strength, cfl)
    if axis is not None:
        limit = jax.lax.pmin(limit, axis)
    return limit


def snap_pot(dt, unit_dt: float, max_dt: float):
    """Snap down to unit_dt * 2^k (the async scheduler's POT buckets,
    async_mpm.cpp:112-118), clamped to [unit_dt, max_dt]."""
    ratio = jnp.maximum(dt / unit_dt, 1.0)
    k = jnp.floor(jnp.log2(ratio))
    snapped = unit_dt * jnp.exp2(k)
    return jnp.clip(snapped, unit_dt, max_dt)


def adaptive_frame_fn(
    p: Particles,
    t,
    cfg: SimConfig,
    colliders,
    frame_dt: float,
    unit_dt: float,
    max_dt: float,
    strength_dt_mul: float = 1.0,
    cfl_dt_mul: float = 1.0,
    max_substeps: int = 100000,
):
    """Advance one frame with data-dependent substep count.

    Returns (particles, t, substeps_taken). The work metric
    (substeps x particles) is the reference's update_counter
    (mpm.cpp:436,449)."""
    t_end = t + frame_dt

    def cond(carry):
        _, tt, n = carry
        return (tt < t_end - 1e-9) & (n < max_substeps)

    def body(carry):
        pp, tt, n = carry
        dt = dt_limit(pp, cfg, strength_dt_mul, cfl_dt_mul)
        dt = snap_pot(dt, unit_dt, max_dt)
        dt = jnp.minimum(dt, t_end - tt)  # land exactly on the frame end
        pp, tt = substep(pp, tt, cfg, colliders, dt)
        return pp, tt, n + 1

    p, t, n = jax.lax.while_loop(cond, body, (p, t, jnp.int32(0)))
    return p, t, n


def adaptive_cpic_frame_fn(
    p: Particles,
    bodies,
    t,
    cfg: SimConfig,
    scene,
    frame_dt: float,
    unit_dt: float,
    max_dt: float,
    strength_dt_mul: float = 1.0,
    cfl_dt_mul: float = 1.0,
    max_substeps: int = 100000,
):
    """Adaptive-dt frame over the COUPLED (CPIC) oracle substep — the
    reference AsyncMPM reuses the full MPM::substep including rigid
    coupling (async_mpm.cpp:330); dt is the POT-snapped global limit,
    identical discipline to adaptive_frame_fn. Returns
    (particles, bodies, t, substeps_taken)."""
    from taichi_mpm_tpu.rigid.cpic import cpic_substep

    t_end = t + frame_dt

    def cond(carry):
        _, _, tt, n = carry
        return (tt < t_end - 1e-9) & (n < max_substeps)

    def body(carry):
        pp, bb, tt, n = carry
        dt = dt_limit(pp, cfg, strength_dt_mul, cfl_dt_mul)
        dt = snap_pot(dt, unit_dt, max_dt)
        dt = jnp.minimum(dt, t_end - tt)
        pp, bb, tt = cpic_substep(pp, bb, tt, cfg, scene, dt)
        return pp, bb, tt, n + 1

    p, bodies, t, n = jax.lax.while_loop(
        cond, body, (p, bodies, t, jnp.int32(0))
    )
    return p, bodies, t, n


class AsyncMPM(MPM):
    """Driver with adaptive dt (the reference's `async_mpm` simulation
    type, async_mpm.cpp:426-427, redesigned per module docstring).

    base_delta_t acts as the maximum dt; unit_delta_t as the minimum
    POT unit (reference default 1e-6, async_mpm.cpp:23).
    """

    def __init__(
        self,
        *args,
        unit_delta_t: float = 1e-6,
        strength_dt_mul: float = 1.0,
        cfl_dt_mul: float = 1.0,
        per_block: bool = False,
        **kw,
    ):
        """per_block=True selects the BUCKETED per-block scheduler
        (ops/async_bucketed — POT dt level per grid block, largest-
        first bucketed advance with time-consistent backups, the
        reference AsyncMPM design async_mpm.cpp:90-421); False keeps
        the global adaptive dt."""
        super().__init__(*args, **kw)
        self.unit_delta_t = unit_delta_t
        self.strength_dt_mul = strength_dt_mul
        self.cfl_dt_mul = cfl_dt_mul
        self.per_block = per_block
        self.update_counter = 0

    def _build_jit(self, n_substeps: int):
        if self.bodies is not None:
            return self._build_cpic_jit()
        cfg = self.cfg
        colliders = tuple(self.colliders)
        frame_dt = self.frame_dt
        unit = self.unit_delta_t
        max_dt = cfg.base_dt
        smul = self.strength_dt_mul
        cmul = self.cfl_dt_mul

        use_blocked = self.optimized
        if use_blocked is None:
            use_blocked = cfg.dim == 3 and jax.default_backend() == "tpu"
        if self.per_block:
            assert cfg.dim == 3, "per-block buckets are 3D-only"
            return self._build_bucketed_jit()
        if use_blocked and cfg.dim == 3:
            # adaptive dt over the packed Pallas path (VERDICT r1 #3)
            from taichi_mpm_tpu.ops.packed import packed_adaptive_frame

            cap = self._active_block_cap()
            self._blocked_cap = cap
            fused = self.fused  # fully-fused kernels (MPM.fused default)

            def fn(p, t):
                return packed_adaptive_frame(
                    p, t, cfg, colliders, frame_dt, unit, max_dt, cap,
                    smul, cmul, fused=fused,
                )

            return jax.jit(fn)
        self._blocked_cap = None

        def fn(p, t):
            p, t, n = adaptive_frame_fn(
                p, t, cfg, colliders, frame_dt, unit, max_dt, smul, cmul
            )
            return p, t, n, jnp.int32(0)

        return jax.jit(fn)

    def _build_cpic_jit(self):
        """Global adaptive dt over CPIC scenes (VERDICT r4 #5; the
        reference AsyncMPM runs the full coupled substep,
        async_mpm.cpp:330). Packed/fused production path when blocked
        is available; oracle coupled while-loop otherwise. Per-block
        buckets + CPIC stay unsupported."""
        assert not self.per_block, (
            "per-block bucketed dt + CPIC not supported yet; use "
            "AsyncMPM(per_block=False) for global adaptive dt"
        )
        cfg = self.cfg
        if self._use_blocked() and cfg.dim == 3 and self.fused:
            near, b1, Kr = self._near_budget_cap()
            return self._build_cpic_blocked_jit(
                0, self._active_block_cap(), near, b1, Kr
            )
        # oracle coupled adaptive frame (2D scenes / unfused fallback)
        self._blocked_cap = None
        scene = self.rigid_scene
        frame_dt, unit = self.frame_dt, self.unit_delta_t
        max_dt, smul, cmul = (
            cfg.base_dt, self.strength_dt_mul, self.cfl_dt_mul
        )

        def fn(p, bodies, t):
            return adaptive_cpic_frame_fn(
                p, bodies, t, cfg, scene, frame_dt, unit, max_dt,
                smul, cmul,
            )

        return jax.jit(fn)

    def _build_cpic_blocked_jit(self, n_substeps: int, cap: int,
                                near: int, b1: int, Kr: int):
        """Adaptive twin of MPM._build_cpic_blocked_jit: same budget
        bookkeeping (so MPM._step_impl's growth loop re-jits through
        this override), but the frame is
        cpic_packed_adaptive_frame_carry with a 9th output (substeps
        taken)."""
        if not self.fused:
            # Mosaic fallback path: no packed adaptive form unfused
            return self._build_cpic_jit()
        cfg = self.cfg
        scene = self.rigid_scene
        self._blocked_cap = cap
        self._near_budget = near
        self._near_b1 = b1
        self._rigid_cap = Kr
        _ = self.particles
        self._pcarry = None
        cap_p = self.particles.capacity
        self._cap_p = cap_p

        from taichi_mpm_tpu.ops import packed
        from taichi_mpm_tpu.rigid.cpic_packed import (
            cpic_packed_adaptive_frame_carry,
            cpic_packed_pack_carry,
        )

        frame_dt, unit = self.frame_dt, self.unit_delta_t
        max_dt, smul, cmul = (
            cfg.base_dt, self.strength_dt_mul, self.cfl_dt_mul
        )

        @jax.jit
        def pack_fn(p):
            return cpic_packed_pack_carry(p, cfg, cap, two_d=True)

        def fn(carry, bodies, t):
            (carry, bodies, t, n_act, n_near, n_coarse, n_r, _,
             plast, n) = cpic_packed_adaptive_frame_carry(
                carry, bodies, t, cfg, scene, frame_dt, unit, max_dt,
                cap, near, b1, Kr, smul, cmul,
            )
            return (carry, bodies, t, n_act, n_near, n_coarse, n_r,
                    plast, n)

        self._pack_jit = pack_fn
        self._unpack_jit = jax.jit(
            lambda st: packed.unpack_particles(st, cap_p)
        )
        return jax.jit(fn)

    def _build_bucketed_jit(self):
        """Per-block bucketed frame: budgets estimated on device from
        the t=0 level assignment, grown on overflow in step()."""
        import numpy as np

        from taichi_mpm_tpu.ops import packed
        from taichi_mpm_tpu.ops.async_bucketed import (
            MAXLEV,
            bucketed_frame,
            slot_levels,
        )
        from taichi_mpm_tpu.ops.blocked import nbr_at

        cfg = self.cfg
        colliders = tuple(self.colliders)
        cap = self._active_block_cap()
        self._blocked_cap = None  # bucketed path does its own growth
        # snap the unit so frame_dt = m * unit * 2^MAXLEV exactly
        m = max(1, round(self.frame_dt / (self.unit_delta_t * (1 << MAXLEV))))
        unit = self.frame_dt / (m * (1 << MAXLEV))
        smul, cmul = self.strength_dt_mul, self.cfl_dt_mul

        # size per-level budgets from the t=0 context demands
        @jax.jit
        def demands(p):
            st = packed.pack_particles(p)
            st, keys = packed.sort_packed(st, cfg)
            pm = packed.build_page_map_packed(keys, cfg, cap)
            lev = slot_levels(st, keys, pm, cfg, unit, smul, cmul)
            K = pm["ids"].shape[0]
            counts = pm["e_arr"] - pm["s_arr"]
            out = []
            slots = []
            for L in range(MAXLEV + 1):
                sel = lev == L
                ctx = sel
                for ox in range(3):
                    for oy in range(3):
                        for oz in range(3):
                            if (ox, oy, oz) == (1, 1, 1):
                                continue
                            nn = nbr_at(pm["nbr"], ox, oy, oz)
                            ctx = ctx | jnp.where(
                                nn < K, sel[jnp.minimum(nn, K - 1)], False
                            )
                out.append(jnp.sum(jnp.where(ctx, counts, 0)))
                slots.append(jnp.sum(ctx.astype(jnp.int32)))
            return jnp.stack(out), jnp.stack(slots)

        dem, slots = demands(self.particles)
        dem, slots = np.asarray(dem), np.asarray(slots)
        budgets = tuple(
            int(min(
                packed.padded_width(self.particles.capacity),
                -(-max(512, int(1.5 * d)) // 512) * 512,
            ))
            for d in dem
        )
        K_ctx = int(-(-max(64, int(2.0 * slots.max())) // 64) * 64)
        self._bucket_budgets = budgets
        self._bucket_Kctx = K_ctx
        self._bucket_unit = unit
        self._bucket_K = cap

        interp = jax.default_backend() != "tpu"
        fused = self.fused

        def fn(p, t):
            p, t, nup, nsel, nact, _ = bucketed_frame(
                p, t, cfg, colliders, self.frame_dt, unit, cap,
                budgets, K_ctx, smul, cmul, interpret=interp,
                fused=fused,
            )
            return p, t, nup, nsel, nact

        self._bucketed = True
        return jax.jit(fn)

    def step(self, frame_dt=None):
        if self.particles is None or self._pending:
            self._finalize()
        if self.bodies is not None:
            # CPIC scenes route through MPM.step (budget auto-grow +
            # Mosaic fallback); the adaptive frames report their
            # data-dependent substep count via last_substeps
            MPM.step(self, frame_dt)
            self.update_counter += (
                int(getattr(self, "last_substeps", 0))
                * int(self.particles.count())
            )
            return self.particles
        if self._frame_jit is None:
            self._frame_jit = self._build_jit(0)
            self._frame_substeps = 0
        if getattr(self, "per_block", False):
            return self._step_bucketed()
        while True:
            p, t, n, nmax = self._frame_jit(self.particles, self.t)
            cap = getattr(self, "_blocked_cap", None)
            if not cap:
                break
            from taichi_mpm_tpu.ops.blocked import total_blocks_padded

            nbt = total_blocks_padded(self.cfg)
            if int(nmax) <= cap or cap >= nbt:
                break
            # page-map overflow: re-jit larger, re-run the frame intact
            self._blocked_cap = int(min(nbt, -(-2 * int(nmax) // 64) * 64))
            cap2 = self._blocked_cap
            cfg, colliders = self.cfg, tuple(self.colliders)
            from taichi_mpm_tpu.ops.packed import packed_adaptive_frame

            frame_dt, unit = self.frame_dt, self.unit_delta_t
            max_dt, smul, cmul = (
                self.cfg.base_dt, self.strength_dt_mul, self.cfl_dt_mul
            )
            fused = self.fused
            self._frame_jit = jax.jit(
                lambda p, t: packed_adaptive_frame(
                    p, t, cfg, colliders, frame_dt, unit, max_dt, cap2,
                    smul, cmul, fused=fused,
                )
            )
        self.particles, self.t = p, t
        self.update_counter += int(n) * int(self.particles.count())
        self.last_substeps = int(n)
        return self.particles

    def visualize_scheduler(self, path: str):
        """Dump per-particle scheduler state to a BGEO: the material
        strength dt limit, the advection CFL limit, the combined limit,
        and (per_block mode) the particle's block dt LEVEL — the
        reference's async debug output (AsyncMPM::visualize,
        async_visualize.cpp:12-163)."""
        import numpy as np

        from taichi_mpm_tpu.io.bgeo import write_bgeo

        if self.particles is None or self._pending:
            self._finalize()
        p, cfg = self.particles, self.cfg
        speed = jnp.linalg.norm(p.v, axis=-1)
        a_dt = materials.dispatch_allowed_dt(
            cfg.active_materials, p.mat, p.F, p.aux, p.params, p.vol,
            p.mass, speed, cfg.dx,
        )
        cfl = self.cfl_dt_mul * cfg.dx / jnp.maximum(speed, 1e-30)
        strength = a_dt * self.strength_dt_mul
        limit = jnp.minimum(strength, cfl)
        act = np.asarray(p.active)
        attrs = {
            "limit_strength": np.asarray(strength)[act],
            "limit_cfl": np.asarray(cfl)[act],
            "limit": np.asarray(limit)[act],
        }
        if self.per_block:
            from taichi_mpm_tpu.ops import packed
            from taichi_mpm_tpu.ops.async_bucketed import (
                MAXLEV,
                slot_levels,
            )

            cap = self._active_block_cap()
            m = max(
                1, round(self.frame_dt / (self.unit_delta_t * (1 << MAXLEV)))
            )
            unit = self.frame_dt / (m * (1 << MAXLEV))

            @jax.jit
            def levels(p):
                st = packed.pack_particles(p)
                st, keys = packed.sort_packed(st, cfg)
                pm = packed.build_page_map_packed(keys, cfg, cap)
                lev = slot_levels(
                    st, keys, pm, cfg, unit, self.strength_dt_mul,
                    self.cfl_dt_mul,
                )
                K = pm["ids"].shape[0]
                lane_lev = jnp.where(
                    pm["slot_keys"] < K,
                    lev[jnp.minimum(pm["slot_keys"], K - 1)], -1
                )
                # return in sorted order with the sorted positions
                pw = st.shape[0] // packed.NCH
                xs = jnp.stack(
                    [packed.row(st, packed.RX + k, pw) for k in range(3)],
                    -1,
                )
                acts = packed.row(st, packed.RACT, pw) > 0.5
                return xs, lane_lev, acts

            xs, lane_lev, acts = levels(p)
            acts = np.asarray(acts)
            write_bgeo(
                path, np.asarray(xs)[acts],
                {
                    "dt_level": np.asarray(lane_lev)[acts].astype(np.float32),
                    "dt_block": (
                        unit * np.exp2(np.asarray(lane_lev)[acts])
                    ).astype(np.float32),
                },
            )
            return
        write_bgeo(path, np.asarray(p.x)[act], attrs)

    def _step_bucketed(self):
        """Bucketed frame with per-level budget / context-page-map
        overflow growth (re-jit + re-run, no state modified)."""
        import numpy as np

        from taichi_mpm_tpu.ops import packed
        from taichi_mpm_tpu.ops.async_bucketed import (
            MAXLEV,
            bucketed_frame,
        )

        cfg = self.cfg
        colliders = tuple(self.colliders)
        while True:
            p, t, nup, nsel, nact = self._frame_jit(self.particles, self.t)
            nsel = np.asarray(nsel)
            nact = int(nact)
            pwcap = packed.padded_width(self.particles.capacity)
            grow_b = [
                int(nsel[L]) > self._bucket_budgets[L]
                and self._bucket_budgets[L] < pwcap
                for L in range(MAXLEV + 1)
            ]
            grow_k = nact > self._bucket_Kctx
            if not (any(grow_b) or grow_k):
                break
            budgets = tuple(
                int(min(pwcap, -(-2 * int(nsel[L]) // 512) * 512))
                if grow_b[L] else self._bucket_budgets[L]
                for L in range(MAXLEV + 1)
            )
            if grow_k:
                self._bucket_Kctx = int(-(-2 * nact // 64) * 64)
            self._bucket_budgets = budgets
            unit, cap, K_ctx = (
                self._bucket_unit, self._bucket_K, self._bucket_Kctx
            )
            smul, cmul = self.strength_dt_mul, self.cfl_dt_mul

            interp = jax.default_backend() != "tpu"
            fused = self.fused

            def fn(p, t):
                p, t, nup, nsel, nact, _ = bucketed_frame(
                    p, t, cfg, colliders, self.frame_dt, unit, cap,
                    budgets, K_ctx, smul, cmul, interpret=interp,
                    fused=fused,
                )
                return p, t, nup, nsel, nact

            self._frame_jit = jax.jit(fn)
        self.particles, self.t = p, t
        self.update_counter += int(nup)
        return self.particles
