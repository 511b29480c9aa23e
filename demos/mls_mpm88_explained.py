"""mls-mpm88, JAX edition — THE EXPLAINED VERSION.

The walkthrough analog of the reference's mls-mpm88-explained.cpp
(/root/reference/mls-mpm88-explained.cpp — David Medina's annotated
88-liner): the same 2-D Moving Least Squares Material Point Method as
demos/mls_mpm88.py, with every step spelled out, plus notes on what
changes when the loop body is a traced JAX program instead of a
per-particle C++ loop.

MPM in one paragraph
--------------------
MPM is a hybrid particle/grid method. Particles carry the persistent
state (position, velocity, deformation); the grid is a scratchpad
rebuilt every substep. Each substep:

  1. P2G   — particles scatter mass and momentum to nearby grid nodes,
  2. GRID  — nodes turn momentum into velocity, gain gravity, and
             enforce boundary conditions,
  3. G2P   — particles gather the new grid velocities and update their
             deformation gradient, then advect.

MLS-MPM (Hu et al. 2018) is the variant where the force and the APIC
affine-velocity transfer share one moving-least-squares reconstruction
— the stress contribution "rides along" in the same scatter as the
momentum, which is what makes an 88-line implementation possible.

The JAX twist
-------------
The reference iterates `for (auto &p : particles)` and scatters with
`grid[base_coord.x + i][...] += ...`. Under `jax.jit` there is no
mutation and no data-dependent loop: every step below is a whole-array
operation over ALL particles at once, and the scatter becomes
`grid.at[...].add(...)` — a functional scatter-add XLA turns into one
fused kernel. The 3x3 stencil loops are Python loops: they UNROLL at
trace time into nine static scatter/gather stages (static shapes are
what lets XLA tile work onto the TPU's vector/matrix units).
"""
import jax
import jax.numpy as jnp
import numpy as np

# -- simulation constants ---------------------------------------------------

n = 80                 # grid resolution: n x n cells over the unit square
dt = 1e-4              # substep — must resolve the elastic wave speed
frame_dt = 4e-3        # one printed frame = 40 substeps
dx, inv_dx = 1.0 / n, float(n)

gravity = 200.0        # the reference's scaled gravity (unit square world)
E, nu = 1e4, 0.2       # Young's modulus, Poisson ratio
hardening = 10.0       # snow stiffens when compressed
# Lamé parameters: mu (shear) and lambda (volumetric) from E, nu
mu_0 = E / (2 * (1 + nu))
lam_0 = E * nu / ((1 + nu) * (1 - 2 * nu))

p_vol = (dx * 0.5) ** 2   # each particle represents a quarter-cell area
p_rho = 1.0
p_mass = p_vol * p_rho


def polar_r(F):
    """Rotation factor R of the polar decomposition F = R S, closed
    form in 2-D: R is the rotation by the angle of (a+d, c-b). The
    corotated model measures stretch relative to this rotation so pure
    rigid rotation produces zero stress. (The reference calls a
    library `polar_decomp`; in 2-D two hypot-normalized numbers do it,
    and rsqrt keeps the whole thing branch-free for the VPU.)"""
    a, b, c, d = F[..., 0, 0], F[..., 0, 1], F[..., 1, 0], F[..., 1, 1]
    x, y = a + d, c - b
    s = jax.lax.rsqrt(jnp.maximum(x * x + y * y, 1e-20))
    cs, sn = x * s, y * s
    return jnp.stack([jnp.stack([cs, -sn], -1), jnp.stack([sn, cs], -1)], -2)


@jax.jit
def substep(x, v, F, C, Jp):
    """One MLS-MPM substep over every particle simultaneously.

    State (all leading-dim P arrays):
      x  (P, 2)    position
      v  (P, 2)    velocity
      F  (P, 2, 2) elastic deformation gradient
      C  (P, 2, 2) APIC affine velocity field (velocity gradient)
      Jp (P,)      plastic volume ratio (snow hardening memory)
    """
    # ---- locate each particle on the grid --------------------------------
    # Quadratic B-spline support covers 3x3 nodes. `base` is the lowest
    # node of that stencil; `fx` in [0.5, 1.5) is the particle's offset
    # from it in cell units.
    base = jnp.floor(x * inv_dx - 0.5).astype(jnp.int32)
    fx = x * inv_dx - base

    # Quadratic B-spline weights per axis — w[:, i, axis] is the weight
    # of stencil node i in {0,1,2}. They sum to 1 (partition of unity),
    # so scattering conserves mass and momentum exactly.
    w = jnp.stack(
        [0.5 * (1.5 - fx) ** 2,
         0.75 - (fx - 1.0) ** 2,
         0.5 * (fx - 0.5) ** 2], 1)                       # (P, 3, 2)

    # ---- constitutive model: fixed corotated + snow hardening ------------
    # Compression (Jp < 1) exponentially stiffens the material — the
    # classic Disney snow hardening.
    e = jnp.exp(hardening * (1.0 - Jp))
    mu, lam = mu_0 * e, lam_0 * e
    J = jnp.linalg.det(F)        # current volume ratio
    R = polar_r(F)

    # PK1 stress (times F^T): 2 mu (F - R) F^T penalizes stretch away
    # from the nearest rotation; lam J (J - 1) I penalizes volume
    # change. This is the force half of the MLS reconstruction.
    PF = (2 * mu[:, None, None] * (F - R) @ jnp.swapaxes(F, 1, 2)
          + (lam * J * (J - 1))[:, None, None] * jnp.eye(2))

    # MLS-MPM's key fusion: with quadratic B-splines the inverse inertia
    # tensor D = dx^2/4 I is constant, so the stress term folds into the
    # SAME affine matrix APIC already scatters. One scatter does both
    # momentum transfer and force application. (transfer.cpp:452-454 in
    # the big reference does the same fusion in 3-D.)
    D_inv = 4.0 * inv_dx * inv_dx
    stress = -(dt * p_vol) * (D_inv * PF)
    affine = stress + p_mass * C

    # ---- P2G: scatter mass and momentum ----------------------------------
    # grid[..., :2] accumulates momentum, grid[..., 2] mass. The (n+2)^2
    # grid leaves room for the stencil at the domain edge. The 3x3 loop
    # unrolls into 9 whole-array scatter-adds; `.at[].add()` is the
    # functional (race-free, deterministic) scatter — the TPU framework
    # in this repo replaces it with block-local matmul accumulation,
    # but the semantics are exactly this.
    grid = jnp.zeros((n + 2, n + 2, 3))
    for i in range(3):
        for j in range(3):
            off = jnp.array([i, j])
            dpos = (off - fx) * dx               # node position - particle
            wt = w[:, i, 0] * w[:, j, 1]         # tensor-product weight
            mv = p_mass * v + jnp.einsum("pab,pb->pa", affine, dpos)
            val = jnp.concatenate(
                [mv * wt[:, None], (p_mass * wt)[:, None]], 1)
            grid = grid.at[base[:, 0] + i, base[:, 1] + j].add(val)

    # ---- GRID: momentum -> velocity, gravity, boundaries ------------------
    m = grid[..., 2:3]
    gv = jnp.where(m > 0, grid[..., :2] / jnp.maximum(m, 1e-30), 0.0)
    gv = jnp.where(m > 0, gv + dt * jnp.array([0.0, -gravity]), gv)

    # Box boundary, three cells thick: side walls zero the normal (x)
    # velocity; floor and ceiling act as separating walls — they only
    # cancel velocity INTO the wall (the `< 0` / `> 0` guards), so
    # material can leave but not penetrate.
    idx = jnp.arange(n + 2)
    bx, by = jnp.meshgrid(idx, idx, indexing="ij")
    gv = jnp.where(((bx < 3) | (bx > n - 3))[..., None],
                   gv * jnp.array([0.0, 1.0]), gv)
    gv = jnp.where(((by < 3) & (gv[..., 1] < 0))[..., None],
                   gv * jnp.array([1.0, 0.0]), gv)
    gv = jnp.where(((by > n - 3) & (gv[..., 1] > 0))[..., None],
                   gv * jnp.array([1.0, 0.0]), gv)

    # ---- G2P: gather velocity and the affine field ------------------------
    # nv is the B-spline-weighted grid velocity; nC is the MLS velocity
    # gradient, reconstructed from the same 9 samples (4/dx^2 is D^-1
    # again). No extra stress pass — this is the other half of the MLS
    # fusion.
    nv = jnp.zeros_like(v)
    nC = jnp.zeros_like(C)
    for i in range(3):
        for j in range(3):
            dpos = jnp.array([i, j]) - fx        # in cell units here
            wt = (w[:, i, 0] * w[:, j, 1])[:, None]
            g = gv[base[:, 0] + i, base[:, 1] + j]
            nv = nv + wt * g
            nC = nC + 4 * inv_dx * (wt * g)[:, :, None] * dpos[:, None, :]

    # ---- advect + elastic/plastic update ----------------------------------
    # Positions clamp just inside the wall band (the pool analog of the
    # reference letting particles pile on the boundary).
    x = jnp.clip(x + dt * nv, 2.5 * dx, 1.0 - 2.5 * dx)

    # Elastic prediction: F <- (I + dt grad v) F.
    F = (jnp.eye(2) + dt * nC) @ F

    # Snow plasticity: clamp the singular values of F into the elastic
    # region [1-2.5e-2, 1+7.5e-3]; whatever stretch is clipped moves
    # into the plastic ratio Jp (and thereby into the hardening). The
    # reference clamps sig the same way inside its SVD.
    U, sig, Vt = jnp.linalg.svd(F)
    sig_c = jnp.clip(sig, 1.0 - 2.5e-2, 1.0 + 7.5e-3)
    Jp = jnp.clip(Jp * jnp.prod(sig, -1) / jnp.prod(sig_c, -1), 0.6, 20.0)
    F = U @ (sig_c[..., None] * Vt)

    return x, nv, F, nC, Jp


if __name__ == "__main__":
    # Two snow squares, one above the other — they fall, collide and
    # splat (the reference seeds three; the physics is identical).
    rng = np.random.default_rng(0)
    P = 8192
    x = jnp.asarray(
        np.concatenate([rng.random((P // 2, 2)) * 0.2 + [0.35, 0.6],
                        rng.random((P // 2, 2)) * 0.2 + [0.45, 0.25]]),
        jnp.float32)
    v = jnp.zeros((P, 2))
    F = jnp.tile(jnp.eye(2), (P, 1, 1))
    C = jnp.zeros((P, 2, 2))
    Jp = jnp.ones(P)
    for f in range(40):
        for _ in range(int(frame_dt / dt)):
            x, v, F, C, Jp = substep(x, v, F, C, Jp)
        print(f"frame {f:03d}  y in "
              f"[{float(x[:, 1].min()):.3f}, {float(x[:, 1].max()):.3f}]")
