"""mls-mpm88, JAX edition — a self-contained dense-grid 2D MLS-MPM in
~88 lines, the pedagogical analog of the reference's mls-mpm88.cpp
(/root/reference/mls-mpm88.cpp: 80x80 grid, fixed corotated + snow
plasticity, sticky box boundary). One jitted substep, no framework.
Run:  python demos/mls_mpm88.py  (prints the particle bounds per frame)
"""
import jax
import jax.numpy as jnp
import numpy as np

n, dt, frame_dt = 80, 1e-4, 4e-3
dx, inv_dx = 1.0 / n, float(n)
gravity, E, nu, hardening = 200.0, 1e4, 0.2, 10.0
mu_0, lam_0 = E / (2 * (1 + nu)), E * nu / ((1 + nu) * (1 - 2 * nu))
p_vol, p_rho = (dx * 0.5) ** 2, 1.0
p_mass = p_vol * p_rho


def polar_r(F):  # 2x2 rotation factor of F (closed form)
    a, b, c, d = F[..., 0, 0], F[..., 0, 1], F[..., 1, 0], F[..., 1, 1]
    x, y = a + d, c - b
    s = jax.lax.rsqrt(jnp.maximum(x * x + y * y, 1e-20))
    cs, sn = x * s, y * s
    return jnp.stack(
        [jnp.stack([cs, -sn], -1), jnp.stack([sn, cs], -1)], -2
    )


@jax.jit
def substep(x, v, F, C, Jp):
    base = jnp.floor(x * inv_dx - 0.5).astype(jnp.int32)
    fx = x * inv_dx - base
    w = jnp.stack(
        [0.5 * (1.5 - fx) ** 2, 0.75 - (fx - 1.0) ** 2, 0.5 * (fx - 0.5) ** 2], 1
    )  # (P, 3, 2)
    e = jnp.exp(hardening * (1.0 - Jp))
    mu, lam = mu_0 * e, lam_0 * e
    J = jnp.linalg.det(F)
    R = polar_r(F)
    # fixed corotated PK1 F^T, fused into the APIC affine (mls-mpm88.cpp advance())
    D_inv = 4.0 * inv_dx * inv_dx
    PF = 2 * mu[:, None, None] * (F - R) @ jnp.swapaxes(F, 1, 2) + (
        lam * J * (J - 1)
    )[:, None, None] * jnp.eye(2)
    stress = -(dt * p_vol) * (D_inv * PF)
    affine = stress + p_mass * C

    grid = jnp.zeros((n + 2, n + 2, 3))
    for i in range(3):
        for j in range(3):
            off = jnp.array([i, j])
            dpos = (off - fx) * dx
            wt = w[:, i, 0] * w[:, j, 1]
            mv = p_mass * v + jnp.einsum("pab,pb->pa", affine, dpos)
            val = jnp.concatenate([mv * wt[:, None], (p_mass * wt)[:, None]], 1)
            grid = grid.at[base[:, 0] + i, base[:, 1] + j].add(val)

    m = grid[..., 2:3]
    gv = jnp.where(m > 0, grid[..., :2] / jnp.maximum(m, 1e-30), 0.0)
    gv = jnp.where(m > 0, gv + dt * jnp.array([0.0, -gravity]), gv)
    idx = jnp.arange(n + 2)
    bx, by = jnp.meshgrid(idx, idx, indexing="ij")
    gv = jnp.where(((bx < 3) | (bx > n - 3))[..., None], gv * jnp.array([0.0, 1.0]), gv)
    gv = jnp.where(((by < 3) & (gv[..., 1] < 0))[..., None], gv * jnp.array([1.0, 0.0]), gv)
    gv = jnp.where(((by > n - 3) & (gv[..., 1] > 0))[..., None], gv * jnp.array([1.0, 0.0]), gv)

    nv = jnp.zeros_like(v)
    nC = jnp.zeros_like(C)
    for i in range(3):
        for j in range(3):
            dpos = jnp.array([i, j]) - fx
            wt = (w[:, i, 0] * w[:, j, 1])[:, None]
            g = gv[base[:, 0] + i, base[:, 1] + j]
            nv = nv + wt * g
            nC = nC + 4 * inv_dx * (wt * g)[:, :, None] * dpos[:, None, :]
    x = jnp.clip(x + dt * nv, 2.5 * dx, 1.0 - 2.5 * dx)
    F = (jnp.eye(2) + dt * nC) @ F
    # snow plasticity: clamp singular values (mls-mpm88.cpp plasticity)
    U, sig, Vt = jnp.linalg.svd(F)
    sig_c = jnp.clip(sig, 1.0 - 2.5e-2, 1.0 + 7.5e-3)
    Jp = jnp.clip(Jp * jnp.prod(sig, -1) / jnp.prod(sig_c, -1), 0.6, 20.0)
    F = U @ (sig_c[..., None] * Vt)
    return x, nv, F, nC, Jp


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    P = 8192
    x = jnp.asarray(
        np.concatenate([rng.random((P // 2, 2)) * 0.2 + [0.35, 0.6],
                        rng.random((P // 2, 2)) * 0.2 + [0.45, 0.25]]), jnp.float32)
    v = jnp.zeros((P, 2)); F = jnp.tile(jnp.eye(2), (P, 1, 1))
    C = jnp.zeros((P, 2, 2)); Jp = jnp.ones(P)
    for f in range(40):
        for _ in range(int(frame_dt / dt)):
            x, v, F, C, Jp = substep(x, v, F, C, Jp)
        print(f"frame {f:03d}  y in [{float(x[:,1].min()):.3f}, {float(x[:,1].max()):.3f}]")
