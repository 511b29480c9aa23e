"""B-spline interpolation kernels for MPM transfers.

TPU-native re-implementation of the reference kernels
(``/root/reference/src/kernel.h:73-166``): linear (order 1), quadratic
(order 2, the MLS-MPM default) and cubic (order 3) tensor-product
B-splines. All functions are pure, vectorized over a leading batch of
positions, and jit/vmap friendly (static shapes, no Python branching on
traced values).

Conventions (identical to the reference):
  * Positions are in *grid units* (``x_grid = x_phys / dx``).
  * ``stencil_start(order, x)``: the lowest grid-node index touched:
    order 1 -> floor(x); order 2 -> floor(x - 0.5); order 3 -> floor(x) - 1.
  * ``inv_D(order) = 6 - order`` (``kernel.h:68-70``): the MLS-MPM/APIC
    inertia-tensor inverse scale (4 for quadratic).
  * Weights are returned per-axis with shape ``(..., dim, order+1)``;
    the full tensor-product weight of node offset (i, j, k) is
    ``w[..., 0, i] * w[..., 1, j] * w[..., 2, k]``.
  * Gradients ``dw`` are with respect to the grid-unit coordinate; divide
    by dx for physical-space gradients.
"""

from __future__ import annotations

import jax.numpy as jnp


def inv_D(order: int) -> float:
    """MLS/APIC D-matrix inverse scale: 4 (quadratic), 3 (cubic)."""
    return float(6 - order)


def stencil_size(order: int) -> int:
    return order + 1


def stencil_start(order: int, x: jnp.ndarray) -> jnp.ndarray:
    """Lowest node index of the interpolation stencil (int32).

    Mirrors ``get_stencil_start`` in kernel.h:88,119,149.
    """
    if order == 1:
        return jnp.floor(x).astype(jnp.int32)
    elif order == 2:
        return jnp.floor(x - 0.5).astype(jnp.int32)
    elif order == 3:
        return jnp.floor(x).astype(jnp.int32) - 1
    raise ValueError(f"unsupported B-spline order {order}")


def bspline_weights(order: int, x: jnp.ndarray):
    """Per-axis B-spline weights and grid-unit gradients.

    Args:
      order: 1, 2 or 3.
      x: positions in grid units, shape (..., dim) (or any shape; the
         kernel acts elementwise on the last axis).

    Returns:
      (base, w, dw): base int32 stencil start with the same shape as x;
      w and dw with shape x.shape + (order+1,).
    """
    base = stencil_start(order, x)
    fx = x - base.astype(x.dtype)  # fractional offset to the first node
    if order == 1:
        # fx in [0, 1)
        w = jnp.stack([1.0 - fx, fx], axis=-1)
        dw = jnp.stack([-jnp.ones_like(fx), jnp.ones_like(fx)], axis=-1)
    elif order == 2:
        # fx in [0.5, 1.5); distances to nodes: fx, fx-1, fx-2
        w = jnp.stack(
            [
                0.5 * (1.5 - fx) ** 2,
                0.75 - (fx - 1.0) ** 2,
                0.5 * (fx - 0.5) ** 2,
            ],
            axis=-1,
        )
        dw = jnp.stack([fx - 1.5, -2.0 * (fx - 1.0), fx - 0.5], axis=-1)
    elif order == 3:
        # fx in [1, 2); signed distances t_m = fx - m for node offsets m.
        t0 = fx  # in [1, 2)
        t1 = fx - 1.0  # in [0, 1)
        t2 = fx - 2.0  # in (-1, 0]
        t3 = fx - 3.0  # in (-2, -1]
        w = jnp.stack(
            [
                (-1.0 / 6.0) * t0**3 + t0**2 - 2.0 * t0 + 4.0 / 3.0,
                0.5 * t1**3 - t1**2 + 2.0 / 3.0,
                -0.5 * t2**3 - t2**2 + 2.0 / 3.0,
                (1.0 / 6.0) * t3**3 + t3**2 + 2.0 * t3 + 4.0 / 3.0,
            ],
            axis=-1,
        )
        dw = jnp.stack(
            [
                -0.5 * t0**2 + 2.0 * t0 - 2.0,
                1.5 * t1**2 - 2.0 * t1,
                -1.5 * t2**2 - 2.0 * t2,
                0.5 * t3**2 + 2.0 * t3 + 2.0,
            ],
            axis=-1,
        )
    else:
        raise ValueError(f"unsupported B-spline order {order}")
    return base, w, dw
