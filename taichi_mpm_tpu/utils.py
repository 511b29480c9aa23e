"""Small shared utilities."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

HI = jax.lax.Precision.HIGHEST


def mm(a, b):
    """Matmul at full f32 precision; batched small (<=4) matrices are
    unrolled to elementwise ops (tiny batched dots pad onto the MXU and
    are ~100x slower on TPU)."""
    d = a.shape[-1]
    if a.ndim > 2 and d <= 4 and b.shape[-1] <= 4:
        rows = [
            jnp.stack(
                [
                    sum(a[..., i, k] * b[..., k, j] for k in range(d))
                    for j in range(b.shape[-1])
                ],
                -1,
            )
            for i in range(a.shape[-2])
        ]
        return jnp.stack(rows, -2)
    return jnp.matmul(a, b, precision=HI)


def pytree_dataclass(cls=None, *, meta_fields: tuple = ()):
    """Register a dataclass as a JAX pytree; `meta_fields` are static."""

    def wrap(c):
        c = dataclasses.dataclass(c)
        data_fields = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        )
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=tuple(meta_fields)
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def outer(a, b):
    """Batched outer product: (..., d) x (..., d) -> (..., d, d)."""
    return a[..., :, None] * b[..., None, :]


def mv(a, v):
    """Batched small matrix-vector product, unrolled (see mm)."""
    d = v.shape[-1]
    if d <= 4:
        return jnp.stack(
            [sum(a[..., i, k] * v[..., k] for k in range(d)) for i in range(a.shape[-2])],
            -1,
        )
    return jnp.einsum("...ij,...j->...i", a, v)
