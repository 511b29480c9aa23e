"""B-spline kernel unit tests.

Mirrors the reference's "mpm_kernel" test (partition of unity and zero
gradient sum over random positions, /root/reference/src/tests.cpp:13-33)
and extends it with interpolation-order (linear completeness) checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taichi_mpm_tpu.math.kernels import bspline_weights, inv_D, stencil_size

ORDERS = [1, 2, 3]


@pytest.mark.parametrize("order", ORDERS)
def test_partition_of_unity_and_gradient_sum(order):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(5.0, 50.0, size=(4096, 3)), jnp.float32)
    base, w, dw = bspline_weights(order, x)
    assert w.shape == (4096, 3, order + 1)
    np.testing.assert_allclose(np.sum(np.asarray(w), -1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(np.asarray(dw), -1), 0.0, atol=1e-5)


@pytest.mark.parametrize("order", ORDERS)
def test_linear_completeness(order):
    """sum_i w_i * x_i == x  and  sum_i dw_i * x_i == 1 (reproduces linears)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(5.0, 50.0, size=(1000,)), jnp.float32)
    base, w, dw = bspline_weights(order, x)
    nodes = base[:, None] + jnp.arange(stencil_size(order))[None, :]
    nodes = nodes.astype(jnp.float32)
    np.testing.assert_allclose(
        np.sum(np.asarray(w * nodes), -1), np.asarray(x), atol=2e-4
    )
    np.testing.assert_allclose(
        np.sum(np.asarray(dw * nodes), -1), 1.0, atol=2e-4
    )


@pytest.mark.parametrize("order", ORDERS)
def test_weights_nonnegative_and_support(order):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(5.0, 50.0, size=(1000,)), jnp.float32)
    base, w, dw = bspline_weights(order, x)
    assert np.asarray(w).min() >= -1e-6
    # Stencil must bracket the particle: node0 <= x <= node_last.
    assert np.all(np.asarray(base) <= np.asarray(x))
    assert np.all(np.asarray(base) + order >= np.asarray(x) - 1.0)


def test_quadratic_matches_mpm88_formula():
    """The quadratic weights must equal the canonical MLS-MPM88 formulas
    (w0=0.5(1.5-fx)^2, w1=0.75-(fx-1)^2, w2=0.5(fx-0.5)^2)."""
    rng = np.random.default_rng(3)
    x = rng.uniform(5.0, 50.0, size=(100,)).astype(np.float32)
    base_ref = np.floor(x - 0.5).astype(np.int32)
    fx = x - base_ref
    w_ref = np.stack(
        [0.5 * (1.5 - fx) ** 2, 0.75 - (fx - 1) ** 2, 0.5 * (fx - 0.5) ** 2], -1
    )
    base, w, _ = bspline_weights(2, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(base), base_ref)
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-6)


def test_inv_D():
    assert inv_D(2) == 4.0
    assert inv_D(3) == 3.0


def test_gradient_matches_finite_difference():
    x = jnp.linspace(5.2, 9.7, 257, dtype=jnp.float32)
    eps = 1e-3
    for order in ORDERS:
        _, wp, _ = bspline_weights(order, x + eps)
        _, wm, _ = bspline_weights(order, x - eps)
        _, _, dw = bspline_weights(order, x)
        fd = (np.asarray(wp) - np.asarray(wm)) / (2 * eps)
        # Only valid where base doesn't change across the fd step.
        bp, _, _ = bspline_weights(order, x + eps)
        bm, _, _ = bspline_weights(order, x - eps)
        mask = np.asarray(bp) == np.asarray(bm)
        np.testing.assert_allclose(
            fd[mask], np.asarray(dw)[mask], atol=5e-3
        )


def test_jittable():
    f = jax.jit(lambda x: bspline_weights(2, x))
    x = jnp.ones((8, 3), jnp.float32) * 7.3
    base, w, dw = f(x)
    assert w.shape == (8, 3, 3)
