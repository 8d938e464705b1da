"""Smoother tests — explicit-formula and sweep-order oracles (SURVEY.md §4.1).

The RB-GS color/order tests are the guard against the #1 hard part in
SURVEY.md §7: silently turning Gauss-Seidel into Jacobi.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from multigridcmt_tpu.grids import interior, pad_interior
from multigridcmt_tpu.ops import smoothers

import reference_impl as ref


def _pad(a):
    return pad_interior(jnp.asarray(a))


@pytest.mark.parametrize("ndim,n", [(1, 31), (2, 15)])
def test_jacobi_matches_reference(ndim, n):
    h = 1.0 / (n + 1)
    omega = ref.default_omega(ndim)
    rng = np.random.default_rng(0)
    u = rng.standard_normal((n,) * ndim)
    b = rng.standard_normal((n,) * ndim)
    want = ref.jacobi(u, b, h, omega)
    got = interior(smoothers.jacobi(_pad(u), _pad(b), h, omega))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-13)


@pytest.mark.parametrize("ndim,n", [(1, 31), (2, 15), (2, 16 - 1)])
def test_rbgs_matches_reference(ndim, n):
    h = 1.0 / (n + 1)
    rng = np.random.default_rng(1)
    u = rng.standard_normal((n,) * ndim)
    b = rng.standard_normal((n,) * ndim)
    want = ref.rbgs(u, b, h)
    got = interior(smoothers.rbgs(_pad(u), _pad(b), h))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-13)


def test_rbgs_half_sweep_touches_only_one_color():
    n = 15
    h = 1.0 / (n + 1)
    rng = np.random.default_rng(2)
    u = rng.standard_normal((n, n))
    b = rng.standard_normal((n, n))
    red = np.asarray(interior(smoothers.rbgs_half_sweep(
        _pad(u), _pad(b), h, parity=0)))
    ii, jj = np.meshgrid(np.arange(1, n + 1), np.arange(1, n + 1),
                         indexing="ij")
    black_mask = ((ii + jj) % 2) == 1
    # Black points unchanged by the red half-sweep.
    np.testing.assert_array_equal(red[black_mask], u[black_mask])
    # At least the red points changed.
    assert not np.allclose(red[~black_mask], u[~black_mask])


def test_rbgs_black_sweep_sees_updated_red():
    """The black half-sweep must consume red values written by the red
    half-sweep — i.e. RB-GS is Gauss-Seidel, not two-color Jacobi."""
    n = 15
    h = 1.0 / (n + 1)
    rng = np.random.default_rng(3)
    u = rng.standard_normal((n, n))
    b = rng.standard_normal((n, n))
    got = np.asarray(interior(smoothers.rbgs(_pad(u), _pad(b), h)))
    # Two-color *Jacobi* (both colors from the old u) gives a different
    # answer; make sure we do NOT match it.
    upd_old = np.asarray(interior(smoothers._gs_update(_pad(u), _pad(b), h)))
    assert not np.allclose(got, upd_old)
    np.testing.assert_allclose(got, ref.rbgs(u, b, h), rtol=1e-13)


def test_jacobi_explicit_formula():
    """One sweep equals x + omega/d * (b - Ax) element-wise."""
    n = 7
    h = 1.0 / (n + 1)
    omega = 0.5
    rng = np.random.default_rng(4)
    u = rng.standard_normal(n)
    b = rng.standard_normal(n)
    d = 2.0 / (h * h)
    r = ref.residual(u, b, h)
    want = u + (omega / d) * r
    got = interior(smoothers.jacobi(_pad(u), _pad(b), h, omega))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-13)


def test_smoother_reduces_error():
    """Smoothing drives the error of a random guess toward the solution."""
    n = 31
    h = 1.0 / (n + 1)
    rng = np.random.default_rng(5)
    x_true = rng.standard_normal((n, n))
    b = -ref.residual(x_true, np.zeros((n, n)), h)   # b = A x_true
    u = jnp.zeros((n + 2, n + 2))
    bp = _pad(b)
    e0 = float(jnp.linalg.norm(interior(u) - x_true))
    for kind in ("jacobi", "rbgs"):
        uu = smoothers.smooth(u, bp, h, kind=kind,
                              omega=ref.default_omega(2), sweeps=20)
        e = float(jnp.linalg.norm(interior(uu) - jnp.asarray(x_true)))
        assert e < e0
