"""Pallas kernel tests — oracle: the pure-jnp stencils, run in interpreter
mode on CPU (SURVEY.md §4.5); the same tests run compiled on a real TPU.

Kernels operate on TPU-aligned grids (grids.aligned_shape); tests convert
at the boundary and also check the zero-pad invariant is preserved.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from multigridcmt_tpu.grids import (aligned_shape, from_aligned, interior,
                                    pad_interior, to_aligned)
from multigridcmt_tpu.kernels import stencil2d
from multigridcmt_tpu.ops import laplacian, smoothers, transfer


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    u = pad_interior(jnp.asarray(rng.standard_normal((n, n)),
                                 dtype=jnp.float32))
    b = pad_interior(jnp.asarray(rng.standard_normal((n, n)),
                                 dtype=jnp.float32))
    return u, b


def _check_pad_zero(out_a, n):
    """Everything outside the logical interior must be exactly zero."""
    m = np.asarray(out_a).copy()
    m[1:n + 1, 1:n + 1] = 0.0
    assert np.abs(m).max() == 0.0


# Sizes: whole-array tile (small), multi-tile exact, and multi-tile with an
# overlapping (non-divisible) tail.
SIZES = [15, 63, 127, 255, 191]


@pytest.mark.parametrize("n", SIZES)
def test_rbgs_kernel_matches_jnp(n):
    h = 1.0 / (n + 1)
    u, b = _rand(n)
    want = smoothers.rbgs(u, b, h)
    out_a = stencil2d.rbgs_sweep(to_aligned(u), to_aligned(b), n, h)
    got = from_aligned(out_a, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)
    _check_pad_zero(out_a, n)


@pytest.mark.parametrize("n", SIZES)
def test_jacobi_kernel_matches_jnp(n):
    h = 1.0 / (n + 1)
    omega = 0.8
    u, b = _rand(n, seed=1)
    want = smoothers.jacobi(u, b, h, omega)
    got = from_aligned(
        stencil2d.jacobi_sweep(to_aligned(u), to_aligned(b), n, h, omega), n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n", SIZES)
def test_residual_kernel_matches_jnp(n):
    h = 1.0 / (n + 1)
    u, b = _rand(n, seed=2)
    want = laplacian.residual(u, b, h)
    out_a = stencil2d.residual(to_aligned(u), to_aligned(b), n, h)
    got = from_aligned(out_a, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-2)  # residual cancellation
    _check_pad_zero(out_a, n)


def test_rbgs_kernel_shifted():
    n = 63
    h = 1.0 / (n + 1)
    sigma = 15.0
    u, b = _rand(n, seed=3)
    want = smoothers.rbgs(u, b, h, sigma=sigma)
    got = from_aligned(
        stencil2d.rbgs_sweep(to_aligned(u), to_aligned(b), n, h,
                             sigma=jnp.float32(sigma)), n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("n", [15, 31])
def test_aligned_transfers_match_logical(n):
    rng = np.random.default_rng(4)
    r = pad_interior(jnp.asarray(rng.standard_normal((n, n)),
                                 dtype=jnp.float32))
    nc = (n - 1) // 2
    want = transfer.restrict(r)
    got_a = transfer.restrict_aligned(to_aligned(r), n)
    np.testing.assert_allclose(np.asarray(from_aligned(got_a, nc)),
                               np.asarray(want), rtol=1e-6)
    _check_pad_zero(got_a, nc)

    e = pad_interior(jnp.asarray(rng.standard_normal((nc, nc)),
                                 dtype=jnp.float32))
    want_p = transfer.prolong(e)
    got_p = transfer.prolong_aligned(to_aligned(e), nc)
    np.testing.assert_allclose(np.asarray(from_aligned(got_p, n)),
                               np.asarray(want_p), rtol=1e-6)


def test_aligned_roundtrip():
    n = 31
    u, _ = _rand(n)
    ua = to_aligned(u)
    assert ua.shape == aligned_shape(n)
    np.testing.assert_array_equal(np.asarray(from_aligned(ua, n)),
                                  np.asarray(u))


def test_pallas_backend_vcycle_matches_jnp_backend():
    """End-to-end: a full V-cycle through the Pallas backend equals the
    jnp backend to fp32 tolerance."""
    import dataclasses

    import multigridcmt_tpu as mg
    from multigridcmt_tpu.solvers import cycles

    prob = mg.poisson2d(k=6, dtype=jnp.float32, smoother="rbgs")
    x0 = jnp.zeros_like(prob.b)
    x_jnp = cycles.cycle(prob.hierarchy, x0, prob.b, prob.config)
    cfg_p = dataclasses.replace(prob.config, use_pallas=True)
    solver = mg.MultigridSolver(
        mg.Problem(config=cfg_p, hierarchy=prob.hierarchy, b=prob.b,
                   u_exact=prob.u_exact))
    x_pal = solver.v_cycle(x0, prob.b)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_jnp),
                               rtol=1e-5, atol=1e-5)


def test_pallas_solve_converges():
    import multigridcmt_tpu as mg

    # fp32 stalls near ~3e-5 relative residual (cancellation against
    # 1/h^2 ~ 4e3); 1e-4 is the realistic single-precision target.
    prob = mg.poisson2d(k=6, dtype=jnp.float32, smoother="rbgs",
                        use_pallas=True, tol=1e-4)
    res = mg.MultigridSolver(prob).solve()
    assert bool(res.converged)
    err = np.abs(np.asarray(interior(res.x))
                 - np.asarray(interior(prob.u_exact))).max()
    assert err < 1e-3


@pytest.mark.parametrize("n", [63, 255, 511])
def test_prolong_add_kernel(n):
    from multigridcmt_tpu.kernels import transfer2d

    nc = (n - 1) // 2
    rng = np.random.default_rng(7)
    x = pad_interior(jnp.asarray(rng.standard_normal((n, n)),
                                 dtype=jnp.float32))
    e = pad_interior(jnp.asarray(rng.standard_normal((nc, nc)),
                                 dtype=jnp.float32))
    want = x + transfer.prolong(e)
    got_a = transfer2d.prolong_add(to_aligned(x), to_aligned(e), n, nc)
    np.testing.assert_allclose(np.asarray(from_aligned(got_a, n)),
                               np.asarray(want), rtol=2e-6, atol=2e-6)
    _check_pad_zero(got_a, n)


@pytest.mark.parametrize("n", [63, 255, 511])
def test_residual_restrict_kernel(n):
    from multigridcmt_tpu.kernels import transfer2d

    nc = (n - 1) // 2
    h = 1.0 / (n + 1)
    u, b = _rand(n, seed=8)
    want = transfer.restrict(laplacian.residual(u, b, h))
    got_a = transfer2d.residual_restrict(to_aligned(u), to_aligned(b), n, h)
    np.testing.assert_allclose(np.asarray(from_aligned(got_a, nc)),
                               np.asarray(want), rtol=2e-4, atol=2e-3)
    _check_pad_zero(got_a, nc)


@pytest.mark.parametrize("kind,sweeps", [("rbgs", 2), ("rbgs", 3),
                                         ("jacobi", 2), ("jacobi", 4)])
def test_multisweep_kernels(kind, sweeps):
    n = 255
    h = 1.0 / (n + 1)
    u, b = _rand(n, seed=9)
    want = smoothers.smooth(u, b, h, kind=kind, omega=0.8, sweeps=sweeps)
    if kind == "rbgs":
        got_a = stencil2d.rbgs_sweep(to_aligned(u), to_aligned(b), n, h,
                                     sweeps=sweeps)
    else:
        got_a = stencil2d.jacobi_sweep(to_aligned(u), to_aligned(b), n, h,
                                       0.8, sweeps=sweeps)
    np.testing.assert_allclose(np.asarray(from_aligned(got_a, n)),
                               np.asarray(want), rtol=1e-4, atol=1e-4)
