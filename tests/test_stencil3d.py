"""3D plane-rolling kernel tests (kernels/stencil3d.py) — interpret mode
on CPU vs the jnp oracle (SURVEY.md §4.5, VERDICT.md round-2 item 5).

Covers the 7-point residual, Jacobi, and the two-color pipelined RB-GS
sweep (exact reference sweep order), plus the end-to-end aligned3 solve
equality against the jnp backend. Multi-plane pipelining bugs hide at
tiny sizes, so sizes up to k=5 (33 planes) run the ring through many
wrap-arounds.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from multigridcmt_tpu import kernels
from multigridcmt_tpu.config import SolverConfig
from multigridcmt_tpu.grids import (build_hierarchy, from_aligned3,
                                    pad_interior, to_aligned3)
from multigridcmt_tpu.kernels import stencil3d
from multigridcmt_tpu.ops import laplacian, smoothers


def _rand_pair(n, seed=0):
    rng = np.random.default_rng(seed)
    u = np.zeros((n + 2,) * 3)
    u[1:-1, 1:-1, 1:-1] = rng.standard_normal((n,) * 3)
    b = np.zeros_like(u)
    b[1:-1, 1:-1, 1:-1] = rng.standard_normal((n,) * 3)
    return jnp.asarray(u), jnp.asarray(b)


@pytest.mark.parametrize("k", [2, 4, 5])
def test_residual3d_matches_reference(k):
    n = 2 ** k - 1
    h = 1.0 / (n + 1)
    u, b = _rand_pair(n)
    got = from_aligned3(
        stencil3d.residual(to_aligned3(u), to_aligned3(b), n, h), n)
    want = laplacian.residual(u, b, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


def test_residual3d_shifted():
    n, sigma = 2 ** 4 - 1, 7.5
    h = 1.0 / (n + 1)
    u, b = _rand_pair(n, seed=3)
    got = from_aligned3(
        stencil3d.residual(to_aligned3(u), to_aligned3(b), n, h,
                           sigma=sigma), n)
    want = laplacian.residual(u, b, h, sigma=sigma)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("sweeps", [1, 3])
def test_jacobi3d_matches_reference(sweeps):
    n = 2 ** 4 - 1
    h = 1.0 / (n + 1)
    omega = 6.0 / 7.0
    u, b = _rand_pair(n, seed=1)
    got = from_aligned3(
        stencil3d.jacobi_sweep(to_aligned3(u), to_aligned3(b), n, h,
                               omega, sweeps=sweeps), n)
    want = u
    for _ in range(sweeps):
        want = smoothers.jacobi(want, b, h, omega)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("k,sweeps", [(3, 1), (4, 1), (4, 2), (5, 1)])
def test_rbgs3d_matches_reference(k, sweeps):
    """The pipelined two-color sweep equals the oracle red-then-black
    sweep point-for-point (the 2D tests' exact-ordering contract)."""
    n = 2 ** k - 1
    h = 1.0 / (n + 1)
    u, b = _rand_pair(n, seed=2)
    got = from_aligned3(
        stencil3d.rbgs_sweep(to_aligned3(u), to_aligned3(b), n, h,
                             sweeps=sweeps), n)
    want = u
    for _ in range(sweeps):
        want = smoothers.rbgs(want, b, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


def test_rbgs3d_shifted():
    n, sigma = 2 ** 4 - 1, 4.0
    h = 1.0 / (n + 1)
    u, b = _rand_pair(n, seed=5)
    got = from_aligned3(
        stencil3d.rbgs_sweep(to_aligned3(u), to_aligned3(b), n, h,
                             sigma=sigma), n)
    want = smoothers.rbgs(u, b, h, sigma=sigma)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("smoother", ["rbgs", "jacobi", "chebyshev"])
def test_solve3d_pallas_matches_jnp(smoother, monkeypatch):
    """End-to-end: the aligned3 kernel path solves identically to the
    pure-jnp backend (fine level on kernels, coarse levels logical)."""
    monkeypatch.setattr(kernels, "PALLAS3_MIN_N", 10)
    from multigridcmt_tpu.solvers import cycles

    base = dict(ndim=3, k=4, dtype=jnp.float64, smoother=smoother,
                tol=1e-10, max_iters=40)
    cfg_p = SolverConfig(**base, use_pallas=True)
    cfg_j = SolverConfig(**base)
    hier = build_hierarchy(cfg_p)
    _, b = _rand_pair(cfg_p.n, seed=7)
    rp = cycles.solve(hier, b, cfg_p)
    rj = cycles.solve(hier, b, cfg_j)
    assert bool(rp.converged) and bool(rj.converged)
    assert int(rp.iters) == int(rj.iters)
    np.testing.assert_allclose(np.asarray(rp.x), np.asarray(rj.x),
                               rtol=1e-10, atol=1e-12)


def test_fits_vmem_gate():
    import jax.numpy as jnp

    from multigridcmt_tpu.grids import aligned3_shape

    # k=8..10 planes fit the ~80 MB plane-ring budget (physical VMEM is
    # ~128 MB on v5e; Mosaic's scoped limit is raised per-kernel);
    # k=11 (2056 x 2176 planes, 14 x 17.9 MB) does not.
    for n, want in ((255, True), (511, True), (1023, True), (2047, False)):
        _, r, c = aligned3_shape(n)
        assert stencil3d.fits_vmem(r, c, jnp.float32) == want, n
        assert kernels._use_pallas3(n, jnp.float32) == want, n
