"""Eigensolver tests — oracles: the exact discrete spectrum and
scipy.sparse.linalg.eigsh (SURVEY.md §4.3, BASELINE config 4 CPU-sized)."""
import jax.numpy as jnp
import numpy as np
import pytest

import multigridcmt_tpu as mg
from multigridcmt_tpu.ops import laplacian

import reference_impl as ref


def _exact_smallest(n, h, count):
    """Smallest `count` eigenvalues of the discrete 2D operator."""
    lams = sorted(laplacian.eigenvalue_2d(kx, ky, n, h)
                  for kx in range(1, 6) for ky in range(1, 6))
    return np.array(lams[:count])


@pytest.mark.parametrize("method", ["ii", "rqi"])
def test_smallest_eigenpair_2d(method):
    prob = mg.poisson2d(k=5, dtype=jnp.float64, smoother="rbgs")
    solver = mg.MultigridSolver(prob)
    res = solver.eigensolve(k=1, method=method, tol=1e-9)
    assert bool(res.converged)
    n, h = prob.config.n, prob.config.h
    want = laplacian.eigenvalue_1d(1, n, h) * 2
    np.testing.assert_allclose(np.asarray(res.eigenvalues), [want],
                               rtol=1e-8)


def test_smallest_eigenvalue_matches_eigsh():
    prob = mg.poisson2d(k=5, dtype=jnp.float64)
    res = mg.MultigridSolver(prob).eigensolve(k=1, tol=1e-9)
    want = ref.eigsh_oracle(prob.config.n, 2, prob.config.h, k=1)
    np.testing.assert_allclose(np.asarray(res.eigenvalues), want, rtol=1e-7)


def test_k3_eigenpairs_2d():
    """Block inverse iteration resolves the (degenerate) next eigenvalues."""
    prob = mg.poisson2d(k=5, dtype=jnp.float64, smoother="rbgs")
    res = mg.MultigridSolver(prob).eigensolve(k=3, tol=1e-9, max_iters=200)
    assert bool(res.converged)
    n, h = prob.config.n, prob.config.h
    want = _exact_smallest(n, h, 3)
    np.testing.assert_allclose(np.sort(np.asarray(res.eigenvalues)), want,
                               rtol=1e-7)


def test_eigenvector_is_ground_state():
    """The smallest eigenvector is the particle-in-a-box ground state
    sin(pi x) sin(pi y) (up to sign/scale) — the reference's CMT payload."""
    prob = mg.poisson2d(k=5, dtype=jnp.float64)
    res = mg.MultigridSolver(prob).eigensolve(k=1, tol=1e-9)
    v = np.array(mg.interior(res.eigenvectors[0]))   # writable copy
    n, h = prob.config.n, prob.config.h
    x = np.arange(1, n + 1) * h
    want = np.outer(np.sin(np.pi * x), np.sin(np.pi * x))
    want /= np.linalg.norm(want)
    v /= np.linalg.norm(v)
    if np.vdot(v, want) < 0:
        v = -v
    np.testing.assert_allclose(v, want, atol=5e-4)


def test_eigenvalue_continuum_limit():
    """lambda_1 -> 2 pi^2 with O(h^2) error (BASELINE config 4 semantics)."""
    prob = mg.poisson2d(k=6, dtype=jnp.float64)
    res = mg.MultigridSolver(prob).eigensolve(k=1, tol=1e-9)
    lam = float(res.eigenvalues[0])
    h = prob.config.h
    assert abs(lam - 2 * np.pi ** 2) < 2.0 * np.pi ** 4 * h * h


def test_1d_eigensolve():
    prob = mg.poisson1d(k=7, dtype=jnp.float64)
    res = mg.MultigridSolver(prob).eigensolve(k=2, tol=1e-9)
    n, h = prob.config.n, prob.config.h
    want = np.array([laplacian.eigenvalue_1d(1, n, h),
                     laplacian.eigenvalue_1d(2, n, h)])
    np.testing.assert_allclose(np.sort(np.asarray(res.eigenvalues)), want,
                               rtol=1e-8)
