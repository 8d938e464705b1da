"""Sparse format tests — oracle: scipy.sparse (SURVEY.md §4.2)."""
import jax.numpy as jnp
import numpy as np
import pytest

from multigridcmt_tpu.ops import sparse

from reference_impl import laplacian_matrix


@pytest.mark.parametrize("ndim,n", [(1, 31), (2, 15)])
def test_csr_matches_scipy(ndim, n):
    h = 1.0 / (n + 1)
    a = sparse.laplacian_csr(n, ndim, h, dtype=jnp.float64)
    want = laplacian_matrix(n, ndim, h)
    got = sparse.csr_to_scipy(a)
    assert (got != want).nnz == 0


@pytest.mark.parametrize("ndim,n", [(1, 31), (2, 15)])
def test_spmv_csr(ndim, n):
    h = 1.0 / (n + 1)
    a = sparse.laplacian_csr(n, ndim, h, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(a.shape[1])
    want = laplacian_matrix(n, ndim, h) @ x
    got = sparse.spmv(a, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)


@pytest.mark.parametrize("ndim,n", [(1, 31), (2, 15)])
def test_spmv_coo(ndim, n):
    h = 1.0 / (n + 1)
    a = sparse.laplacian_coo(n, ndim, h, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(a.shape[1])
    want = laplacian_matrix(n, ndim, h) @ x
    got = sparse.spmv_coo(a, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)


@pytest.mark.parametrize("ndim,n", [(1, 31), (2, 15)])
def test_spmv_dia(ndim, n):
    h = 1.0 / (n + 1)
    a = sparse.laplacian_dia(n, ndim, h, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(a.shape[1])
    want = laplacian_matrix(n, ndim, h) @ x
    got = sparse.spmv_dia(a, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)
    # nnz bookkeeping matches scipy's count
    assert a.nnz == laplacian_matrix(n, ndim, h).nnz


def test_coo_to_csr_roundtrip():
    n, h = 15, 1.0 / 16
    coo = sparse.laplacian_coo(n, 2, h, dtype=jnp.float64)
    csr = sparse.coo_to_csr(coo)
    want = laplacian_matrix(n, 2, h)
    assert (sparse.csr_to_scipy(csr) != want).nnz == 0
