"""Pallas DIA-SpMV kernel tests — oracles: ops.sparse.spmv_dia (XLA) and
scipy.sparse (SURVEY.md §4.2/§4.5). Interpreter mode on CPU; the same
kernel runs compiled on TPU (bench_spmv.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from multigridcmt_tpu.kernels import spmv as kspmv
from multigridcmt_tpu.ops import sparse


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)


# 1D tridiagonal and 2D 5-point at several sizes: single-tile, multi-tile,
# non-multiple-of-128 lengths, and a 2D size whose +-n offsets are not lane
# multiples.
CASES = [(1023, 1), (4097, 1), (31, 2), (63, 2), (100, 2)]


@pytest.mark.parametrize("n,ndim", CASES)
def test_spmv_dia_kernel_matches_xla(n, ndim):
    h = 1.0 / (n + 1)
    a = sparse.laplacian_dia(n, ndim, h, dtype=jnp.float32)
    x = _rand(a.shape[0], seed=n)
    want = sparse.spmv_dia(a, x)
    got = kspmv.spmv_dia(a, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4 / h)


def test_spmv_dia_kernel_matches_scipy():
    import scipy.sparse as sp

    n, ndim = 40, 2
    h = 1.0 / (n + 1)
    a = sparse.laplacian_dia(n, ndim, h, dtype=jnp.float32)
    a_sp = sparse.csr_to_scipy(sparse.laplacian_csr(n, ndim, h,
                                                    dtype=jnp.float32))
    x = _rand(a.shape[0], seed=7)
    want = a_sp @ np.asarray(x, dtype=np.float64)
    got = np.asarray(kspmv.spmv_dia(a, x), dtype=np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


def test_spmv_packed_chains():
    """y = A(A(x)) without leaving the packed layout == two XLA spmvs."""
    n, ndim = 63, 2
    h = 1.0 / (n + 1)
    a = sparse.laplacian_dia(n, ndim, h, dtype=jnp.float32)
    pk = kspmv.pack_dia(a)
    x = _rand(a.shape[0], seed=3)
    # Scale down so h^-4 growth stays in fp32 range for the tolerance.
    x = x * (h * h)
    y2 = kspmv.spmv_packed(pk, kspmv.spmv_packed(pk, kspmv.pack_x(x, pk.halo)))
    got = kspmv.unpack_y(y2, pk.n, pk.halo)
    want = sparse.spmv_dia(a, sparse.spmv_dia(a, x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-2)
    # Packed skirts must come back zero (chain invariant).
    yp = np.asarray(y2)
    assert np.abs(yp.reshape(-1)[:pk.halo * 128]).max() == 0.0
    assert np.abs(yp.reshape(-1)[pk.halo * 128 + pk.n:]).max() == 0.0


def test_pack_roundtrip():
    x = _rand(1000, seed=1)
    h = 8
    np.testing.assert_array_equal(
        np.asarray(kspmv.unpack_y(kspmv.pack_x(x, h), 1000, h)),
        np.asarray(x))
