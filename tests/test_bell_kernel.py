"""Blocked-ELL SpMM kernel tests — oracle: scipy.sparse dense products
(SURVEY.md §4.2/§4.5). Interpreter mode on CPU; the same kernel runs
compiled on TPU (bench_spmv.py --bell)."""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from multigridcmt_tpu.kernels import bell


def _block_random(nbr, nbc, density, seed, n_r=None, n_c=None):
    """Random matrix whose nonzeros cluster into dense 128x128 blocks."""
    rng = np.random.default_rng(seed)
    mask = rng.random((nbr, nbc)) < density
    mask[rng.integers(nbr), rng.integers(nbc)] = True  # at least one block
    dense = np.zeros((nbr * 128, nbc * 128), np.float32)
    for i, j in zip(*np.nonzero(mask)):
        dense[i * 128:(i + 1) * 128, j * 128:(j + 1) * 128] = (
            rng.standard_normal((128, 128)))
    n_r = n_r or nbr * 128
    n_c = n_c or nbc * 128
    return sp.csr_matrix(dense[:n_r, :n_c])


CASES = [
    (2, 2, 1.0, None, None),      # fully block-dense
    (4, 3, 0.4, None, None),      # rectangular, ragged block rows
    (3, 3, 0.3, 300, 310),        # logical shape not a block multiple
    (1, 5, 0.6, None, None),      # single block row
]


@pytest.mark.parametrize("nbr,nbc,density,n_r,n_c", CASES)
def test_spmm_matches_scipy(nbr, nbc, density, n_r, n_c):
    a_sp = _block_random(nbr, nbc, density, seed=nbr * 31 + nbc)
    a = bell.bell_from_scipy(a_sp)
    m = 16
    rng = np.random.default_rng(7)
    x = rng.standard_normal((a_sp.shape[1], m)).astype(np.float32)
    want = (a_sp @ x).T

    xt = jnp.zeros((m, -(-a_sp.shape[1] // 128) * 128), jnp.float32)
    xt = xt.at[:, :a_sp.shape[1]].set(jnp.asarray(x.T))
    got = np.asarray(bell.spmm(a, xt))[:, :a_sp.shape[0]]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_spmm_f64_accumulates_at_f64():
    """f64 BELL SpMM must match an f64 oracle to near-roundoff — the
    kernel's VMEM accumulator must not narrow to f32 per k step (the
    round-2 packed2d bug class; VERDICT.md round-3 item 5)."""
    a_sp = _block_random(4, 3, 0.6, seed=17).astype(np.float64)
    a = bell.bell_from_scipy(a_sp, dtype=jnp.float64)
    assert a.data.dtype == jnp.float64
    rng = np.random.default_rng(23)
    x = rng.standard_normal((a_sp.shape[1], 16))
    want = (a_sp @ x).T

    xt = jnp.zeros((16, -(-a_sp.shape[1] // 128) * 128), jnp.float64)
    xt = xt.at[:, :a_sp.shape[1]].set(jnp.asarray(x.T))
    got = bell.spmm(a, xt)
    assert got.dtype == jnp.float64
    np.testing.assert_allclose(np.asarray(got)[:, :a_sp.shape[0]], want,
                               rtol=1e-12, atol=1e-12)


def test_spmv_matches_scipy():
    a_sp = _block_random(3, 4, 0.5, seed=11, n_r=333, n_c=420)
    a = bell.bell_from_scipy(a_sp)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(420).astype(np.float32)
    got = np.asarray(bell.spmv(a, jnp.asarray(x)))
    np.testing.assert_allclose(got, a_sp @ x, rtol=1e-5, atol=1e-4)


def test_explicit_kmax_padding():
    a_sp = _block_random(3, 3, 0.3, seed=5)
    tight = bell.bell_from_scipy(a_sp)
    padded = bell.bell_from_scipy(a_sp, kmax=tight.kmax + 3)
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((8, a_sp.shape[1])).astype(np.float32))
    np.testing.assert_allclose(np.asarray(bell.spmm(tight, x)),
                               np.asarray(bell.spmm(padded, x)),
                               rtol=1e-6, atol=1e-6)


def test_kmax_too_small_raises():
    a_sp = _block_random(2, 4, 1.0, seed=9)
    with pytest.raises(ValueError):
        bell.bell_from_scipy(a_sp, kmax=1)


def test_laplacian_roundtrip():
    """The framework's own 2D operator through the general-sparse path."""
    from multigridcmt_tpu.ops import sparse

    n, h = 30, 1.0 / 31
    a_csr = sparse.laplacian_csr(n, 2, h, dtype=jnp.float32)
    a_sp = sparse.csr_to_scipy(a_csr)
    a = bell.bell_from_scipy(a_sp)
    x = np.random.default_rng(2).standard_normal(n * n).astype(np.float32)
    got = np.asarray(bell.spmv(a, jnp.asarray(x)))
    np.testing.assert_allclose(got, a_sp @ x, rtol=1e-4, atol=1e-2 / h)
