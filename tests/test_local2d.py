"""Direct unit tests for the shard-local kernels (kernels/local2d.py).

The sharded end-to-end tests (test_sharded_pallas.py) run k<=7, whose
extended tiles fit ONE kernel window — the double-buffered multi-window
path (nt > 1, the path production k=12 tiles take) would go untested in
interpret mode (the 2D round-2 gotcha: multi-tile bugs hide at small n).
These tests drive the kernels directly on tall tiles with nonzero global
offsets against a jnp oracle that replays the same global sweep.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from multigridcmt_tpu.kernels import local2d
from multigridcmt_tpu.ops import smoothers


def _case(n, r0, m, seed=0):
    """A full padded global grid plus the extended local tile of the
    shard owning global rows r0+1 .. r0+m (hh ghosts each side)."""
    hh = local2d.HALO_ROWS
    rng = np.random.default_rng(seed)
    u = np.zeros((n + 2, n + 2))
    u[1:-1, 1:-1] = rng.standard_normal((n, n))
    b = np.zeros_like(u)
    b[1:-1, 1:-1] = rng.standard_normal((n, n))

    def ext(g):
        """Rows r0+1-hh .. r0+m+hh of the padded grid (zeros outside),
        embedded in the aligned layout."""
        rows = m + 2 * hh
        out = np.zeros((rows, n + 2))
        for i in range(rows):
            gr = r0 + 1 - hh + i
            if 0 <= gr <= n + 1:
                out[i] = g[gr]
        r8 = -(-rows // 8) * 8
        c128 = -(-(n + 2) // 128) * 128
        return jnp.asarray(np.pad(out, ((0, r8 - rows),
                                        (0, c128 - (n + 2)))))

    return u, b, ext(u), ext(b)


# n=510 rows per tile -> extended 526 -> aligned 528 rows = 7 windows
# at _TILE_ROWS=64 (multi-window); r0=256 exercises nonzero offsets.
@pytest.mark.parametrize("sweeps", [1, 2, 4])
def test_local_rbgs_multiwindow_matches_global(sweeps):
    n, m, r0 = 1022, 510, 256
    h = 1.0 / (n + 1)
    hh = local2d.HALO_ROWS
    u, b, ue, be = _case(n, r0, m)
    got = local2d.rbgs_sweep(ue, be, n, h, row_off=r0 + 1 - hh,
                             sweeps=sweeps)
    want = jnp.asarray(u)
    for _ in range(sweeps):
        want = smoothers.rbgs(want, jnp.asarray(b), h)
    # Owned rows (global r0+1 .. r0+m) must equal the global sweep.
    np.testing.assert_allclose(
        np.asarray(got)[hh:hh + m, : n + 2],
        np.asarray(want)[r0 + 1: r0 + 1 + m], rtol=1e-12, atol=1e-12)


def test_local_jacobi_multiwindow_matches_global():
    n, m, r0, sweeps = 1022, 510, 512, 3
    h = 1.0 / (n + 1)
    omega = 0.8
    hh = local2d.HALO_ROWS
    u, b, ue, be = _case(n, r0, m, seed=1)
    got = local2d.jacobi_sweep(ue, be, n, h, omega, row_off=r0 + 1 - hh,
                               sweeps=sweeps)
    want = jnp.asarray(u)
    for _ in range(sweeps):
        want = smoothers.jacobi(want, jnp.asarray(b), h, omega)
    np.testing.assert_allclose(
        np.asarray(got)[hh:hh + m, : n + 2],
        np.asarray(want)[r0 + 1: r0 + 1 + m], rtol=1e-12, atol=1e-12)


def test_local_residual_edge_shard():
    """First shard (r0=0): the near ghost rows are global rows <= 0 —
    the kernel must treat them as Dirichlet zeros, not data."""
    from multigridcmt_tpu.ops import laplacian

    n, m, r0 = 1022, 510, 0
    h = 1.0 / (n + 1)
    hh = local2d.HALO_ROWS
    u, b, ue, be = _case(n, r0, m, seed=2)
    got = local2d.residual(ue, be, n, h, row_off=r0 + 1 - hh)
    want = laplacian.residual(jnp.asarray(u), jnp.asarray(b), h)
    np.testing.assert_allclose(
        np.asarray(got)[hh:hh + m, : n + 2],
        np.asarray(want)[r0 + 1: r0 + 1 + m], rtol=1e-12, atol=1e-12)
