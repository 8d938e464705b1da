"""Color-packed kernel tests (kernels/packed2d.py) — interpret mode on CPU
vs the jnp oracle (SURVEY.md §4.5).

The packed layout halves the VPU work of the RB-GS half-sweeps (each color
computed only at its points); these tests pin the layout transforms, the
packed neighbor algebra (including the row-parity lane selects), the fused
down/up legs, and the end-to-end solve equality against the jnp backend.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import multigridcmt_tpu as mg
from multigridcmt_tpu import kernels
from multigridcmt_tpu.config import SolverConfig
from multigridcmt_tpu.grids import aligned_shape, from_aligned, to_aligned
from multigridcmt_tpu.kernels import packed2d
from multigridcmt_tpu.ops import laplacian, smoothers, transfer


def _rand_pair(n, seed=0):
    rng = np.random.default_rng(seed)
    u = np.zeros((n + 2, n + 2))
    u[1:-1, 1:-1] = rng.standard_normal((n, n))
    b = np.zeros_like(u)
    b[1:-1, 1:-1] = rng.standard_normal((n, n))
    return jnp.asarray(u), jnp.asarray(b)


@pytest.mark.parametrize("k", [4, 6])
def test_pack_unpack_roundtrip(k):
    n = 2 ** k - 1
    u, _ = _rand_pair(n)
    ua = to_aligned(u)
    s = packed2d.pack(ua)
    np.testing.assert_array_equal(np.asarray(packed2d.unpack(s, ua.shape[1])),
                                  np.asarray(ua))
    # color separation: red plane holds exactly the (i+j)-even points
    full = np.asarray(ua)
    got_red = np.asarray(s[0])
    r, c = full.shape
    for i in range(min(r, n + 2)):
        row = full[i, i % 2::2]
        np.testing.assert_array_equal(got_red[i, : len(row)], row)


@pytest.mark.parametrize("sweeps", [1, 2, 4])
def test_packed_rbgs_matches_reference(sweeps):
    n = 2 ** 6 - 1
    h = 1.0 / (n + 1)
    u, b = _rand_pair(n)
    c = to_aligned(u).shape[1]
    got = packed2d.unpack(packed2d.rbgs_sweep(
        packed2d.pack(to_aligned(u)), packed2d.pack(to_aligned(b)),
        n, h, sweeps=sweeps), c)
    want = u
    for _ in range(sweeps):
        want = smoothers.rbgs(want, b, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(to_aligned(want)),
                               rtol=1e-13, atol=1e-13)


def test_packed_residual_matches_reference():
    n = 2 ** 6 - 1
    h = 1.0 / (n + 1)
    u, b = _rand_pair(n, seed=3)
    c = to_aligned(u).shape[1]
    got = packed2d.unpack(packed2d.residual(
        packed2d.pack(to_aligned(u)), packed2d.pack(to_aligned(b)), n, h,
        sigma=2.5), c)
    want = to_aligned(laplacian.residual(u, b, h, sigma=2.5))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("kind,sweeps", [("rbgs", 2), ("jacobi", 2),
                                         ("rbgs", 0)])
def test_packed_down_leg_matches_reference(kind, sweeps):
    n = 2 ** 6 - 1
    nc = (n - 1) // 2
    h = 1.0 / (n + 1)
    omega = 0.8
    u, b = _rand_pair(n, seed=5)
    us, rc = packed2d.smooth_residual_restrict(
        packed2d.pack(to_aligned(u)), packed2d.pack(to_aligned(b)), n, h,
        kind=kind, omega=omega, sweeps=sweeps)
    want_u = smoothers.smooth(u, b, h, kind=kind, omega=omega,
                              sweeps=sweeps)
    want_rc = transfer.restrict(laplacian.residual(want_u, b, h))
    c = to_aligned(u).shape[1]
    np.testing.assert_allclose(np.asarray(packed2d.unpack(us, c)),
                               np.asarray(to_aligned(want_u)),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(from_aligned(rc, nc)), np.asarray(want_rc),
        rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("kind,sweeps", [("rbgs", 2), ("jacobi", 2),
                                         ("rbgs", 0)])
def test_packed_up_leg_matches_reference(kind, sweeps):
    n = 2 ** 6 - 1
    nc = (n - 1) // 2
    h = 1.0 / (n + 1)
    omega = 0.8
    x, b = _rand_pair(n, seed=7)
    rng = np.random.default_rng(11)
    e = np.zeros((nc + 2, nc + 2))
    e[1:-1, 1:-1] = rng.standard_normal((nc, nc))
    e = jnp.asarray(e)
    got = packed2d.prolong_add_smooth(
        packed2d.pack(to_aligned(x)), to_aligned(e),
        packed2d.pack(to_aligned(b)), n, nc, h, kind=kind, omega=omega,
        sweeps=sweeps)
    want = x + transfer.prolong(e)
    want = smoothers.smooth(want, b, h, kind=kind, omega=omega,
                            sweeps=sweeps)
    c = to_aligned(x).shape[1]
    np.testing.assert_allclose(np.asarray(packed2d.unpack(got, c)),
                               np.asarray(to_aligned(want)),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("smoother", ["rbgs", "jacobi", "chebyshev"])
def test_packed_solve_matches_jnp(smoother, monkeypatch):
    """End-to-end: the Pallas backend with packed fine levels produces the
    same iteration count and solution as the jnp backend."""
    monkeypatch.setattr(kernels, "PACK_MIN_N", 30)
    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 20)
    prob_ref = mg.poisson2d(k=6, dtype=jnp.float64, smoother=smoother,
                            tol=1e-9)
    ref = mg.MultigridSolver(prob_ref).solve()
    prob = mg.poisson2d(k=6, dtype=jnp.float64, smoother=smoother,
                        tol=1e-9, use_pallas=True)
    got = mg.MultigridSolver(prob).solve()
    assert bool(got.converged)
    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-8, atol=1e-12)


def test_packed_fmg_and_wcycle(monkeypatch):
    monkeypatch.setattr(kernels, "PACK_MIN_N", 30)
    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 20)
    for cyc in ("fmg", "w"):
        prob_ref = mg.poisson2d(k=6, dtype=jnp.float64, smoother="rbgs",
                                cycle=cyc, tol=1e-9)
        ref = mg.MultigridSolver(prob_ref).solve()
        prob = mg.poisson2d(k=6, dtype=jnp.float64, smoother="rbgs",
                            cycle=cyc, tol=1e-9, use_pallas=True)
        got = mg.MultigridSolver(prob).solve()
        assert int(got.iters) == int(ref.iters), cyc
        np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                                   rtol=1e-8, atol=1e-12)


@pytest.mark.parametrize("k", [6, 8])   # single- and multi-tile
def test_packed_residual_norm(k):
    """Fused ||r||^2: full == oracle; red_only exact after an RB-GS sweep
    (closing black half-sweep zeroes the black residual). k=8 exercises
    the multi-tile path incl. the overlapped-tail ownership mask."""
    n = 2 ** k - 1
    h = 1.0 / (n + 1)
    u, b = _rand_pair(n, seed=13)
    sp = packed2d.pack(to_aligned(u))
    bp = packed2d.pack(to_aligned(b))
    want = float(jnp.sum(laplacian.residual(u, b, h) ** 2))
    got = float(packed2d.residual_norm_sq(sp, bp, n, h))
    np.testing.assert_allclose(got, want, rtol=1e-12)

    # red_only after one full RB-GS sweep
    u2 = smoothers.rbgs(u, b, h)
    sp2 = packed2d.pack(to_aligned(u2))
    want2 = float(jnp.sum(laplacian.residual(u2, b, h) ** 2))
    got2 = float(packed2d.residual_norm_sq(sp2, bp, n, h, red_only=True))
    np.testing.assert_allclose(got2, want2, rtol=1e-10)
