"""Packed->packed coarse-crossing tests (VERDICT.md round-2 item 4).

When two adjacent levels both use the color-packed layout, the fused
down leg emits the coarse RHS directly in packed form and the up leg
consumes a packed coarse correction — no XLA pack/unpack scatter at the
crossing. These tests pin the in-kernel lane extraction/expansion
against the host-side pack()/unpack() transforms and the end-to-end
multi-packed-level solve against the jnp backend.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from multigridcmt_tpu import kernels
from multigridcmt_tpu.config import SolverConfig
from multigridcmt_tpu.grids import (aligned_shape, build_hierarchy,
                                    pad_interior, to_aligned)
from multigridcmt_tpu.kernels import packed2d
from multigridcmt_tpu.solvers import cycles


def _rand_pair(n, seed=0):
    rng = np.random.default_rng(seed)
    u = np.zeros((n + 2, n + 2))
    u[1:-1, 1:-1] = rng.standard_normal((n, n))
    b = np.zeros_like(u)
    b[1:-1, 1:-1] = rng.standard_normal((n, n))
    return jnp.asarray(u), jnp.asarray(b)


@pytest.mark.parametrize("k,sweeps,kind", [(6, 2, "rbgs"), (6, 1, "jacobi"),
                                           (8, 2, "rbgs")])
def test_down_leg_packed_emit_matches_pack(k, sweeps, kind):
    """packed_coarse=True output == pack(aligned output), exactly."""
    n = 2 ** k - 1
    nc = (n - 1) // 2
    h = 1.0 / (n + 1)
    u, b = _rand_pair(n)
    s = packed2d.pack(to_aligned(u))
    bs = packed2d.pack(to_aligned(b))
    kw = dict(kind=kind, omega=0.8, sweeps=sweeps)
    us_a, rc_a = packed2d.smooth_residual_restrict(s, bs, n, h, **kw)
    us_p, rc_p = packed2d.smooth_residual_restrict(s, bs, n, h, **kw,
                                                   packed_coarse=True)
    np.testing.assert_array_equal(np.asarray(us_a), np.asarray(us_p))
    assert rc_p.shape == (2, rc_a.shape[0],
                          packed2d.packed_width(rc_a.shape[1]))
    np.testing.assert_allclose(np.asarray(packed2d.pack(rc_a)),
                               np.asarray(rc_p), rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("k,sweeps,kind", [(6, 2, "rbgs"), (6, 1, "jacobi"),
                                           (8, 2, "rbgs")])
def test_up_leg_packed_consume_matches_aligned(k, sweeps, kind):
    """prolong_add_smooth(packed e) == prolong_add_smooth(aligned e)."""
    n = 2 ** k - 1
    nc = (n - 1) // 2
    h = 1.0 / (n + 1)
    u, b = _rand_pair(n, seed=1)
    x = packed2d.pack(to_aligned(u))
    bs = packed2d.pack(to_aligned(b))
    ec, _ = _rand_pair(nc, seed=2)
    ea = to_aligned(ec)
    ep = packed2d.pack(ea)
    kw = dict(kind=kind, omega=0.8, sweeps=sweeps)
    out_a = packed2d.prolong_add_smooth(x, ea, bs, n, nc, h, **kw)
    out_p = packed2d.prolong_add_smooth(x, ep, bs, n, nc, h, **kw)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_p),
                               rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("smoother", ["rbgs", "jacobi"])
def test_multi_packed_level_solve_matches_jnp(smoother, monkeypatch):
    """Three packed levels (k=6 at PACK_MIN_N=10): the whole packed->
    packed cycle path equals the jnp backend to oracle tolerance."""
    monkeypatch.setattr(kernels, "PACK_MIN_N", 10)
    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 8)
    base = dict(ndim=2, k=6, dtype=jnp.float64, smoother=smoother,
                tol=1e-10, max_iters=40)
    cfg_p = SolverConfig(**base, use_pallas=True)
    cfg_j = SolverConfig(**base)
    hier = build_hierarchy(cfg_p)
    _, b = _rand_pair(cfg_p.n, seed=3)
    rp = cycles.solve(hier, b, cfg_p)
    rj = cycles.solve(hier, b, cfg_j)
    assert bool(rp.converged) and bool(rj.converged)
    assert int(rp.iters) == int(rj.iters)
    np.testing.assert_allclose(np.asarray(rp.x), np.asarray(rj.x),
                               rtol=1e-9, atol=1e-11)


def test_multi_packed_fmg_and_pcg(monkeypatch):
    monkeypatch.setattr(kernels, "PACK_MIN_N", 10)
    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 8)
    from multigridcmt_tpu.solvers import krylov

    base = dict(ndim=2, k=6, dtype=jnp.float64, smoother="rbgs",
                tol=1e-10, max_iters=40)
    cfg_p = SolverConfig(**base, use_pallas=True, cycle="fmg")
    cfg_j = SolverConfig(**base, cycle="fmg")
    hier = build_hierarchy(cfg_p)
    _, b = _rand_pair(cfg_p.n, seed=4)
    rp = cycles.solve(hier, b, cfg_p)
    rj = cycles.solve(hier, b, cfg_j)
    np.testing.assert_allclose(np.asarray(rp.x), np.asarray(rj.x),
                               rtol=1e-9, atol=1e-11)

    cfg_pk = SolverConfig(**base, use_pallas=True)
    rk = krylov.solve_pcg(hier, b, cfg_pk)
    assert bool(rk.converged)
    np.testing.assert_allclose(np.asarray(rk.x), np.asarray(rj.x),
                               rtol=1e-7, atol=1e-9)
