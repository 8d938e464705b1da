"""Shard-local Pallas smoothing tests (kernels/local2d.py).

The sharded runtime's jnp color-masked smoothing costs ~10x the Pallas
kernels per point on the chip (BASELINE.md round-3); with
``use_pallas=True`` a row-decomposed 2D solve runs each smoothing stage
as ONE fused kernel over a halo-extended tile. The binding property is
unchanged: sharded == unsharded point-for-point at fp64, including
RB-GS sweep order across shard boundaries — now with the kernel's
ghost-region overlap-recompute standing in for the jnp path's
per-half-sweep halo re-exchange.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import multigridcmt_tpu as mg
from multigridcmt_tpu import kernels
from multigridcmt_tpu.config import SolverConfig
from multigridcmt_tpu.parallel import sharded

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 (virtual) devices")


def _mesh(ndev=8):
    return sharded.make_mesh(jax.devices()[:ndev])


@needs_8
@pytest.mark.parametrize("smoother,sweeps", [("rbgs", 2), ("rbgs", 4),
                                             ("jacobi", 2)])
def test_sharded_pallas_solve_matches_unsharded(smoother, sweeps,
                                                monkeypatch):
    """use_pallas sharded solve == single-device solve, exactly the same
    residual history (k=6 on 8 row-devices: m=8 local rows — the minimum
    tile the 8-row halo supports — with agglomerated coarse levels)."""
    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 30)
    base = dict(k=6, dtype=jnp.float64, smoother=smoother,
                nu1=sweeps, nu2=sweeps, tol=1e-8, agglom_rows=8)
    cfg = SolverConfig(ndim=2, **base, use_pallas=True)
    prob = mg.poisson2d(**base)
    ref = mg.MultigridSolver(prob).solve()

    s = sharded.ShardedSolver(cfg, _mesh())
    got = s.solve(prob.b)

    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(np.asarray(got.res_history),
                               np.asarray(ref.res_history),
                               rtol=1e-6, atol=1e-11)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-8, atol=1e-12)


@needs_8
def test_sharded_pallas_matches_sharded_jnp(monkeypatch):
    """Same solve with and without the local kernels: identical to fp64
    round-off (the kernel path replaces re-exchange with ghost
    recompute — same math, different summation sites)."""
    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 30)
    base = dict(k=7, dtype=jnp.float64, smoother="rbgs",
                tol=1e-9, agglom_rows=4)
    prob = mg.poisson2d(**base)
    a = sharded.ShardedSolver(SolverConfig(ndim=2, **base), _mesh()).solve(prob.b)
    b = sharded.ShardedSolver(SolverConfig(ndim=2, **base, use_pallas=True),
                              _mesh()).solve(prob.b)
    assert int(a.iters) == int(b.iters)
    np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x),
                               rtol=1e-10, atol=1e-13)


@needs_8
def test_sharded_pallas_pcg_and_eigen(monkeypatch):
    """The Krylov and eigensolver drivers inherit the kernel smoothing
    through _sharded_v_cycle; spot-check both converge to the same
    answers."""
    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 30)
    base = dict(k=6, dtype=jnp.float64, smoother="rbgs",
                tol=1e-9, agglom_rows=8)
    prob = mg.poisson2d(**base)
    sj = sharded.ShardedSolver(SolverConfig(ndim=2, **base), _mesh())
    sp = sharded.ShardedSolver(SolverConfig(ndim=2, **base, use_pallas=True),
                               _mesh())
    rj = sj.solve(prob.b, method="pcg")
    rp = sp.solve(prob.b, method="pcg")
    assert bool(rj.converged) and bool(rp.converged)
    np.testing.assert_allclose(np.asarray(rp.x), np.asarray(rj.x),
                               rtol=1e-8, atol=1e-11)

    ej = sj.eigensolve(k=1, method="lobpcg", tol=1e-8, max_iters=30)
    ep = sp.eigensolve(k=1, method="lobpcg", tol=1e-8, max_iters=30)
    assert bool(ej.converged) and bool(ep.converged)
    lam_j = float(ej.eigenvalues[0])
    lam_p = float(ep.eigenvalues[0])
    assert abs(lam_p - lam_j) / lam_j < 1e-8


@needs_8
@pytest.mark.parametrize("smoother,mesh_shape", [("rbgs", (4, 2)),
                                                 ("rbgs", (2, 2)),
                                                 ("jacobi", (4, 2))])
def test_sharded_pallas_block_decomp(smoother, mesh_shape, monkeypatch):
    """Block decompositions (both axes sharded): the sequential row-then-
    column halo extension carries the corner ghosts the multi-sweep
    overlap-recompute needs — sharded == unsharded point-for-point."""
    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 30)
    base = dict(k=6, dtype=jnp.float64, smoother=smoother,
                tol=1e-8, agglom_rows=4)
    prob = mg.poisson2d(**base)
    ref = mg.MultigridSolver(prob).solve()
    mesh = sharded.make_block_mesh(mesh_shape)
    got = sharded.ShardedSolver(SolverConfig(ndim=2, **base,
                                             use_pallas=True),
                                mesh).solve(prob.b)
    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(np.asarray(got.res_history),
                               np.asarray(ref.res_history),
                               rtol=1e-6, atol=1e-11)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-8, atol=1e-12)


@needs_8
def test_small_tiles_fall_back(monkeypatch):
    """Tiles shallower than the 8-row halo (k=5 on 8 devices: m=4) must
    fall back to the jnp path and still match unsharded."""
    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 10)
    base = dict(k=5, dtype=jnp.float64, smoother="rbgs",
                tol=1e-8, agglom_rows=2)
    prob = mg.poisson2d(**base)
    ref = mg.MultigridSolver(prob).solve()
    got = sharded.ShardedSolver(SolverConfig(ndim=2, **base, use_pallas=True),
                                _mesh()).solve(prob.b)
    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-8, atol=1e-12)


@needs_8
@pytest.mark.parametrize("smoother,nu", [("rbgs", 2), ("rbgs", 3),
                                         ("jacobi", 6)])
def test_whole_leg_kernels_multiwindow(smoother, nu, monkeypatch):
    """Whole-leg down/up kernels (local2d.down_leg/up_leg) at k=10 on 8
    row-devices: m=128 local rows -> MULTI-window pipelines in both
    kernels (single-window tests hide double-buffer bugs), several
    sharded levels, nu at the staleness-budget boundary (rbgs 3 = max
    down sweeps; jacobi 6). Pinned: identical residual history and
    solution vs the sharded jnp path at fp64 (the kernels' MXU-matrix
    restriction sums in a different order than the jnp separable passes,
    so equality is to a few eps — verified: one full cycle differs by
    <= 8e-16 max over the grid; a real staleness bug would show
    value-scale errors at shard boundaries)."""
    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 30)
    base = dict(k=10, dtype=jnp.float64, smoother=smoother, nu1=nu,
                nu2=nu, tol=1e-10, max_iters=4, agglom_rows=4)
    prob = mg.poisson2d(**base)
    sj = sharded.ShardedSolver(SolverConfig(ndim=2, **base), _mesh())
    sp = sharded.ShardedSolver(SolverConfig(ndim=2, **base,
                                            use_pallas=True), _mesh())
    rj = sj.solve(prob.b)
    rp = sp.solve(prob.b)
    assert int(rj.iters) == int(rp.iters)
    np.testing.assert_allclose(np.asarray(rp.res_history),
                               np.asarray(rj.res_history),
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(rp.x), np.asarray(rj.x),
                               rtol=1e-8, atol=1e-12)


@needs_8
def test_whole_leg_shifted_operator(monkeypatch):
    """sigma-shifted cycles (eigensolver inner solves) through the
    whole-leg kernels: distributed RQI matches the single-device result."""
    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 30)
    base = dict(k=6, dtype=jnp.float64, smoother="rbgs", tol=1e-8,
                agglom_rows=8)
    cfg = SolverConfig(ndim=2, **base, use_pallas=True)
    s = sharded.ShardedSolver(cfg, _mesh())
    got = s.eigensolve(k=1, method="rqi", tol=1e-8, max_iters=40)
    assert bool(got.converged)
    from multigridcmt_tpu.grids import build_hierarchy
    from multigridcmt_tpu.solvers import eigen as seigen
    ref = seigen.eigensolve(build_hierarchy(SolverConfig(ndim=2, **base)),
                            SolverConfig(ndim=2, **base), k=1,
                            method="rqi", tol=1e-8, max_iters=40)
    lam, lam_ref = float(got.eigenvalues[0]), float(ref.eigenvalues[0])
    assert abs(lam - lam_ref) / lam_ref < 1e-8


@needs_8
@pytest.mark.parametrize("smoother,ndev,kk", [("rbgs", 8, 5),
                                              ("rbgs", 4, 6),
                                              ("jacobi", 4, 6)])
def test_slab3d_pallas_matches_unsharded(smoother, ndev, kk, monkeypatch):
    """Slab-sharded 3D plane-pipeline kernels (VERDICT.md round-3 item
    4): a 3D solve on a plane decomposition with use_pallas routes
    smoothing/residual through the goff-parameterized stencil3d kernels
    and stays exactly equal to the unsharded solve — including RB-GS
    plane sweep order across slab boundaries. ndev=8/k=5 runs at the
    minimum tile depth (m=4 = the RB-GS halo), ndev=4/k=6 multi-plane
    tiles."""
    monkeypatch.setattr(kernels, "PALLAS3_MIN_N", 10)
    base = dict(ndim=3, k=kk, dtype=jnp.float64, smoother=smoother,
                tol=1e-8, agglom_rows=2)
    prob = mg.poisson3d(k=kk, dtype=jnp.float64, smoother=smoother,
                        tol=1e-8, agglom_rows=2)
    ref = mg.MultigridSolver(prob).solve()
    got = sharded.ShardedSolver(
        SolverConfig(**base, use_pallas=True),
        _mesh(ndev)).solve(prob.b)
    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(np.asarray(got.res_history),
                               np.asarray(ref.res_history),
                               rtol=1e-6, atol=1e-11)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-8, atol=1e-12)


@needs_8
@pytest.mark.parametrize("cycle", ["w", "fmg"])
def test_whole_leg_wcycle_fmg(cycle, monkeypatch):
    """W-cycles (gamma=2 through the ext-carried recursion) and FMG
    (stagewise walk + leg-path polish cycles) on the whole-leg kernel
    path match the unsharded solve."""
    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 30)
    base = dict(k=7, dtype=jnp.float64, smoother="rbgs", cycle=cycle,
                tol=1e-9, agglom_rows=4)
    prob = mg.poisson2d(**base)
    ref = mg.MultigridSolver(prob).solve()
    got = sharded.ShardedSolver(SolverConfig(ndim=2, **base,
                                             use_pallas=True),
                                _mesh()).solve(prob.b)
    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(np.asarray(got.res_history),
                               np.asarray(ref.res_history),
                               rtol=1e-6, atol=1e-11)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-8, atol=1e-12)


@needs_8
def test_whole_leg_block_decomp_multiwindow(monkeypatch):
    """Whole-leg kernels on a BLOCK decomposition (both axes sharded,
    col_ext kernel variants) at k=9 on a 4x2 mesh: multi-window row
    pipelines AND multi-block column extraction/interpolation, several
    chained leg levels. Pinned vs the unsharded solve at fp64."""
    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 30)
    base = dict(k=9, dtype=jnp.float64, smoother="rbgs",
                tol=1e-9, max_iters=6, agglom_rows=4)
    prob = mg.poisson2d(**base)
    ref = mg.MultigridSolver(prob).solve()
    mesh = sharded.make_block_mesh((4, 2))
    dec = sharded.decomp_from_mesh(mesh, 2)
    cfg = SolverConfig(ndim=2, **base, use_pallas=True)
    assert sharded._leg_level_ok(cfg, dec, 0)       # engaged, not a fallback
    got = sharded.ShardedSolver(cfg, mesh).solve(prob.b)
    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(np.asarray(got.res_history),
                               np.asarray(ref.res_history),
                               rtol=1e-6, atol=1e-11)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-8, atol=1e-12)


# ---------------------------------------------------------------------------
# Color-packed whole-leg kernels (kernels/plocal2d.py, VERDICT.md round-4
# item 1): the packed shard tier must equal the aligned tier at the kernel
# level and the unsharded solve end-to-end.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kk,mcol,kind,nu,sigma,dev", [
    (8, 0, "rbgs", 2, 0.0, 0),        # rows, multi-window
    (8, 0, "rbgs", 3, 0.0, 1),        # rows, 3 fused sweeps, device 1
    (8, 0, "jacobi", 2, 0.0, 0),
    (8, 0, "rbgs", 2, 3.7, 0),        # shifted operator
    (8, 128, "rbgs", 2, 0.0, 0),      # blocks (col-ext), device (0, 0)
    (8, 128, "rbgs", 2, 0.0, 1),      # blocks, device (1, 0)
    (8, 256, "jacobi", 2, 0.0, 0),
])
def test_packed_leg_kernels_match_aligned(kk, mcol, kind, nu, sigma, dev):
    """pack -> plocal2d kernel -> unpack == the aligned local2d kernel on
    identical extended tiles (owned region; ghosts are stale in both).
    Multi-window (k=8: r=144 > one 88-row window) per the multi-tile
    testing rule."""
    from multigridcmt_tpu.grids import aligned_shape
    from multigridcmt_tpu.kernels import local2d, plocal2d

    rng = np.random.default_rng(11 + kk + mcol + dev)
    n = 2 ** kk - 1
    hh = local2d.HALO_ROWS
    h = 1.0 / (n + 1)
    m = 2 ** kk // 2
    r = local2d.ext_rows(m)
    if mcol:
        c = -(-(mcol + 2 * hh) // 128) * 128
        col_off, cpar = 1 - hh, 1
    else:
        c = aligned_shape(n)[1]
        col_off, cpar = 0, 0
    row_off = dev * m + 1 - hh
    u = jnp.asarray(rng.standard_normal((r, c)))
    b = jnp.asarray(rng.standard_normal((r, c)))
    up = plocal2d.pack_ext(u, cpar)
    bp = plocal2d.pack_ext(b, cpar)
    tol = 1e-13 * 4.0 ** kk          # residuals scale with 1/h^2

    ua_s, rc_a = local2d.down_leg(u, b, n, h, m, row_off, col_off,
                                  kind=kind, omega=0.8, sweeps=nu,
                                  sigma=sigma, mcol=mcol)
    up_s, rc_p = plocal2d.down_leg(up, bp, n, h, m, row_off, col_off,
                                   kind=kind, omega=0.8, sweeps=nu,
                                   sigma=sigma, mcol=mcol)
    owned = (slice(hh, hh + m), slice(hh, hh + mcol) if mcol
             else slice(0, c))
    us_p = plocal2d.unpack_ext(up_s, c, cpar)
    np.testing.assert_allclose(np.asarray(us_p[owned]),
                               np.asarray(ua_s[owned]), atol=tol)
    np.testing.assert_allclose(np.asarray(rc_p), np.asarray(rc_a),
                               atol=tol)

    ra = local2d.residual(u, b, n, h, row_off, col_off, sigma=sigma)
    rp = plocal2d.unpack_ext(
        plocal2d.residual(up, bp, n, h, row_off, col_off, sigma=sigma),
        c, cpar)
    np.testing.assert_allclose(np.asarray(rp[owned]),
                               np.asarray(ra[owned]), atol=tol)

    nc = (n - 1) // 2
    e = jnp.asarray(rng.standard_normal(rc_a.shape))
    ua_u = local2d.up_leg(u, e, b, n, nc, h, m, row_off, col_off,
                          kind=kind, omega=0.8, sweeps=nu, sigma=sigma,
                          mcol=mcol)
    up_u = plocal2d.unpack_ext(
        plocal2d.up_leg(up, e, bp, n, nc, h, m, row_off, col_off,
                        kind=kind, omega=0.8, sweeps=nu, sigma=sigma,
                        mcol=mcol), c, cpar)
    np.testing.assert_allclose(np.asarray(up_u[owned]),
                               np.asarray(ua_u[owned]), atol=tol)


@needs_8
@pytest.mark.parametrize("mesh_kind,smoother,method", [
    ("rows", "rbgs", "mg"), ("rows", "rbgs", "pcg"),
    ("block", "rbgs", "mg"), ("block", "jacobi", "pcg"),
    ("rows_w", "rbgs", "mg"),
])
def test_packed_sharded_solve_matches_unsharded(mesh_kind, smoother,
                                                method, monkeypatch):
    """End-to-end solves on the COLOR-PACKED whole-leg tier (tiles
    carried packed across cycles / the whole Krylov recurrence) ==
    unsharded, at fp64."""
    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 30)
    monkeypatch.setattr(kernels, "PACK_MIN_N", 30)
    base = dict(k=8, dtype=jnp.float64, smoother=smoother, tol=1e-9,
                agglom_rows=4,
                **({"cycle": "w"} if mesh_kind == "rows_w" else {}))
    cfg = SolverConfig(ndim=2, **base, use_pallas=True)
    mesh = (sharded.make_block_mesh((2, 2)) if mesh_kind == "block"
            else sharded.make_mesh(jax.devices()[:4]))
    s = sharded.ShardedSolver(cfg, mesh)
    assert sharded._pack_level_ok(cfg, s.decomp, 0)   # engaged
    prob = mg.poisson2d(**base)
    ref = mg.MultigridSolver(prob).solve(method=method)
    got = s.solve(prob.b, method=method)
    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-7, atol=1e-11)


@needs_8
def test_packed_sharded_eigensolve(monkeypatch):
    """The distributed eigensolver's ext-carried inner loops run packed
    when the fine level packs; lambda_1 matches the single-device
    solver."""
    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 30)
    monkeypatch.setattr(kernels, "PACK_MIN_N", 30)
    base = dict(k=6, dtype=jnp.float64, smoother="rbgs", agglom_rows=8)
    cfg = SolverConfig(ndim=2, **base, use_pallas=True)
    s = sharded.ShardedSolver(cfg, _mesh())
    assert sharded._pack_level_ok(cfg, s.decomp, 0)
    got = s.eigensolve(k=1, tol=1e-8, max_iters=40)
    prob = mg.poisson2d(**base)
    ref = mg.MultigridSolver(prob).eigensolve(k=1, tol=1e-8, max_iters=40)
    assert bool(got.converged)
    lam_g, lam_r = float(got.eigenvalues[0]), float(ref.eigenvalues[0])
    assert abs(lam_g - lam_r) / lam_r < 1e-8


@pytest.mark.parametrize("smoother", ["rbgs", "jacobi"])
def test_pencil3d_pallas_matches_unsharded(smoother, monkeypatch):
    """Pencil (2-axis) 3D kernel tier (round 5, VERDICT round-4 missing
    #3): planes AND rows sharded, the stencil3d kernels parameterized by
    (goff, roff) SMEM offsets, ext stacks carried per level. Pinned
    exact vs the unsharded solve at fp64."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from multigridcmt_tpu.ops import transfer

    monkeypatch.setattr(kernels, "PALLAS3_MIN_N", 10)
    # Exercise the MIXED transfer regime the production 255^3+ pencil
    # hits: the unsharded reference runs the minor-axis MXU matmul
    # passes while the sharded row axis keeps the halo'd slice pass —
    # equal to rounding order (~1e-13 relative), not bit-exact
    # (transfer._axis_order notes).
    monkeypatch.setattr(transfer, "_MM_MIN_N", 16)
    base = dict(k=5, dtype=jnp.float64, smoother=smoother, tol=1e-9,
                agglom_rows=4)
    prob = mg.poisson3d(**base)
    ref = mg.MultigridSolver(prob).solve()
    mesh = sharded.make_block_mesh((2, 2))
    cfg = SolverConfig(ndim=3, **base, use_pallas=True)
    dec = sharded.decomp_from_mesh(mesh, 3)
    s = sharded.ShardedSolver(cfg, mesh)
    # The pencil gate must actually engage at the fine level.
    xt = jnp.zeros((2 ** 5 // 2, 2 ** 5 // 2, cfg.n + 2), jnp.float64)
    assert sharded._pencil3d_ok(xt, cfg.n, cfg, dec)
    got = s.solve(prob.b)
    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(np.asarray(got.res_history),
                               np.asarray(ref.res_history),
                               rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-8, atol=1e-11)


def test_packed_apply_op_matches_residual():
    """apply_op == -residual(u, 0) on packed extended tiles (the PCG
    apply kernel with the zero-b DMA stream removed)."""
    from multigridcmt_tpu.grids import aligned_shape
    from multigridcmt_tpu.kernels import local2d, plocal2d

    rng = np.random.default_rng(7)
    n = 2 ** 8 - 1
    hh = local2d.HALO_ROWS
    h = 1.0 / (n + 1)
    m = 2 ** 8 // 2
    r = local2d.ext_rows(m)
    c = aligned_shape(n)[1]
    u = jnp.asarray(rng.standard_normal((r, c)))
    up = plocal2d.pack_ext(u, 0)
    row_off = m + 1 - hh
    got = plocal2d.apply_op(up, n, h, row_off, 0, sigma=1.3)
    want = -plocal2d.residual(up, jnp.zeros_like(up), n, h, row_off, 0,
                              sigma=1.3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-13 * 4.0 ** 8)
