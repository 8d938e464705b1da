"""Mixed-precision preconditioner tests (``config.precond_dtype``).

Validates the round-2 bfloat16 feature end-to-end (VERDICT.md item 2):

  * MG-PCG and MG-LOBPCG with a bfloat16 V-cycle preconditioner converge
    to full-``dtype`` tolerance at iteration counts within +20% of the
    full-precision run (the flexible outer loops absorb the rounding);
  * outside the supported packed-Pallas regime the cast is skipped and
    results are *identical* to full precision (the guard in
    ``solvers.krylov.mixed_cycle_dtype``);
  * a mixed cycle keeps its internal dtypes stable: bf16 only on the
    packed fine level, f32 on coarse levels, no silent f64 creep through
    the coarsest dense solve.

Runs on CPU with interpret-mode Pallas kernels; packing is forced at
small sizes by monkeypatching ``kernels.PACK_MIN_N`` (same device-free
recipe as tests/test_packed.py).
"""
import jax.numpy as jnp
import numpy as np
import pytest

import multigridcmt_tpu as mg
from multigridcmt_tpu import kernels
from multigridcmt_tpu.config import SolverConfig
from multigridcmt_tpu.grids import build_hierarchy
from multigridcmt_tpu.solvers import eigen, krylov


def _rhs(n, ndim=2, seed=0):
    rng = np.random.default_rng(seed)
    shape = (n + 2,) * ndim
    b = np.zeros(shape)
    core = tuple(slice(1, -1) for _ in range(ndim))
    b[core] = rng.standard_normal((n,) * ndim)
    return jnp.asarray(b)


def _pack_small(monkeypatch):
    monkeypatch.setattr(kernels, "PACK_MIN_N", 30)
    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 20)


def test_mixed_cycle_dtype_gate(monkeypatch):
    base = dict(ndim=2, k=12, dtype=jnp.float32,
                precond_dtype=jnp.bfloat16, use_pallas=True)
    assert krylov.mixed_cycle_dtype(SolverConfig(**base)) == jnp.bfloat16
    # No precond_dtype -> None.
    assert krylov.mixed_cycle_dtype(
        SolverConfig(ndim=2, k=12, use_pallas=True)) is None
    # jnp backend, 1D/3D, or a fine level too small to pack -> None.
    assert krylov.mixed_cycle_dtype(
        SolverConfig(**{**base, "use_pallas": False})) is None
    assert krylov.mixed_cycle_dtype(
        SolverConfig(**{**base, "ndim": 1})) is None
    assert krylov.mixed_cycle_dtype(
        SolverConfig(**{**base, "ndim": 3, "k": 5})) is None
    assert krylov.mixed_cycle_dtype(
        SolverConfig(**{**base, "k": 8})) is None
    # The gate reads the live (monkeypatchable) threshold.
    _pack_small(monkeypatch)
    assert krylov.mixed_cycle_dtype(
        SolverConfig(**{**base, "k": 6})) == jnp.bfloat16


@pytest.mark.parametrize("smoother", ["rbgs", "jacobi"])
def test_pcg_bf16_precond_converges_full_tolerance(monkeypatch, smoother):
    """bf16-preconditioned PCG reaches the full-f64 tolerance with at most
    20% extra iterations (BASELINE-spec acceptance from VERDICT.md #2)."""
    _pack_small(monkeypatch)
    base = dict(ndim=2, k=6, dtype=jnp.float64, smoother=smoother,
                use_pallas=True, tol=1e-10, max_iters=60)
    cfg_full = SolverConfig(**base)
    cfg_mixed = SolverConfig(**base, precond_dtype=jnp.bfloat16)
    hier = build_hierarchy(cfg_full)
    b = _rhs(cfg_full.n)

    full = krylov.solve_pcg(hier, b, cfg_full)
    mixed = krylov.solve_pcg(hier, b, cfg_mixed)

    assert bool(full.converged) and bool(mixed.converged)
    assert int(mixed.iters) <= int(np.ceil(1.2 * int(full.iters)))
    # Both solutions agree to the *outer* tolerance (the preconditioner's
    # precision must not limit the converged answer).
    ref = np.asarray(full.x)
    got = np.asarray(mixed.x)
    denom = np.linalg.norm(ref)
    assert np.linalg.norm(got - ref) / denom < 1e-8


def test_pcg_unsupported_regime_identical(monkeypatch):
    """Outside the packed-Pallas regime precond_dtype is a no-op: the run
    is bit-identical to the full-precision config (guard, not crash)."""
    base = dict(ndim=2, k=5, dtype=jnp.float64, use_pallas=False,
                tol=1e-10, max_iters=40)
    cfg_full = SolverConfig(**base)
    cfg_mixed = SolverConfig(**base, precond_dtype=jnp.bfloat16)
    hier = build_hierarchy(cfg_full)
    b = _rhs(cfg_full.n)
    full = krylov.solve_pcg(hier, b, cfg_full)
    mixed = krylov.solve_pcg(hier, b, cfg_mixed)
    np.testing.assert_array_equal(np.asarray(full.x), np.asarray(mixed.x))
    assert int(full.iters) == int(mixed.iters)


def test_mixed_cycle_dtype_stability(monkeypatch):
    """One mixed V-cycle returns the fine level in the preconditioner
    dtype — no f64 creep from the coarse dense solve (cycles.coarse_solve
    pins the cycle dtype) and no accidental full-precision fallback."""
    _pack_small(monkeypatch)
    from multigridcmt_tpu.solvers import cycles

    cfg = SolverConfig(ndim=2, k=6, dtype=jnp.float64, use_pallas=True,
                       precond_dtype=jnp.bfloat16)
    hier = build_hierarchy(cfg)
    bk = cycles.get_backend(cfg)
    b = bk.encode(_rhs(cfg.n)).astype(jnp.bfloat16)
    out = cycles.cycle(hier, jnp.zeros_like(b), b, cfg)
    assert out.dtype == jnp.bfloat16


def test_lobpcg_bf16_precond(monkeypatch):
    """MG-LOBPCG honors precond_dtype (config.py docstring contract): the
    bf16-preconditioned run reaches the same smallest eigenvalue to f64
    accuracy. LOBPCG leans harder on preconditioner quality than flexible
    CG: measured overhead is a constant ~3 extra outer steps at 1e-8/1e-9
    tolerances (6->9, 7->10 across k=6/7) — additive, not multiplicative —
    so the bound here is +3 steps, not the +20% PCG bound."""
    _pack_small(monkeypatch)
    base = dict(ndim=2, k=6, dtype=jnp.float64, use_pallas=True)
    cfg_full = SolverConfig(**base)
    cfg_mixed = SolverConfig(**base, precond_dtype=jnp.bfloat16)
    hier = build_hierarchy(cfg_full)

    full = eigen.lobpcg(hier, cfg_full, k=1, tol=1e-9, max_iters=40)
    mixed = eigen.lobpcg(hier, cfg_mixed, k=1, tol=1e-9, max_iters=40)

    assert bool(full.converged) and bool(mixed.converged)
    assert int(mixed.iters) <= int(full.iters) + 3
    lam_f = float(full.eigenvalues[0])
    lam_m = float(mixed.eigenvalues[0])
    assert abs(lam_m - lam_f) / lam_f < 1e-8


def test_sharded_pcg_bf16_precond(monkeypatch):
    """Distributed mixed precision (VERDICT.md round-3 item 6): the
    sharded PCG honors precond_dtype through the whole-leg kernels
    (bf16 tiles, f32 registers, coarse RHS emitted f32), converging to
    full-f64 tolerance at <= +20% iterations on the 8-device mesh."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from multigridcmt_tpu.parallel import sharded

    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 30)
    base = dict(ndim=2, k=6, dtype=jnp.float64, smoother="rbgs",
                use_pallas=True, tol=1e-10, max_iters=60, agglom_rows=8)
    cfg_full = SolverConfig(**base)
    cfg_mixed = SolverConfig(**base, precond_dtype=jnp.bfloat16)
    mesh = sharded.make_mesh(jax.devices()[:8])
    decomp = sharded.decomp_from_mesh(mesh, 2)
    assert sharded.mixed_leg_dtype(cfg_mixed, decomp) == jnp.bfloat16
    # Block decompositions run the whole-leg kernels too (round 4), so
    # the gate admits them...
    bmesh = sharded.make_block_mesh((4, 2))
    assert (sharded.mixed_leg_dtype(cfg_mixed,
                                    sharded.decomp_from_mesh(bmesh, 2))
            == jnp.bfloat16)
    # ...but tiles too shallow for the halo fall back (and skip the cast).
    assert sharded.mixed_leg_dtype(
        SolverConfig(**{**base, "k": 5}, precond_dtype=jnp.bfloat16),
        decomp) is None

    # Block-mesh mixed PCG converges to full tolerance too.
    bsolver = sharded.ShardedSolver(cfg_mixed, bmesh)
    bres = bsolver.solve(_rhs(cfg_full.n), method="pcg")
    assert bool(bres.converged)

    b = _rhs(cfg_full.n)
    full = sharded.ShardedSolver(cfg_full, mesh).solve(b, method="pcg")
    mixed = sharded.ShardedSolver(cfg_mixed, mesh).solve(b, method="pcg")
    assert bool(full.converged) and bool(mixed.converged)
    assert int(mixed.iters) <= int(np.ceil(1.2 * int(full.iters))) + 1
    np.testing.assert_allclose(np.asarray(mixed.x), np.asarray(full.x),
                               rtol=1e-7, atol=1e-8)


def test_sharded_lobpcg_bf16_precond(monkeypatch):
    """Distributed MG-LOBPCG with a bf16 V-cycle preconditioner reaches
    the same smallest eigenvalue (the Ritz step re-projects on the true
    operator, so T's precision only shapes the search direction)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from multigridcmt_tpu.parallel import sharded

    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 30)
    base = dict(ndim=2, k=6, dtype=jnp.float64, smoother="rbgs",
                use_pallas=True, agglom_rows=8)
    mesh = sharded.make_mesh(jax.devices()[:8])
    ef = sharded.ShardedSolver(SolverConfig(**base), mesh).eigensolve(
        k=1, method="lobpcg", tol=1e-7, max_iters=40)
    em = sharded.ShardedSolver(
        SolverConfig(**base, precond_dtype=jnp.bfloat16), mesh).eigensolve(
        k=1, method="lobpcg", tol=1e-7, max_iters=40)
    assert bool(ef.converged) and bool(em.converged)
    assert int(em.iters) <= int(np.ceil(1.2 * int(ef.iters))) + 3
    lam_f, lam_m = float(ef.eigenvalues[0]), float(em.eigenvalues[0])
    assert abs(lam_m - lam_f) / lam_f < 1e-7


def test_sharded_pcg_bf16_packed_tier(monkeypatch):
    """Mixed precision through the COLOR-PACKED whole-leg tier
    (kernels/plocal2d.py): the Krylov recurrence is carried packed-ext
    at f64/f32 and the preconditioner casts to bf16 at an elementwise
    boundary (no per-application relayout). Converges to full tolerance
    on rows AND block meshes."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from multigridcmt_tpu.parallel import sharded

    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 30)
    monkeypatch.setattr(kernels, "PACK_MIN_N", 30)
    base = dict(ndim=2, k=6, dtype=jnp.float64, smoother="rbgs",
                use_pallas=True, tol=1e-10, max_iters=60, agglom_rows=8)
    cfg_full = SolverConfig(**base)
    cfg_mixed = SolverConfig(**base, precond_dtype=jnp.bfloat16)
    for mesh in (sharded.make_mesh(jax.devices()[:8]),
                 sharded.make_block_mesh((4, 2))):
        s = sharded.ShardedSolver(cfg_mixed, mesh)
        assert sharded._pack_level_ok(cfg_mixed, s.decomp, 0)
        b = _rhs(cfg_full.n)
        full = sharded.ShardedSolver(cfg_full, mesh).solve(b, method="pcg")
        mixed = s.solve(b, method="pcg")
        assert bool(full.converged) and bool(mixed.converged)
        assert int(mixed.iters) <= int(np.ceil(1.2 * int(full.iters))) + 1
        np.testing.assert_allclose(np.asarray(mixed.x), np.asarray(full.x),
                                   rtol=1e-7, atol=1e-8)


@pytest.mark.parametrize("method", ["ii", "rqi"])
def test_eigensolve_bf16_inner_refinement(monkeypatch, method):
    """II/RQI inner MG solves honor precond_dtype (VERDICT.md round-4
    item 5) as defect-correction iterative refinement: the bf16 cycle
    only produces corrections to a full-dtype defect, so the eigensolver
    still converges to the same eigenvalue at full tolerance."""
    from multigridcmt_tpu.solvers.krylov import mixed_cycle_dtype

    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 30)
    monkeypatch.setattr(kernels, "PACK_MIN_N", 30)
    base = dict(k=6, dtype=jnp.float64, smoother="rbgs", use_pallas=True)
    prob_f = mg.poisson2d(**base)
    cfg_m = SolverConfig(ndim=2, **base, precond_dtype=jnp.bfloat16)
    assert mixed_cycle_dtype(cfg_m) == jnp.bfloat16
    prob_m = mg.Problem(config=cfg_m, hierarchy=prob_f.hierarchy,
                        b=prob_f.b, u_exact=prob_f.u_exact)
    ef = mg.MultigridSolver(prob_f).eigensolve(k=1, method=method,
                                               tol=1e-8, max_iters=40)
    em = mg.MultigridSolver(prob_m).eigensolve(k=1, method=method,
                                               tol=1e-8, max_iters=40)
    assert bool(ef.converged) and bool(em.converged)
    lam_f, lam_m = float(ef.eigenvalues[0]), float(em.eigenvalues[0])
    assert abs(lam_m - lam_f) / lam_f < 1e-8
    assert int(em.iters) <= int(ef.iters) + 3


def test_sharded_eigensolve_bf16_inner_refinement(monkeypatch):
    """Distributed II with bf16 inner refinement on the 8-device mesh
    (the ext-carried inner loop's mixed path) reaches the same
    lambda_1."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from multigridcmt_tpu.parallel import sharded

    monkeypatch.setattr(kernels, "PALLAS_MIN_N", 30)
    base = dict(ndim=2, k=6, dtype=jnp.float64, smoother="rbgs",
                use_pallas=True, agglom_rows=8)
    mesh = sharded.make_mesh(jax.devices()[:8])
    ef = sharded.ShardedSolver(SolverConfig(**base), mesh).eigensolve(
        k=1, method="ii", tol=1e-8, max_iters=40)
    em = sharded.ShardedSolver(
        SolverConfig(**base, precond_dtype=jnp.bfloat16), mesh).eigensolve(
        k=1, method="ii", tol=1e-8, max_iters=40)
    assert bool(ef.converged) and bool(em.converged)
    lam_f, lam_m = float(ef.eigenvalues[0]), float(em.eigenvalues[0])
    assert abs(lam_m - lam_f) / lam_f < 1e-8
    assert int(em.iters) <= int(ef.iters) + 3


def test_pcg_bf16_3d_kernel_tier(monkeypatch):
    """3D mixed precision (round 5): the stencil3d tier stores bf16
    tiles with f32 registers and an f32-emitting residual (coarse
    correction at full precision), so a bf16-preconditioned 3D PCG
    converges to full tolerance."""
    monkeypatch.setattr(kernels, "PALLAS3_MIN_N", 10)
    base = dict(ndim=3, k=5, dtype=jnp.float64, smoother="rbgs",
                use_pallas=True, tol=1e-10, max_iters=60)
    cfg_full = SolverConfig(**base)
    cfg_mixed = SolverConfig(**base, precond_dtype=jnp.bfloat16)
    assert krylov.mixed_cycle_dtype(cfg_mixed) == jnp.bfloat16
    # jacobi routes 3D to the jnp tier -> the gate must refuse.
    assert krylov.mixed_cycle_dtype(SolverConfig(
        **{**base, "smoother": "jacobi"},
        precond_dtype=jnp.bfloat16)) is None
    prob = mg.poisson3d(k=5, dtype=jnp.float64)
    hier = build_hierarchy(cfg_full)
    full = krylov.solve_pcg(hier, prob.b, cfg_full)
    mixed = krylov.solve_pcg(hier, prob.b, cfg_mixed)
    assert bool(full.converged) and bool(mixed.converged)
    assert int(mixed.iters) <= int(np.ceil(1.2 * int(full.iters))) + 1
    np.testing.assert_allclose(np.asarray(mixed.x), np.asarray(full.x),
                               rtol=1e-7, atol=1e-8)


@pytest.mark.parametrize("mesh_kind", ["slab", "pencil"])
def test_sharded_pcg_bf16_3d_slab(mesh_kind, monkeypatch):
    """Distributed 3D slab/pencil mixed precision through _slab3d_level
    (bf16 stacks, f32-emitting top level)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from multigridcmt_tpu.parallel import sharded

    monkeypatch.setattr(kernels, "PALLAS3_MIN_N", 10)
    base = dict(ndim=3, k=5, dtype=jnp.float64, smoother="rbgs",
                use_pallas=True, tol=1e-10, max_iters=60, agglom_rows=4)
    cfg_full = SolverConfig(**base)
    cfg_mixed = SolverConfig(**base, precond_dtype=jnp.bfloat16)
    mesh = (sharded.make_mesh(jax.devices()[:4]) if mesh_kind == "slab"
            else sharded.make_block_mesh((2, 2)))
    decomp = sharded.decomp_from_mesh(mesh, 3)
    assert sharded.mixed_slab_dtype(cfg_mixed, decomp) == jnp.bfloat16
    prob = mg.poisson3d(k=5, dtype=jnp.float64)
    full = sharded.ShardedSolver(cfg_full, mesh).solve(prob.b,
                                                       method="pcg")
    mixed = sharded.ShardedSolver(cfg_mixed, mesh).solve(prob.b,
                                                         method="pcg")
    assert bool(full.converged) and bool(mixed.converged)
    assert int(mixed.iters) <= int(np.ceil(1.2 * int(full.iters))) + 1
    np.testing.assert_allclose(np.asarray(mixed.x), np.asarray(full.x),
                               rtol=1e-7, atol=1e-8)
