"""Multigrid cycle drivers: V-cycle, W-cycle, FMG, and the outer solve loop.

Capability parity with the reference's recursive cycle drivers
(SURVEY.md §3.1/§3.2): pre-smooth, restrict residual, recurse, prolong and
correct, post-smooth, with a direct solve on the coarsest level, plus the
full-multigrid (FMG) driver that walks the hierarchy coarse-to-fine.

TPU-first formulation: the reference's Python recursion is unrolled at trace
time over the *static* level list (`grids.Hierarchy`), so a whole V-cycle —
and in fact the whole outer iteration via `lax.while_loop` — compiles to a
single XLA program: one host->device dispatch per solve, not per smoothing
sweep. The coarsest solve is a tiny dense matmul against a precomputed
inverse (MXU-friendly) instead of the reference's `spsolve`.

All grid arrays are padded with a one-cell zero ghost boundary (`grids.py`).
Ops are routed through a `Backend` record so the Pallas kernel versions
(`kernels/`) can replace the pure-jnp stencils without touching the drivers.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..config import SolverConfig
from ..grids import Hierarchy, interior, pad_interior
from ..ops import laplacian, smoothers, transfer
from ..utils import profiling


class Backend(NamedTuple):
    """Pluggable stencil implementations (pure-jnp default; Pallas in kernels/).

    Arrays flow through a cycle in the backend's *native layout*: the
    logical padded grid for jnp, the TPU-aligned embedding for Pallas
    (`grids.aligned_shape`). `encode`/`decode` convert once per solve at
    the driver boundary. Every op takes the logical interior size n and
    mesh spacing h of its level (static per level).

    Signatures (native-layout in / native-layout out):
      smooth(u, b, n, h, kind=..., omega=..., sweeps=..., sigma=...)
      residual(u, b, n, h, sigma=...)
      restrict(r, n)            # fine level n -> coarse level (n-1)/2
      prolong(e, nc)            # coarse level nc -> fine level 2*nc+1
      encode(u_padded) / decode(u_native, n)
    """

    smooth: Callable
    residual: Callable
    restrict: Callable
    prolong: Callable
    encode: Callable
    decode: Callable
    # Optional fused ops (None -> composed from the basics):
    #   residual_restrict(u, b, n, h) = restrict(residual(u, b, n, h))
    #   prolong_add(x, e, n, nc) = x + prolong(e, nc)
    residual_restrict: Callable | None = None
    prolong_add: Callable | None = None
    # Optional whole-leg fusions (kernels/fused2d.py) — one HBM pass per
    # V-cycle leg. Return None from the callable to decline a case (the
    # driver then composes from the ops above):
    #   smooth_residual_restrict(u, b, n, h, kind=, omega=, sweeps=,
    #       sigma=) -> (u', rc) | None
    #   prolong_add_smooth(x, e, b, n, nc, h, kind=, omega=, sweeps=,
    #       sigma=) -> x' | None
    smooth_residual_restrict: Callable | None = None
    prolong_add_smooth: Callable | None = None
    # Optional fused convergence check (None or a callable returning None
    # to decline): ||b - A x||^2 without materializing the residual.
    # red_only=True asserts x just finished an RB-GS sweep (whose closing
    # black half-sweep zeroes the black-point residual exactly), halving
    # the work.
    #   residual_norm2(x, b, n, h, red_only=False) -> scalar | None
    residual_norm2: Callable | None = None


JNP_BACKEND = Backend(
    smooth=lambda u, b, n, h, **kw: smoothers.smooth(u, b, h, **kw),
    residual=lambda u, b, n, h, sigma=0.0: laplacian.residual(
        u, b, h, sigma=sigma),
    restrict=lambda r, n: transfer.restrict(r),
    prolong=lambda e, nc: transfer.prolong(e),
    encode=lambda u: u,
    decode=lambda u, n: u,
)


def get_backend(config: SolverConfig) -> Backend:
    if config.use_pallas:
        if config.ndim == 3 and config.smoother != "rbgs":
            # Measured on the v5e chip (bench_3d.py, 255^3): XLA already
            # compiles the jnp 7-point Jacobi/Chebyshev chains to fused
            # single-pass programs and pins the loop-carried grid in the
            # ~128 MB physical VMEM, beating a hand-streamed Pallas
            # kernel (166 us vs 481 us per Jacobi sweep). Only RB-GS —
            # whose two-color masked updates XLA cannot fuse into one
            # pass — wins with the plane-rolling kernel (2.3x), so the
            # kernel tier is reserved for it.
            return JNP_BACKEND
        from ..kernels import PALLAS_BACKEND

        return PALLAS_BACKEND
    return JNP_BACKEND


def coarse_solve(hier: Hierarchy, b: jax.Array, sigma=0.0,
                 backend: Backend = JNP_BACKEND) -> jax.Array:
    """Direct solve on the coarsest level (native layout in/out).

    sigma == 0 (static): single small matmul against the precomputed dense
    inverse. Shifted (traced sigma, eigensolver path): dense
    ``jnp.linalg.solve`` on (A_c - sigma*I) — the coarsest operator is tiny.
    """
    nc = hier.coarsest.n
    r = interior(backend.decode(b, nc)).reshape(-1)
    # The dense operator/inverse live in config.dtype; solve at that full
    # precision but hand the result back in the cycle's dtype — in a
    # mixed-precision cycle the coarse arrays are f32 and must not creep
    # up to f64 on the way back through the Pallas up-leg kernels.
    if laplacian._is_zero(sigma):
        x = (hier.coarse_inv @ r.astype(hier.coarse_inv.dtype)
             ).astype(r.dtype)
    else:
        cd = hier.coarse_dense
        a = cd - jnp.asarray(sigma, dtype=cd.dtype) * jnp.eye(
            cd.shape[0], dtype=cd.dtype)
        x = jnp.linalg.solve(a, r.astype(cd.dtype)).astype(r.dtype)
    shape = (nc,) * hier.ndim
    return backend.encode(pad_interior(x.reshape(shape)))


def v_cycle(hier: Hierarchy, x: jax.Array, b: jax.Array,
            config: SolverConfig, level: int = 0, sigma=0.0,
            gamma: int = 1) -> jax.Array:
    """One multigrid cycle starting at ``level`` (gamma=1: V, gamma=2: W).

    Mirrors the reference's recursive driver (SURVEY.md §3.1); the Python
    recursion unrolls at trace time because the hierarchy is static.
    Arrays are in the backend's native layout.
    """
    bk = get_backend(config)
    spec = hier.levels[level]
    omega = config.effective_omega()
    if level == hier.num_levels - 1:
        with profiling.level_scope(level):
            return coarse_solve(hier, b, sigma, backend=bk)
    # Down leg: whole-leg fusion (one HBM pass) when the backend offers it,
    # else smooth + (fused or composed) residual/restrict.
    with profiling.level_scope(level):
        down = None
        if bk.smooth_residual_restrict is not None:
            down = bk.smooth_residual_restrict(
                x, b, spec.n, spec.h, kind=config.smoother, omega=omega,
                sweeps=config.nu1, sigma=sigma)
        if down is not None:
            x, rc = down
        else:
            x = bk.smooth(x, b, spec.n, spec.h, kind=config.smoother,
                          omega=omega, sweeps=config.nu1, sigma=sigma)
            if bk.residual_restrict is not None and laplacian._is_zero(sigma):
                rc = bk.residual_restrict(x, b, spec.n, spec.h)
            else:
                r = bk.residual(x, b, spec.n, spec.h, sigma=sigma)
                rc = bk.restrict(r, spec.n)
        ec = jnp.zeros_like(rc)
    for _ in range(gamma):
        ec = v_cycle(hier, ec, rc, config, level=level + 1, sigma=sigma,
                     gamma=gamma)
    nc = hier.levels[level + 1].n
    # Up leg, symmetric.
    with profiling.level_scope(level):
        up = None
        if bk.prolong_add_smooth is not None:
            up = bk.prolong_add_smooth(
                x, ec, b, spec.n, nc, spec.h, kind=config.smoother,
                omega=omega, sweeps=config.nu2, sigma=sigma)
        if up is not None:
            x = up
        else:
            if bk.prolong_add is not None:
                x = bk.prolong_add(x, ec, spec.n, nc)
            else:
                x = x + bk.prolong(ec, nc)
            x = bk.smooth(x, b, spec.n, spec.h, kind=config.smoother,
                          omega=omega, sweeps=config.nu2, sigma=sigma)
    return x


def cycle(hier: Hierarchy, x: jax.Array, b: jax.Array,
          config: SolverConfig, sigma=0.0) -> jax.Array:
    """One cycle of the configured type from the finest level."""
    gamma = 2 if config.cycle == "w" else 1
    return v_cycle(hier, x, b, config, level=0, sigma=sigma, gamma=gamma)


def fmg(hier: Hierarchy, b: jax.Array, config: SolverConfig,
        n_vcycles: int = 1) -> jax.Array:
    """Full multigrid (SURVEY.md §3.2): O(N) solve to discretization accuracy.

    Restrict b through the whole hierarchy, direct-solve the coarsest, then
    walk up: prolong the current solution as the initial guess and run
    ``n_vcycles`` V-cycles at each level. Native-layout in/out.
    """
    bk = get_backend(config)
    bs = [b]
    for lev in range(hier.num_levels - 1):
        bs.append(bk.restrict(bs[-1], hier.levels[lev].n))
    x = coarse_solve(hier, bs[-1], backend=bk)
    for level in range(hier.num_levels - 2, -1, -1):
        nc = hier.levels[level + 1].n
        if config.fmg_prolong == "cubic":
            # FMG-order interpolation for the solution walk (SURVEY.md
            # §3.2). Runs on the logical layout — once per level per
            # solve, dwarfed by the V-cycles — while the within-cycle
            # correction prolongation stays (bi)linear on the backend.
            x = bk.encode(transfer.fmg_prolong(bk.decode(x, nc)))
        else:
            x = bk.prolong(x, nc)
        for _ in range(n_vcycles):
            x = v_cycle(hier, x, bs[level], config, level=level)
    return x


class SolveResult(NamedTuple):
    x: jax.Array             # padded solution
    iters: jax.Array         # number of cycles taken (scalar int)
    res_history: jax.Array   # (max_iters + 1,) relative residual norms;
                             # entries past `iters` hold the final value
    converged: jax.Array     # bool scalar


def _norm(v: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.sum(v * v))


# In-loop failure detection (SURVEY.md §5: "divergence guard on the
# residual history (abort if rho >= 1)"). Two cheap counters folded into
# every outer while_loop, so a diverging solve — e.g. a bad eigensolver
# shift making a level indefinite, or an unstable smoother omega — aborts
# within a couple of iterations with converged=False instead of spinning
# to max_iters and returning an overflow/NaN field:
#   stall: residual not improving (>= 0.9x) — the dtype roundoff floor.
#   diverge: residual GREW by more than DIVERGE_FACTOR in one iteration,
#            DIVERGE_PATIENCE times in a row. rho slightly above 1 is
#            indistinguishable from a stall (and the stall guard gets it);
#            10x-per-cycle growth twice is unambiguous divergence.
STALL_PATIENCE = 3
DIVERGE_FACTOR = 10.0
DIVERGE_PATIENCE = 2


def step_guards(new_rel, rel, stall, div):
    """Updated (stall, diverge) counters after one outer iteration."""
    stall = jnp.where(new_rel >= 0.9 * rel, stall + 1, 0)
    div = jnp.where(new_rel > DIVERGE_FACTOR * rel, div + 1, 0)
    return stall, div


def guards_ok(stall, div):
    return (stall < STALL_PATIENCE) & (div < DIVERGE_PATIENCE)


# Eigensolver outers use a CUMULATIVE growth counter instead: a broken
# shift (indefinite operator) typically makes the eigen-residual
# *oscillate* — up 10x, down, up again — because the Ritz step
# renormalizes every iteration, so a consecutive counter never fires.
# Legitimate runs bump at most once or twice (shift activation), far
# below this total.
EIGEN_DIVERGE_TOTAL = 4


def eigen_guard(new_res, res, div):
    """Cumulative count of >DIVERGE_FACTOR eigen-residual growths."""
    return div + jnp.where(new_res > DIVERGE_FACTOR * res, 1, 0)


@partial(jax.jit, static_argnames=("config",))
def solve(hier: Hierarchy, b: jax.Array, config: SolverConfig,
          x0: jax.Array | None = None) -> SolveResult:
    """Iterate cycles until ||r|| / ||b|| < config.tol (SURVEY.md §3.1).

    The whole loop — including residual-history bookkeeping — runs on
    device inside one ``lax.while_loop``; the history has static length
    ``max_iters + 1`` (XLA needs static shapes).
    """
    bk = get_backend(config)
    n, h = hier.fine.n, hier.fine.h
    # Sanitize: every op relies on the zero-ghost invariant, and the norms
    # below are whole-array — zero the ghost boundary of user inputs.
    b = bk.encode(pad_interior(interior(b)))
    if config.cycle == "fmg":
        # FMG is a direct method: run it once, then report its residual and
        # polish with V-cycles if the tolerance asks for more.
        x = fmg(hier, b, config)
    else:
        x = (jnp.zeros_like(b) if x0 is None
             else bk.encode(pad_interior(interior(x0))))
    # Full-array norms are interior norms: ghosts (and alignment pads in
    # the Pallas layout) are zero by invariant.
    b_norm = _norm(b)
    b_norm = jnp.where(b_norm == 0, 1.0, b_norm)

    def res_norm(x, red_only=False):
        if bk.residual_norm2 is not None:
            v = bk.residual_norm2(x, b, n, h, red_only=red_only)
            if v is not None:
                return jnp.sqrt(v)
        return _norm(bk.residual(x, b, n, h))

    # After a cycle, x ends with the level-0 post-smooth: for RB-GS the
    # closing black half-sweep zeroes the black residual exactly, so the
    # convergence check only needs the red plane.
    post_red = config.smoother == "rbgs" and config.nu2 >= 1

    r0 = res_norm(x) / b_norm
    hist0 = jnp.full((config.max_iters + 1,), r0, dtype=b.dtype)

    # Stall guard: when the residual hits the dtype's roundoff floor (fp32
    # stalls near ~1e-4 relative for fine grids — 1/h^2 cancellation), the
    # iteration stops improving; exit after 3 non-improving cycles instead
    # of spinning to max_iters with rho ~ 1. Divergence guard: see
    # step_guards above.
    def cond(state):
        x, k, hist, rel, stall, div = state
        return ((rel >= config.tol) & (k < config.max_iters)
                & guards_ok(stall, div))

    def body(state):
        x, k, hist, rel, stall, div = state
        x = cycle(hier, x, b, config)
        new_rel = res_norm(x, red_only=post_red) / b_norm
        stall, div = step_guards(new_rel, rel, stall, div)
        hist = hist.at[k + 1].set(new_rel)
        return x, k + 1, hist, new_rel, stall, div

    x, iters, hist, rel, _, _ = jax.lax.while_loop(
        cond, body, (x, 0, hist0, r0, 0, 0))
    # Entries past `iters` were never written; backfill them with the final
    # residual so downstream convergence-factor code can mask cleanly.
    idx = jnp.arange(config.max_iters + 1)
    hist = jnp.where(idx <= iters, hist, rel)
    return SolveResult(x=bk.decode(x, n), iters=iters, res_history=hist,
                       converged=rel < config.tol)


def convergence_factor(result: SolveResult) -> jax.Array:
    """Geometric-mean residual reduction per cycle over the iterations run.

    rho = (r_final / r_0) ** (1 / iters) — the metric the reference reports
    and BASELINE.md bounds (match within <= 0.1).
    """
    r0 = result.res_history[0]
    rk = result.res_history[result.iters]
    iters = jnp.maximum(result.iters, 1)
    return (rk / r0) ** (1.0 / iters)
