"""Multigrid-preconditioned conjugate gradients (MG-PCG).

Beyond reference parity (AndyMN/MultigridCMT iterates plain V-cycles —
SURVEY.md §3.1): wrapping the V-cycle in a Krylov accelerator is the
standard production upgrade for SPD problems. One V-cycle per iteration is
the preconditioner ``z = M^-1 r``; CG then minimizes the A-norm of the
error over the generated Krylov space, which

  * squeezes the convergence factor below the stationary V-cycle's rho
    (the CG polynomial is optimal, the stationary iteration's is fixed), and
  * rescues configurations where the stationary cycle is slow or stalls
    (strong shifts, low-precision arithmetic).

TPU-first formulation: the entire iteration — V-cycle preconditioner,
matrix-free operator applies, dot products, residual history — runs on
device inside one ``lax.while_loop``; arrays stay in the backend's native
layout (aligned Pallas layout on TPU) throughout, so the hot path is the
same fused Pallas kernels as the stationary solve.

The Polak-Ribiere (flexible-CG) beta ``z'(r_new - r_old) / z'r`` is used
instead of the textbook Fletcher-Reeves form: the RB-GS-smoothed V-cycle is
not an exactly symmetric operator (red-then-black ordering), and flexible
CG stays convergent for such slightly nonsymmetric preconditioners at the
cost of one extra dot product.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import SolverConfig
from ..grids import Hierarchy, interior, pad_interior
from . import cycles


def _dot(a: jax.Array, b: jax.Array) -> jax.Array:
    # Whole-array dots are interior dots: ghost cells and alignment pads
    # are zero by invariant in both layouts.
    return jnp.sum(a * b)


def mixed_cycle_dtype(config: SolverConfig):
    """Dtype the V-cycle preconditioner should be cast to, or None.

    ``config.precond_dtype`` is honored only where the cycle runs on
    kernels adapted for sub-32-bit storage: the color-packed 2D Pallas
    tier (``kernels/packed2d.py``), whose tiles are widened to float32 in
    registers (`_cdt`) and which emits coarse-level arrays in the compute
    dtype, so low precision only ever touches the fine level's HBM
    traffic. Everywhere else — jnp stencils, the aligned fused2d /
    stencil2d kernels, 1D/3D problems — raw bfloat16 stencil algebra at
    1/h^2 ~ 4^k scale is catastrophic cancellation (or an outright Mosaic
    compile failure: no sub-32-bit sublane rotate), so the cast is
    skipped and the preconditioner runs in full ``config.dtype``.
    """
    pd = config.cycle_dtype()
    if pd == jnp.dtype(config.dtype):
        return None
    from .. import kernels  # deferred: kernels imports solvers.cycles

    if (config.ndim == 2 and config.use_pallas
            and config.n >= kernels.PACK_MIN_N):
        return pd
    if (config.ndim == 3 and config.use_pallas
            and config.smoother == "rbgs"      # jacobi/cheby route to the
            and config.n >= kernels.PALLAS3_MIN_N):  # jnp tier: no bf16
        # stencil3d tier (round 5): rings widen bf16 to f32 in
        # registers, the residual emits f32 (coarse levels at full
        # precision), and the up leg promotes to f32 at the correction
        # add — the 3D kernels sit at the Mosaic DMA cap, so halved
        # bytes are a direct win.
        from ..grids import aligned3_shape
        from ..kernels.stencil3d import fits_vmem

        _, r, c = aligned3_shape(config.n)
        if fits_vmem(r, c, pd):
            return pd
    return None


def cg_loop(x, b, *, dot, apply_a, precond, residual, tol, max_iters):
    """Flexible (Polak-Ribiere) preconditioned-CG iteration driver.

    The single source of the CG recurrence, shared by the single-device
    solver below and the distributed solver (``parallel.sharded``) — the
    two differ only in their primitives, which come in as callables:

      dot(a, b)      inner product (plain ``jnp.sum`` or mesh ``psum``)
      apply_a(p)     operator apply in the caller's native layout
      precond(r)     one V-cycle from a zero guess
      residual(x, b) r = b - A x (a fused kernel where available — cheaper
                     than ``b - apply_a(x)``)

    Runs entirely inside one ``lax.while_loop`` with the same stall and
    divergence guards as ``cycles.solve`` (``cycles.step_guards``).
    Returns ``(x, iters, hist, rel)`` where ``hist`` has static length
    ``max_iters + 1``, entries past ``iters`` backfilled with the final
    relative residual.
    """
    b_norm = jnp.sqrt(dot(b, b))
    b_norm = jnp.where(b_norm == 0, 1.0, b_norm)

    r = residual(x, b)
    rel0 = jnp.sqrt(dot(r, r)) / b_norm
    z = precond(r)
    p = z
    rz = dot(r, z)
    hist0 = jnp.full((max_iters + 1,), rel0, dtype=b.dtype)

    def cond(state):
        x, r, z, p, rz, k, hist, rel, stall, div = state
        return ((rel >= tol) & (k < max_iters)
                & cycles.guards_ok(stall, div))

    def body(state):
        x, r, z, p, rz, k, hist, rel, stall, div = state
        ap = apply_a(p)
        pap = dot(p, ap)
        alpha = rz / jnp.where(pap == 0, 1.0, pap)
        x = x + alpha * p
        r_new = r - alpha * ap
        new_rel = jnp.sqrt(dot(r_new, r_new)) / b_norm
        z_new = precond(r_new)
        rz_new = dot(r_new, z_new)
        beta = (rz_new - dot(z_new, r)) / jnp.where(rz == 0, 1.0, rz)
        p = z_new + beta * p
        stall, div = cycles.step_guards(new_rel, rel, stall, div)
        hist = hist.at[k + 1].set(new_rel)
        return x, r_new, z_new, p, rz_new, k + 1, hist, new_rel, stall, div

    x, r, z, p, rz, iters, hist, rel, _, _ = jax.lax.while_loop(
        cond, body, (x, r, z, p, rz, 0, hist0, rel0, 0, 0))
    idx = jnp.arange(max_iters + 1)
    hist = jnp.where(idx <= iters, hist, rel)
    return x, iters, hist, rel


@partial(jax.jit, static_argnames=("config",))
def solve_pcg(hier: Hierarchy, b: jax.Array, config: SolverConfig,
              x0: jax.Array | None = None) -> cycles.SolveResult:
    """Solve A x = b by CG preconditioned with one V-cycle per iteration.

    Same contract as ``cycles.solve``: iterate until
    ``||r|| / ||b|| < config.tol`` or ``config.max_iters``, returning a
    ``SolveResult`` whose ``res_history`` holds the relative residual after
    each iteration (CG iterations play the role of cycles).
    """
    bk = cycles.get_backend(config)
    n, h = hier.fine.n, hier.fine.h
    b = bk.encode(pad_interior(interior(b)))
    x = (jnp.zeros_like(b) if x0 is None
         else bk.encode(pad_interior(interior(x0))))
    zeros = jnp.zeros_like(b)

    def apply_a(p):
        # A p = -(b' - A p) with b' = 0; reuses the backend residual kernel.
        return -bk.residual(p, zeros, n, h)

    pd = mixed_cycle_dtype(config)
    if pd is None:
        def precond(r):
            return cycles.cycle(hier, jnp.zeros_like(r), r, config)
    else:
        # Mixed precision: the inner V-cycle runs in `precond_dtype`
        # (bfloat16 on TPU — half the HBM bytes on the fine level, where
        # ~75% of a cycle's traffic lives). Cast at the preconditioner
        # boundary only; the outer CG recurrence and all dot products stay
        # in config.dtype, so the solve converges to full-dtype accuracy
        # (flexible CG tolerates the inexact M^-1). The Pallas packed
        # kernels keep f32 compute registers and emit COARSE arrays in
        # f32 (kernels/packed2d._cdt), so coarser levels and the coarsest
        # dense solve run at full precision automatically — low precision
        # only ever touches the fine level's storage.
        def precond(r):
            rp = r.astype(pd)
            z = cycles.cycle(hier, jnp.zeros_like(rp), rp, config)
            return z.astype(r.dtype)

    x, iters, hist, rel = cg_loop(
        x, b, dot=_dot, apply_a=apply_a, precond=precond,
        residual=lambda xx, bb: bk.residual(xx, bb, n, h),
        tol=config.tol, max_iters=config.max_iters)
    return cycles.SolveResult(x=bk.decode(x, n), iters=iters,
                              res_history=hist, converged=rel < config.tol)
