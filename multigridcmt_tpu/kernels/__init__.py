"""Pallas kernel backend — drop-in replacement for the pure-jnp stencils.

Exports `PALLAS_BACKEND`, matching `solvers.cycles.Backend`. 2D grids live
in the TPU-aligned layout (`grids.aligned_shape`) end-to-end and route to
the row-tiled Pallas kernels (`stencil2d.py`); 1D grids (a few KB even at
the reference's 1023-point config) stay on the fused-by-XLA jnp path in
logical layout, where a hand-written kernel cannot win anything.
"""
from __future__ import annotations

import jax

from ..grids import from_aligned, to_aligned
from ..ops import laplacian, smoothers, stencils_aligned, transfer
from ..solvers.cycles import Backend
from . import fused2d, stencil2d, transfer2d

# Below this interior size, a level uses the aligned-layout jnp stencils
# instead of a Pallas kernel: the level is cheap either way, and each
# distinct Pallas kernel costs a per-process Mosaic compile (~25s through
# the axon remote-compile tunnel, not covered by the persistent XLA cache).
PALLAS_MIN_N = 200


def _smooth(u: jax.Array, b: jax.Array, n: int, h: float, *, kind: str,
            omega: float, sweeps: int, sigma=0.0) -> jax.Array:
    if u.ndim != 2:
        return smoothers.smooth(u, b, h, kind=kind, omega=omega,
                                sweeps=sweeps, sigma=sigma)
    if kind == "chebyshev":
        # Chebyshev = residual applies + elementwise axpys: the residual is
        # the Pallas kernel (one HBM pass per application), the recurrence
        # fuses in XLA. No dedicated kernel needed — or worth a Mosaic
        # compile.
        diag = laplacian.diag_value(2, h, sigma)
        return smoothers.chebyshev_generic(
            u, b, sweeps, diag,
            lambda uu, bb: _residual(uu, bb, n, h, sigma=sigma))
    if n < PALLAS_MIN_N:
        return stencils_aligned.smooth(u, b, n, h, kind=kind, omega=omega,
                                       sweeps=sweeps, sigma=sigma)
    if kind not in ("jacobi", "rbgs"):
        raise ValueError(f"unknown smoother {kind!r}")
    # Fuse as many sweeps as the kernel's halo supports into each call —
    # nu sweeps in one HBM pass instead of nu passes.
    max_fused = stencil2d.max_fused_sweeps(kind)
    while sweeps > 0:
        s = min(sweeps, max_fused)
        if kind == "jacobi":
            u = stencil2d.jacobi_sweep(u, b, n, h, omega, sigma=sigma,
                                       sweeps=s)
        else:
            u = stencil2d.rbgs_sweep(u, b, n, h, sigma=sigma, sweeps=s)
        sweeps -= s
    return u


def _residual(u: jax.Array, b: jax.Array, n: int, h: float,
              sigma=0.0) -> jax.Array:
    if u.ndim != 2:
        return laplacian.residual(u, b, h, sigma=sigma)
    if n < PALLAS_MIN_N:
        return stencils_aligned.residual(u, b, n, h, sigma=sigma)
    return stencil2d.residual(u, b, n, h, sigma=sigma)


def _restrict(r: jax.Array, n: int) -> jax.Array:
    if r.ndim != 2:
        return transfer.restrict(r)
    return transfer.restrict_aligned(r, n)


def _prolong(e: jax.Array, nc: int) -> jax.Array:
    if e.ndim != 2:
        return transfer.prolong(e)
    return transfer.prolong_aligned(e, nc)


def _encode(u: jax.Array) -> jax.Array:
    return to_aligned(u) if u.ndim == 2 else u


def _decode(u: jax.Array, n: int) -> jax.Array:
    return from_aligned(u, n) if u.ndim == 2 else u


def _residual_restrict(u: jax.Array, b: jax.Array, n: int,
                       h: float) -> jax.Array:
    if u.ndim != 2:
        return transfer.restrict(laplacian.residual(u, b, h))
    if n < PALLAS_MIN_N:
        return transfer.restrict_aligned(
            stencils_aligned.residual(u, b, n, h), n)
    return transfer2d.residual_restrict(u, b, n, h)


def _prolong_add(x: jax.Array, e: jax.Array, n: int, nc: int) -> jax.Array:
    if x.ndim != 2:
        return x + transfer.prolong(e)
    if n < PALLAS_MIN_N:
        return x + transfer.prolong_aligned(e, nc)
    return transfer2d.prolong_add(x, e, n, nc)


def _smooth_residual_restrict(u, b, n, h, *, kind, omega, sweeps,
                              sigma=0.0):
    """Whole-down-leg fusion; None declines to the composed path (1D,
    small levels, or more sweeps than one kernel's halo supports)."""
    if (u.ndim != 2 or n < PALLAS_MIN_N or kind not in ("jacobi", "rbgs")
            or sweeps > fused2d.max_down_sweeps(kind)):
        return None
    return fused2d.smooth_residual_restrict(
        u, b, n, h, kind=kind, omega=omega, sweeps=sweeps, sigma=sigma)


def _prolong_add_smooth(x, e, b, n, nc, h, *, kind, omega, sweeps,
                        sigma=0.0):
    if (x.ndim != 2 or n < PALLAS_MIN_N or kind not in ("jacobi", "rbgs")
            or sweeps > fused2d.max_up_sweeps(kind)):
        return None
    return fused2d.prolong_add_smooth(
        x, e, b, n, nc, h, kind=kind, omega=omega, sweeps=sweeps,
        sigma=sigma)


PALLAS_BACKEND = Backend(
    smooth=_smooth,
    residual=_residual,
    restrict=_restrict,
    prolong=_prolong,
    encode=_encode,
    decode=_decode,
    residual_restrict=_residual_restrict,
    prolong_add=_prolong_add,
    smooth_residual_restrict=_smooth_residual_restrict,
    prolong_add_smooth=_prolong_add_smooth,
)
