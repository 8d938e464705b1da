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
from . import stencil2d

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
    if n < PALLAS_MIN_N:
        return stencils_aligned.smooth(u, b, n, h, kind=kind, omega=omega,
                                       sweeps=sweeps, sigma=sigma)
    for _ in range(sweeps):
        if kind == "jacobi":
            u = stencil2d.jacobi_sweep(u, b, n, h, omega, sigma=sigma)
        elif kind == "rbgs":
            u = stencil2d.rbgs_sweep(u, b, n, h, sigma=sigma)
        else:
            raise ValueError(f"unknown smoother {kind!r}")
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


PALLAS_BACKEND = Backend(
    smooth=_smooth,
    residual=_residual,
    restrict=_restrict,
    prolong=_prolong,
    encode=_encode,
    decode=_decode,
)
