"""Smoothers: weighted Jacobi and red-black Gauss-Seidel.

Capability parity with the reference's two smoothers (SURVEY.md §2):
  * weighted Jacobi  x <- x + omega * D^-1 (b - A x), omega default 2/3 (1D)
    / 4/5 (2D);
  * red-black Gauss-Seidel: update all red points (interior coordinate sum
    (i+j) even, 1-based), then all black points, each half-sweep fully
    parallel.

TPU-first formulation: both smoothers are whole-grid vectorized stencil
updates. RB-GS computes the GS update at every point and selects by a color
mask — twice the (cheap) FLOPs of a strided implementation but a single
coalesced memory pass, which is what matters on an HBM-bandwidth-bound
kernel. The Pallas fused versions live in `kernels/`.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import laplacian


def default_omega(ndim: int) -> float:
    return 2.0 / 3.0 if ndim == 1 else 4.0 / 5.0


def jacobi(u: jax.Array, b: jax.Array, h: float, omega: float,
           sigma=0.0) -> jax.Array:
    """One weighted-Jacobi sweep on a padded grid: x + omega*D^-1*(b - Ax).

    ``sigma`` shifts the operator to A - sigma*I (eigensolver inner solves).
    """
    ndim = u.ndim
    d = laplacian.diag_value(ndim, h, sigma)
    r = laplacian.residual(u, b, h, sigma)
    return u + (jnp.asarray(omega, dtype=u.dtype)
                / jnp.asarray(d, dtype=u.dtype)) * r


def _color_mask(shape, parity: int, row_offset: int = 0, dtype=jnp.bool_):
    """Mask of padded-grid points whose coordinate sum has given parity.

    Interior point (i, j) (1-based padded indices) is *red* iff (i+j) even.
    ``row_offset`` shifts the row index — used by the sharded path where a
    local tile starts at a global row other than 0.
    """
    if len(shape) == 1:
        idx = jax.lax.broadcasted_iota(jnp.int32, (shape[0], 1), 0)[:, 0]
        return (idx + row_offset) % 2 == parity
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (rows + cols + row_offset) % 2 == parity


def _gs_update(u: jax.Array, b: jax.Array, h: float, sigma=0.0) -> jax.Array:
    """Gauss-Seidel pointwise update value at every interior point.

    x_ij = (h^2 b_ij + sum of neighbor values) / (diag*h^2), computed from
    the *current* u everywhere (the color mask makes it a proper
    half-sweep). With a shift, the denominator becomes 2|4 - sigma*h^2.
    """
    h2 = jnp.asarray(h * h, dtype=u.dtype)
    if u.ndim == 1:
        den = 2.0 - jnp.asarray(sigma, dtype=u.dtype) * h2
        core = (h2 * b[1:-1] + u[:-2] + u[2:]) / den
        return jnp.pad(core, 1)
    den = 4.0 - jnp.asarray(sigma, dtype=u.dtype) * h2
    core = (
        h2 * b[1:-1, 1:-1]
        + u[:-2, 1:-1] + u[2:, 1:-1] + u[1:-1, :-2] + u[1:-1, 2:]
    ) / den
    return jnp.pad(core, 1)


def rbgs_half_sweep(u: jax.Array, b: jax.Array, h: float, parity: int,
                    row_offset: int = 0, sigma=0.0) -> jax.Array:
    """Update only the points of one color; ghosts remain untouched (zero)."""
    upd = _gs_update(u, b, h, sigma)
    mask = _color_mask(u.shape, parity, row_offset)
    # Interior-only write: _gs_update already zeroed the ghosts of `upd`,
    # but keep u's ghosts whatever they are by masking on the interior mask.
    imask = jnp.zeros(u.shape, dtype=bool)
    if u.ndim == 1:
        imask = imask.at[1:-1].set(True)
    else:
        imask = imask.at[1:-1, 1:-1].set(True)
    return jnp.where(mask & imask, upd, u)


def rbgs(u: jax.Array, b: jax.Array, h: float, row_offset: int = 0,
         sigma=0.0) -> jax.Array:
    """One full red-black Gauss-Seidel sweep: red (parity 0) then black."""
    u = rbgs_half_sweep(u, b, h, parity=0, row_offset=row_offset, sigma=sigma)
    u = rbgs_half_sweep(u, b, h, parity=1, row_offset=row_offset, sigma=sigma)
    return u


def smooth(u: jax.Array, b: jax.Array, h: float, *, kind: str, omega: float,
           sweeps: int, sigma=0.0) -> jax.Array:
    """Apply ``sweeps`` smoothing sweeps of the requested kind."""
    for _ in range(sweeps):
        if kind == "jacobi":
            u = jacobi(u, b, h, omega, sigma=sigma)
        elif kind == "rbgs":
            u = rbgs(u, b, h, sigma=sigma)
        else:
            raise ValueError(f"unknown smoother {kind!r}")
    return u
