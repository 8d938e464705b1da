"""Pure-jnp stencil ops on TPU-aligned grids (`grids.aligned_shape`).

The coarse levels of the Pallas solve path use these instead of Pallas
kernels: below ~256 interior points a hand-written DMA kernel buys nothing
(the level fits in cache/VMEM and XLA's fusion is already at bandwidth),
while every distinct Pallas kernel costs a separate Mosaic compile — which
the axon remote-compile tunnel prices at ~25s per kernel per process and
the persistent XLA cache does NOT cover (measured; XLA-only programs do
cache). Same masked-roll math as kernels/stencil2d.py, so the two tiers
agree to fp roundoff.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _interior_mask(n: int, shape):
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (rows >= 1) & (rows <= n) & (cols >= 1) & (cols <= n)


def _neighbor_sum(u):
    """Sum of the four neighbors via rolls (wraparound lands in masked
    ghost/pad cells, harmless under the zero-ghost invariant)."""
    return (jnp.roll(u, 1, 0) + jnp.roll(u, -1, 0)
            + jnp.roll(u, 1, 1) + jnp.roll(u, -1, 1))


def residual(u, b, n: int, h: float, sigma=0.0):
    inv_h2 = 1.0 / (h * h)
    au = (4.0 * u - _neighbor_sum(u)) * inv_h2
    r = b - au + jnp.asarray(sigma, u.dtype) * u
    return jnp.where(_interior_mask(n, u.shape), r, jnp.zeros_like(u))


def jacobi(u, b, n: int, h: float, omega: float, sigma=0.0):
    r = residual(u, b, n, h, sigma)
    d = 4.0 / (h * h) - jnp.asarray(sigma, u.dtype)
    return u + (jnp.asarray(omega, u.dtype) / d) * r


def rbgs(u, b, n: int, h: float, sigma=0.0):
    h2 = h * h
    imask = _interior_mask(n, u.shape)
    rows = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
    parity = (rows + cols) % 2
    den = 4.0 - jnp.asarray(sigma, u.dtype) * h2
    for p in (0, 1):
        vals = (h2 * b + _neighbor_sum(u)) / den
        u = jnp.where(imask & (parity == p), vals, u)
    return u


def smooth(u, b, n: int, h: float, *, kind: str, omega: float, sweeps: int,
           sigma=0.0):
    for _ in range(sweeps):
        if kind == "jacobi":
            u = jacobi(u, b, n, h, omega, sigma)
        elif kind == "rbgs":
            u = rbgs(u, b, n, h, sigma)
        else:
            raise ValueError(f"unknown smoother {kind!r}")
    return u
