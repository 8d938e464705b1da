"""Grid hierarchy for vertex-centered geometric multigrid.

Design (TPU-first, see SURVEY.md §7): grids are dense jnp arrays carrying a
one-cell ghost boundary of zeros (homogeneous Dirichlet). A 1D level with
``n`` interior points is stored as shape ``(n+2,)``; a 2D level as
``(n+2, n+2)``. All stencil operators read the full padded array and write
only the interior, so applications are pure shift-and-adds with no edge
conditionals — exactly what XLA fuses well and what the sharded path can
feed with `ppermute` halos.

The hierarchy is *static*: level sizes are Python ints fixed at trace time,
so the recursive V-cycle of the reference (SURVEY.md §3.1) unrolls into a
straight-line XLA program. Constant-coefficient Poisson is re-discretized
per level (h_l = 2^l h), which for full-weighting/bilinear transfers is the
standard textbook choice the reference uses (SURVEY.md §2, "Coarse-grid
hierarchy" row).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SolverConfig
from .ops import laplacian


@dataclasses.dataclass(frozen=True)
class LevelSpec:
    """Static description of one multigrid level."""

    n: int      # interior points per axis
    h: float    # mesh spacing

    @property
    def padded_shape_1d(self) -> Tuple[int, ...]:
        return (self.n + 2,)

    def padded_shape(self, ndim: int) -> Tuple[int, ...]:
        return (self.n + 2,) * ndim


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Hierarchy:
    """Static level specs plus the precomputed dense coarsest-level inverse.

    ``coarse_inv`` is the dense inverse of the coarsest Poisson operator
    (tiny: min_coarse^ndim square), computed once at setup on the host. The
    coarsest solve inside the cycle is then a single small matmul — an
    MXU-friendly replacement for the reference's `scipy.sparse.linalg.spsolve`
    (SURVEY.md §2 "Coarsest solve" row).
    """

    ndim: int
    levels: Tuple[LevelSpec, ...]   # fine → coarse
    coarse_inv: jax.Array
    coarse_dense: jax.Array         # dense A_coarsest, for shifted solves

    def tree_flatten(self):
        return (self.coarse_inv, self.coarse_dense), (self.ndim, self.levels)

    @classmethod
    def tree_unflatten(cls, aux, children):
        ndim, levels = aux
        coarse_inv, coarse_dense = children
        return cls(ndim=ndim, levels=levels, coarse_inv=coarse_inv,
                   coarse_dense=coarse_dense)

    @property
    def num_levels(self) -> int:
        return len(self.levels)

    @property
    def fine(self) -> LevelSpec:
        return self.levels[0]

    @property
    def coarsest(self) -> LevelSpec:
        return self.levels[-1]


def build_hierarchy(config: SolverConfig) -> Hierarchy:
    """Build the static level list and the dense coarsest inverse.

    Runs once, outside jit (SURVEY.md §3.4). The coarsest inverse is built
    with NumPy in float64 and cast to the compute dtype, so its accuracy
    doesn't depend on the compute dtype.
    """
    sizes = config.level_sizes()
    levels = tuple(
        LevelSpec(n=n, h=1.0 / (n + 1)) for n in sizes
    )
    nc = levels[-1].n
    hc = levels[-1].h
    a_dense = laplacian.dense_operator(nc, config.ndim, hc)  # float64 numpy
    inv = np.linalg.inv(a_dense)
    coarse_inv = jnp.asarray(inv, dtype=config.dtype)
    coarse_dense = jnp.asarray(a_dense, dtype=config.dtype)
    return Hierarchy(ndim=config.ndim, levels=levels, coarse_inv=coarse_inv,
                     coarse_dense=coarse_dense)


def zeros_like_level(level: LevelSpec, ndim: int, dtype) -> jax.Array:
    return jnp.zeros(level.padded_shape(ndim), dtype=dtype)


def pad_interior(interior: jax.Array) -> jax.Array:
    """Wrap an interior-only array in a one-cell zero ghost boundary."""
    return jnp.pad(interior, 1)


def interior(u: jax.Array) -> jax.Array:
    """View of the interior of a padded grid array (any ndim)."""
    return u[(slice(1, -1),) * u.ndim]


def aligned_shape(n: int) -> Tuple[int, int]:
    """TPU-native physical shape for a 2D padded grid of logical size n.

    Mosaic DMA windows must be 8-row-aligned and full 128-multiple width
    (see kernels/stencil2d.py), and the logical padded size 2^k + 1 can't
    satisfy that — so the Pallas path stores each level as
    (round_up(n+2, 16), round_up(n+2, 128)) with the logical padded grid in
    the top-left corner and zeros elsewhere. Rows are 16-aligned (not just
    the DMA-minimum 8) so that the cross-level fused kernels (prolong+
    correct, residual+restrict) keep coarse-row offsets (fine/2) 8-aligned
    too. The zero pad region is part of the ghost-boundary invariant: no op
    ever writes it.
    """
    p = n + 2
    return (-(-p // 16) * 16, -(-p // 128) * 128)


def to_aligned(u: jax.Array) -> jax.Array:
    """Embed a (n+2, n+2) padded grid into its aligned physical layout."""
    p = u.shape[0]
    r, c = aligned_shape(p - 2)
    return jnp.pad(u, ((0, r - p), (0, c - p)))


def from_aligned(ua: jax.Array, n: int) -> jax.Array:
    """Extract the (n+2, n+2) logical padded grid from an aligned array."""
    return ua[: n + 2, : n + 2]


def aligned3_shape(n: int) -> Tuple[int, int, int]:
    """TPU-native physical shape for a 3D padded grid of logical size n.

    Only the trailing two dims carry Mosaic tiling constraints (sublane /
    lane); the leading *plane* dim is a plain array dim with no alignment
    requirement, so the 3D layout is ``(n+2, round_up(n+2, 8),
    round_up(n+2, 128))`` — each z-plane is a 2D-aligned grid, streamed
    plane-by-plane by kernels/stencil3d.py. Zero pad region as in 2D.
    """
    p = n + 2
    # Planes padded to a multiple of 4 so the batched plane-pipeline
    # kernels (kernels/stencil3d.py) tile the stack uniformly in blocks
    # of up to 4 planes; the <= 3 pad planes are zero and part of the
    # ghost invariant.
    return (-(-p // 4) * 4, -(-p // 8) * 8, -(-p // 128) * 128)


def to_aligned3(u: jax.Array) -> jax.Array:
    """Embed a (n+2,)*3 padded grid into its aligned physical layout."""
    p = u.shape[0]
    pp, r, c = aligned3_shape(p - 2)
    return jnp.pad(u, ((0, pp - p), (0, r - p), (0, c - p)))


def from_aligned3(ua: jax.Array, n: int) -> jax.Array:
    """Extract the (n+2,)*3 logical padded grid from an aligned3 array."""
    return ua[: n + 2, : n + 2, : n + 2]


def interior_coords_1d(n: int, dtype=jnp.float64) -> jax.Array:
    """x-coordinates of the n interior points of the unit interval."""
    h = 1.0 / (n + 1)
    return (jnp.arange(1, n + 1, dtype=dtype)) * h


def grid_coords(n: int, ndim: int, dtype):
    """Interior coordinates; 1D → (x,), 2D/3D → 'ij' meshgrid tuple."""
    x = jnp.arange(1, n + 1, dtype=dtype) / (n + 1)
    if ndim == 1:
        return (x,)
    return tuple(jnp.meshgrid(*([x] * ndim), indexing="ij"))
