"""Distributed multigrid: shard_map row partitioning with ppermute halos.

This is the build-side L7 runtime of SURVEY.md §1/§3.5 (the reference is
single-process SciPy — BASELINE.json:5 frames all distribution as build
work): the grid is partitioned along its first axis (rows in 2D, planes in
3D) over a 1D device mesh, every stencil op exchanges a one-row halo with
its mesh neighbors via ``jax.lax.ppermute``, and once a level's local tile
gets too small to amortize latency the level is *agglomerated* —
all-gathered and computed replicated on every device (BASELINE.md config 5:
"halo ppermute + coarse-level agglomeration").

Partitioning invariants (vertex-centered 2^k - 1 grids; "row" below means
a slab of the first axis — a (n+2,) line in 2D, a (n+2, n+2) plane in 3D):

* The padded fine grid has 2^k + 1 rows: ghost row 0, interior 1..n, ghost
  n+1. Rows 1..2^k (interior plus the bottom ghost) are sharded: with D
  (a power of two <= 2^(k-1)) devices, device d owns m = 2^k / D rows,
  global rows d*m+1 .. (d+1)*m. The bottom ghost lands on the last device
  as a "dead row" that masks keep zero; the top ghost row 0 is never
  stored — it reappears as device 0's all-zero halo (ppermute edge
  semantics: non-receiving devices get zeros — exactly the homogeneous
  Dirichlet boundary).

* Coarsening halves m per level (coarse row j sits at fine row 2j), so the
  same ownership formula holds on every sharded level and restriction
  needs only the bottom halo, prolongation only the top halo.

* Red-black Gauss-Seidel re-exchanges halos between the two half-sweeps
  (the updated red halo row feeds the black sweep) — this is what keeps
  the distributed sweep *exactly* equal to the single-device sweep
  (SURVEY.md §7 hard part #1), which the tests assert to fp tolerance.

Multi-host note: the same code runs unchanged on a multi-host mesh built
from ``jax.distributed.initialize`` + all processes' devices; ppermute
rides ICI within a slice and DCN across slices (SURVEY.md §5).

Local tiles are *owned-rows only*: (m, n+2) in 2D, (m, n+2, n+2) in 3D;
each op builds its halo-extended (m+2, ...) view on the fly. All trailing
axes keep the full padded extent — only the first axis is ever sharded,
so the trailing-axis parts of the transfer stencils reuse the
single-device separable passes from ``ops/transfer.py``.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SolverConfig
from ..grids import Hierarchy, build_hierarchy, interior, pad_interior
from ..ops import laplacian, smoothers, transfer
from ..solvers import cycles


def make_mesh(devices=None, axis: str = "row") -> Mesh:
    """1D device mesh for row partitioning (SURVEY.md §3.5)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


# ---------------------------------------------------------------------------
# Halo exchange and local (per-shard) stencil ops. All run inside shard_map.
# ---------------------------------------------------------------------------

def _perm_down(d: int):
    """src -> src+1 (deliver my last row as my lower neighbor's top halo)."""
    return [(i, i + 1) for i in range(d - 1)]


def _perm_up(d: int):
    return [(i + 1, i) for i in range(d - 1)]


def halo_extend(u: jax.Array, axis: str, ndev: int) -> jax.Array:
    """(m, c) owned tile -> (m+2, c) with neighbor halo rows.

    Edge devices receive zeros — the Dirichlet ghost rows — for free from
    ppermute's no-source semantics.
    """
    top = jax.lax.ppermute(u[-1:, :], axis, _perm_down(ndev))
    bot = jax.lax.ppermute(u[:1, :], axis, _perm_up(ndev))
    return jnp.concatenate([top, u, bot], axis=0)


def _row_gids(m: int, c: int, axis: str):
    """Global padded row index of each owned row: d*m + 1 + i."""
    d = jax.lax.axis_index(axis)
    return (d * m + 1
            + jax.lax.broadcasted_iota(jnp.int32, (m, c), 0))


def _interior_mask(n: int, m: int, c: int, axis: str):
    g = _row_gids(m, c, axis)
    col = jax.lax.broadcasted_iota(jnp.int32, (m, c), 1)
    return (g <= n) & (col >= 1) & (col <= n)


def _stencil_sum(ext: jax.Array) -> jax.Array:
    """Sum of 4 neighbors at each owned row of the extended tile."""
    return (ext[:-2, 1:-1] + ext[2:, 1:-1]
            + ext[1:-1, :-2] + ext[1:-1, 2:])


def _pad_cols(core: jax.Array) -> jax.Array:
    return jnp.pad(core, ((0, 0), (1, 1)))


def s_residual(u, b, n, h, axis, ndev, sigma=0.0):
    """r = b - (A - sigma I) u on owned tiles."""
    m, c = u.shape
    ext = halo_extend(u, axis, ndev)
    inv_h2 = 1.0 / (h * h)
    au = (4.0 * ext[1:-1, 1:-1] - _stencil_sum(ext)) * inv_h2
    r = b[:, 1:-1] - au + sigma * u[:, 1:-1]
    return jnp.where(_interior_mask(n, m, c, axis), _pad_cols(r),
                     jnp.zeros_like(u))


def s_jacobi(u, b, n, h, omega, axis, ndev, sigma=0.0):
    m, c = u.shape
    r = s_residual(u, b, n, h, axis, ndev, sigma)
    d = laplacian.diag_value(2, h, sigma)
    return u + (omega / d) * r


def s_rbgs(u, b, n, h, axis, ndev, sigma=0.0):
    """One full RB-GS sweep == the single-device sweep, exactly.

    Halos are re-exchanged between the red and black half-sweeps so black
    updates see red-updated neighbor rows across shard boundaries.
    """
    m, c = u.shape
    h2 = h * h
    gids = _row_gids(m, c, axis)
    col = jax.lax.broadcasted_iota(jnp.int32, (m, c), 1)
    imask = _interior_mask(n, m, c, axis)
    for parity in (0, 1):
        ext = halo_extend(u, axis, ndev)
        den = 4.0 - sigma * h2
        vals = _pad_cols((h2 * b[:, 1:-1] + _stencil_sum(ext)) / den)
        mask = imask & (((gids + col) % 2) == parity)
        u = jnp.where(mask, vals, u)
    return u


def s_smooth(u, b, n, h, *, kind, omega, sweeps, axis, ndev, sigma=0.0):
    if kind == "chebyshev":
        # Apply-only smoother: the generic Chebyshev recurrence over the
        # halo-exchanging residual — one ppermute pair per application,
        # identical comm cost to Jacobi, RB-GS-class smoothing. No sweep-
        # order coupling across shards, so sharded == unsharded exactly.
        diag = laplacian.diag_value(2, h, sigma)
        return smoothers.chebyshev_generic(
            u, b, sweeps, diag,
            lambda uu, bb: s_residual(uu, bb, n, h, axis, ndev, sigma))
    for _ in range(sweeps):
        if kind == "jacobi":
            u = s_jacobi(u, b, n, h, omega, axis, ndev, sigma)
        elif kind == "rbgs":
            u = s_rbgs(u, b, n, h, axis, ndev, sigma)
        else:
            raise ValueError(f"unknown smoother {kind!r}")
    return u


def s_restrict(r, n, axis, ndev):
    """Full-weighting to the coarse owned tile (mc = m/2 rows).

    Coarse owned row q (global jc = d*mc + 1 + q) reads fine extended rows
    2q+1, 2q+2, 2q+3 — i.e. only the bottom halo.
    """
    m, c = r.shape
    mc = m // 2
    nc = (n - 1) // 2
    ext = halo_extend(r, axis, ndev)       # rows 0..m+1
    rows = 0.25 * (ext[1:m:2, :] + 2.0 * ext[2:m + 1:2, :]
                   + ext[3:m + 2:2, :])    # (mc, c)
    core = 0.25 * (rows[:, 1:n:2] + 2.0 * rows[:, 2:n + 1:2]
                   + rows[:, 3:n + 2:2])   # (mc, nc)
    out = _pad_cols(core)                  # (mc, nc+2)
    mask = _interior_mask(nc, mc, nc + 2, axis)
    return jnp.where(mask, out, jnp.zeros_like(out))


def s_prolong(e, nc, axis, ndev):
    """Bilinear interpolation to the fine owned tile (m = 2*mc rows).

    Fine owned row i (global f = d*m + 1 + i): even f -> coarse row f/2
    (extended index (i+1)/2), odd f -> average of its two coarse
    neighbors — i.e. only the top halo.
    """
    mc, cc = e.shape
    m = 2 * mc
    n = 2 * nc + 1
    ext = halo_extend(e, axis, ndev)       # rows 0..mc+1
    # Column interpolation first (width nc+2 -> n+2), on the extended tile.
    cols = jnp.zeros((mc + 2, n + 2), dtype=e.dtype)
    cols = cols.at[:, 2:n + 1:2].set(ext[:, 1:-1])
    cols = cols.at[:, 1:n + 2:2].set(0.5 * (ext[:, :-1] + ext[:, 1:]))
    # Row interpolation: interleave averaged (odd f) and copied (even f).
    odd_f = 0.5 * (cols[0:mc, :] + cols[1:mc + 1, :])   # fine i = 0, 2, ...
    even_f = cols[1:mc + 1, :]                          # fine i = 1, 3, ...
    out = jnp.zeros((m, n + 2), dtype=e.dtype)
    out = out.at[0::2, :].set(odd_f)
    out = out.at[1::2, :].set(even_f)
    mask = _interior_mask(n, m, n + 2, axis)
    return jnp.where(mask, out, jnp.zeros_like(out))


def _psum_sq(x, axis):
    return jax.lax.psum(jnp.sum(x * x), axis)


# ---------------------------------------------------------------------------
# The sharded cycle: sharded fine levels, replicated (agglomerated) coarse
# levels, all inside one shard_map region.
# ---------------------------------------------------------------------------

def _level_rows(k: int, level: int) -> int:
    """Sharded row count (interior + bottom ghost) at a level: 2^(k-level)."""
    return 2 ** (k - level)


def _is_sharded(cfg: SolverConfig, ndev: int, level: int) -> bool:
    m = _level_rows(cfg.k, level) // ndev
    return (_level_rows(cfg.k, level) % ndev == 0) and m >= max(
        cfg.agglom_rows, 2)


def _gather_full(u_local, n, axis):
    """Owned tiles -> replicated full padded grid (the agglomeration step)."""
    rows = jax.lax.all_gather(u_local, axis, tiled=True)   # (n+1, n+2)
    return jnp.pad(rows, ((1, 0), (0, 0)))                  # add ghost row 0


def _scatter_local(full, m, axis):
    """Replicated full padded grid -> my owned rows."""
    d = jax.lax.axis_index(axis)
    return jax.lax.dynamic_slice_in_dim(full, d * m + 1, m, axis=0)


def _sharded_v_cycle(hier: Hierarchy, cfg: SolverConfig, ndev: int,
                     axis: str, x, b, level: int, gamma: int = 1,
                     sigma=0.0):
    """Recursive cycle; per-level arrays are owned tiles while the level is
    sharded and full replicated grids below the agglomeration cutoff.
    ``sigma`` shifts the operator to A - sigma*I (eigensolver inner
    solves, SURVEY.md §3.3)."""
    spec = hier.levels[level]
    n, h = spec.n, spec.h
    omega = cfg.effective_omega()
    if not _is_sharded(cfg, ndev, level):
        # Replicated region: identical unsharded cycle on every device.
        return cycles.v_cycle(hier, x, b, cfg, level=level, gamma=gamma,
                              sigma=sigma)
    x = s_smooth(x, b, n, h, kind=cfg.smoother, omega=omega,
                 sweeps=cfg.nu1, axis=axis, ndev=ndev, sigma=sigma)
    r = s_residual(x, b, n, h, axis, ndev, sigma)
    rc = s_restrict(r, n, axis, ndev)
    nc = hier.levels[level + 1].n
    if not _is_sharded(cfg, ndev, level + 1):
        # Agglomerate: gather the coarse RHS, recurse replicated, scatter.
        rc_full = _gather_full(rc, nc, axis)
        ec_full = jnp.zeros_like(rc_full)
        for _ in range(gamma):
            ec_full = cycles.v_cycle(hier, ec_full, rc_full, cfg,
                                     level=level + 1, gamma=gamma,
                                     sigma=sigma)
        ef_full = transfer.prolong(ec_full)
        mloc = _level_rows(cfg.k, level) // ndev
        x = x + _scatter_local(ef_full, mloc, axis)
    else:
        ec = jnp.zeros_like(rc)
        for _ in range(gamma):
            ec = _sharded_v_cycle(hier, cfg, ndev, axis, ec, rc,
                                  level + 1, gamma, sigma)
        x = x + s_prolong(ec, nc, axis, ndev)
    x = s_smooth(x, b, n, h, kind=cfg.smoother, omega=omega,
                 sweeps=cfg.nu2, axis=axis, ndev=ndev, sigma=sigma)
    return x


def _sharded_fmg(hier: Hierarchy, cfg: SolverConfig, ndev: int, axis: str,
                 b, gamma: int = 1, n_vcycles: int = 1):
    """Distributed full multigrid (SURVEY.md §3.2 on the §3.5 runtime).

    The RHS is restricted down through the sharded levels (halo ppermute),
    gathered at the agglomeration cutoff, direct-solved replicated on the
    coarsest level, and the solution walked back up — scattered into owned
    tiles when it re-enters the sharded region — with ``n_vcycles``
    distributed V-cycles per level.
    """
    bs = [b]
    for lev in range(hier.num_levels - 1):
        if _is_sharded(cfg, ndev, lev):
            if _is_sharded(cfg, ndev, lev + 1):
                bs.append(s_restrict(bs[-1], hier.levels[lev].n, axis, ndev))
            else:  # crossing the agglomeration cutoff
                full = _gather_full(bs[-1], hier.levels[lev].n, axis)
                bs.append(transfer.restrict(full))
        else:
            bs.append(transfer.restrict(bs[-1]))
    # The coarsest level is always replicated (agglom_rows >= 2 guarantees
    # tiny levels fail _is_sharded).
    x = cycles.coarse_solve(hier, bs[-1], backend=cycles.JNP_BACKEND)
    for level in range(hier.num_levels - 2, -1, -1):
        if _is_sharded(cfg, ndev, level):
            if _is_sharded(cfg, ndev, level + 1):
                x = s_prolong(x, hier.levels[level + 1].n, axis, ndev)
            else:  # re-entering the sharded region
                xf_full = transfer.prolong(x)
                mloc = _level_rows(cfg.k, level) // ndev
                x = _scatter_local(xf_full, mloc, axis)
        else:
            x = transfer.prolong(x)
        for _ in range(n_vcycles):
            x = _sharded_v_cycle(hier, cfg, ndev, axis, x, bs[level],
                                 level, gamma)
    return x


# ---------------------------------------------------------------------------
# Host-side driver
# ---------------------------------------------------------------------------

def shard_rhs(b_padded: jax.Array, mesh: Mesh, axis: str = "row"):
    """Global padded RHS (n+2, n+2) -> device-sharded owned rows (n+1, n+2).

    Row 0 (top ghost) is dropped; rows 1..n+1 are laid out contiguously
    over the mesh so each device holds its m = (n+1)/D owned rows.
    """
    rows = b_padded[1:, :]
    return jax.device_put(rows, NamedSharding(mesh, P(axis, None)))


def unshard(x_rows: jax.Array) -> jax.Array:
    """Sharded owned rows (n+1, n+2) -> global padded (n+2, n+2)."""
    return jnp.pad(jax.device_get(x_rows), ((1, 0), (0, 0)))


class ShardedSolver:
    """Distributed MultigridSolver: row-partitioned V-cycles to tolerance.

    >>> mesh = make_mesh()
    >>> s = ShardedSolver(SolverConfig(ndim=2, k=12, smoother="rbgs"), mesh)
    >>> result = s.solve(b_padded)         # b as a plain (n+2, n+2) array
    """

    def __init__(self, config: SolverConfig, mesh: Mesh,
                 hierarchy: Optional[Hierarchy] = None):
        if config.ndim != 2:
            raise ValueError("the sharded path is 2D (row partitioning); "
                             "1D problems fit on one chip by definition")
        self.config = config
        self.mesh = mesh
        self.axis = config.mesh_axis
        self.ndev = int(np.prod(mesh.devices.shape))
        if (2 ** config.k) % self.ndev != 0:
            raise ValueError(f"2^k must be divisible by the mesh size "
                             f"({self.ndev})")
        self.hierarchy = (hierarchy if hierarchy is not None
                          else build_hierarchy(config))
        self._solve = self._build_solve()
        self._solve_pcg = None          # built lazily on first use

    def _build_solve(self):
        cfg = self.config
        hier = self.hierarchy
        axis = self.axis
        ndev = self.ndev
        gamma = 2 if cfg.cycle == "w" else 1

        def local_solve(b):
            if cfg.cycle == "fmg":
                # FMG is a direct method (cycles.solve semantics): run it
                # once, then polish with V-cycles if tol asks for more.
                x = _sharded_fmg(hier, cfg, ndev, axis, b)
            else:
                x = jnp.zeros_like(b)
            n, h = hier.fine.n, hier.fine.h
            b_norm = jnp.sqrt(_psum_sq(b, axis))
            b_norm = jnp.where(b_norm == 0, 1.0, b_norm)
            r0 = jnp.sqrt(_psum_sq(
                s_residual(x, b, n, h, axis, ndev), axis)) / b_norm
            hist0 = jnp.full((cfg.max_iters + 1,), r0, dtype=b.dtype)

            # Stall guard, as in cycles.solve: exit after 3 non-improving
            # cycles (fp32 roundoff floor) instead of spinning to max_iters.
            def cond(st):
                _, k_it, _, rel, stall = st
                return ((rel >= cfg.tol) & (k_it < cfg.max_iters)
                        & (stall < 3))

            def body(st):
                x, k_it, hist, rel, stall = st
                x = _sharded_v_cycle(hier, cfg, ndev, axis, x, b, 0, gamma)
                new_rel = jnp.sqrt(_psum_sq(
                    s_residual(x, b, n, h, axis, ndev), axis)) / b_norm
                stall = jnp.where(new_rel >= 0.9 * rel, stall + 1, 0)
                hist = hist.at[k_it + 1].set(new_rel)
                return x, k_it + 1, hist, new_rel, stall

            x, iters, hist, rel, _ = jax.lax.while_loop(
                cond, body, (x, 0, hist0, r0, 0))
            idx = jnp.arange(cfg.max_iters + 1)
            hist = jnp.where(idx <= iters, hist, rel)
            return x, iters, hist, rel < cfg.tol

        from jax import shard_map

        sharded = shard_map(
            local_solve, mesh=self.mesh,
            in_specs=P(self.axis, None),
            out_specs=(P(self.axis, None), P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded)

    def _build_pcg(self):
        """Distributed MG-PCG (the sharded twin of solvers/krylov.py):
        one distributed V-cycle per iteration as the preconditioner, all
        dot products psum-ed over the mesh, flexible (Polak-Ribiere) beta
        for the not-exactly-symmetric RB-GS cycle."""
        cfg = self.config
        hier = self.hierarchy
        axis = self.axis
        ndev = self.ndev
        gamma = 2 if cfg.cycle == "w" else 1
        n, h = hier.fine.n, hier.fine.h

        from ..solvers.krylov import cg_loop

        def local_pcg(b):
            def pdot(u, v):
                return jax.lax.psum(jnp.sum(u * v), axis)

            def apply_a(p):
                return -s_residual(p, jnp.zeros_like(p), n, h, axis, ndev)

            def precond(r):
                return _sharded_v_cycle(hier, cfg, ndev, axis,
                                        jnp.zeros_like(r), r, 0, gamma)

            x, iters, hist, rel = cg_loop(
                jnp.zeros_like(b), b, dot=pdot, apply_a=apply_a,
                precond=precond,
                residual=lambda xx, bb: s_residual(xx, bb, n, h, axis, ndev),
                tol=cfg.tol, max_iters=cfg.max_iters)
            return x, iters, hist, rel < cfg.tol

        from jax import shard_map

        sharded = shard_map(
            local_pcg, mesh=self.mesh,
            in_specs=P(self.axis, None),
            out_specs=(P(self.axis, None), P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded)

    def solve(self, b_padded: jax.Array,
              method: str = "mg") -> cycles.SolveResult:
        if method == "pcg":
            if self._solve_pcg is None:
                self._solve_pcg = self._build_pcg()
            fn = self._solve_pcg
        elif method == "mg":
            fn = self._solve
        else:
            raise ValueError(f"unknown solve method {method!r}")
        b_sh = shard_rhs(jnp.asarray(b_padded, dtype=self.config.dtype),
                         self.mesh, self.axis)
        x, iters, hist, conv = fn(b_sh)
        return cycles.SolveResult(
            x=jnp.asarray(unshard(x)), iters=iters, res_history=hist,
            converged=conv)

    def eigensolve(self, k: int = 1, method: str = "ii", tol: float = 1e-8,
                   max_iters: int = 100, inner_cycles: int = 30,
                   inner_tol: Optional[float] = None):
        """Distributed MG eigensolver: k smallest eigenpairs (SURVEY.md
        §3.3 on the §3.5 runtime).

        Same algorithm as solvers.eigen.eigensolve — nested-iteration
        coarse init, block inverse iteration (or RQI shifts) with the
        inner solves done by distributed V-cycles, Rayleigh-Ritz per
        outer step — with every inner product ``psum``-ed over the mesh
        (BASELINE.json:5 "psum for ... Rayleigh quotients"). Eigenvector
        tiles stay row-partitioned end-to-end.
        """
        from ..solvers import eigen as seigen

        if method not in ("ii", "rqi"):
            raise ValueError(f"unknown eigensolver method {method!r}")
        cfg, hier, axis, ndev = (self.config, self.hierarchy, self.axis,
                                 self.ndev)
        n, h = hier.fine.n, hier.fine.h
        dtype = cfg.dtype
        if inner_tol is None:
            inner_tol = 200.0 * float(jnp.finfo(dtype).eps)

        def apply_local(u):
            """A u on owned tiles (one halo exchange)."""
            return -s_residual(u, jnp.zeros_like(u), n, h, axis, ndev)

        def psum_dots(f, g):
            """(k, k) Gram-type matrix of flattened local tiles."""
            return jax.lax.psum(
                jnp.einsum("iX,jX->ij", f, g,
                           preferred_element_type=dtype), axis)

        def flat(v):
            return v.reshape(v.shape[0], -1)

        def rayleigh(v):
            av = jax.vmap(apply_local)(v)
            fv, fav = flat(v), flat(av)
            num = jax.lax.psum(jnp.sum(fv * fav, axis=1), axis)
            den = jax.lax.psum(jnp.sum(fv * fv, axis=1), axis)
            lam = num / den
            rr = fav - lam[:, None] * fv
            res = jnp.sqrt(jax.lax.psum(jnp.sum(rr * rr, axis=1),
                                        axis)) / jnp.abs(lam)
            return lam, jnp.max(res)

        def inner_solve(v, sigma):
            def one(rhs, sg):
                rn = jnp.sqrt(jax.lax.psum(jnp.sum(rhs * rhs), axis))
                rn = jnp.where(rn == 0, 1.0, rn)

                def cond(st):
                    w, i, rel = st
                    return (rel >= inner_tol) & (i < inner_cycles)

                def body(st):
                    w, i, rel = st
                    w = _sharded_v_cycle(hier, cfg, ndev, axis, w, rhs, 0,
                                         sigma=sg)
                    r = s_residual(w, rhs, n, h, axis, ndev, sg)
                    rel = jnp.sqrt(jax.lax.psum(jnp.sum(r * r),
                                                axis)) / rn
                    return w, i + 1, rel

                w, _, _ = jax.lax.while_loop(
                    cond, body,
                    (jnp.zeros_like(rhs), 0, jnp.ones((), dtype=dtype)))
                return w

            return jax.vmap(one)(v, sigma)

        def ritz(w):
            """Generalized Rayleigh-Ritz on the (non-orthonormal) block:
            H s = theta G s via Cholesky of the psum-ed Gram matrix.
            Rows are pre-normalized: RQI inner solves return vectors of
            wildly different magnitudes (1/|lambda - sigma| growth), and
            an unequilibrated Gram matrix wrecks the Cholesky."""
            nrm0 = jnp.sqrt(jax.lax.psum(
                jnp.sum(flat(w) * flat(w), axis=1), axis))
            w = w / jnp.where(nrm0 == 0, 1.0, nrm0)[:, None, None]
            f = flat(w)
            aw = flat(jax.vmap(apply_local)(w))
            g = psum_dots(f, f)
            hm = psum_dots(f, aw)
            hm = 0.5 * (hm + hm.T)
            ell = jnp.linalg.cholesky(g)
            li = jax.scipy.linalg.solve_triangular(
                ell, jnp.eye(k, dtype=dtype), lower=True)
            ht = li @ hm @ li.T
            lam, s = jnp.linalg.eigh(0.5 * (ht + ht.T))
            rot = (li.T @ s).T                     # (k, k): rows are Ritz
            f2 = rot @ f
            # Normalize rows (Ritz vectors of a symmetric pencil come out
            # G-orthonormal, i.e. already unit — this guards roundoff).
            nrm = jnp.sqrt(jax.lax.psum(jnp.sum(f2 * f2, axis=1), axis))
            f2 = f2 / nrm[:, None]
            return f2.reshape(w.shape), lam

        rqi_active_tol, rqi_polish_tol = 1e-2, 1e-5

        def local_eigen(v):
            lam0, res0 = rayleigh(v)
            hist0 = jnp.full((max_iters + 1,), res0, dtype=dtype)

            def cond(st):
                _, _, it, _, res = st
                return (res >= tol) & (it < max_iters)

            def body(st):
                v, lam, it, hist, res = st
                if method == "rqi":
                    # Shift back-off as in solvers.eigen: strictly below
                    # lambda_min keeps every level SPD; drop the shift in
                    # the endgame so plain II polishes to tol.
                    on = (res < rqi_active_tol) & (res > rqi_polish_tol)
                    sigma = jnp.where(on, lam * 0.9, jnp.zeros_like(lam))
                else:
                    sigma = jnp.zeros_like(lam)
                w = inner_solve(v, sigma)
                v2, lam2 = ritz(w)
                lam2b, res2 = rayleigh(v2)
                hist = hist.at[it + 1].set(res2)
                return v2, lam2b, it + 1, hist, res2

            v, lam, iters, hist, res = jax.lax.while_loop(
                cond, body, (v, lam0, 0, hist0, res0))
            idx = jnp.arange(max_iters + 1)
            hist = jnp.where(idx <= iters, hist, res)
            return v, lam, iters, hist, res < tol

        from jax import shard_map

        fn = jax.jit(shard_map(
            local_eigen, mesh=self.mesh,
            in_specs=P(None, self.axis, None),
            out_specs=(P(None, self.axis, None), P(), P(), P(), P()),
            check_vma=False,
        ))

        # Nested-iteration start (replicated, host-side setup as in the
        # single-device path), sharded into row tiles.
        v0 = seigen.coarse_init(self.hierarchy, k, dtype)   # (k, n+2, n+2)
        v0_rows = jnp.asarray(v0)[:, 1:, :]
        v0_sh = jax.device_put(
            v0_rows, NamedSharding(self.mesh, P(None, self.axis, None)))
        v, lam, iters, hist, conv = fn(v0_sh)
        v_full = np.pad(np.asarray(jax.device_get(v)),
                        ((0, 0), (1, 0), (0, 0)))
        return seigen.EigenResult(
            eigenvalues=lam, eigenvectors=jnp.asarray(v_full), iters=iters,
            res_history=hist, converged=conv)

    def v_cycle_fn(self):
        """The jitted sharded cycle (for benchmarking): tiles -> tiles."""
        cfg, hier, axis, ndev = (self.config, self.hierarchy, self.axis,
                                 self.ndev)
        gamma = 2 if cfg.cycle == "w" else 1

        def one_cycle(x, b):
            return _sharded_v_cycle(hier, cfg, ndev, axis, x, b, 0, gamma)

        from jax import shard_map

        return jax.jit(shard_map(
            one_cycle, mesh=self.mesh,
            in_specs=(P(self.axis, None), P(self.axis, None)),
            out_specs=P(self.axis, None), check_vma=False))
