"""Pallas TPU kernels for the hot 3D (7-point) stencil operations.

3D Poisson is a capability extension over the reference (AndyMN/
MultigridCMT covers 1D/2D — SURVEY.md §0); BASELINE.json:5's "every
kernel at speed-of-light nnz/s" applies to it all the same, so the 3D
fine levels get the same Pallas treatment as 2D (VERDICT.md round-2
item 5).

Layout: aligned3 grids (`grids.aligned3_shape`) — shape ``(p, r, c)``
with ``p = round_up(n + 2, 4)`` z-planes, each plane a 2D-aligned
``(8k, 128k)`` grid. Only the trailing two dims carry Mosaic tiling
constraints; the plane dim is a plain array dim, so plane-granular DMA
windows take arbitrary dynamic offsets.

Design — *batched plane-rolling* stream (the 3D analog of stencil2d's
row tiles, with zero traffic amplification):

* A 7-point stencil at plane g reads planes g-1, g, g+1. The kernel
  keeps a ring of resident plane BLOCKS (``pb`` planes each) in VMEM:
  each iteration DMAs exactly one new u block and one b block, computes
  one output block, and writes it out — every HBM byte moves once, so
  the kernel can run at the 3-array DMA floor.

* Blocks, not single planes, because per-iteration fixed cost is what
  actually bounds the pipeline: measured on the v5e (round 4), the
  single-plane variant ran residual/Jacobi/RB-GS all at ~9.7-10.8 us
  per 520x640 plane against a 5.8 us DMA floor — one- and two-stage
  kernels alike, i.e. bound by per-plane DMA issue/loop overhead, not
  VPU work. Batching 4 planes per iteration divides that overhead by 4.

* In-plane neighbors are `pltpu.roll` lane/sublane rotates (zero-ghost
  invariant makes circular semantics free, as in 2D); z-neighbors are
  flanking ring planes. The interior and red/black masks are
  PRECOMPUTED once into a VMEM buffer (0/1 values) and applied as
  arithmetic selects — rebuilding iota-chain masks per plane is pure
  VPU waste.

* The fused RB-GS sweep pipelines the two colors one block apart: at
  iteration j the kernel red-updates block j+1 (red neighbors are
  black, i.e. not-yet-updated — original values are the correct GS
  reads) into a second ring, then black-updates block j from the
  red-updated ring (black neighbors are red — updated values, exact GS
  ordering) and emits it. A full red+black sweep in ONE HBM pass,
  matching the reference sweep order point-for-point.

* Shard-agnostic (the slab-decomposition path of parallel/sharded.py):
  the global z-index of local plane 0 rides in SMEM as ``goff``; color
  parity and the z-interior selector derive from g + goff, so one SPMD
  program serves every slab. Edge planes of the stack are zeroed, and
  each chained call invalidates 2 (RB-GS) / 1 (Jacobi) ghost planes
  per side — the caller's exchanged halo depth bounds the chain.

VMEM: the rings hold ~13 blocks + masks; `fits_vmem` caps the kernel
path and `_pick_pb` shrinks the block size for large planes (v5e
physical VMEM is ~128 MB; the 16 MB figure is only Mosaic's default
scoped limit, raised via vmem_limit_bytes).

h is a static Python float (one kernel per level); the eigensolver
shift sigma is an SMEM scalar (no retrace across RQI shifts).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packed2d import _cdt
from .stencil2d import _interpret

_VMEM_LIMIT = 100 * 1024 * 1024
_PLANE_BUDGET_BYTES = 80 * 1024 * 1024


def _pick_pb(r: int, c: int, dtype) -> int:
    """Largest plane-block size whose rings fit the VMEM budget."""
    ib = jnp.dtype(dtype).itemsize
    for pb in (4, 2, 1):
        if (13 * pb + 4) * r * c * ib <= _PLANE_BUDGET_BYTES:
            return pb
    return 1


def fits_vmem(r: int, c: int, dtype) -> bool:
    # The pb=1 rings + masks + compute temporaries.
    return 17 * r * c * jnp.dtype(dtype).itemsize <= _PLANE_BUDGET_BYTES


def _nsum(zl, zm, zh):
    """Sum of the 6 face neighbors at every point of plane zm."""
    r, c = zm.shape
    s = zl + zh
    s = s + pltpu.roll(zm, 1, 0)        # y-1
    s = s + pltpu.roll(zm, r - 1, 0)    # y+1
    s = s + pltpu.roll(zm, 1, 1)        # x-1
    s = s + pltpu.roll(zm, c - 1, 1)    # x+1
    return s


def _valid(g, goff, n, p, dtype):
    """Scalar 0/1: plane g is computable and a global-interior z-plane
    (inside the stack's computable range AND inside [1, n] globally —
    the two differ only for slab stacks, whose edge/pad planes are the
    neighbor's territory or padding and must come back zero)."""
    gq = jnp.int32(g) + goff
    ok = ((jnp.int32(g) >= 1) & (jnp.int32(g) <= p - 2)
          & (gq >= 1) & (gq <= n))
    return jnp.where(ok, jnp.ones((), dtype), jnp.zeros((), dtype))


def _make_batch_kernel(compute_block, prologue_fn, n: int, p: int, r: int,
                       c: int, dtype, extra_ring: bool, pb: int,
                       out_dtype=None):
    """Batched plane-rolling driver.

    compute_block(j, up, rp, rwrite, bp, mbuf, sigma, goff) -> list of
    pb (r, c) output planes for block j, where up/rp/bp read plane
    ``block*pb + off`` of the u / red / b rings and rwrite stores into
    the red ring. ``prologue_fn`` (the RB-GS prime) runs after the
    prologue waits, BEFORE the loop's first lookahead DMA reuses ring
    slots (the single-plane version once primed inside the body and
    raced the slot-0 lookahead).

    Mixed precision (the packed2d._cdt rule): the rings/DMA move the
    STORAGE dtype; the accessors widen every read to the compute dtype
    and rwrite/obuf narrow on store, so bf16 halves the HBM traffic —
    which IS the bottleneck here (the GB-footprint kernels sit at the
    Mosaic DMA cap, BASELINE.md round-4) — while the stencil algebra
    runs at f32. ``out_dtype`` widens the OUTPUT array (a mixed cycle's
    top level emits f32 — the final-bf16-store noise rule).
    """
    assert p % pb == 0 and p >= 2 + pb, (p, pb)
    cdt = _cdt(dtype)
    odt = jnp.dtype(out_dtype if out_dtype is not None else dtype)
    nbu = p // pb
    US = 4
    BS = 4 if extra_ring else 3
    RS = 3

    def kernel(sigma_ref, off_ref, u_hbm, b_hbm, out_hbm, ubuf, rbuf,
               bbuf, obuf, mbuf, usems, bsems, osems):
        sigma = sigma_ref[0, 0]
        goff = off_ref[0, 0]
        # Global row index of local plane-row 0 (pencil decompositions —
        # the row axis is sharded too; 0 when rows carry the global
        # padding). Masks derive from global coordinates, so one SPMD
        # program serves every pencil tile.
        roff = off_ref[0, 1]

        # Zero the rings once: the few reads that land on never-loaded
        # slots (edge planes' flanks, the tail block's lookahead, the
        # RB-GS pipeline's one-past-the-end stage-1 block) are
        # multiplied by a 0 selector, which only kills FINITE garbage —
        # uninitialized VMEM could hold NaN.
        ubuf[...] = jnp.zeros_like(ubuf)
        bbuf[...] = jnp.zeros_like(bbuf)
        if extra_ring:
            rbuf[...] = jnp.zeros_like(rbuf)

        # Precomputed masks: mbuf[par] = red mask for global planes of
        # parity par (interior & (par + y + x) even); mbuf[2] interior.
        grow = roff + jax.lax.broadcasted_iota(jnp.int32, (r, c), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
        inter = (grow >= 1) & (grow <= n) & (col >= 1) & (col <= n)
        even = ((grow + col) % 2) == 0
        one = jnp.ones((r, c), cdt)
        zero = jnp.zeros((r, c), cdt)
        mbuf[pl.ds(0, 1)] = jnp.where(inter & even, one,
                                      zero).reshape(1, r, c)
        mbuf[pl.ds(1, 1)] = jnp.where(inter & (~even), one,
                                      zero).reshape(1, r, c)
        mbuf[pl.ds(2, 1)] = jnp.where(inter, one, zero).reshape(1, r, c)

        # Block DMAs move pb*r ROWS of the 2D-bitcast (p*r, c) arrays
        # — byte-identical to plane blocks, but the windows have the
        # exact shape of the proven stencil2d row pipeline (a 3D-ref
        # window decomposes into weaker DMA inside Mosaic; measured
        # round 4: plane-shaped copies capped the kernels at ~390 GB/s
        # regardless of batching).
        def ustart(t):
            s = jnp.int32(t) % US
            pltpu.make_async_copy(u_hbm.at[pl.ds(t * (pb * r), pb * r)],
                                  ubuf.at[s], usems.at[s]).start()

        def uwait(t):
            s = jnp.int32(t) % US
            pltpu.make_async_copy(u_hbm.at[pl.ds(t * (pb * r), pb * r)],
                                  ubuf.at[s], usems.at[s]).wait()

        def bstart(t):
            s = jnp.int32(t) % BS
            pltpu.make_async_copy(b_hbm.at[pl.ds(t * (pb * r), pb * r)],
                                  bbuf.at[s], bsems.at[s]).start()

        def bwait(t):
            s = jnp.int32(t) % BS
            pltpu.make_async_copy(b_hbm.at[pl.ds(t * (pb * r), pb * r)],
                                  bbuf.at[s], bsems.at[s]).wait()

        def up(j, off):
            bo, l2 = divmod(off, pb)
            return ubuf[jnp.int32(j + bo) % US,
                        l2 * r:(l2 + 1) * r].astype(cdt)

        def rp(j, off):
            bo, l2 = divmod(off, pb)
            return rbuf[jnp.int32(j + bo) % RS,
                        l2 * r:(l2 + 1) * r].astype(cdt)

        def rwrite(j, off, vals):
            bo, l2 = divmod(off, pb)
            rbuf[jnp.int32(j + bo) % RS,
                 l2 * r:(l2 + 1) * r] = vals.astype(dtype)

        def bp(j, off):
            bo, l2 = divmod(off, pb)
            return bbuf[jnp.int32(j + bo) % BS,
                        l2 * r:(l2 + 1) * r].astype(cdt)

        # Prologue loads. One-stage (residual / Jacobi): block j reads u
        # blocks j-1..j+1 and b block j; body j starts u(j+2)/b(j+2),
        # waits u(j+1)/b(j). RB-GS (extra ring): iteration j red-updates
        # block j+1 (u blocks j+1, j+2; b block j+1) then black-updates
        # block j (red ring, b block j); body j starts u(j+4)/b(j+3),
        # waits u(j+2)/b(j+1).
        if extra_ring:
            for t in range(min(4, nbu)):
                ustart(t)
            for t in range(min(3, nbu)):
                bstart(t)
            for t in range(min(2, nbu)):
                uwait(t)
            bwait(0)
        else:
            for t in range(min(2, nbu)):
                ustart(t)
            for t in range(min(2, nbu)):
                bstart(t)
            uwait(0)
            bwait(0)

        if prologue_fn is not None:
            prologue_fn(up, rp, rwrite, bp, mbuf, sigma, goff)

        # Start/wait distances (each block started and waited exactly
        # once: u(t), t past the prologue, is waited at body t-uw; b(t)
        # at body t-1).
        ula = 4 if extra_ring else 2    # u lookahead start distance
        bla = 3 if extra_ring else 2
        uw = 2 if extra_ring else 1     # u wait distance

        def body(j, _):
            oslot = jnp.int32(j) % 2

            @pl.when(j + ula <= nbu - 1)
            def _():
                ustart(j + ula)

            @pl.when(j + bla <= nbu - 1)
            def _():
                bstart(j + bla)

            @pl.when(j + uw <= nbu - 1)
            def _():
                uwait(j + uw)

            @pl.when(j + 1 <= nbu - 1)
            def _():
                bwait(j + 1)

            vals = compute_block(j, up, rp, rwrite, bp, mbuf, sigma, goff)

            @pl.when(j >= 2)
            def _():
                pltpu.make_async_copy(
                    obuf.at[oslot],
                    out_hbm.at[pl.ds((j - 2) * (pb * r), pb * r)],
                    osems.at[oslot]).wait()

            for l in range(pb):
                obuf[oslot, l * r:(l + 1) * r] = vals[l].astype(odt)
            pltpu.make_async_copy(obuf.at[oslot],
                                  out_hbm.at[pl.ds(j * (pb * r), pb * r)],
                                  osems.at[oslot]).start()
            return 0

        jax.lax.fori_loop(0, nbu, body, 0, unroll=False)

        def drain(i, _):
            @pl.when(i < jnp.minimum(nbu, 2))
            def _():
                s = jnp.int32(nbu - 1 - i) % 2
                pltpu.make_async_copy(obuf.at[s],
                                      out_hbm.at[pl.ds(0, pb * r)],
                                      osems.at[s]).wait()
            return 0

        jax.lax.fori_loop(0, 2, drain, 0, unroll=False)

    scratch = [
        pltpu.VMEM((US, pb * r, c), dtype),            # u block ring
        pltpu.VMEM((RS, pb * r, c) if extra_ring
                   else (1, 8, 128), dtype),           # red ring
        pltpu.VMEM((BS, pb * r, c), dtype),            # b block ring
        pltpu.VMEM((2, pb * r, c), odt),               # out double buffer
        pltpu.VMEM((3, r, c), cdt),                    # mask planes
        pltpu.SemaphoreType.DMA((US,)),
        pltpu.SemaphoreType.DMA((BS,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def call(sigma_arr, off_arr, u, b):
        nnz = 7 * n * n * n
        # 2D bitcasts: planes are contiguous, so reshape is free.
        u2 = u.reshape(p * r, c)
        b2 = b.reshape(p * r, c)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((p * r, c), odt),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=2 * nnz, transcendentals=0,
                bytes_accessed=3 * p * r * c * jnp.dtype(dtype).itemsize),
            interpret=_interpret(),
        )(sigma_arr, off_arr, u2, b2)
        return out.reshape(p, r, c)

    return call


@functools.lru_cache(maxsize=None)
def _residual_call(n: int, p: int, r: int, c: int, h: float,
                   dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    cdt = _cdt(dtype)
    inv_h2 = 1.0 / (h * h)
    pb = _pick_pb(r, c, dtype)

    def compute(j, up, rp, rwrite, bp, mbuf, sigma, goff):
        out = []
        for l in range(pb):
            g = j * pb + l
            zm = up(j, l)
            au = (6.0 * zm - _nsum(up(j, l - 1), zm,
                                   up(j, l + 1))) * inv_h2
            vals = bp(j, l) - au + sigma * zm
            out.append(_valid(g, goff, n, p, cdt) * (mbuf[2] * vals))
        return out

    # The residual ALWAYS emits the compute dtype: it feeds the coarse
    # RHS, and the mixed-precision design keeps every coarse level at
    # f32 (packed2d._cdt notes) — identity for f32/f64 storage.
    return _make_batch_kernel(compute, None, n, p, r, c, dtype,
                              extra_ring=False, pb=pb, out_dtype=cdt)


@functools.lru_cache(maxsize=None)
def _jacobi_call(n: int, p: int, r: int, c: int, h: float, omega: float,
                 dtype_name: str, out_dtype_name: str = None):
    dtype = jnp.dtype(dtype_name)
    cdt = _cdt(dtype)
    inv_h2 = 1.0 / (h * h)
    pb = _pick_pb(r, c, dtype)

    def compute(j, up, rp, rwrite, bp, mbuf, sigma, goff):
        out = []
        for l in range(pb):
            g = j * pb + l
            zm = up(j, l)
            au = (6.0 * zm - _nsum(up(j, l - 1), zm,
                                   up(j, l + 1))) * inv_h2
            res = bp(j, l) - au + sigma * zm
            upd = zm + mbuf[2] * ((omega / (6.0 * inv_h2 - sigma)) * res)
            out.append(_valid(g, goff, n, p, cdt) * upd)
        return out

    return _make_batch_kernel(compute, None, n, p, r, c, dtype,
                              extra_ring=False, pb=pb,
                              out_dtype=out_dtype_name)


@functools.lru_cache(maxsize=None)
def _rbgs_call(n: int, p: int, r: int, c: int, h: float, dtype_name: str,
               out_dtype_name: str = None):
    """One full red+black GS sweep in one HBM pass (two-color pipeline).

    The red ring holds *red-updated* planes (red points updated, black
    original). At iteration j:
      1. red-update block j+1 from ORIGINAL flanking planes — a red
         point's 6 neighbors are all black, and no black point has been
         touched yet, so original values are exactly what sequential GS
         reads. z-neighbors: the red ring suffices for z-1 (its black
         points are original) and the u ring for z+1.
      2. black-update block j from the red ring — a black point's
         neighbors are all red, all red-updated by now: exact reference
         sweep order (red sweep, then black sweep).
    The prologue prime seeds the red ring's plane 0 with u plane 0
    (red(1) reads only its BLACK values = original u; zero for a
    single-device ghost, the neighbor's exchanged data for a slab) and
    red-updates the rest of block 0; the stack's LAST plane is likewise
    copied, not updated, when stage 1 reaches it.
    """
    dtype = jnp.dtype(dtype_name)
    cdt = _cdt(dtype)
    h2 = h * h
    pb = _pick_pb(r, c, dtype)

    def red_plane(j, l, up, rp, bp, mbuf, sigma, goff):
        """Red-updated plane q = j*pb + l (reads rp(q-1), u(q), u(q+1))."""
        q = j * pb + l
        inv_den = 1.0 / (6.0 - sigma * h2)
        zm = up(j, l)
        gs = (h2 * bp(j, l)
              + _nsum(rp(j, l - 1), zm, up(j, l + 1))) * inv_den
        upd = zm + mbuf[jnp.int32(q + goff) % 2] * (gs - zm)
        # Inside [1, p-2] and globally interior: the update. Stack edge
        # plane p-1: copy u (its BLACK values are all the black stage
        # ever reads from it). Anything else (global ghosts, pads):
        # zero.
        v = _valid(q, goff, n, p, cdt)
        last = jnp.where(jnp.int32(q) == p - 1,
                         jnp.ones((), cdt), jnp.zeros((), cdt))
        return v * upd + (1.0 - v) * (last * zm)

    def prime(up, rp, rwrite, bp, mbuf, sigma, goff):
        rwrite(0, 0, up(0, 0))          # seed plane 0 (black values)
        for l in range(1, pb):
            rwrite(0, l, red_plane(0, l, up, rp, bp, mbuf, sigma, goff))

    def compute(j, up, rp, rwrite, bp, mbuf, sigma, goff):
        # Stage 1: red-update block j+1.
        for l in range(pb):
            rwrite(j + 1, l, red_plane(j + 1, l, up, rp, bp, mbuf,
                                       sigma, goff))
        # Stage 2: black-update block j. Black mask of plane g = red
        # mask of parity g+1.
        inv_den = 1.0 / (6.0 - sigma * h2)
        out = []
        for l in range(pb):
            g = j * pb + l
            zm = rp(j, l)
            gs = (h2 * bp(j, l)
                  + _nsum(rp(j, l - 1), zm, rp(j, l + 1))) * inv_den
            upd = zm + mbuf[jnp.int32(g + 1 + goff) % 2] * (gs - zm)
            out.append(_valid(g, goff, n, p, cdt) * upd)
        return out

    return _make_batch_kernel(compute, prime, n, p, r, c, dtype,
                              extra_ring=True, pb=pb,
                              out_dtype=out_dtype_name)


def _sigma_arr(sigma, dtype):
    return jnp.asarray(sigma, dtype=_cdt(dtype)).reshape(1, 1)


def _off_arr(goff, roff):
    return jnp.stack([jnp.asarray(goff, jnp.int32),
                      jnp.asarray(roff, jnp.int32)]).reshape(1, 2)


def residual(u: jax.Array, b: jax.Array, n: int, h: float,
             sigma=0.0, goff=0, roff=0) -> jax.Array:
    """r = b - (A - sigma I) u in one pass.

    u/b: aligned3 grids, or a slab decomposition's halo-extended plane
    stack with ``goff`` the global z-index of local plane 0 (traced)."""
    p, r, c = u.shape
    call = _residual_call(n, p, r, c, float(h), jnp.dtype(u.dtype).name)
    return call(_sigma_arr(sigma, u.dtype), _off_arr(goff, roff), u, b)


def jacobi_sweep(u: jax.Array, b: jax.Array, n: int, h: float,
                 omega: float, sigma=0.0, sweeps: int = 1,
                 goff=0, roff=0, out_dtype=None) -> jax.Array:
    """Weighted-Jacobi sweeps, one HBM pass each (aligned3 / slab).
    ``out_dtype`` widens the LAST sweep's output store (mixed top
    level)."""
    if b.dtype != u.dtype:
        # Mixed cycles promote u to f32 at the correction add while b
        # stays bf16; the rings are one dtype — cast b up once.
        b = b.astype(u.dtype)
    if sweeps == 0 and out_dtype is not None:
        return u.astype(out_dtype)     # honor the contract with no sweeps
    p, r, c = u.shape
    dn = jnp.dtype(u.dtype).name
    call = _jacobi_call(n, p, r, c, float(h), float(omega), dn)
    s = _sigma_arr(sigma, u.dtype)
    go = _off_arr(goff, roff)
    for i in range(sweeps):
        if i == sweeps - 1 and out_dtype is not None:
            call = _jacobi_call(n, p, r, c, float(h), float(omega), dn,
                                jnp.dtype(out_dtype).name)
        u = call(s, go, u, b)
    return u


def rbgs_sweep(u: jax.Array, b: jax.Array, n: int, h: float,
               sigma=0.0, sweeps: int = 1, goff=0, roff=0,
               out_dtype=None) -> jax.Array:
    """Full red+black GS sweeps, ONE HBM pass each (aligned3 / slab).

    Chained calls on a slab's extended plane stack invalidate 2 ghost
    planes per sweep per side (the edge planes are zeroed, not
    recomputed) — the caller's exchanged halo depth bounds ``sweeps``.
    """
    if b.dtype != u.dtype:
        b = b.astype(u.dtype)      # see jacobi_sweep
    if sweeps == 0 and out_dtype is not None:
        return u.astype(out_dtype)     # honor the contract with no sweeps
    p, r, c = u.shape
    dn = jnp.dtype(u.dtype).name
    call = _rbgs_call(n, p, r, c, float(h), dn)
    s = _sigma_arr(sigma, u.dtype)
    go = _off_arr(goff, roff)
    for i in range(sweeps):
        if i == sweeps - 1 and out_dtype is not None:
            call = _rbgs_call(n, p, r, c, float(h), dn,
                              jnp.dtype(out_dtype).name)
        u = call(s, go, u, b)
    return u
