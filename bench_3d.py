"""3D (7-point) kernel benchmark on the TPU chip.

Measures the plane-rolling Pallas RB-GS kernel (kernels/stencil3d.py)
against the pure-jnp/XLA path it replaces, at k=8 (255^3) and k=9
(511^3). Context from calibration on this chip (2026-08-21): physical
VMEM is ~128 MB — XLA pins loop-carried arrays up to ~116 MB, which is
why the jnp Jacobi/Chebyshev chains beat hand-streamed kernels at k<=8
(they are routed to jnp — see cycles.get_backend); RB-GS two-color
masked updates cannot be fused by XLA and win big as a kernel. Raw HBM
streaming measures ~670-700 GB/s against the 819 GB/s paper roofline.

Prints a table to stderr and one JSON line to stdout.
"""
from __future__ import annotations

import json
import sys

from bench import HBM_GBPS, _marginal, log


def bare_copy_probe():
    """Platform probe (VERDICT.md round-4 weak item 6): a minimal
    double-buffered Mosaic HBM->VMEM->HBM copy pipeline on a ~700 MB
    array vs XLA's copy of the same array. Round-4 measured the Mosaic
    pipeline at 321-326 GB/s while XLA streamed 627-757 GB/s — the
    chip/tunnel-specific DMA cap that bounds the GB-footprint 3D
    kernels. Re-run after any platform update to re-open (or re-close)
    the 3D kernel headroom question."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, cols = 21504, 8192          # ~704 MB f32
    t = 512
    nt = rows // t

    def kernel(src, dst, buf, in_sems, out_sems):
        cp0 = pltpu.make_async_copy(src.at[pl.ds(0, t), :], buf.at[0],
                                    in_sems.at[0])
        cp0.start()

        def body(i, _):
            slot = i % 2
            nxt = (i + 1) % 2

            @pl.when(i + 1 < nt)
            def _():
                pltpu.make_async_copy(
                    src.at[pl.ds((i + 1) * t, t), :], buf.at[nxt],
                    in_sems.at[nxt]).start()

            pltpu.make_async_copy(
                src.at[pl.ds(i * t, t), :], buf.at[slot],
                in_sems.at[slot]).wait()

            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    buf.at[slot], dst.at[pl.ds(0, t), :],
                    out_sems.at[slot]).wait()

            pltpu.make_async_copy(
                buf.at[slot], dst.at[pl.ds(i * t, t), :],
                out_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, nt, body, 0, unroll=False)

        def drain(j, _):
            @pl.when(j < jnp.minimum(nt, 2))
            def _():
                pltpu.make_async_copy(
                    buf.at[(nt - 1 - j) % 2, :, :],
                    dst.at[pl.ds(0, t), :],
                    out_sems.at[(nt - 1 - j) % 2]).wait()
            return 0

        jax.lax.fori_loop(0, 2, drain, 0, unroll=False)

    def copy(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.VMEM((2, t, cols), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=64 * 1024 * 1024),
        )(x)

    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((rows, cols)).astype(np.float32))
    nbytes = 2 * rows * cols * 4      # read + write

    @jax.jit
    def mosaic_m(x, m):
        def body(i, v):
            return copy(v)

        return jnp.sum(jax.lax.fori_loop(0, m, body, x)[:1, :1])

    @jax.jit
    def xla_m(x, m):
        def body(i, v):
            return v * 1.0000001      # forced elementwise pass (~copy)

        return jnp.sum(jax.lax.fori_loop(0, m, body, x)[:1, :1])

    tm = _marginal(lambda m: float(mosaic_m(x, m)), k1=1, k2=7, reps=5)
    tx = _marginal(lambda m: float(xla_m(x, m)), k1=1, k2=7, reps=5)
    log(f"[probe] bare Mosaic 2-stream copy: {nbytes / tm / 1e9:.0f} GB/s; "
        f"XLA elementwise pass: {nbytes / tx / 1e9:.0f} GB/s "
        f"({rows * cols * 4 / 1e6:.0f} MB array)")
    print(json.dumps({
        "metric": "bare_copy_probe",
        "mosaic_gbps": round(nbytes / tm / 1e9, 1),
        "xla_gbps": round(nbytes / tx / 1e9, 1),
    }), flush=True)


def main():
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from multigridcmt_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    if "--bare-copy" in sys.argv:
        bare_copy_probe()
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multigridcmt_tpu.grids import aligned3_shape, to_aligned3
    from multigridcmt_tpu.kernels import stencil3d
    from multigridcmt_tpu.ops import smoothers

    out = {}
    for K in (8, 9):
        n = 2 ** K - 1
        h = 1.0 / (n + 1)
        p, r, c = aligned3_shape(n)
        rng = np.random.default_rng(0)
        u = np.zeros((n + 2,) * 3, np.float32)
        u[1:-1, 1:-1, 1:-1] = rng.standard_normal((n,) * 3)
        b = np.zeros_like(u)
        b[1:-1, 1:-1, 1:-1] = rng.standard_normal((n,) * 3)
        ua = to_aligned3(jnp.asarray(u))
        ba = to_aligned3(jnp.asarray(b))
        ul = jnp.asarray(u)
        bl = jnp.asarray(b)

        phys = 3 * p * r * c * 4
        nnz = 7 * n ** 3

        def chain(op, x0, bx):
            # x0/b must be ARGUMENTS: closing over a 0.5 GB array bakes
            # it into the HLO as a constant and the remote-compile
            # request dies with HTTP 413.
            @jax.jit
            def f(x0, bb, m):
                def body(i, x):
                    return op(x, bb)

                return jnp.sum(jax.lax.fori_loop(0, m, body, x0)
                               .astype(jnp.float32))

            return lambda m: float(f(x0, bx, m))

        reps = 6 if K == 8 else 4
        k2 = 11 if K == 8 else 7
        ks = _marginal(chain(
            lambda x, bb: stencil3d.rbgs_sweep(x, bb, n, h), ua, ba),
            k1=1, k2=k2, reps=reps)
        js = _marginal(chain(
            lambda x, bb: smoothers.rbgs(x, bb, h), ul, bl),
            k1=1, k2=k2, reps=reps)
        gbps = phys / ks / 1e9
        out[f"k{K}"] = dict(kernel_us=ks * 1e6, jnp_us=js * 1e6,
                            gbps=gbps, roofline=gbps / HBM_GBPS,
                            gnnz=nnz / ks / 1e9, speedup=js / ks)
        log(f"[3d] k={K} rbgs: kernel {ks * 1e6:.0f} us ({gbps:.0f} GB/s, "
            f"{100 * gbps / HBM_GBPS:.0f}% of 819 roofline, "
            f"{nnz / ks / 1e9:.1f} Gnnz/s) vs XLA jnp {js * 1e6:.0f} us "
            f"({js / ks:.2f}x)")

    print(json.dumps({
        "metric": "poisson3d_rbgs_sweep_kernel_speedup_vs_xla",
        "value": round(out["k9"]["speedup"], 2),
        "unit": "x",
        "detail": {k: {kk: round(vv, 3) for kk, vv in v.items()}
                   for k, v in out.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
