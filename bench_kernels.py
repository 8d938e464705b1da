"""Per-kernel microbenchmark: where does the V-cycle's time go?

Times each Pallas kernel (and the whole cycle) at a chosen grid size with
the marginal-difference method (see bench.py), printing us/call, achieved
GB/s vs the HBM roofline, and the per-level cycle budget. Drives kernel
optimization; BASELINE.md quotes its outputs.

Usage: python bench_kernels.py [--k 12] [--levels]
"""
from __future__ import annotations

import argparse
import sys
import time

HBM_GBPS = 819.0


def log(msg):
    print(msg, flush=True)


def marginal(run, k1=2, k2=12, reps=4):
    run(k1); run(k2)

    def tmin(m):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run(m)
            best = min(best, time.perf_counter() - t0)
        return best

    return (tmin(k2) - tmin(k1)) / (k2 - k1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--levels", action="store_true",
                    help="also time one full cycle at every k' <= k")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from multigridcmt_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    import multigridcmt_tpu as mg
    from multigridcmt_tpu.grids import to_aligned
    from multigridcmt_tpu.kernels import (fused2d, packed2d, stencil2d,
                                          transfer2d)
    from multigridcmt_tpu.solvers import cycles

    prob = mg.poisson2d(k=args.k, dtype=jnp.float32, smoother="rbgs",
                        use_pallas=True)
    hier, cfg = prob.hierarchy, prob.config
    bk = cycles.get_backend(cfg)
    n, h = hier.fine.n, hier.fine.h
    benc = bk.encode(prob.b)       # the solve-path layout (packed if big)
    b = to_aligned(prob.b)         # aligned copy for the aligned kernels
    r, c = b.shape
    byte = r * c * 4

    def chain(op):
        @jax.jit
        def f(b, m):
            def body(i, u):
                return op(u, b)

            return jnp.sum(jax.lax.fori_loop(0, m, body, jnp.zeros_like(b)))

        return lambda m: float(f(b, m))

    def chain_reduce(op):
        """Chain an op whose output shape differs from its input: carry u
        unchanged, fold the op's result into a scalar accumulator (the
        kernels are side-effecting, so XLA can't hoist the repeat)."""
        @jax.jit
        def f(b, m):
            def body(i, carry):
                u, acc = carry
                out = op(u, b)
                return u, acc + out.reshape(-1)[0]

            _, acc = jax.lax.fori_loop(0, m, body,
                                       (b, jnp.zeros((), b.dtype)))
            return acc

        return lambda m: float(f(b, m))

    def report(name, sec, nbytes):
        gbps = nbytes / sec / 1e9
        log(f"{name:34s} {sec * 1e6:7.0f} us  {gbps:5.0f} GB/s "
            f"({100 * gbps / HBM_GBPS:3.0f}% roofline)")

    omega = cfg.effective_omega()

    sec = marginal(chain(lambda u, b: stencil2d.rbgs_sweep(u, b, n, h)))
    report("rbgs_sweep x1", sec, 3 * byte)
    sec = marginal(chain(
        lambda u, b: stencil2d.rbgs_sweep(u, b, n, h, sweeps=2)))
    report("rbgs_sweep x2 (fused)", sec, 3 * byte)
    sec = marginal(chain(lambda u, b: stencil2d.residual(u, b, n, h)))
    report("residual", sec, 3 * byte)
    sec = marginal(chain_reduce(lambda u, b: transfer2d.residual_restrict(
        u, b, n, h)))
    report("residual_restrict", sec, 2.27 * byte)
    sec = marginal(chain(lambda u, b: fused2d.smooth_residual_restrict(
        u, b, n, h, kind="rbgs", omega=omega, sweeps=2)[0]))
    report("down leg (smooth2+res+restrict)", sec, 2.27 * byte)

    ec = jnp.zeros(transfer2d.residual_restrict(b, b, n, h).shape,
                   dtype=b.dtype)

    @jax.jit
    def up_chain(b, ec, m):
        def body(i, u):
            return fused2d.prolong_add_smooth(u, ec, b, n, (n - 1) // 2, h,
                                              kind="rbgs", omega=omega,
                                              sweeps=2)

        return jnp.sum(jax.lax.fori_loop(0, m, body, jnp.zeros_like(b)))

    sec = marginal(lambda m: float(up_chain(b, ec, m)))
    report("up leg (prolong+corr+smooth2)", sec, 3.27 * byte)

    @jax.jit
    def pa_chain(b, ec, m):
        def body(i, u):
            return transfer2d.prolong_add(u, ec, n, (n - 1) // 2)

        return jnp.sum(jax.lax.fori_loop(0, m, body, jnp.zeros_like(b)))

    sec = marginal(lambda m: float(pa_chain(b, ec, m)))
    report("prolong_add", sec, 2.27 * byte)

    # --- color-packed kernels (the solve path at this size) -------------
    if benc.ndim == 3:
        bp = benc
        pbyte = bp.size * 4

        def pchain(op):
            @jax.jit
            def f(bp, m):
                def body(i, u):
                    return op(u, bp)

                return jnp.sum(jax.lax.fori_loop(0, m, body,
                                                 jnp.zeros_like(bp)))

            return lambda m: float(f(bp, m))

        sec = marginal(pchain(
            lambda u, bb: packed2d.rbgs_sweep(u, bb, n, h, sweeps=1)))
        report("packed rbgs_sweep x1", sec, 3 * pbyte)
        sec = marginal(pchain(
            lambda u, bb: packed2d.rbgs_sweep(u, bb, n, h, sweeps=2)))
        report("packed rbgs_sweep x2 (fused)", sec, 3 * pbyte)
        sec = marginal(pchain(
            lambda u, bb: packed2d.residual(u, bb, n, h)))
        report("packed residual", sec, 3 * pbyte)
        sec = marginal(pchain(
            lambda u, bb: packed2d.smooth_residual_restrict(
                u, bb, n, h, kind="rbgs", omega=omega, sweeps=2)[0]))
        report("packed down leg", sec, 2.27 * pbyte)

        @jax.jit
        def pup_chain(bp, ec, m):
            def body(i, u):
                return packed2d.prolong_add_smooth(
                    u, ec, bp, n, (n - 1) // 2, h, kind="rbgs",
                    omega=omega, sweeps=2)

            return jnp.sum(jax.lax.fori_loop(0, m, body,
                                             jnp.zeros_like(bp)))

        sec = marginal(lambda m: float(pup_chain(bp, ec, m)))
        report("packed up leg", sec, 3.27 * pbyte)

    @jax.jit
    def cyc(benc, m):
        def body(i, x):
            return cycles.cycle(hier, x, benc, cfg)

        return jnp.sum(jax.lax.fori_loop(0, m, body, jnp.zeros_like(benc)))

    sec = marginal(lambda m: float(cyc(benc, m)), 1, 9)
    log(f"{'FULL V(2,2) cycle':34s} {sec * 1e6:7.0f} us")

    if args.levels:
        for kk in range(5, args.k):
            pr = mg.poisson2d(k=kk, dtype=jnp.float32, smoother="rbgs",
                              use_pallas=True)
            hh, cc2 = pr.hierarchy, pr.config
            bb = cycles.get_backend(cc2).encode(pr.b)

            @jax.jit
            def cyck(bb, m, hh=hh, cc2=cc2):
                def body(i, x):
                    return cycles.cycle(hh, x, bb, cc2)

                return jnp.sum(jax.lax.fori_loop(0, m, body,
                                                 jnp.zeros_like(bb)))

            sec = marginal(lambda m: float(cyck(bb, m)), 1, 9)
            log(f"  full cycle at k={kk:2d} ({2**kk - 1:4d}^2)"
                f"   {sec * 1e6:7.0f} us")


if __name__ == "__main__":
    main()
