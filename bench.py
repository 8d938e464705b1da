"""Headline benchmark: 2D Poisson RB-GS V-cycle on the TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference (AndyMN/MultigridCMT) publishes no numbers (BASELINE.md), so
vs_baseline is the speedup of one TPU Pallas V-cycle over the SciPy
mini-reference implementation (tests/reference_impl.py — the stand-in
oracle per SURVEY.md §4.3) running the same V(2,2) RB-GS cycle on this
host's CPU at the same grid size.

Extra metrics (smoother nnz/s, roofline fraction, per-size timings) go to
stderr so the driver's stdout contract stays a single line.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

N_WARM = 2
N_ITER = 10
K = 12                 # 4095^2 — the BASELINE.md config-5 grid size
HBM_GBPS = 819.0       # v5e HBM bandwidth (roofline denominator)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _marginal(run, k1=2, k2=12, reps=4):
    """Marginal per-op seconds, immune to the per-dispatch tunnel latency.

    `run(m)` executes m chained ops in ONE jitted program with a *dynamic*
    trip count (single compile — remote compiles cost minutes) and a
    scalar fetch as the completion fence (`block_until_ready` is not a
    reliable fence through the axon tunnel). Min over reps (dispatch noise
    is heavy-tailed), differenced so fixed costs cancel.
    """
    run(k1)
    run(k2)

    def tmin(m):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run(m)
            best = min(best, time.perf_counter() - t0)
        return best

    return (tmin(k2) - tmin(k1)) / (k2 - k1)


def bench_tpu():
    import jax
    import jax.numpy as jnp

    import multigridcmt_tpu as mg
    from multigridcmt_tpu import kernels
    from multigridcmt_tpu.kernels import packed2d, stencil2d
    from multigridcmt_tpu.solvers import cycles

    prob = mg.poisson2d(k=K, dtype=jnp.float32, smoother="rbgs",
                        use_pallas=True)
    hier, cfg = prob.hierarchy, prob.config
    bk = cycles.get_backend(cfg)
    n, h = hier.fine.n, hier.fine.h
    b = bk.encode(prob.b)          # packed (2, r, c/2) at this size

    @jax.jit
    def cycles_m(b, m):
        def body(i, x):
            return cycles.cycle(hier, x, b, cfg)

        return jnp.sum(jax.lax.fori_loop(0, m, body, jnp.zeros_like(b)))

    # Hardened like the sweep marginal below (VERDICT.md round-3 weak
    # item 1): the r03-captured 1.45 ms headline came from a k2-k1=8,
    # reps=4 estimate whose ~2 ms dispatch-noise tail is the same order
    # as the quantity; >= 20 cycles of spread and min-over-6 keeps the
    # estimate inside the run-to-run band. Round-4 weak item 1: the
    # tunnel occasionally produces a WHOLE-RUN outlier (adjacent runs of
    # identical code differing 2.3x), so the captured number is the min
    # of TWO fully independent estimates, separated by the sweep bench —
    # corrupting it now takes two bad windows in one run.
    est_a = _marginal(lambda m: float(cycles_m(b, m)), k1=2, k2=22,
                      reps=6) * 1e3

    @jax.jit
    def sweeps_m(b, m):
        def body(i, u):
            if b.ndim == 3:
                return packed2d.rbgs_sweep(u, b, n, h, sweeps=1)
            return stencil2d.rbgs_sweep(u, b, n, h)

        return jnp.sum(jax.lax.fori_loop(0, m, body, jnp.zeros_like(b)))

    # Wide trip-count spread + extra reps: with k2-k1=20 a single ~2 ms
    # dispatch-noise tail in tmin(k1) swamps the ~110 us/sweep marginal
    # (one run measured a nonsense 10 us/sweep); 40 sweeps of spread and
    # min-over-6 keeps the estimate stable through the tunnel.
    sweep_s = _marginal(lambda m: float(sweeps_m(b, m)), k1=2, k2=42,
                        reps=6)
    nbytes = b.size * 4
    gbps = 3 * nbytes / sweep_s / 1e9
    nnz_per_s = 2 * 5 * n * n / sweep_s
    log(f"[bench] n={n} rbgs sweep {sweep_s * 1e6:.0f} us, "
        f"{gbps:.0f} GB/s ({100 * gbps / HBM_GBPS:.0f}% of HBM roofline), "
        f"{nnz_per_s / 1e9:.1f} Gnnz/s")

    est_b = _marginal(lambda m: float(cycles_m(b, m)), k1=2, k2=22,
                      reps=6) * 1e3
    vcycle_ms = min(est_a, est_b)
    log(f"[bench] V(2,2) cycle at {n}x{n}: {vcycle_ms:.2f} ms "
        f"(independent estimates {est_a:.3f} / {est_b:.3f})")
    return vcycle_ms


def bench_scipy_reference():
    sys.path.insert(0, "tests")
    import reference_impl as ref

    n = 2 ** K - 1
    h = 1.0 / (n + 1)
    x = np.arange(1, n + 1) * h
    b = (2 * np.pi ** 2 * np.outer(np.sin(np.pi * x), np.sin(np.pi * x)))
    u = np.zeros_like(b)
    t0 = time.perf_counter()
    u = ref.v_cycle(u, b, h, 2, 2, "rbgs", 0.8)
    ref_ms = (time.perf_counter() - t0) * 1e3
    log(f"[bench] SciPy reference V(2,2) cycle at {n}x{n}: {ref_ms:.0f} ms")
    return ref_ms


def main():
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from multigridcmt_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    vcycle_ms = bench_tpu()
    ref_ms = bench_scipy_reference()
    print(json.dumps({
        "metric": "poisson2d_4095_rbgs_vcycle_wall",
        "value": round(vcycle_ms, 3),
        "unit": "ms",
        "vs_baseline": round(ref_ms / vcycle_ms, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
