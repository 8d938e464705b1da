"""Mixed-precision (bfloat16 preconditioner) benchmark on the TPU chip.

Measures the claim behind ``SolverConfig.precond_dtype`` (BASELINE.md /
VERDICT.md round-2 item 2): storing the packed fine level in bfloat16
halves its HBM traffic, so the V-cycle a Krylov solve runs as its
preconditioner gets cheaper — while tests/test_mixed.py separately pins
that convergence still reaches full-dtype tolerance.

Prints a per-layout table to stderr and one JSON summary line to stdout:
f32 vs bf16 wall time of (a) a single fused RB-GS sweep and (b) a whole
V(2,2) cycle at 4095^2, plus the implied HBM saving.
"""
from __future__ import annotations

import json
import sys

from bench import HBM_GBPS, K, _marginal, log


def main():
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from multigridcmt_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    import multigridcmt_tpu as mg
    from multigridcmt_tpu.kernels import packed2d
    from multigridcmt_tpu.solvers import cycles

    prob = mg.poisson2d(k=K, dtype=jnp.float32, smoother="rbgs",
                        use_pallas=True)
    hier, cfg = prob.hierarchy, prob.config
    bk = cycles.get_backend(cfg)
    n, h = hier.fine.n, hier.fine.h
    b32 = bk.encode(prob.b)                    # packed (2, r, c/2)
    assert b32.ndim == 3, "expected the packed layout at this size"

    out = {}
    for name, bx in (("f32", b32), ("bf16", b32.astype(jnp.bfloat16))):

        @jax.jit
        def sweeps_m(b, m):
            def body(i, u):
                return packed2d.rbgs_sweep(u, b, n, h, sweeps=1)

            return jnp.sum(
                jax.lax.fori_loop(0, m, body, jnp.zeros_like(b))
                .astype(jnp.float32))

        sweep_s = _marginal(lambda m: float(sweeps_m(bx, m)), k1=2, k2=42,
                            reps=6)

        @jax.jit
        def cycles_m(b, m):
            def body(i, x):
                return cycles.cycle(hier, x, b, cfg)

            return jnp.sum(
                jax.lax.fori_loop(0, m, body, jnp.zeros_like(b))
                .astype(jnp.float32))

        cyc_s = _marginal(lambda m: float(cycles_m(bx, m)), k1=1, k2=9,
                          reps=6)

        nbytes = bx.size * bx.dtype.itemsize
        gbps = 3 * nbytes / sweep_s / 1e9
        out[name] = dict(sweep_us=sweep_s * 1e6, cycle_ms=cyc_s * 1e3)
        log(f"[mixed] {name}: sweep {sweep_s * 1e6:.0f} us "
            f"({gbps:.0f} GB/s, {100 * gbps / HBM_GBPS:.0f}% roofline), "
            f"V(2,2) cycle {cyc_s * 1e3:.3f} ms")

    speedup = out["f32"]["cycle_ms"] / out["bf16"]["cycle_ms"]
    print(json.dumps({
        "metric": "poisson2d_4095_bf16_precond_cycle_speedup",
        "f32_cycle_ms": round(out["f32"]["cycle_ms"], 3),
        "bf16_cycle_ms": round(out["bf16"]["cycle_ms"], 3),
        "f32_sweep_us": round(out["f32"]["sweep_us"], 1),
        "bf16_sweep_us": round(out["bf16"]["sweep_us"], 1),
        "value": round(speedup, 3),
        "unit": "x",
    }), flush=True)


if __name__ == "__main__":
    main()
