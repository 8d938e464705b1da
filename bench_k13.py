"""k=13 (8191^2) V-cycle benchmark — the packed->packed coarse crossing.

At k=13 both level 0 (8191^2) and level 1 (4095^2) use the color-packed
layout. Before the in-kernel packed-coarse emit (VERDICT.md round-2
item 4) the crossing paid milliseconds of XLA pack/unpack scatters; now
the fused down leg emits a packed coarse RHS and the up leg consumes it
directly. Acceptance: the k=13 V(2,2) cycle scales ~4x from the k=12
cycle (same kernels, 4x the points, no scatter spike).

Prints one JSON line with both cycle times and the scaling ratio.
"""
from __future__ import annotations

import json
import sys

from bench import _marginal, log


def main():
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from multigridcmt_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    import multigridcmt_tpu as mg
    from multigridcmt_tpu import kernels
    from multigridcmt_tpu.solvers import cycles

    out = {}
    # (K, PACK_MIN_N): k=12 single-packed (default), k=12 double-packed
    # (does packing level 1 pay now the crossing is in-kernel?), k=13
    # double-packed (default thresholds).
    for K, pmin in ((12, 3000), (12, 1500), (13, 3000)):
        kernels.PACK_MIN_N = pmin
        label = f"k{K}_pmin{pmin}"
        prob = mg.poisson2d(k=K, dtype=jnp.float32, smoother="rbgs",
                            use_pallas=True)
        hier, cfg = prob.hierarchy, prob.config
        bk = cycles.get_backend(cfg)
        b = bk.encode(prob.b)

        @jax.jit
        def cycles_m(b, m):
            def body(i, x):
                return cycles.cycle(hier, x, b, cfg)

            return jnp.sum(jax.lax.fori_loop(0, m, body, jnp.zeros_like(b))
                           .astype(jnp.float32))

        k2 = 9 if K == 12 else 5
        cyc = _marginal(lambda m: float(cycles_m(b, m)), k1=1, k2=k2,
                        reps=6)
        out[label] = cyc * 1e3
        log(f"[k13] V(2,2) cycle at k={K} ({2**K - 1}^2), "
            f"PACK_MIN_N={pmin} ({sum(1 for s in cfg.level_sizes() if s >= pmin)} packed levels): "
            f"{cyc * 1e3:.3f} ms")
        del prob, b
    kernels.PACK_MIN_N = 3000

    ratio = out["k13_pmin3000"] / out["k12_pmin3000"]
    print(json.dumps({
        "metric": "poisson2d_8191_vs_4095_vcycle_scaling",
        "value": round(ratio, 2),
        "unit": "x (ideal 4.0)",
        "detail_ms": {k: round(v, 3) for k, v in out.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
