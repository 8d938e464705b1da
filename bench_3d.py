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


def main():
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from multigridcmt_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

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
