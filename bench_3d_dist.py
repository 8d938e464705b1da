"""Sharded 3D cycle breakdown at mesh-of-1 (VERDICT.md round-4 item 6).

Times the full slab-sharded 3D V(2,2) cycle at 255^3 (and optionally
511^3) and its stages separately — kernel smoothing/residual vs the jnp
separable restrict/prolong passes — to decide whether in-kernel 3D
transfer emission is worth building. Prints JSONL to stdout.

Run on the chip: python bench_3d_dist.py [--k 9]
"""
from __future__ import annotations

import argparse
import json
import sys


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--k", type=int, default=8, help="grid exponent (8=255^3)")
    p.add_argument("--agglom", type=int, default=64)
    args = p.parse_args()

    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from multigridcmt_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    import multigridcmt_tpu as mg
    from multigridcmt_tpu.config import SolverConfig
    from multigridcmt_tpu.parallel import sharded
    from bench import _marginal, log

    K = args.k
    cfg = SolverConfig(ndim=3, k=K, dtype=jnp.float32, smoother="rbgs",
                       use_pallas=True, agglom_rows=args.agglom)
    mesh = sharded.make_mesh()
    solver = sharded.ShardedSolver(cfg, mesh)
    decomp = solver.decomp
    n, h = solver.hierarchy.fine.n, solver.hierarchy.fine.h
    nc = solver.hierarchy.levels[1].n
    prob = mg.poisson3d(k=K, dtype=jnp.float32)
    b_sh = sharded.shard_rhs(jnp.asarray(prob.b), mesh, decomp)
    omega = cfg.effective_omega()

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def wrap(f, nout=1):
        return jax.jit(shard_map(
            f, mesh=mesh, in_specs=(decomp.spec(), decomp.spec(), P()),
            out_specs=P(), check_vma=False))

    # Chained-component timings: the scalar carry forces sequencing.
    def chain(opname, local_op):
        def many(x, b, m):
            def body(i, s):
                out = local_op(x + s * 0.0, b)
                return s + jnp.sum(out)

            return jax.lax.fori_loop(0, m, body, jnp.zeros((), x.dtype))

        fn = wrap(many)
        t = _marginal(lambda m: float(fn(jnp.zeros_like(b_sh), b_sh, m)),
                      k1=2, k2=12, reps=6)
        log(f"[3d-dist] {opname}: {t * 1e6:.0f} us")
        return t

    comps = {}
    comps["smooth2"] = chain(
        "smooth x2 (slab kernel)",
        lambda x, b: sharded.s_smooth(x, b, n, h, kind="rbgs",
                                      omega=omega, sweeps=2,
                                      decomp=decomp, use_pallas=True))
    comps["residual"] = chain(
        "residual (slab kernel)",
        lambda x, b: sharded.s_residual(x, b, n, h, decomp,
                                        use_pallas=True))
    # The op input must depend on the carry (x = 0 + s) or XLA hoists
    # the whole op out of the timing loop (first version of this script
    # read 30 us for a 537 MB restrict). The b + x dependency costs a
    # full streaming pass of its own — measured as "nop" below and
    # subtracted from the reported transfer numbers.
    comps["nop"] = chain(
        "nop (b + x carry pass, subtracted from transfers)",
        lambda x, b: b + x)
    comps["restrict"] = chain(
        "restrict (jnp separable)",
        lambda x, b: sharded.s_restrict(b + x, n, decomp))
    comps["prolong"] = chain(
        "prolong (jnp separable)",
        lambda x, b: sharded.s_prolong(
            (b + x)[: b.shape[0] // 2, : nc + 2, : nc + 2], nc, decomp))

    # Full cycle marginal (the production chained path).
    vfn = solver.v_cycles_fn()

    @jax.jit
    def cyc_m(b, m):
        return jnp.sum(vfn(jnp.zeros_like(b), b, m).astype(jnp.float32))

    t_cycle = _marginal(lambda m: float(cyc_m(b_sh, m)), k1=2, k2=10,
                        reps=6)
    log(f"[3d-dist] full V(2,2) cycle: {t_cycle * 1e3:.3f} ms")

    comps["restrict"] = max(comps["restrict"] - comps["nop"], 0.0)
    comps["prolong"] = max(comps["prolong"] - comps["nop"], 0.0)
    level0 = 2 * comps["smooth2"] + comps["residual"] \
        + comps["restrict"] + comps["prolong"]
    transfers = comps["restrict"] + comps["prolong"]
    print(json.dumps({
        "metric": f"sharded3d_{n}_cycle_breakdown",
        "cycle_ms": round(t_cycle * 1e3, 3),
        "level0_components_ms": round(level0 * 1e3, 3),
        "smooth2_us": round(comps["smooth2"] * 1e6),
        "residual_us": round(comps["residual"] * 1e6),
        "restrict_us": round(comps["restrict"] * 1e6),
        "prolong_us": round(comps["prolong"] * 1e6),
        "transfer_frac_of_cycle": round(transfers / t_cycle, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
