"""SpMV nnz/s benchmark (BASELINE.md "SpMV nnz/s per chip" row).

Runs the Pallas DIA kernel on the 2D 5-point Poisson operator on the TPU
chip, chained in packed layout, and reports achieved nnz/s and the fraction
of the HBM-bandwidth roofline ((ndiag + 2) * 4 bytes per row of traffic).
Also times the XLA gather+segment-sum CSR path for comparison. Correctness
is cross-checked against the XLA DIA path on the first iterate.

Usage: python bench_spmv.py [--n 4095] [--reps 4]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

HBM_GBPS = 819.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def marginal(run, k1, k2, reps):
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
    ap.add_argument("--n", type=int, default=4095,
                    help="2D grid side (N = n^2 rows)")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--csr", action="store_true",
                    help="also bench the XLA CSR path (slow at large N)")
    ap.add_argument("--bell", action="store_true",
                    help="also bench the blocked-ELL MXU SpMM kernel")
    ap.add_argument("--bell-blocks", type=int, default=64,
                    help="block rows/cols of the synthetic BELL matrix")
    ap.add_argument("--bell-density", type=float, default=0.15)
    ap.add_argument("--bell-m", type=int, default=128,
                    help="multivector width for the BELL SpMM bench")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from multigridcmt_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from multigridcmt_tpu.kernels import spmv as kspmv
    from multigridcmt_tpu.ops import sparse

    n = args.n
    h = 1.0 / (n + 1)
    a = sparse.laplacian_dia(n, 2, h, dtype=jnp.float32)
    pk = kspmv.pack_dia(a)
    nnz = a.nnz
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(a.shape[0]) * h * h,
                    dtype=jnp.float32)
    xp = kspmv.pack_x(x, pk.halo)

    # Correctness on-chip vs the XLA DIA path.
    got = kspmv.unpack_y(kspmv.spmv_packed(pk, xp), pk.n, pk.halo)
    want = sparse.spmv_dia(a, x)
    err = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
    log(f"[spmv] n={n} N={a.shape[0]} nnz={nnz} max rel err vs XLA: "
        f"{err:.2e}")
    assert err < 1e-5

    @jax.jit
    def chain(pk, xp, m):
        def body(i, v):
            return kspmv.spmv_packed(pk, v)

        return jnp.sum(jax.lax.fori_loop(0, m, body, xp))

    sec = marginal(lambda m: float(chain(pk, xp, m)), 2, 22, args.reps)
    ndiag = pk.diags.shape[0]
    traffic = (ndiag + 2) * pk.diags.shape[1] * 128 * 4
    gbps = traffic / sec / 1e9
    line = (f"[spmv] pallas DIA: {sec * 1e6:.0f} us/apply, "
            f"{nnz / sec / 1e9:.1f} Gnnz/s, {gbps:.0f} GB/s "
            f"({100 * gbps / HBM_GBPS:.0f}% of HBM roofline)")
    log(line)

    if args.bell:
        import scipy.sparse as sp

        from multigridcmt_tpu.kernels import bell

        nbr = nbc = args.bell_blocks
        rng = np.random.default_rng(1)
        mask = rng.random((nbr, nbc)) < args.bell_density
        mask[np.arange(nbr), np.arange(nbr) % nbc] = True  # no empty rows
        blocks = {(i, j): rng.standard_normal((128, 128)).astype(np.float32)
                  for i, j in zip(*np.nonzero(mask))}
        a_sp = sp.bmat([[sp.csr_matrix(blocks[(i, j)])
                         if (i, j) in blocks else None
                         for j in range(nbc)] for i in range(nbr)],
                       format="csr")
        ab = bell.bell_from_scipy(a_sp)
        m = args.bell_m
        xt = jnp.asarray(rng.standard_normal((m, nbc * 128)),
                         dtype=jnp.float32)

        got = np.asarray(bell.spmm(ab, xt))[:, :a_sp.shape[0]]
        want = (a_sp @ np.asarray(xt).T).T
        errb = float(np.max(np.abs(got - want))
                     / max(np.max(np.abs(want)), 1e-30))
        log(f"[spmv] BELL {nbr}x{nbc} blocks, kmax={ab.kmax}, "
            f"m={m}: max rel err vs scipy {errb:.2e}")
        assert errb < 1e-4

        @jax.jit
        def chain_bell(ab, xt, mm):
            def body(i, v):
                y = bell.spmm(ab, v)
                return y[:, :xt.shape[1]] if y.shape[1] != xt.shape[1] else y

            return jnp.sum(jax.lax.fori_loop(0, mm, body, xt))

        sec_b = marginal(lambda mm: float(chain_bell(ab, xt, mm)), 2, 22,
                         args.reps)
        flops = 2.0 * ab.n_stored * m
        stored_bytes = 4 * (ab.n_stored + 2 * m * nbc * 128)
        log(f"[spmv] pallas BELL SpMM: {sec_b * 1e6:.0f} us/apply, "
            f"{flops / sec_b / 1e12:.2f} TFLOP/s dense-block, "
            f"{ab.nnz_scalar * m / sec_b / 1e9:.1f} Gnnz*vec/s, "
            f"{stored_bytes / sec_b / 1e9:.0f} GB/s streamed")

    if args.csr:
        csr = sparse.laplacian_csr(n, 2, h, dtype=jnp.float32)

        @jax.jit
        def chain_csr(csr, x, m):
            def body(i, v):
                return sparse.spmv(csr, v) * (h * h)

            return jnp.sum(jax.lax.fori_loop(0, m, body, x))

        sec_csr = marginal(lambda m: float(chain_csr(csr, x, m)), 2, 10,
                           args.reps)
        log(f"[spmv] XLA CSR:    {sec_csr * 1e6:.0f} us/apply, "
            f"{nnz / sec_csr / 1e9:.1f} Gnnz/s "
            f"({sec_csr / sec:.1f}x slower than pallas DIA)")

    print(line.replace("[spmv] ", ""))


if __name__ == "__main__":
    main()
