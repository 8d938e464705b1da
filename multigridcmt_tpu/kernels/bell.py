"""Pallas TPU block-sparse (blocked-ELL) SpMM kernel.

Completes the general-sparse tier of SURVEY.md §2 ("Sparse formats / SpMV"
row). The design split across the three sparse kernels is:

* banded / stencil matrices  → DIA kernel (`kernels/spmv.py`), gather-free
  shifted multiply-adds at the HBM roofline;
* arbitrary scalar-sparse    → XLA gather + segment-sum (`ops.sparse.spmv`),
  correct but serialized by TPU's lack of hardware gather;
* **block-sparse (this kernel)** — the idiomatic TPU answer for general
  sparsity: nonzero structure at (128, 128)-block granularity, where every
  stored block is a dense tile that the MXU multiplies at full rate. This
  is how sparsity is actually made fast on TPU (block-sparse attention /
  MoE routing use the same shape); scalar formats that scatter nnz across
  rows cannot feed the systolic array.

Format — blocked ELL ("BELL"): every block row stores exactly ``kmax``
(bm, bn) blocks, padded with explicit zero blocks at block-column 0. The
rectangular (nbr, kmax) shape keeps the Pallas grid static; zero padding
blocks contribute nothing, so the kernel needs no validity masks.

Kernel: grid (nbr, kmax), k innermost. The block-column index array rides
as a scalar-prefetch operand, so the BlockSpec index maps can fetch the
right X tile for each stored block before the body runs
(`pltpu.PrefetchScalarGridSpec`, pallas_guide.md §12). The output tile for
a block row stays resident in VMEM across its k steps and accumulates
``Xt_block (m, bn) @ A_block^T (bn, bm)`` MXU products; Pallas writes it
back when the block row advances.

Operands are **transposed multivectors**: ``Xt`` has shape (m, n_cols),
one operand vector per sublane row, m a multiple of 8. That keeps the lane
dimension (128) on the matrix axis for every tile regardless of how few
vectors are applied — an m=8 SpMV and an m=256 block-eigensolver apply use
the same kernel at the same lane utilization. Single-vector `spmv` wraps
this with an 8-row carrier.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil2d import _interpret

_BM = 128
_BN = 128


def _cdt(dtype):
    """Accumulator dtype for a storage dtype (the packed2d `_cdt` rule):
    float32 for <=32-bit storage, float64 for float64 — an f64 BELL apply
    must accumulate its k-step partial products at f64, and bf16 storage
    must not round its accumulator to 8 mantissa bits per grid step."""
    return jnp.float64 if jnp.dtype(dtype) == jnp.float64 else jnp.float32


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BELL:
    """Blocked-ELL matrix: (nbr, kmax) dense (bm, bn) blocks + block cols."""

    data: jax.Array        # (nbr, kmax, bm, bn)
    cols: jax.Array        # (nbr, kmax) int32 block-column indices
    shape: Tuple[int, int]  # logical (unpadded) matrix shape
    nnz_scalar: int         # scalar nnz of the source matrix (for metrics)

    def tree_flatten(self):
        return (self.data, self.cols), (self.shape, self.nnz_scalar)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, cols = children
        shape, nnz_scalar = aux
        return cls(data=data, cols=cols, shape=shape, nnz_scalar=nnz_scalar)

    @property
    def nbr(self) -> int:
        return self.data.shape[0]

    @property
    def kmax(self) -> int:
        return self.data.shape[1]

    @property
    def block_shape(self) -> Tuple[int, int]:
        return self.data.shape[2], self.data.shape[3]

    @property
    def n_stored(self) -> int:
        """Stored (dense-block) element count — the bandwidth denominator."""
        return int(np.prod(self.data.shape))


def bell_from_scipy(a, dtype=jnp.float32, kmax: int | None = None) -> BELL:
    """Convert any scipy.sparse matrix to BELL with (128, 128) blocks.

    Host-side, setup-time. Block rows with fewer populated block columns
    than ``kmax`` are padded with zero blocks at block-column 0.
    """
    import scipy.sparse as sp

    a = sp.csr_matrix(a)
    n_r, n_c = a.shape
    nbr = -(-n_r // _BM)
    nbc = -(-n_c // _BN)
    coo = a.tocoo()
    pair = (coo.row // _BM).astype(np.int64) * nbc + coo.col // _BN
    blocks_of = [np.array([], dtype=np.int64)] * nbr
    for p in np.unique(pair):
        br, bc = divmod(int(p), nbc)
        blocks_of[br] = np.append(blocks_of[br], bc)
    need = max((len(b) for b in blocks_of), default=1) or 1
    if kmax is None:
        kmax = need
    elif kmax < need:
        raise ValueError(f"kmax={kmax} < densest block row ({need})")

    data = np.zeros((nbr, kmax, _BM, _BN), dtype=np.dtype(dtype))
    cols = np.zeros((nbr, kmax), dtype=np.int32)
    padded = sp.csr_matrix((a.data, a.indices, a.indptr),
                           shape=(n_r, nbc * _BN))
    for br, bcs in enumerate(blocks_of):
        r0, r1 = br * _BM, min((br + 1) * _BM, n_r)
        strip = padded[r0:r1]
        for k, bc in enumerate(np.sort(bcs)):
            blk = strip[:, bc * _BN:(bc + 1) * _BN].toarray()
            data[br, k, :r1 - r0, :] = blk
            cols[br, k] = bc
    return BELL(data=jnp.asarray(data), cols=jnp.asarray(cols),
                shape=(n_r, n_c), nnz_scalar=int(a.nnz))


@functools.lru_cache(maxsize=None)
def _spmm_call(nbr: int, kmax: int, nbc: int, m: int, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    cdt = _cdt(dtype)

    def kernel(cols_ref, d_ref, x_ref, o_ref):
        del cols_ref  # consumed by the index maps

        @pl.when(pl.program_id(1) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        # The VMEM-resident output tile IS the accumulator across a block
        # row's k steps — it must live in `cdt`, not the storage dtype
        # (per-step narrowing silently computed f64 SpMMs at f32).
        o_ref[...] += jax.lax.dot_general(
            x_ref[...], d_ref[0, 0],
            (((1,), (1,)), ((), ())),
            preferred_element_type=cdt,
            precision=jax.lax.Precision.HIGHEST).astype(cdt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr, kmax),
        in_specs=[
            pl.BlockSpec((1, 1, _BM, _BN),
                         lambda i, k, cols: (i, k, 0, 0)),
            pl.BlockSpec((m, _BN), lambda i, k, cols: (0, cols[i, k])),
        ],
        out_specs=pl.BlockSpec((m, _BM), lambda i, k, cols: (0, i)),
    )

    del dtype  # output narrows to storage dtype in the spmm() wrapper
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, nbr * _BM), cdt),
        interpret=_interpret(),
    )


def spmm(a: BELL, xt: jax.Array) -> jax.Array:
    """Yt (m, nbr*128) = (A @ X)^T for transposed multivector Xt (m, ≥n_c).

    m must be a multiple of 8. Xt columns beyond a.shape[1] are padding the
    caller guarantees to be zero (or at least multiplied by zero blocks);
    output columns beyond a.shape[0] are zero.
    """
    n_r, n_c = a.shape
    m = xt.shape[0]
    if m % 8 != 0:
        raise ValueError(f"m={m} must be a multiple of 8")
    nbc = -(-n_c // _BN)
    if xt.shape[1] < nbc * _BN:
        xt = jnp.pad(xt, ((0, 0), (0, nbc * _BN - xt.shape[1])))
    call = _spmm_call(a.nbr, a.kmax, nbc, m, jnp.dtype(xt.dtype).name)
    return call(a.cols, a.data, xt).astype(xt.dtype)


def spmv(a: BELL, x: jax.Array) -> jax.Array:
    """y = A @ x through the SpMM kernel (8-row carrier, row 0 live)."""
    n_r, n_c = a.shape
    nbc = -(-n_c // _BN)
    xt = jnp.zeros((8, nbc * _BN), x.dtype).at[0, :n_c].set(x)
    return spmm(a, xt)[0, :n_r]
