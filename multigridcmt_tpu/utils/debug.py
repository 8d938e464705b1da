"""Debug mode: NaN trapping and checkified numeric guards.

SURVEY.md §5 "Race detection / sanitizers": JAX's functional model removes
data races by construction, so the build's sanitizer tier is numerical —
(a) `jax_debug_nans` to fault on the first NaN-producing primitive, and
(b) `jax.experimental.checkify` assertions that travel through `jit` /
`lax.while_loop`, used here to guard residual finiteness and divergence
(rho >= 1 is also guarded post-hoc by `metrics.divergence_guard`).
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax.experimental import checkify


@contextlib.contextmanager
def debug_mode(nans: bool = True):
    """Enable `jax_debug_nans` within a block (slow: forces sync dispatch)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", nans)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_finite(x: jax.Array, name: str = "array") -> None:
    """Checkify assertion: every element of ``x`` is finite.

    Use inside functions run through `checked` below; outside checkify
    functionalization this raises immediately on concrete values.
    """
    checkify.check(jnp.all(jnp.isfinite(x)), f"{name} contains NaN/Inf")


def checked(fn, *, errors=checkify.float_checks):
    """Wrap ``fn`` so float errors (NaN/Inf/div-by-zero) surface as Python
    exceptions after the device computation completes:

    >>> safe_solve = checked(lambda b: solver.solve(b).x)
    >>> x = safe_solve(b)     # raises checkify.JaxRuntimeError on NaN
    """
    cfn = checkify.checkify(fn, errors=errors)

    def run(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return run
