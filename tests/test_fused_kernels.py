"""Whole-leg fused kernel tests (kernels/fused2d.py) — oracle: the composed
pure-jnp ops (smooth -> residual -> restrict / prolong -> add -> smooth).
Interpreter mode on CPU; the same kernels run compiled on TPU via bench.py.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from multigridcmt_tpu.grids import (from_aligned, pad_interior, to_aligned)
from multigridcmt_tpu.kernels import fused2d
from multigridcmt_tpu.ops import laplacian, smoothers, transfer


def _rand(n, seed=0, k=2):
    rng = np.random.default_rng(seed)
    return [pad_interior(jnp.asarray(rng.standard_normal((n, n)),
                                     dtype=jnp.float32)) for _ in range(k)]


SIZES = [15, 63, 127, 255, 191]
SMOOTHERS = [("rbgs", 1.0), ("jacobi", 0.8)]


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("kind,omega", SMOOTHERS)
@pytest.mark.parametrize("sweeps", [0, 1, 2, 3])
def test_down_leg_matches_composed(n, kind, omega, sweeps):
    if sweeps > fused2d.max_down_sweeps(kind):
        pytest.skip("beyond single-kernel fusion cap")
    h = 1.0 / (n + 1)
    u, b = _rand(n, seed=n)
    want_u = smoothers.smooth(u, b, h, kind=kind, omega=omega,
                              sweeps=sweeps)
    want_rc = transfer.restrict(laplacian.residual(want_u, b, h))
    got_u_a, got_rc_a = fused2d.smooth_residual_restrict(
        to_aligned(u), to_aligned(b), n, h, kind=kind, omega=omega,
        sweeps=sweeps)
    nc = (n - 1) // 2
    np.testing.assert_allclose(np.asarray(from_aligned(got_u_a, n)),
                               np.asarray(want_u), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(from_aligned(got_rc_a, nc)), np.asarray(want_rc),
        rtol=2e-5, atol=2e-4 / h)
    # Pad invariant: everything outside the logical interiors stays zero.
    for out, m in ((got_u_a, n), (got_rc_a, nc)):
        z = np.asarray(out).copy()
        z[1:m + 1, 1:m + 1] = 0.0
        assert np.abs(z).max() == 0.0


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("kind,omega", SMOOTHERS)
@pytest.mark.parametrize("sweeps", [0, 2, 4])
def test_up_leg_matches_composed(n, kind, omega, sweeps):
    if sweeps > fused2d.max_up_sweeps(kind):
        pytest.skip("beyond single-kernel fusion cap")
    h = 1.0 / (n + 1)
    nc = (n - 1) // 2
    x, b = _rand(n, seed=n + 1)
    (e,) = _rand(nc, seed=n + 2, k=1)
    want = smoothers.smooth(x + transfer.prolong(e), b, h, kind=kind,
                            omega=omega, sweeps=sweeps)
    got_a = fused2d.prolong_add_smooth(
        to_aligned(x), to_aligned(e), to_aligned(b), n, nc, h, kind=kind,
        omega=omega, sweeps=sweeps)
    np.testing.assert_allclose(np.asarray(from_aligned(got_a, n)),
                               np.asarray(want), rtol=2e-5, atol=5e-5)
    z = np.asarray(got_a).copy()
    z[1:n + 1, 1:n + 1] = 0.0
    assert np.abs(z).max() == 0.0


def test_shifted_legs_match_composed():
    """sigma != 0 (eigensolver path) through both fused legs."""
    n, h, sigma = 63, 1.0 / 64, 11.5
    nc = (n - 1) // 2
    u, b = _rand(n, seed=5)
    want_u = smoothers.smooth(u, b, h, kind="rbgs", omega=1.0, sweeps=2,
                              sigma=sigma)
    want_rc = transfer.restrict(laplacian.residual(want_u, b, h,
                                                   sigma=sigma))
    got_u_a, got_rc_a = fused2d.smooth_residual_restrict(
        to_aligned(u), to_aligned(b), n, h, kind="rbgs", omega=1.0,
        sweeps=2, sigma=sigma)
    np.testing.assert_allclose(np.asarray(from_aligned(got_u_a, n)),
                               np.asarray(want_u), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(from_aligned(got_rc_a, nc)), np.asarray(want_rc),
        rtol=2e-5, atol=2e-4 / h)
    (e,) = _rand(nc, seed=6, k=1)
    want_x = smoothers.smooth(u + transfer.prolong(e), b, h, kind="jacobi",
                              omega=0.8, sweeps=2, sigma=sigma)
    got_x = fused2d.prolong_add_smooth(
        to_aligned(u), to_aligned(e), to_aligned(b), n, nc, h,
        kind="jacobi", omega=0.8, sweeps=2, sigma=sigma)
    np.testing.assert_allclose(np.asarray(from_aligned(got_x, n)),
                               np.asarray(want_x), rtol=2e-5, atol=5e-5)
