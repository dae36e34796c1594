"""Blocked-affine-scan Pallas solve kernel (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from quflow_tpu.parallel.stepper import _shear_factors_cached, _Fac
from quflow_tpu.ops.tridiag import solve_factored
from quflow_tpu.ops.diagpack import mat2shear
from quflow_tpu.ops.pallas_scan_solve import scan_base_cols


def _skewh(N, seed=0):
    rng = np.random.RandomState(seed)
    W = rng.randn(N, N) + 1j * rng.randn(N, N)
    return W - W.conj().T


def test_blocked_scan_kernel_matches_f64_solve():
    N = 256
    w, binv, u, _ = _shear_factors_cached(N)
    W = _skewh(N)
    d64 = mat2shear(jnp.asarray(W), tracefree=True)
    x64 = np.asarray(solve_factored(_Fac(w, binv, u), d64, axis=-2))

    base = scan_base_cols(w, binv, u, tile=128, chunk=64, interpret=True)
    x_k = np.asarray(base(d64))
    rel = np.abs(x_k - x64).max() / np.abs(x64).max()
    assert rel < 1e-12, rel  # f64 path: same math, scan order differs


def test_blocked_scan_kernel_f32_error_comparable():
    """In f32 the kernel's error vs the f64 truth must be in the same class
    as the XLA associative-scan solver (both dominated by the
    ill-conditioned m=0 system; measured 1.8e-4 vs 2.6e-4 at N=256)."""
    N = 256
    w, binv, u, _ = _shear_factors_cached(N)
    W = _skewh(N, seed=1)
    d64 = mat2shear(jnp.asarray(W), tracefree=True)
    x64 = np.asarray(solve_factored(_Fac(w, binv, u), d64, axis=-2))
    d32 = d64.astype(jnp.complex64)
    x32 = np.asarray(solve_factored(_Fac(w, binv, u), d32, axis=-2))
    base = scan_base_cols(
        w.astype(np.float32), binv.astype(np.float32), u.astype(np.float32),
        tile=128, chunk=64, interpret=True,
    )
    x_k = np.asarray(base(d32))
    scale = np.abs(x64).max()
    err_scan = np.abs(x32 - x64).max() / scale
    err_kernel = np.abs(x_k - x64).max() / scale
    assert err_kernel < 3 * err_scan, (err_kernel, err_scan)


def test_blocked_scan_kernel_batched():
    N = 128
    w, binv, u, _ = _shear_factors_cached(N)
    B = 3
    ds = jnp.stack([mat2shear(jnp.asarray(_skewh(N, seed=s)), tracefree=True)
                    for s in range(B)])
    x_ref = np.asarray(solve_factored(_Fac(w, binv, u), ds, axis=-2))
    base = scan_base_cols(w, binv, u, tile=128, chunk=32, interpret=True)
    x_k = np.asarray(base(ds))
    np.testing.assert_allclose(x_k, x_ref, atol=1e-12 * np.abs(x_ref).max())
