"""Native C++ host kernels: equivalence with the JAX path and performance
sanity."""

import numpy as np
import pytest

import quflow_tpu as qf
from quflow_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def rsk(N, seed=0):
    rng = np.random.RandomState(seed)
    W = rng.randn(N, N) + 1j * rng.randn(N, N)
    return W - W.conj().T


@pytest.mark.parametrize("N", [9, 33, 128])
def test_native_solve_poisson_equivalence(N):
    W = rsk(N, seed=N)
    P_native = native.solve_poisson_native(W)
    P_jax = np.asarray(qf.solve_poisson(W, skewh=True))
    np.testing.assert_allclose(P_native, P_jax, atol=1e-13 * N)


def test_native_conj_subtract():
    rng = np.random.RandomState(1)
    A = rng.randn(16, 16) + 1j * rng.randn(16, 16)
    out = native.conj_subtract_native(A.copy())
    np.testing.assert_allclose(out, A - A.conj().T, atol=1e-14)


def test_native_thomas_batch():
    from quflow_tpu.ops.laplacian import _factors
    from quflow_tpu.ops.diagpack import mat2diagh

    N = 32
    fac = _factors(N, True, "poisson", ())
    W = rsk(N, seed=2)
    d = np.asarray(mat2diagh(W, skewh=True, tracefree=True))
    stacked = np.stack([d.real, d.imag])
    out = native.thomas_batch(fac.w, fac.binv, fac.u, stacked.copy())
    from quflow_tpu.ops.tridiag import solve_factored

    ref = np.asarray(solve_factored(fac, d))
    np.testing.assert_allclose(out[0] + 1j * out[1], ref, atol=1e-11)
