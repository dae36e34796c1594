"""Pallas solve kernel: interpret-mode equivalence with the associative-scan
solver (device validation happens in the TPU bench)."""

import numpy as np
import pytest

import quflow_tpu as qf
from quflow_tpu.ops.laplacian import _factors
from quflow_tpu.ops.diagpack import mat2diagh
from quflow_tpu.ops.tridiag import solve_factored
from quflow_tpu.ops.pallas_solve import solve_factored_pallas


@pytest.mark.parametrize("N", [16, 33])
def test_pallas_thomas_equivalence(N):
    rng = np.random.RandomState(N)
    W = rng.randn(N, N) + 1j * rng.randn(N, N)
    W = W - W.conj().T
    fac = _factors(N, True, "poisson", ())
    d = np.asarray(mat2diagh(W, skewh=True, tracefree=True))
    planes = np.stack([d.real, d.imag])
    out = np.asarray(
        solve_factored_pallas(fac.w, fac.binv, fac.u, planes, tile=8, interpret=True)
    )
    ref = np.asarray(solve_factored(fac, d))
    np.testing.assert_allclose(out[0] + 1j * out[1], ref, atol=1e-11)
