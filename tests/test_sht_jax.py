"""Device-side (jitted) SHT: parity with the host Gauss-Legendre transform."""

import numpy as np
import pytest
import jax.numpy as jnp

import quflow_tpu as qf
from quflow_tpu.ops.sht import shsynthesis, shanalysis
from quflow_tpu.ops.sht_jax import build_synthesis_fn, build_analysis_fn


@pytest.mark.parametrize("L", [16, 33, 64])
def test_synthesis_parity(L):
    rng = np.random.RandomState(L)
    flm = qf.shr2shc(rng.randn(L * L))
    f_host = shsynthesis(flm, L, reality=True)
    syn = build_synthesis_fn(L)
    f_dev = np.asarray(syn(jnp.asarray(np.stack([flm.real, flm.imag]))))
    np.testing.assert_allclose(f_dev[0], f_host, atol=1e-12)
    assert np.abs(f_dev[1]).max() == 0.0


@pytest.mark.parametrize("L", [16, 33])
def test_analysis_parity(L):
    rng = np.random.RandomState(L + 1)
    flm = qf.shr2shc(rng.randn(L * L))
    f = shsynthesis(flm, L, reality=True)
    ana = build_analysis_fn(L)
    out = np.asarray(ana(jnp.asarray(np.stack([f, np.zeros_like(f)]))))
    ref = shanalysis(f, L, reality=True)
    np.testing.assert_allclose(out[0] + 1j * out[1], ref, atol=1e-12)
    np.testing.assert_allclose(out[0] + 1j * out[1], flm, atol=1e-11)
