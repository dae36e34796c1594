"""Magnetic midpoint integrator tests: reference-oracle parity, cross-Casimir
conservation, and model wrapper."""

import numpy as np
import pytest

import quflow_tpu as qf
from quflow_tpu.integrators import magmp, solve_mhd
from quflow_tpu.models import MHDFlow


@pytest.fixture(scope="module")
def oracle():
    return np.load("tests/data/oracle.npz")


def test_magmp_oracle(oracle):
    st = oracle["mhd_state0"].copy()
    out = magmp(st, float(oracle["mhd_dt"]), steps=20, tol=1e-12, maxit=20)
    np.testing.assert_allclose(out, oracle["mhd_state20"], atol=1e-10)


def test_solve_mhd_hamiltonian(oracle):
    st = oracle["mhd_state0"]
    P, B = solve_mhd(st)
    np.testing.assert_allclose(
        np.asarray(P), np.asarray(qf.solve_poisson(st[0], skewh=True)), atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(B), np.asarray(qf.laplace(st[1], skewh=True)), atol=1e-10
    )


def test_magmp_conservation(oracle):
    """magmp conserves the spectra of W and the cross-helicity-like Casimir
    tr(W Theta^k) structure approximately; check spectrum of state[1]
    (advected Theta -> isospectral) and energy-ish boundedness."""
    st = oracle["mhd_state0"].copy()
    dtm = float(oracle["mhd_dt"])
    e0 = np.sort(np.linalg.eigvalsh(-1j * st[1]))
    out = magmp(st.copy(), dtm, steps=100, tol=1e-12, maxit=20)
    e1 = np.sort(np.linalg.eigvalsh(-1j * out[1]))
    np.testing.assert_allclose(e1, e0, atol=1e-9)


def test_mhd_model():
    flow = MHDFlow(N=12)
    st = flow.random_initial(lmax=5)
    assert st.shape == (2, 12, 12)
    out = flow.step(st.copy(), 0.1 * flow.hbar, steps=3)
    assert out.shape == st.shape
    assert np.abs(out - st).max() > 0


def test_mhd_production_stepper(oracle):
    """Branch-free planes MHD stepper == magmp at fixed iteration count."""
    import jax.numpy as jnp
    from quflow_tpu.parallel.stepper import (
        build_mhd_step_fn, to_planes, from_planes,
    )

    st0 = oracle["mhd_state0"]
    dtm = float(oracle["mhd_dt"])
    ref = magmp(st0.copy(), dtm, steps=20, tol=1e-18, maxit=8, minit=8)
    fn = build_mhd_step_fn(12, dtm, steps=20, maxit=8, dtype=np.complex128)
    Sp = jnp.asarray(to_planes(st0))
    z = jnp.zeros_like(Sp)
    out, _ = fn(Sp, z)
    np.testing.assert_allclose(from_planes(np.asarray(out)), ref, atol=1e-12)
