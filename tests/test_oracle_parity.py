"""Additional behavioral parity pins against the reference oracle:
explicit integrators, simplified isospectral method, sectional curvature."""

import numpy as np
import pytest

import quflow_tpu as qf
from quflow_tpu import physics


@pytest.fixture(scope="module")
def oracle():
    return np.load("tests/data/oracle.npz")


@pytest.mark.parametrize("method", ["euler", "heun", "rk4"])
def test_erk_parity(oracle, method):
    W0 = oracle["erk_W0"]
    dt = float(oracle["erk_dt"])
    fn = getattr(qf.integrators, method)
    out = fn(W0.copy(), dt, steps=50)
    np.testing.assert_allclose(out, oracle[f"{method}_50"], atol=1e-11)


def test_isomp_simple_parity(oracle):
    W0 = oracle["erk_W0"]
    dt = float(oracle["erk_dt"])
    out = qf.isomp_simple(W0.copy(), dt, steps=50)
    np.testing.assert_allclose(out, oracle["isomp_simple_50"], atol=1e-11)


def test_sectional_curvature_parity(oracle):
    K = float(physics.sectional_curvature(oracle["curv_F"], oracle["curv_G"]))
    np.testing.assert_allclose(K, float(oracle["curv_K"]), rtol=1e-10)
