"""Quantization basis + transform tests, including exact parity with the
reference implementation via oracle fixtures (tests/data/make_oracle.py)."""

import numpy as np
import pytest

import quflow_tpu as qf


@pytest.fixture(scope="module")
def oracle():
    return np.load("tests/data/oracle.npz")


@pytest.mark.parametrize("N", [33, 65])
def test_basis_break_index(N):
    bb = np.hstack((0, (np.arange(N, 0, -1) ** 2).cumsum()))
    for m in range(N + 1):
        assert qf.basis_break_index(m, N) == bb[m]
    np.testing.assert_equal(qf.basis_break_index(np.arange(N + 1), N), bb)


def test_basis_parity_with_reference(oracle):
    """Exact basis parity (incl. sign conventions) with the reference."""
    basis = qf.compute_basis(17)
    np.testing.assert_allclose(basis, oracle["basis_17"], atol=1e-12)


def test_get_basis_caching():
    b1 = qf.get_basis(9)
    b2 = qf.get_basis(9)
    assert b1 is b2


def test_shr2mat_parity(oracle):
    W = qf.shr2mat(oracle["omega17"], N=17)
    np.testing.assert_allclose(W, oracle["shr2mat_W17"], atol=1e-13)


def test_mat2shr_parity(oracle):
    omega = qf.mat2shr(oracle["shr2mat_W17"])
    np.testing.assert_allclose(omega, oracle["mat2shr_back17"], atol=1e-13)


def test_shc2mat_parity(oracle):
    W = qf.shc2mat(oracle["omegac10"], N=10)
    np.testing.assert_allclose(W, oracle["shc2mat_W10"], atol=1e-13)


@pytest.mark.parametrize("N", [5, 17])
def test_roundtrip_shr(N):
    rng = np.random.RandomState(N)
    omega = rng.randn(N**2)
    W = qf.shr2mat(omega)
    np.testing.assert_allclose(qf.mat2shr(W), omega, atol=1e-12)


@pytest.mark.parametrize("N", [5, 17])
def test_roundtrip_shc(N):
    rng = np.random.RandomState(N)
    omega = rng.randn(N**2) + 1j * rng.randn(N**2)
    W = qf.shc2mat(omega)
    np.testing.assert_allclose(qf.mat2shc(W), omega, atol=1e-12)


def test_shr2mat_equals_shc2mat_via_shr2shc():
    """shr2mat == shc2mat o shr2shc (reference test_quantization.py:39-50)."""
    from quflow_tpu.transforms import shr2shc

    rng = np.random.RandomState(4)
    omega = rng.randn(17**2)
    W1 = qf.shr2mat(omega, N=17)
    W2 = qf.shc2mat(shr2shc(omega), N=17)
    np.testing.assert_allclose(W1, W2, atol=1e-13)


@pytest.mark.parametrize("N", [33, 64])
def test_shr2mat_short_omega(N):
    """Band-limited omega shorter than N^2 equals the zero-padded call."""
    rng = np.random.RandomState(10)
    omega = rng.randn(100)
    W = qf.shr2mat(omega, N=N)
    omega2 = np.hstack((omega, np.zeros(N**2 - 100)))
    W2 = qf.shr2mat(omega2, N=N)
    np.testing.assert_allclose(W, W2)


@pytest.mark.parametrize("N", [33, 64])
def test_mat2shr_short_omega(N):
    rng = np.random.RandomState(11)
    omega = rng.randn(100)
    W = qf.shr2mat(omega, N=N)
    basis = qf.get_basis(N)
    omega2 = omega.copy()
    qf.mat2shr_(W, basis, omega2)
    np.testing.assert_allclose(omega, omega2, atol=1e-12)


@pytest.mark.parametrize("m", [0, -4, 4, -9, 9])
@pytest.mark.parametrize("el", [9, 15])
@pytest.mark.parametrize("N", [16, 19])
def test_elmr2mat(el, m, N):
    i = qf.elm2ind(el, m)
    omegar = np.zeros(N**2)
    omegar[i] = 1.0
    Tref = qf.shr2mat(omegar, N=N)
    T = qf.elmr2mat(el, m, N)
    np.testing.assert_allclose(T.toarray(), Tref, atol=1e-14)
    np.testing.assert_allclose(float(qf.norm_L2(T.toarray())), 1.0)
    assert T.el == el


@pytest.mark.parametrize("m", [0, -4, 4, -9, 9])
@pytest.mark.parametrize("el", [9, 15])
@pytest.mark.parametrize("N", [16, 19])
def test_elmc2mat(el, m, N):
    i = qf.elm2ind(el, m)
    omegac = np.zeros(N**2, dtype=np.complex128)
    omegac[i] = 1.0
    Tref = qf.shc2mat(omegac, N=N)
    T = qf.elmc2mat(el, m, N)
    np.testing.assert_allclose(T.toarray(), Tref, atol=1e-14)
    np.testing.assert_allclose(float(qf.norm_L2(T.toarray())), 1.0)


def test_streamed_transforms_match_full():
    """Band-limited streamed (truncated per-m eigh) path == full-basis path."""
    from quflow_tpu.quantization.transforms import (
        shr2mat_streamed, mat2shr_streamed,
    )

    N = 128
    rng = np.random.RandomState(0)
    omega = rng.randn(9**2)
    W_full = qf.shr2mat(omega, N=N)
    np.testing.assert_allclose(shr2mat_streamed(omega, N), W_full, atol=1e-11)
    np.testing.assert_allclose(
        mat2shr_streamed(W_full, 8), qf.mat2shr(W_full, elmax=8), atol=1e-11
    )


def test_streamed_scales_past_basis_memory():
    """N=1536 > threshold: shr2mat works band-limited without materializing
    the ~9 GB full basis (auto-streamed), and round-trips exactly."""
    omega = qf.analysis.random_shr(lmax=8, seed=3)
    W = qf.shr2mat(omega, N=1536)
    from quflow_tpu.quantization.basis import _basis_cache

    assert (1536, np.dtype(np.float64)) not in _basis_cache
    om = qf.mat2shr(W, elmax=8)
    np.testing.assert_allclose(om, omega, atol=1e-12)
