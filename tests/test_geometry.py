"""Geometry tests, porting the behavioral contract of the reference
tests/test_geometry.py (norm isometry, inner products, Hoppe-Yau Laplacian
identity, so(3) algebra, generator scalings and golden spectral norms)."""

import numpy as np
import pytest

import quflow_tpu as qf


def get_random_omega_real(N=5, seed=1):
    rng = np.random.RandomState(seed)
    return rng.randn(N**2)


def get_random_omega_complex(N=5, seed=2):
    rng = np.random.RandomState(seed)
    return rng.randn(N**2) + 1j * rng.randn(N**2)


def get_random_mat(N=5, seed=3):
    rng = np.random.RandomState(seed)
    W = rng.randn(N, N) + 1j * rng.randn(N, N)
    W -= W.conj().T
    return W


@pytest.mark.parametrize("N", [5, 17])
def test_norm_L2_isometry(N):
    omega = get_random_omega_real(N)
    W = qf.shr2mat(omega, N=N)
    np.testing.assert_allclose(np.linalg.norm(omega), float(qf.norm_L2(W)))


@pytest.mark.parametrize("N", [5, 17, 64])
def test_inner_L2_real(N):
    omega1 = get_random_omega_real(N, seed=11)
    omega2 = get_random_omega_real(N, seed=12)
    W1 = qf.shr2mat(omega1, N=N)
    W2 = qf.shr2mat(omega2, N=N)
    np.testing.assert_allclose((omega1 * omega2).sum(), float(qf.inner_L2(W1, W2)))


@pytest.mark.parametrize("N", [17, 64])
def test_inner_L2_complex(N):
    omega1 = get_random_omega_complex(N, seed=21)
    omega2 = get_random_omega_complex(N, seed=22)
    W1 = qf.shc2mat(omega1, N=N)
    W2 = qf.shc2mat(omega2, N=N)
    np.testing.assert_allclose(
        (omega1 * omega2.conj()).sum().real, float(qf.inner_L2(W1, W2))
    )


@pytest.mark.parametrize("N", [17, 64])
def test_inner_vs_norm_L2(N):
    W = get_random_mat(N)
    np.testing.assert_allclose(
        float(qf.norm_L2(W)), np.sqrt(float(qf.inner_L2(W, W)))
    )


@pytest.mark.parametrize("N", [17, 64])
def test_norm_Linf(N):
    W = get_random_mat(N)
    np.testing.assert_allclose(float(qf.norm_Linf(W)), np.linalg.norm(W, ord=2))


@pytest.mark.parametrize("N", [15, 16, 64])
def test_hoppe_yau_laplacian(N):
    """Delta_N P == sum_k (1/hbar^2) [X_k, [X_k, P]] - validates the packed
    Laplacian coefficients against the definition."""
    P = get_random_mat(N)
    X = qf.cartesian_generators(N)
    Wtilde = sum(np.asarray(qf.bracket(Xk, qf.bracket(Xk, P))) for Xk in X)
    W = np.asarray(qf.laplace(P, skewh=True))
    np.testing.assert_allclose(Wtilde, W, atol=1e-10 * N)


@pytest.mark.parametrize("N", [15, 16, 64, 128])
def test_so3_generators(N):
    S1, S2, S3 = qf.so3_generators(N)
    np.testing.assert_allclose(S1 @ S2 - S2 @ S1, S3, atol=1e-13)
    np.testing.assert_allclose(S2 @ S3 - S3 @ S2, S1, atol=1e-13)
    np.testing.assert_allclose(S3 @ S1 - S1 @ S3, S2, atol=1e-13)


@pytest.mark.parametrize("N", [15, 16, 64, 128])
def test_cartesian_generators(N):
    X1, X2, X3 = qf.cartesian_generators(N)
    np.testing.assert_allclose(np.asarray(qf.bracket(X1, X2)), X3, atol=1e-13)
    np.testing.assert_allclose(np.asarray(qf.bracket(X2, X3)), X1, atol=1e-13)
    np.testing.assert_allclose(np.asarray(qf.bracket(X3, X1)), X2, atol=1e-13)


@pytest.mark.parametrize("N", [15, 16, 64])
def test_cartesian_generators_scale(N):
    X1, X2, X3 = qf.cartesian_generators(N)
    T1m1 = qf.shr2mat(np.array([0, 1, 0, 0], dtype=np.float64), N=N)
    T10 = qf.shr2mat(np.array([0, 0, 1, 0], dtype=np.float64), N=N)
    T1p1 = qf.shr2mat(np.array([0, 0, 0, 1], dtype=np.float64), N=N)
    scale = np.sqrt(3)
    np.testing.assert_allclose(scale * X1, T1p1, atol=1e-14)
    np.testing.assert_allclose(scale * X2, T1m1, atol=1e-14)
    np.testing.assert_allclose(scale * X3, T10, atol=1e-14)


@pytest.mark.parametrize(
    "N, ref", [(64, 0.98449518), (45, 0.97801929), (128, 0.99221778)]
)
def test_cartesian_generators_spectrum(N, ref):
    """Golden spectral norms from the reference test suite
    (tests/test_geometry.py:131-135)."""
    for Xi in qf.cartesian_generators(N):
        np.testing.assert_allclose(float(qf.norm_Linf(Xi)), ref, atol=1e-8)


def test_rotate_oracle():
    d = np.load("tests/data/oracle.npz")
    W9 = d["smooth_W9"]
    out = np.asarray(qf.rotate(d["rotate_xi"], W9))
    np.testing.assert_allclose(out, d["rotate_W9"], atol=1e-12)


def test_integral_trace():
    W = get_random_mat(8)
    np.testing.assert_allclose(
        float(qf.integral(W)), np.real(-1j * np.trace(W) / 8)
    )
