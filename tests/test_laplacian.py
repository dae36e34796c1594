"""Laplacian / Poisson-family solver tests: manufactured spectral solutions,
skewh and generic paths, stacked-state reduce semantics, heat/viscdamp
equivalences and oracle regressions - porting the contract of the reference
tests/test_laplacian.py onto the single TPU-native backend."""

import numpy as np
import pytest

import quflow_tpu as qf


def get_random_mat(N=5, zero_trace=True, skewh=True, seed=0):
    rng = np.random.RandomState(seed)
    W = rng.randn(N, N) + 1j * rng.randn(N, N)
    if skewh:
        W -= W.conj().T
    if zero_trace:
        W -= np.eye(N) * np.trace(W) / N
    return W


def get_random_poisson_solution(N=5, skewh=True, seed=None, lmax=None, zerotrace=True):
    rng = np.random.RandomState(seed)
    if lmax is None:
        lmax = N
    lmax = min(lmax, N)
    if skewh:
        omegaP = rng.randn(lmax**2)
    else:
        omegaP = rng.randn(lmax**2) + 1.0j * rng.randn(lmax**2)
    omegaW = omegaP.copy()
    ells = qf.ind2elm(np.arange(lmax**2))[0][1:]
    omegaW[1:] *= -ells * (ells + 1)
    if zerotrace:
        omegaW[0] = 0.0
    omegaP[0] = 0.0
    sh2mat = qf.shr2mat if skewh else qf.shc2mat
    return sh2mat(omegaP, N=N), sh2mat(omegaW, N=N)


def get_smooth_mat(N):
    d = np.load("tests/data/oracle.npz")
    return qf.shr2mat(d["smooth_omegar"], N=N)


@pytest.mark.parametrize("N", [2, 33, 65, 128])
@pytest.mark.parametrize("skewh", [True, False])
def test_laplace(N, skewh):
    Pexact, Wexact = get_random_poisson_solution(N=N, skewh=skewh, seed=N)
    W = np.asarray(qf.laplace(Pexact, skewh=skewh))
    np.testing.assert_allclose(W, Wexact, atol=1e-11 * N**2)


@pytest.mark.parametrize("N", [33, 64, 101])
@pytest.mark.parametrize("skewh", [True, False])
@pytest.mark.parametrize("zerotrace", [True, False])
def test_solve_poisson(N, skewh, zerotrace):
    Pexact, Wexact = get_random_poisson_solution(
        N=N, skewh=skewh, seed=N + 1, zerotrace=zerotrace
    )
    P = np.asarray(qf.solve_poisson(Wexact, skewh=skewh))
    np.testing.assert_allclose(P, Pexact, atol=1e-14 * N**2, rtol=0)


def test_solve_poisson_autodetect():
    Pexact, Wexact = get_random_poisson_solution(N=33, skewh=True, seed=5)
    P = np.asarray(qf.solve_poisson(Wexact))  # skewh auto-detected
    np.testing.assert_allclose(P, Pexact, atol=1e-14 * 33**2, rtol=0)


def test_solve_poisson_oracle():
    d = np.load("tests/data/oracle.npz")
    P = np.asarray(qf.solve_poisson(d["isomp_W0"], skewh=True))
    np.testing.assert_allclose(P, d["poisson_P"], atol=1e-13)


@pytest.mark.parametrize("N", [33, 64, 101])
def test_solve_poisson_multistate(N):
    """Stacked states: reference reduce='first' semantics
    (reference cpu.py:672-734, tests/test_laplacian.py:211-223)."""
    W0 = get_smooth_mat(N)
    W1 = get_random_mat(N, seed=N)
    W = np.stack([W0, W1])
    Plarge = np.asarray(qf.solve_poisson(W, skewh=True))
    P0 = np.asarray(qf.solve_poisson(W0, skewh=True))
    np.testing.assert_allclose(Plarge, np.broadcast_to(P0, W.shape))


def test_solve_poisson_batched():
    """reduce='none' gives true per-state solves (the ensemble path)."""
    N = 33
    W0 = get_smooth_mat(N)
    W1 = get_random_mat(N, seed=N)
    W = np.stack([W0, W1])
    P = np.asarray(qf.solve_poisson(W, skewh=True, reduce="none"))
    np.testing.assert_allclose(P[0], np.asarray(qf.solve_poisson(W0, skewh=True)))
    np.testing.assert_allclose(P[1], np.asarray(qf.solve_poisson(W1, skewh=True)))


@pytest.mark.parametrize("N", [33, 65, 128])
@pytest.mark.parametrize("skewh", [True, False])
def test_solve_helmholtz(N, skewh, alpha=0.1):
    rng = np.random.RandomState(22)
    lmax = 16
    if skewh:
        omegaP = rng.randn(lmax**2)
    else:
        omegaP = rng.randn(lmax**2) + 1.0j * rng.randn(lmax**2)
    omegaW = omegaP.copy()
    ells = qf.ind2elm(np.arange(lmax**2))[0][1:]
    omegaW[1:] *= 1.0 + alpha * ells * (ells + 1)
    omegaW[0] = 0.0
    omegaP[0] = 0.0
    sh2mat = qf.shr2mat if skewh else qf.shc2mat
    W = sh2mat(omegaW, N=N)
    Pexact = sh2mat(omegaP, N=N)
    P = np.asarray(qf.solve_helmholtz(W, alpha=alpha, skewh=skewh))
    np.testing.assert_allclose(P, Pexact, atol=1e-12)


@pytest.mark.parametrize("N", [9, 32])
def test_solve_heat_vs_viscdamp(N):
    W0 = get_smooth_mat(N)
    Wheat = W0.copy()
    Wviscdamp = W0.copy()
    for _ in range(100):
        Wheat = np.asarray(qf.solve_heat(1e-2 * 0.1, Wheat))
        Wviscdamp = np.asarray(
            qf.solve_viscdamp(0.1, Wviscdamp, nu=1e-2, alpha=0, theta=1)
        )
    np.testing.assert_allclose(Wheat, Wviscdamp)


def test_solve_heat_oracle():
    d = np.load("tests/data/oracle.npz")
    Wh = np.asarray(qf.solve_heat(1e-3, d["smooth_W9"]))
    np.testing.assert_allclose(Wh, d["heat_W9"], atol=1e-13)


def test_solve_viscdamp_oracle():
    """100 theta-scheme steps vs the reference-run oracle
    (original golden regression: reference tests/test_laplacian.py:283-314)."""
    d = np.load("tests/data/oracle.npz")
    Wt = d["smooth_W9"].copy()
    for _ in range(100):
        Wt = np.asarray(qf.solve_viscdamp(0.1, Wt, nu=1e-2, alpha=0.6, theta=0.7))
    np.testing.assert_allclose(
        qf.mat2shr(Wt), d["viscdamp_omegatref"], atol=1e-10, rtol=0
    )


def test_solve_globalqg_oracle():
    """Parity with the reference cpu.solve_globalqg (cpu.py:829-877), which
    like all reference solves applies the trace projection to the solution."""
    d = np.load("tests/data/oracle.npz")
    P = np.asarray(qf.solve_globalqg(d["smooth_W9"], gamma=0.7, skewh=True))
    np.testing.assert_allclose(P, d["globalqg_P9"], atol=1e-12)


def test_solve_globalqg_residual():
    """Up to the reference's trace projection (which shifts the solution by
    c*I with A(I) = -gamma Z^2), the qg solve satisfies
    Delta P - (gamma/2)(Z^2 P + P Z^2) = W + c * gamma * Z^2."""
    N = 33
    gamma = 0.7
    W = get_random_mat(N, seed=2)
    P = np.asarray(qf.solve_globalqg(W, gamma=gamma, skewh=True))
    s = (N - 1) / 2
    Z = np.diag(qf.hbar(N) * np.arange(-s, s + 1))
    resid = np.asarray(qf.laplace(P, skewh=True)) - (gamma / 2) * (
        Z @ Z @ P + P @ Z @ Z
    ) - W
    # residual must lie in span{Z^2} (the trace-projection direction)
    z2 = np.diag(Z @ Z)
    r = np.diag(resid)
    c = (r @ z2) / (z2 @ z2)
    np.testing.assert_allclose(resid, np.diag(c * z2), atol=1e-10)
