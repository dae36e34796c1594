"""Physics functionals, spectral analysis, dynamics helpers."""

import numpy as np
import pytest

import quflow_tpu as qf
from quflow_tpu import physics, analysis, dynamics


def smooth_W(N=17, lmax=8, seed=3):
    omega = analysis.random_shr(lmax=lmax, seed=seed)
    return qf.shr2mat(omega, N=N), omega


def test_energy_enstrophy_vs_spectra():
    """Parseval: sum of spectra equals the quadratic functionals."""
    W, omega = smooth_W()
    el, espec = analysis.energy_spectrum(omega)
    el, zspec = analysis.enstrophy_spectrum(omega)
    E = float(physics.energy_euler(W))
    Z = float(physics.enstrophy(W))
    np.testing.assert_allclose(espec.sum() / 2, E, rtol=1e-10)
    np.testing.assert_allclose(zspec.sum() / 2, Z, rtol=1e-10)


def test_inner_H1_Hm1():
    W, _ = smooth_W()
    P = np.asarray(qf.solve_poisson(W, skewh=True))
    np.testing.assert_allclose(
        float(physics.inner_Hm1(W, W)), float(-qf.inner_L2(W, P)), rtol=1e-12
    )
    np.testing.assert_allclose(
        float(physics.norm_H1(P)) ** 2, float(-qf.inner_L2(P, W)), rtol=1e-10
    )


def test_energy_conserved_enstrophy_exact():
    W, _ = smooth_W(N=16)
    dt = 0.1 * qf.hbar(16)
    W1 = qf.isomp(W.copy(), dt, 200, tol=1e-12, maxit=20)
    np.testing.assert_allclose(
        float(physics.enstrophy(W1)), float(physics.enstrophy(W)), rtol=1e-12
    )
    np.testing.assert_allclose(
        float(physics.energy_euler(W1)), float(physics.energy_euler(W)), rtol=1e-6
    )


def test_sectional_curvature_symmetry():
    """K(F,G) == K(G,F) (the formula is symmetric under exchange)."""
    rng = np.random.RandomState(5)
    N = 12

    def rsk():
        A = rng.randn(N, N) + 1j * rng.randn(N, N)
        A -= A.conj().T
        return A - np.eye(N) * np.trace(A) / N

    F, G = rsk(), rsk()
    np.testing.assert_allclose(
        float(physics.sectional_curvature(F, G)),
        float(physics.sectional_curvature(G, F)),
        rtol=1e-8,
    )


def test_scale_decomposition():
    W, _ = smooth_W()
    Ws, Wr = analysis.scale_decomposition(W)
    np.testing.assert_allclose(Ws + Wr, W, atol=1e-12)
    # Ws commutes with P (it is diagonal in P's eigenframe)
    P = np.asarray(qf.solve_poisson(W, skewh=True))
    comm = Ws @ P - P @ Ws
    assert np.abs(comm).max() < 1e-10


def test_random_shr_properties():
    omega = analysis.random_shr(lmax=31, s=1.0, gamma=0.0, seed=1)
    np.testing.assert_allclose(np.linalg.norm(omega), 1.0)
    assert np.all(omega[1:4] == 0.0)
    omega2 = analysis.random_shr(lmax=31, s=1.0, gamma=0.5, seed=1)
    np.testing.assert_allclose(analysis.gamma_ratio(omega2), 0.5, rtol=1e-10)


def test_project_el_oracle():
    """The reference's project_el omits the 1/||col||^2 = 1/N normalization
    (reference dynamics.py:54-80), so its output is N x the true orthogonal
    projection (and its 'complement' is not a complement).  quflow_tpu
    implements the correct projection; parity with the reference holds up to
    that documented factor N."""
    d = np.load("tests/data/oracle.npz")
    N = 17
    W = qf.shr2mat(d["omega17"], N=N)
    np.testing.assert_allclose(
        N * dynamics.project_el(W, el=5), d["project_el_5"], atol=1e-11
    )


def test_project_el_is_projection():
    W, _ = smooth_W()
    P5 = dynamics.project_el(W, el=5)
    P5b = dynamics.project_el(P5, el=5)
    np.testing.assert_allclose(P5, P5b, atol=1e-12)
    # complement + projection == identity
    np.testing.assert_allclose(
        dynamics.project_el(W, el=5, complement=True) + P5, W, atol=1e-12
    )
    # eigenspace: laplace(P5) == -el(el+1) P5
    np.testing.assert_allclose(
        np.asarray(qf.laplace(P5, skewh=True)), -30.0 * P5, atol=1e-9
    )


def test_north_blob_oracle():
    d = np.load("tests/data/oracle.npz")
    np.testing.assert_allclose(
        dynamics.north_blob(9, sigma=0.2), d["north_blob_9"], atol=1e-13
    )


def test_blob_rotation_invariants():
    Wn = dynamics.north_blob(16, sigma=0.1)
    Wb = dynamics.blob(16, pos=np.array([1.0, 1.0, 0.0]), sigma=0.1)
    # rotation preserves spectrum and L2 norm
    np.testing.assert_allclose(
        np.sort(np.linalg.eigvalsh(-1j * Wb)),
        np.sort(np.linalg.eigvalsh(-1j * Wn)),
        atol=1e-12,
    )


def test_dynamics_legacy_solve():
    W, _ = smooth_W(N=12, lmax=5)
    calls = []

    def cb(W, inner_time=None, inner_steps=None):
        calls.append(inner_steps)

    dynamics.solve(
        W.copy(), stepsize=0.1, steps=20, inner_steps=10,
        callback=cb, progress_bar=False,
    )
    assert calls == [10, 10]
