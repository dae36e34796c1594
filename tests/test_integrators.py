"""Integrator tests: regression against the reference-run oracle trajectory,
cross-method consistency (isomp vs rk4, fixed-point vs quasi-Newton), and the
conservation laws that define the isospectral scheme (Casimirs/energy)."""

import numpy as np
import pytest

import quflow_tpu as qf


@pytest.fixture(scope="module")
def oracle():
    return np.load("tests/data/oracle.npz")


def _ref_traj(oracle):
    W0 = oracle["isomp_W0"]
    Wfinal = oracle["isomp_Wfinal"]
    stepsize = float(oracle["isomp_stepsize"])
    steps = int(oracle["isomp_steps"])
    return W0, Wfinal, stepsize, steps


@pytest.mark.parametrize("N", [5, 16])
def test_compare_isomp_rk4(N):
    rng = np.random.RandomState(42)
    omega0 = rng.randn(10)
    W0 = qf.shr2mat(omega0, N=N)
    stepsize = 0.02
    dt = stepsize * qf.hbar(N)
    steps = 500
    Wrk4 = qf.integrators.rk4(W0.copy(), dt, steps)
    Wisomp = qf.integrators.isomp(W0.copy(), dt, steps)
    np.testing.assert_allclose(Wrk4, Wisomp, atol=1e-2, rtol=0)


@pytest.mark.parametrize("use_compsum", [False, True])
@pytest.mark.parametrize("tol", ["auto", 1e-10])
def test_isomp_against_ref(oracle, use_compsum, tol):
    W0, Wfinal, stepsize, steps = _ref_traj(oracle)
    dt = qf.hbar(W0.shape[-1]) * stepsize
    W = qf.integrators.isomp(W0.copy(), dt, steps, compsum=use_compsum, tol=tol)
    np.testing.assert_allclose(W, Wfinal, rtol=0, atol=1e-7)


@pytest.mark.parametrize("tol", ["auto", 1e-10])
def test_isomp_quasinewton_against_ref(oracle, tol):
    W0, Wfinal, stepsize, steps = _ref_traj(oracle)
    dt = qf.hbar(W0.shape[-1]) * stepsize
    W = qf.integrators.isomp_quasinewton(W0.copy(), dt, steps, tol=tol)
    np.testing.assert_allclose(W, Wfinal, rtol=0, atol=1e-7)


def test_isomp_simple_short(oracle):
    """Explicit isospectral variant agrees with isomp over a short horizon."""
    W0, _, stepsize, _ = _ref_traj(oracle)
    dt = qf.hbar(16) * stepsize
    Ws = qf.isomp_simple(W0.copy(), dt, 50)
    Wf = qf.integrators.isomp(W0.copy(), dt, 50, tol=1e-12, maxit=20)
    np.testing.assert_allclose(Ws, Wf, atol=1e-2)


def test_isomp_conservation(oracle):
    """Casimirs tr(W^k) and energy conserved over 1000 steps (the defining
    property of the scheme; reference README.md:73-76)."""
    W0, _, stepsize, _ = _ref_traj(oracle)
    N = 16
    dt = qf.hbar(N) * stepsize

    def casimirs(W):
        return np.array([np.trace(np.linalg.matrix_power(W, k)).imag for k in (2, 3, 4)])

    def energy(W):
        P = np.asarray(qf.solve_poisson(W, skewh=True))
        return -float(qf.inner_L2(W, P)) / 2.0

    c0, e0 = casimirs(W0), energy(W0)
    W = qf.integrators.isomp(W0.copy(), dt, 1000, tol=1e-12, maxit=20, compsum=True)
    c1, e1 = casimirs(W), energy(W)
    np.testing.assert_allclose(c1, c0, rtol=1e-10, atol=1e-11)
    # energy is only near-conserved (bounded oscillation, not exact)
    assert abs(e1 - e0) < 1e-7


def test_isomp_callback(oracle):
    """Per-step callback receives (W, dW) with W+dW == next state."""
    W0, _, stepsize, _ = _ref_traj(oracle)
    dt = qf.hbar(16) * stepsize
    seen = []

    def cb(W, dW):
        seen.append((np.asarray(W).copy(), np.asarray(dW).copy()))

    W = qf.integrators.isomp(W0.copy(), dt, 5, callback=cb)
    assert len(seen) == 5
    np.testing.assert_allclose(seen[0][0], W0, atol=1e-14)
    # W_{k+1} = W_k + dW_k for consecutive callbacks
    np.testing.assert_allclose(
        seen[1][0], seen[0][0] + seen[0][1], atol=1e-13
    )


def test_isomp_stats(oracle):
    W0, _, stepsize, _ = _ref_traj(oracle)
    dt = qf.hbar(16) * stepsize
    stats = {}
    qf.integrators.isomp(W0.copy(), dt, 20, stats=stats)
    assert stats["iterations"] >= 1.0
    assert "number_of_maxit" in stats
    assert "tol_auto" in stats


def test_isomp_forcing(oracle):
    """Forcing hook: constant small forcing changes the trajectory in the
    expected direction (W' = ... + F)."""
    W0, _, stepsize, _ = _ref_traj(oracle)
    N = 16
    dt = qf.hbar(N) * stepsize
    F = qf.shr2mat(np.array([0, 0, 0.1, 0]), N=N)
    Fj = np.asarray(F)

    def forcing(P, W):
        return Fj

    Wf = qf.integrators.isomp(W0.copy(), dt, 100, forcing=forcing, tol=1e-12)
    Wn = qf.integrators.isomp(W0.copy(), dt, 100, tol=1e-12)
    diff = np.asarray(Wf) - np.asarray(Wn)
    expected = 100 * dt * np.asarray(Fj)
    assert np.abs(diff - expected).max() < 0.3 * np.abs(expected).max()


def test_isomp_strang_splitting(oracle):
    """Strang hook applied before/after each step: with the identity map the
    trajectory is unchanged; with a damping map it contracts."""
    W0, _, stepsize, _ = _ref_traj(oracle)
    dt = qf.hbar(16) * stepsize

    def ident(h, W):
        return W

    W1 = qf.integrators.isomp(W0.copy(), dt, 20, strang_splitting=ident)
    W2 = qf.integrators.isomp(W0.copy(), dt, 20)
    np.testing.assert_allclose(W1, W2, atol=1e-13)

    def damp(h, W):
        return W * (1.0 - 0.01 * h)

    W3 = qf.integrators.isomp(W0.copy(), dt, 20, strang_splitting=damp)
    assert float(qf.norm_L2(W3)) < float(qf.norm_L2(W2))


def test_isomp_batched(oracle):
    """Stacked multicomponent states step consistently: with the reference
    hamiltonian semantics (reduce='first'), component 0 follows the same
    trajectory as an unstacked solve, and component 1 is advected by the
    same P."""
    W0, _, stepsize, _ = _ref_traj(oracle)
    dt = qf.hbar(16) * stepsize
    Wstack = np.stack([W0, 0.5 * W0])
    Ws = qf.integrators.isomp(Wstack.copy(), dt, 20, tol=1e-12)
    Wsingle = qf.integrators.isomp(W0.copy(), dt, 20, tol=1e-12)
    np.testing.assert_allclose(Ws[0], Wsingle, atol=1e-9)


def test_estimate_stepsize(oracle):
    W0 = oracle["isomp_W0"]
    h = qf.estimate_stepsize(W0)
    assert 0 < h < 10


def test_euler_heun_orders(oracle):
    """Heun error << Euler error vs a tight rk4 trajectory."""
    W0, _, stepsize, _ = _ref_traj(oracle)
    dt = qf.hbar(16) * stepsize
    ref = qf.integrators.rk4(W0.copy(), dt / 4, 400)
    e1 = np.abs(qf.integrators.euler(W0.copy(), dt, 100) - ref).max()
    e2 = np.abs(qf.integrators.heun(W0.copy(), dt, 100) - ref).max()
    assert e2 < e1 / 3
