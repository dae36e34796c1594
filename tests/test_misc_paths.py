"""Coverage for less-traveled paths: dispatchers with complex coefficients,
erk forcing, combined strang+forcing, cluster script generation, non-skewh
integrator branch."""

import os

import numpy as np
import pytest

import quflow_tpu as qf
from quflow_tpu import analysis


def test_as_fun_shc_and_resample():
    rng = np.random.RandomState(0)
    omc = qf.shr2shc(rng.randn(8**2))
    f = qf.as_fun(omc, berezin=False)
    assert f.shape == (8, 15)
    f32 = qf.as_fun(omc, N=32, berezin=False)
    assert f32.shape == (32, 63)
    # non-skewh complex matrix -> shc synthesis branch
    W = qf.shc2mat(omc, N=8)
    fm = qf.as_fun(W, berezin=False)
    np.testing.assert_allclose(fm, f, atol=1e-10)


def test_erk_with_forcing():
    import jax.numpy as jnp

    W0 = qf.shr2mat(analysis.random_shr(lmax=5, seed=1), N=12)
    F = jnp.asarray(qf.shr2mat(np.array([0, 0, 0.05, 0]), N=12))

    def forcing(P, W):
        return F

    dt = 0.1 * qf.hbar(12)
    Wf = qf.integrators.euler(W0.copy(), dt, 50, forcing=forcing)
    Wn = qf.integrators.euler(W0.copy(), dt, 50)
    diff = np.asarray(Wf) - np.asarray(Wn)
    expected = 50 * dt * np.asarray(F)
    assert np.abs(diff - expected).max() < 0.2 * np.abs(expected).max()


def test_isomp_strang_plus_forcing():
    import jax.numpy as jnp

    W0 = qf.shr2mat(analysis.random_shr(lmax=5, seed=2), N=12)
    F = jnp.asarray(qf.shr2mat(np.array([0, 0.02, 0, 0]), N=12))

    def forcing(P, W):
        return F

    def damp(h, W):
        return W * (1.0 - 0.005 * h)

    dt = 0.1 * qf.hbar(12)
    W = qf.isomp(W0.copy(), dt, 20, forcing=forcing, strang_splitting=damp)
    assert np.isfinite(np.asarray(W)).all()
    assert np.abs(np.asarray(W) - W0).max() > 0


def test_isomp_nonskewh_branch():
    """Generic (non-skew-Hermitian) commutator branch of isomp."""
    rng = np.random.RandomState(3)
    lmax = 6
    omc = rng.randn(lmax**2) + 1j * rng.randn(lmax**2)
    omc[0] = 0
    W0 = qf.shc2mat(omc, N=16)
    dt = 0.05 * qf.hbar(16)
    W = qf.isomp(W0.copy(), dt, 10, skewh=False, tol=1e-12)
    # spectrum still conserved (isospectral for any matrix)
    e0 = np.sort_complex(np.linalg.eigvals(W0))
    e1 = np.sort_complex(np.linalg.eigvals(np.asarray(W)))
    np.testing.assert_allclose(e1, e0, atol=1e-7)


def test_cluster_submit_template(tmpdir):
    from quflow_tpu.cluster import _SUBMIT_TEMPLATE

    content = _SUBMIT_TEMPLATE.format(
        account="proj1", partition="main", cores=8, walltime="1-00:00:00",
        simname="mysim", constraint="#SBATCH -C ZEN4", runfile="run.py",
    )
    assert "#SBATCH -N 1" in content and "sbatch" not in content
    assert "proj1" in content and "ZEN4" in content


def test_qutype_shc_storage(tmpdir):
    from quflow_tpu.sim import QuSimulation

    rng = np.random.RandomState(4)
    W = rng.randn(12, 12) + 1j * rng.randn(12, 12)
    W -= W.conj().T
    sim = QuSimulation(
        str(tmpdir.join("s.hdf5")), overwrite=True,
        qutypes={"shc": None}, state=W,
    )
    sim(W=W, delta_time=0.1)
    shc = sim["shc", -1]
    np.testing.assert_allclose(shc, qf.mat2shc(W), atol=1e-12)


def test_reference_top_level_export_surface():
    """Every name the reference exports from ``quflow`` (its __init__.py
    star-imports plus named imports) resolves on ``quflow_tpu`` too, so a
    reference user can switch by changing the import line."""
    names = [
        # integrators/__init__.py star-export (reference __init__.py:6)
        "isomp", "isomp_simple", "isomp_quasinewton", "isomp_fixedpoint",
        "commutator", "commutator_generic", "commutator_skewherm",
        "euler", "heun", "rk4", "magmp", "magmp_fixedpoint",
        # named physics/geometry/analysis exports (__init__.py:10-16)
        "scale_decomposition", "inner_L2", "norm_L2", "norm_Linf", "norm_L1",
        "inner_H1", "inner_Hm1", "energy_euler", "enstrophy",
        # simulation star-export helpers
        "solve", "QuSimulation", "create_runfile", "in_notebook",
        # submodule aliases
        "laplacian", "analysis", "integrators", "geometry", "dynamics",
        "physics", "utils", "transforms", "io", "graphics",
    ]
    missing = [n for n in names if not hasattr(qf, n)]
    assert not missing, missing


def test_reduce_callable_policies():
    """solve_poisson accepts the reference's callable reduce policies
    (cpu.py:672-699) as aliases for the string modes."""
    from quflow_tpu.ops.laplacian import select_first, select_sum

    rng = np.random.RandomState(7)
    W = rng.randn(3, 16, 16) + 1j * rng.randn(3, 16, 16)
    W = W - np.conj(np.swapaxes(W, -1, -2))
    np.testing.assert_array_equal(
        np.asarray(qf.solve_poisson(W, reduce=select_first)),
        np.asarray(qf.solve_poisson(W, reduce="first")),
    )
    np.testing.assert_array_equal(
        np.asarray(qf.solve_poisson(W, reduce=select_sum)),
        np.asarray(qf.solve_poisson(W, reduce="sum")),
    )
    # arbitrary callable: reference semantics reduce(W) -> (N, N)
    np.testing.assert_allclose(
        np.asarray(qf.solve_poisson(W, reduce=lambda x: x[2]))[0],
        np.asarray(qf.solve_poisson(W[2], skewh=True)),
        atol=1e-12,
    )


def test_solve_poisson_callable_reduce_traceable():
    """A custom reduce policy must stay jit-traceable and device-resident
    (no host np.asarray: tracers raise and complex device->host transfers
    are unimplemented on this TPU runtime)."""
    import jax
    import jax.numpy as jnp

    N = 12
    rng = np.random.RandomState(3)
    W = rng.randn(3, N, N) + 1j * rng.randn(3, N, N)
    W = W - np.conj(np.swapaxes(W, -1, -2))

    @jax.jit
    def f(Ws):
        return qf.solve_poisson(Ws, reduce=lambda x: x[2], skewh=True)

    got = np.asarray(f(jnp.asarray(W)))[0]
    expect = np.asarray(qf.solve_poisson(W[2]))
    np.testing.assert_allclose(got, expect, atol=1e-12)
