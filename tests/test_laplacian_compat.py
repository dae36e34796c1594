"""Reference-import-path compat package: quflow_tpu.laplacian mirrors the
reference's ``quflow.laplacian`` backend modules (reference
laplacian/{__init__,cpu,tridiagonal,direct,sparse,gpu}.py)."""

import numpy as np
import pytest

from quflow_tpu.laplacian import (
    solve_poisson,
    tridiagonal,
    cpu,
    direct,
    sparse,
    gpu,
)
from quflow_tpu.integrators.isospectral import conj_subtract_, project_skewherm


def _rand_skewh(N, seed=0, tracefree=True):
    rng = np.random.RandomState(seed)
    W = rng.randn(N, N) + 1j * rng.randn(N, N)
    W = W - W.conj().T
    if tracefree:
        W = W - np.eye(N) * np.trace(W) / N
    return W


def _ref_tridiagonal_laplacian(N, bc=False):
    """Reference formula, loop form (laplacian/tridiagonal.py:113-133)."""
    lap = np.zeros((N // 2 + 1, 2, N))
    i_full = np.arange(N)
    for m in range(N // 2 + 1):
        i = i_full[: N - m]
        lap[m, 0, 0 : N - m] = -((N - 1) * (2 * i + 1 + m) - 2 * i * (i + m))
        i = i_full[1 : N - m]
        lap[m, 1, 0 : N - m - 1] = np.sqrt(((i + m) * (N - i - m)) * (i * (N - i)))
        i = i_full[:m]
        lap[m, 0, N - m :] = -((N - 1) * (2 * i + 1 + N - m) - 2 * i * (i + N - m))
        i = i_full[1:m]
        lap[m, 1, N - m : -1] = np.sqrt(((i + N - m) * (m - i)) * (i * (N - i)))
    if bc:
        lap[0, 0, 0] -= 0.5
    return lap


@pytest.mark.parametrize("N", [8, 9, 17, 32])
@pytest.mark.parametrize("bc", [False, True])
def test_compute_tridiagonal_laplacian_matches_reference_formula(N, bc):
    got = tridiagonal.compute_tridiagonal_laplacian(N, bc=bc)
    np.testing.assert_allclose(got, _ref_tridiagonal_laplacian(N, bc=bc))


@pytest.mark.parametrize("N", [16, 17])
@pytest.mark.parametrize("tracefree", [True, False])
def test_solve_tridiagonal_matches_unified_backend(N, tracefree):
    # nonzero trace exercises the rhs trace subtraction (the reference's
    # solvers call mat2diagh with its tracefree default)
    W = _rand_skewh(N, seed=1, tracefree=tracefree)
    lap = tridiagonal.compute_tridiagonal_laplacian(N, bc=True)
    P_compat = tridiagonal.solve_tridiagonal(lap, W)
    P_unified = np.asarray(solve_poisson(W))
    np.testing.assert_allclose(P_compat, P_unified, atol=1e-12)


def test_dot_tridiagonal_inverts_solve():
    N = 16
    W = _rand_skewh(N, seed=2)
    lap_bc = tridiagonal.compute_tridiagonal_laplacian(N, bc=True)
    lap = tridiagonal.compute_tridiagonal_laplacian(N, bc=False)
    P = tridiagonal.solve_tridiagonal(lap_bc, W)
    np.testing.assert_allclose(tridiagonal.dot_tridiagonal(lap, P), W, atol=1e-12)


def test_dot_tridiagonal_subtracts_trace():
    # the reference's dot_tridiagonal packs P with mat2diagh's tracefree
    # default (reference laplacian/tridiagonal.py:155), so a nonzero trace
    # must not change the result
    N = 16
    P = _rand_skewh(N, seed=4, tracefree=True)
    lap = tridiagonal.compute_tridiagonal_laplacian(N, bc=False)
    shifted = P + (0.7j / N) * np.eye(N)  # skew-Hermitian, trace 0.7j
    np.testing.assert_allclose(
        tridiagonal.dot_tridiagonal(lap, shifted),
        tridiagonal.dot_tridiagonal(lap, P),
        atol=1e-12,
    )


def test_mat2diagh_roundtrip_host_numpy():
    N = 12
    W = _rand_skewh(N, seed=3)
    d = tridiagonal.mat2diagh(W)
    assert isinstance(d, np.ndarray) and d.shape == (N // 2 + 1, N)
    np.testing.assert_allclose(tridiagonal.diagh2mat(d), W, atol=1e-14)


def test_backend_aliases_all_resolve_to_unified():
    W = _rand_skewh(8, seed=4)
    ref = np.asarray(solve_poisson(W))
    for backend in (cpu, direct, sparse, gpu):
        np.testing.assert_array_equal(np.asarray(backend.solve_poisson(W)), ref)
        assert hasattr(backend, "solve_heat")
        assert hasattr(backend, "laplacian")


def test_mk2ij_ij2mk_roundtrip():
    for m in range(-5, 6):
        for k in range(4):
            i, j = cpu.mk2ij(m, k)
            assert cpu.ij2mk(i, j) == (m, k)


def test_conj_subtract_and_project_skewherm():
    rng = np.random.RandomState(5)
    A = rng.randn(6, 6) + 1j * rng.randn(6, 6)
    out = conj_subtract_(A.copy())
    np.testing.assert_allclose(out, A - A.conj().T)
    B = A.copy()
    project_skewherm(B)
    np.testing.assert_allclose(B, (A - A.conj().T) / 2.0)
    np.testing.assert_allclose(B, -B.conj().T)  # exactly skew-Hermitian
