"""Sparse dia-matrix fast paths: per-diagonal laplace/solve agree with dense
(porting reference tests/test_laplacian.py:155-206) and the .el eigenvalue
fast path for basis elements."""

import numpy as np
import pytest
from scipy.sparse import dia_matrix

import quflow_tpu as qf


def poisson_pair(N, seed):
    rng = np.random.RandomState(seed)
    omegaP = rng.randn(N**2)
    omegaW = omegaP.copy()
    ells = qf.ind2elm(np.arange(N**2))[0][1:]
    omegaW[1:] *= -ells * (ells + 1)
    omegaW[0] = 0.0
    omegaP[0] = 0.0
    return qf.shr2mat(omegaP, N=N), qf.shr2mat(omegaW, N=N)


def extract_dia(A, m):
    N = A.shape[-1]
    if m == 0:
        return dia_matrix((np.diagonal(A, 0), 0), shape=(N, N))
    data = np.zeros((2, N), dtype=np.complex128)
    data[0, : N - m] = np.diagonal(A, -m)
    data[1, m:] = np.diagonal(A, m)
    return dia_matrix((data, np.array([-m, m])), shape=(N, N))


@pytest.mark.parametrize("m", [0, 9, 22])
@pytest.mark.parametrize("N", [33, 65])
def test_laplace_diamat(N, m):
    Pexact, Wexact = poisson_pair(N, seed=N)
    Pm = extract_dia(Pexact, m)
    Wm = np.asarray(qf.laplace(Pm).toarray())
    np.testing.assert_allclose(Wm, extract_dia(Wexact, m).toarray(), atol=1e-10)


@pytest.mark.parametrize("m", [0, 9, 22])
@pytest.mark.parametrize("N", [33, 65])
def test_solve_poisson_diamat(N, m):
    Pexact, Wexact = poisson_pair(N, seed=N)
    Wm = extract_dia(Wexact, m)
    Pm = np.asarray(qf.solve_poisson(Wm).toarray())
    np.testing.assert_allclose(Pm, extract_dia(Pexact, m).toarray(), atol=1e-12 * N)


@pytest.mark.parametrize("el,m", [(5, 0), (5, 3), (9, -4)])
def test_el_fast_path(el, m):
    N = 19
    T = qf.elmr2mat(el, m, N)
    W = qf.laplace(T)
    np.testing.assert_allclose(
        W.toarray(), -el * (el + 1) * T.toarray(), atol=1e-12
    )
    assert W.el == el
    P = qf.solve_poisson(W)
    np.testing.assert_allclose(P.toarray(), T.toarray(), atol=1e-12)


def test_bracket_dia():
    N = 19
    T1 = qf.elmr2mat(3, 1, N)
    T2 = qf.elmr2mat(5, -2, N)
    B = qf.bracket(T1, T2)
    Bd = np.asarray(qf.bracket(T1.toarray(), T2.toarray()))
    np.testing.assert_allclose(B.toarray(), Bd, atol=1e-12)


def test_norms_dia():
    T = qf.elmr2mat(5, 2, 19)
    np.testing.assert_allclose(float(qf.norm_L2(T)), 1.0, rtol=1e-12)
    np.testing.assert_allclose(
        float(qf.inner_L2(T, T)), 1.0, rtol=1e-12
    )


def test_select_skewherm_compat():
    from quflow_tpu.ops import laplacian as lap

    Pexact, Wexact = poisson_pair(33, seed=1)
    old = lap.select_skewherm(True)
    try:
        P = np.asarray(qf.solve_poisson(Wexact))
        np.testing.assert_allclose(P, Pexact, atol=1e-14 * 33**2)
    finally:
        lap._skewh_default = None


def test_matmul_dia_matches_dense():
    """Banded dia product == dense product for random banded matrices,
    including junk outside the matrix bounds in the dia storage."""
    from scipy.sparse import dia_matrix
    from quflow_tpu.ops.geometry import matmul_dia

    rng = np.random.RandomState(7)
    N = 40
    for _ in range(5):
        ka = rng.choice(np.arange(-6, 7), size=rng.randint(1, 5),
                        replace=False)
        kb = rng.choice(np.arange(-6, 7), size=rng.randint(1, 5),
                        replace=False)
        da = rng.randn(len(ka), N) + 1j * rng.randn(len(ka), N)
        db = rng.randn(len(kb), N) + 1j * rng.randn(len(kb), N)
        A = dia_matrix((da, ka), shape=(N, N))
        B = dia_matrix((db, kb), shape=(N, N))
        C = matmul_dia(A, B)
        np.testing.assert_allclose(C.toarray(), A.toarray() @ B.toarray(),
                                   atol=1e-12)


def test_bracket_dia_uses_banded_path():
    """bracket on dia inputs returns a dia_matrix equal to the dense
    bracket, with bandwidth bounded by the sum of input bandwidths."""
    from scipy.sparse import dia_matrix
    import quflow_tpu as qf

    N = 24
    P = qf.elmr2mat(2, 1, N=N)
    W = qf.elmr2mat(3, -2, N=N)
    out = qf.bracket(P, W)
    dense = qf.bracket(P.toarray(), W.toarray())
    np.testing.assert_allclose(out.toarray(), dense, atol=1e-12)
    assert out.format == "dia"
    assert np.abs(out.offsets).max() <= (np.abs(P.offsets).max()
                                         + np.abs(W.offsets).max())
