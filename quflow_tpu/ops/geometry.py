"""Geometry of u(N): scaled norms, brackets, so(3) generators.

Functional parity with reference quflow/geometry.py (hbar geometry.py:7-9,
bracket :41-49, norms :53-110, integral :113-129, so3/cartesian generators
:132-194, rotate :154-170, grad :197-207).  Implemented on jax.numpy so every
function is jit/vmap-compatible; all accept numpy arrays too.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax.scipy.linalg as jsl

__all__ = [
    "hbar",
    "bracket",
    "matmul_dia",
    "norm_L2",
    "inner_L2",
    "norm_Linf",
    "norm_L1",
    "integral",
    "so3_generators",
    "rotate",
    "cartesian_generators",
    "grad",
    "project_skewherm",
]


def hbar(N):
    """Quantization constant hbar = 2/sqrt(N^2-1).

    Returned as a PYTHON float (weakly typed in jax): an np.float64 scalar
    would strongly promote complex64 arrays to complex128 under x64 - e.g.
    bracket()'s `/ hbar(N)` inside a c64 scan carry (dtype mismatch on
    TPU, where c64 is the working precision)."""
    return float(2.0 / np.sqrt(float(N) ** 2 - 1.0))


def _is_dia(A):
    try:
        from scipy.sparse import issparse

        return issparse(A) and A.format == "dia"
    except ImportError:  # pragma: no cover
        return False


def matmul_dia(A, B):
    """Banded product of two scipy ``dia_matrix`` inputs in O(b_A b_B N).

    Output diagonals are sums of aligned elementwise products of input
    diagonals (offsets add): with scipy's column-indexed dia storage
    ``data[k, j] = M[j - offsets[k], j]``,

        C_data[o1+o2, j] += A_data[o1, j - o2] * B_data[o2, j].

    This is the role of the reference's numba ``matmul_dia``
    (reference geometry.py:13-37): products of band-limited basis elements
    never touch dense N^2 storage.  Returns a ``dia_matrix``.
    """
    from scipy.sparse import dia_matrix

    N = A.shape[0]
    dtype = np.result_type(A.dtype, B.dtype)
    cols = np.arange(N)

    def _clean(offsets, data):
        # scipy permits junk outside the matrix bounds in dia storage
        valid = (cols - offsets[:, None] >= 0) & (cols - offsets[:, None] < N)
        return np.where(valid, data[:, :N], 0)

    da = _clean(A.offsets, A.data)
    db = _clean(B.offsets, B.data)
    out = {}
    for ka, o1 in enumerate(A.offsets):
        for kb, o2 in enumerate(B.offsets):
            oc = int(o1) + int(o2)
            if oc <= -N or oc >= N:
                continue
            prod = np.zeros(N, dtype=dtype)
            if o2 >= 0:
                prod[o2:] = da[ka, : N - o2] * db[kb, o2:]
            else:
                prod[: N + o2] = da[ka, -o2:] * db[kb, : N + o2]
            acc = out.get(oc)
            if acc is None:
                out[oc] = prod
            else:
                acc += prod
    offsets = np.array(sorted(out), dtype=np.int64)
    data = np.stack([out[o] for o in offsets]) if len(offsets) else \
        np.zeros((1, N), dtype=dtype)
    if not len(offsets):
        offsets = np.zeros(1, dtype=np.int64)
    return dia_matrix((data, offsets), shape=(N, N))


def bracket(P, W):
    """Quantized Poisson bracket (1/hbar) [P, W].

    scipy dia_matrix inputs are supported (sparse band-limited basis
    elements, cf. reference geometry.py:13-49) and return a dia_matrix;
    the product runs on the banded fast path (:func:`matmul_dia`,
    O(bandwidth^2 N) instead of dense O(N^3)).
    """
    N = P.shape[-1]
    if _is_dia(P) and _is_dia(W):
        A = matmul_dia(P, W) - matmul_dia(W, P)
        return A.todia() / hbar(N)
    A = P @ W - W @ P
    return A / hbar(N)


def norm_L2(W):
    """Scaled Frobenius norm: ||W||_F / sqrt(N), isometric to the L^2 norm of
    the corresponding vorticity field."""
    N = W.shape[-1]
    if _is_dia(W):
        return np.sqrt((W.data * W.data.conj()).sum().real / N)
    if isinstance(W, np.ndarray):  # host path: stay off accelerators (no f64)
        return np.sqrt((W * W.conj()).real.sum(axis=(-2, -1)) / N)
    return jnp.linalg.norm(W, ord="fro", axis=(-2, -1)) / jnp.sqrt(float(N))


def inner_L2(P, W):
    """Scaled real Frobenius inner product tr(P W^H)/N."""
    N = W.shape[-1]
    if _is_dia(P) and _is_dia(W) and np.array_equal(W.offsets, P.offsets):
        return (P.data * W.data.conj()).sum().real / N
    if isinstance(P, np.ndarray) and isinstance(W, np.ndarray):
        return (P * W.conj()).real.sum(axis=(-2, -1)) / N
    return jnp.sum(P * jnp.conj(W), axis=(-2, -1)).real / N


def norm_Linf(W):
    """Spectral norm (largest singular value), corresponding to L-infinity."""
    if isinstance(W, np.ndarray):
        return np.linalg.norm(W, ord=2)
    return jnp.linalg.norm(W, ord=2, axis=(-2, -1))


def norm_L1(W):
    """Scaled nuclear norm sum |eig(W)| / N, corresponding to L^1."""
    N = W.shape[-1]
    if isinstance(W, np.ndarray):
        return np.abs(np.linalg.eigvals(W)).sum(-1) / N
    return jnp.abs(jnp.linalg.eigvals(W)).sum(-1) / N


def integral(W):
    """Integral of the function represented by W: Re(-i tr(W)/N)."""
    N = W.shape[-1]
    if isinstance(W, np.ndarray):
        return np.real(-1j * np.trace(W, axis1=-2, axis2=-1) / N)
    trW = jnp.trace(W, axis1=-2, axis2=-1) / N
    return jnp.real(-1j * trW)


def project_skewherm(W):
    """Orthogonal projection onto skew-Hermitian matrices."""
    return 0.5 * (W - jnp.conj(jnp.swapaxes(W, -1, -2)))


def so3_generators(N, dtype=np.complex128):
    """Basis S1, S2, S3 of the spin-(N-1)/2 representation of so(3) in u(N),
    satisfying [S1,S2]=S3 (cyclically)."""
    s = (N - 1) / 2
    k = np.arange(-s, s)  # length N-1
    off = np.sqrt(s * (s + 1) - k * (k + 1))
    S3 = 1j * np.diag(np.arange(-s, s + 1))
    S1 = 1j * (np.diag(off, 1) + np.diag(off, -1)) / 2
    S2 = np.diag(off, 1) / 2 - np.diag(off, -1) / 2
    return S1.astype(dtype), S2.astype(dtype), S3.astype(dtype)


def cartesian_generators(N, dtype=np.complex128):
    """Matrices X_i = hbar S_i quantizing the Cartesian coordinate functions
    x_i on the sphere; T_{1,-1} = sqrt(3) X2, T_{1,0} = sqrt(3) X3,
    T_{1,1} = sqrt(3) X1."""
    h = hbar(N)
    S1, S2, S3 = so3_generators(N, dtype=dtype)
    return h * S1, h * S2, h * S3


def rotate(xi, W):
    """Axis-angle (Rodrigues) rotation of a vorticity matrix: R W R^H with
    R = expm(xi . S)."""
    N = W.shape[-1]
    if isinstance(W, np.ndarray):
        from scipy.linalg import expm

        S1, S2, S3 = so3_generators(N, dtype=W.dtype)
        R = expm(xi[0] * S1 + xi[1] * S2 + xi[2] * S3)
        return R @ W @ np.conj(R.T)
    S1, S2, S3 = so3_generators(N, dtype=np.asarray(W).dtype)
    R = jsl.expm(xi[0] * S1 + xi[1] * S2 + xi[2] * S3)
    return R @ W @ jnp.conj(R.T)


def grad(P):
    """Cartesian gradient components (1/hbar)[X_i, P], i = 1..3."""
    N = P.shape[-1]
    X = cartesian_generators(N, np.asarray(P).dtype)
    return jnp.stack([bracket(Xi, P) for Xi in X])
