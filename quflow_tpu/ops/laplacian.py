"""Quantized Laplacian / Poisson-family solvers (the W -> P hot path).

Public API mirrors the reference backends' informal interface
(quflow/laplacian/{cpu,tridiagonal,direct,sparse}.py): ``laplacian``,
``laplace``, ``solve_poisson``, ``solve_heat``, ``solve_helmholtz``,
``solve_viscdamp``, ``solve_globalqg`` - but there is a single TPU-native
implementation instead of five backends: operators live in diag-packed layout
(ops/diagpack.py) and are solved with the host-prefactorized scan-parallel
Thomas of ops/tridiag.py.

Configuration is static (keyword ``skewh``), replacing the reference's
module-global ``select_skewherm`` function-pointer mutation
(cpu.py:563-591).  All solves enforce the trace boundary condition the way
the reference does (rhs trace subtraction + solution trace projection;
cpu.py:311-317, 342-352, tridiagonal.py:208-210).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from .diagpack import mat2diagh, diagh2mat, pack_indices, num_rows
from .tridiag import packed_laplacian, TridiagFactors, solve_factored, dot_packed
from .geometry import hbar

__all__ = [
    "laplacian",
    "laplace",
    "solve_poisson",
    "solve_heat",
    "solve_helmholtz",
    "solve_viscdamp",
    "solve_globalqg",
    "select_skewherm",
    "select_first",
    "select_sum",
]


# ---------------------------------------------------------------------------
# operator registry (pure builders + caching; no mutable global mode state)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=128)
def _lap_op(N, nrows, bc, dtype_str="float64"):
    return packed_laplacian(N, nrows=nrows, bc=bc, dtype=np.dtype(dtype_str))


def laplacian(N, bc=False, skewh=True):
    """Packed quantized Laplacian, shape (R, 2, N) with R = N//2+1 or N."""
    return _lap_op(N, num_rows(N, skewh), bc)


@lru_cache(maxsize=256)
def _factors(N, skewh, kind, params):
    """Prefactorized operator for a given solve kind.

    kind/params:
      ('poisson', ())                    lap with trace bc
      ('heat', (h_nu,))                  I - h_nu * lap
      ('helmholtz', (alpha,))            I - alpha * lap
      ('viscdamp', (h, nu, alpha, th))   (1 + h a th) - h nu th * lap
      ('globalqg', (gamma,))             lap - (gamma/2)(z_i^2 + z_j^2)
    """
    R = num_rows(N, skewh)
    lap = packed_laplacian(N, nrows=R, bc=(kind == "poisson"))
    if kind == "poisson":
        op = lap
    elif kind == "heat":
        (h_nu,) = params
        op = -h_nu * lap
        op[:, 0, :] += 1.0
    elif kind == "helmholtz":
        (alpha,) = params
        op = -alpha * lap
        op[:, 0, :] += 1.0
    elif kind == "viscdamp":
        h, nu, alpha, theta = params
        op = -(h * nu * theta) * lap
        op[:, 0, :] += 1.0 + h * alpha * theta
    elif kind == "globalqg":
        (gamma,) = params
        op = lap.copy()
        s = (N - 1) / 2
        z = hbar(N) * np.arange(-s, s + 1)
        rows, cols = pack_indices(N, skewh)
        op[:, 0, :] -= (gamma / 2.0) * (z[rows] ** 2 + z[cols] ** 2)
    else:  # pragma: no cover
        raise ValueError(kind)
    return TridiagFactors(op)


# ---------------------------------------------------------------------------
# core packed solve (jittable)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("skewh",))
def _solve_packed(W, w, binv, u, skewh):
    fac = _FacView(w, binv, u)
    d = mat2diagh(W, skewh=skewh, tracefree=True)
    x = solve_factored(fac, d)
    N = W.shape[-1]
    tr = jnp.sum(x[..., 0, :], axis=-1, keepdims=True) / N
    x = x.at[..., 0, :].add(-tr)
    return diagh2mat(x, skewh=skewh)


class _FacView:
    __slots__ = ("w", "binv", "u")

    def __init__(self, w, binv, u):
        self.w, self.binv, self.u = w, binv, u


@partial(jax.jit, static_argnames=("skewh",))
def _dot_packed_mat(P, op, skewh):
    d = mat2diagh(P, skewh=skewh, tracefree=False)
    out = dot_packed(op, d)
    return diagh2mat(out, skewh=skewh)


def _is_skewh(W):
    """Auto-detect skew-Hermiticity for concrete (non-traced) inputs."""
    if isinstance(W, jax.core.Tracer):
        raise ValueError(
            "skewh must be passed explicitly when called on traced arrays"
        )
    if isinstance(W, jax.Array):
        # device-resident: evaluate on device (complex downloads are
        # UNIMPLEMENTED on this TPU runtime); the result is a bool scalar
        return bool(jnp.allclose(W, -jnp.conj(jnp.swapaxes(W, -1, -2))))
    Wn = np.asarray(W)
    return bool(np.allclose(Wn, -np.conj(np.swapaxes(Wn, -1, -2))))


# Process-level default for reference-API compatibility (the reference
# mutates module function pointers via select_skewherm, cpu.py:563-591).
# None = auto-detect per call.
_skewh_default = None


def select_skewherm(flag):
    """Reference-compatible mode switch: set the default ``skewh`` used when
    it is not passed explicitly.  Returns the previous value.  Prefer the
    explicit keyword in new code (it is jit-static)."""
    global _skewh_default
    old = _skewh_default
    _skewh_default = flag
    return old if old is not None else True


def _resolve_skewh(W, skewh):
    if skewh is not None:
        return skewh
    if _skewh_default is not None:
        return _skewh_default
    return _is_skewh(W)


def _is_dia(A):
    try:
        from scipy.sparse import issparse

        return issparse(A) and A.format == "dia"
    except ImportError:  # pragma: no cover
        return False


def _dia_apply(A, fn_el, fn_dense):
    """Apply an operator to a scipy dia_matrix, preserving its offsets.

    Basis elements carry a ``.el`` tag (quantization.elmr2mat) enabling the
    eigenvalue fast path Delta T_el = -el(el+1) T_el; otherwise the operator
    (which acts diagonal-by-diagonal) is applied densely and the same
    offsets re-extracted.
    """
    from scipy.sparse import dia_matrix

    if hasattr(A, "el"):
        out = fn_el(A)
        if out is not None:
            return out
    N = A.shape[-1]
    dense = np.asarray(fn_dense(A.toarray()))
    data = np.zeros((len(A.offsets), N), dtype=dense.dtype)
    for k, off in enumerate(A.offsets):
        if off >= 0:
            data[k, off:] = np.diagonal(dense, off)
        else:
            data[k, : N + off] = np.diagonal(dense, off)
    return dia_matrix((data, A.offsets), shape=A.shape)


def _solve_kind(W, kind, params, skewh):
    from ..config import device_for_dtype

    N = W.shape[-1]
    fac = _factors(N, skewh, kind, params)
    if isinstance(W, (jax.core.Tracer, jax.Array)):
        # traced or device-resident input -> stay on device (a complex
        # download would be UNIMPLEMENTED on this TPU runtime anyway)
        return _solve_packed(W, fac.w, fac.binv, fac.u, skewh)
    # host API: numpy in -> numpy out (reference parity), computed on a
    # device that supports the dtype (64-bit never runs on TPU)
    with device_for_dtype(np.dtype(W.dtype)):
        return np.asarray(_solve_packed(W, fac.w, fac.binv, fac.u, skewh))


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def laplace(P, skewh=None):
    """Apply the quantized Laplacian to a stream matrix.

    scipy dia_matrix inputs return a dia_matrix with the same offsets; basis
    elements tagged with ``.el`` use the eigenvalue fast path
    Delta T_el = -el(el+1) T_el (cf. reference cpu.py:457-556).
    """
    from ..config import device_for_dtype

    if _is_dia(P):
        def fel(A):
            el = A.el
            out = A * (-float(el * (el + 1)))
            out = out.todia()
            out.el = el
            return out

        return _dia_apply(
            P, fel, lambda D: laplace(np.ascontiguousarray(D), skewh=False)
        )
    skewh = _resolve_skewh(P, skewh)
    N = P.shape[-1]
    if isinstance(P, (jax.core.Tracer, jax.Array)):
        op = jnp.asarray(laplacian(N, bc=False, skewh=skewh))
        return _dot_packed_mat(P, op, skewh)
    with device_for_dtype(np.dtype(P.dtype)):
        op = jnp.asarray(laplacian(N, bc=False, skewh=skewh))
        return np.asarray(_dot_packed_mat(P, op, skewh))


def select_first(W):
    """Reference reduce policy (cpu.py:672-675): pick state (0, ..., 0)."""
    return np.ascontiguousarray(W[(0,) * (W.ndim - 2)])


def select_sum(W):
    """Reference reduce policy (cpu.py:677-679): sum over stacked states."""
    return W.sum(axis=tuple(range(W.ndim - 2)))


def solve_poisson(W, skewh=None, reduce="first"):
    """Stream matrix P solving Delta_N P = W with the trace bc tr(P)=0.

    For stacked states (k, N, N) the reference semantics apply
    (cpu.py:672-734): ``reduce='first'`` solves state 0 and broadcasts,
    ``reduce='sum'`` solves the sum, ``reduce='none'`` solves each state
    (the TPU-native batched/ensemble path).  The reference's callable
    policies ``select_first``/``select_sum`` are accepted as aliases.
    """
    if callable(reduce):
        reduce = {select_first: "first", select_sum: "sum"}.get(reduce, reduce)
    if reduce is None:
        reduce = "none"
    if _is_dia(W):
        def fel(A):
            el = A.el
            if el == 0:
                return None
            out = A * (-1.0 / float(el * (el + 1)))
            out = out.todia()
            out.el = el
            return out

        return _dia_apply(
            W, fel, lambda D: solve_poisson(np.ascontiguousarray(D), skewh=False)
        )
    skewh = _resolve_skewh(W, skewh)
    if W.ndim > 2 and reduce != "none":
        if reduce == "first":
            W0 = W[(0,) * (W.ndim - 2)]
        elif reduce == "sum":
            W0 = W.reshape((-1,) + W.shape[-2:]).sum(axis=0)
        elif callable(reduce):  # reference-style custom policy W -> (N, N)
            # stay traceable/device-resident: no host conversion (np.asarray
            # of a tracer raises, and complex device->host transfers are
            # unimplemented on this TPU runtime)
            W0 = reduce(W)
        else:
            raise ValueError(reduce)
        P0 = _solve_kind(W0, "poisson", (), skewh)
        return jnp.broadcast_to(P0, W.shape)
    return _solve_kind(W, "poisson", (), skewh)


def solve_heat(h_times_nu, W0, skewh=None):
    """One backward-Euler step of the quantized heat equation:
    (I - h nu Delta) W = W0."""
    skewh = _resolve_skewh(W0, skewh)
    return _solve_kind(W0, "heat", (float(h_times_nu),), skewh)


def solve_helmholtz(W, alpha=1.0, skewh=None):
    """Solve (I - alpha Delta) P = W."""
    skewh = _resolve_skewh(W, skewh)
    return _solve_kind(W, "helmholtz", (float(alpha),), skewh)


def solve_viscdamp(h, W0, nu=1e-4, alpha=0.01, force=None, theta=1, skewh=None):
    """One theta-scheme step of W' - nu Delta W + alpha W = F
    (Crank-Nicolson at theta=0.5; cf. reference tridiagonal.py:364-420)."""
    skewh = _resolve_skewh(W0, skewh)
    if theta == 1:
        Wrhs = W0
    else:
        Wrhs = (1.0 - alpha * h * (1 - theta)) * W0 + (nu * h * (1 - theta)) * laplace(
            W0, skewh=skewh
        )
    if force is not None:
        Wrhs = Wrhs + h * force
    return _solve_kind(
        Wrhs, "viscdamp", (float(h), float(nu), float(alpha), float(theta)), skewh
    )


def solve_globalqg(W, gamma=1.0, skewh=None):
    """Solve the global quasi-geostrophic stream equation
    Delta P - (gamma/2)(Z^2 P + P Z^2) = W with Z the quantized z coordinate
    (cf. reference cpu.py:829-877)."""
    skewh = _resolve_skewh(W, skewh)
    return _solve_kind(W, "globalqg", (float(gamma),), skewh)
