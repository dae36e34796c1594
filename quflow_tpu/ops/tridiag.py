"""Batched tridiagonal operators in diag-packed layout, solved scan-parallel.

The quantized Laplacian acting on matrix diagonal m at position k has main
coefficient -((N-1)(2k+1+m) - 2k(k+m)) and off-diagonal coupling
sqrt((k+m)(N-k-m) k(N-k)) (cf. reference quflow/laplacian/cpu.py:82-83,
tridiagonal.py:95-133).  In packed layout (see ops/diagpack.py) the operator
is a batch of R independent real symmetric tridiagonal systems of equal
length N, stored as ``op[r, 0, :]`` = main diagonal, ``op[r, 1, :-1]`` =
sub/super diagonal (element j couples positions j and j+1); the slot between
the two sub-blocks of a packed row is zero, which decouples them.

TPU-native solve
----------------
The reference sweeps Thomas sequentially per row (numba prange,
tridiagonal.py:165-215) or calls cuSPARSE gtsv2StridedBatch
(experimental/cuda.py:358-418).  Neither maps to TPU.  Here the operator is
*prefactorized on the host* (LU of a fixed tridiagonal matrix), after which
the solve consists of two first-order affine recurrences

    forward :  y_i = d_i - w_i y_{i-1}
    backward:  x_i = g_i - u_i x_{i+1},   g = y / btilde

Each affine recurrence is evaluated with ``jax.lax.associative_scan``
(composition of affine maps is associative), giving O(log N) depth fully
vectorized over the R rows and any batch dims - the "parallel-in-k" solve
that SURVEY.md section 7.3 ranks as the top hard part.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = [
    "packed_laplacian",
    "shear_laplacian",
    "shear_operator",
    "solve_factored",
    "dot_packed",
    "TridiagFactors",
]


def packed_laplacian(N, nrows=None, bc=False, dtype=np.float64):
    """Packed quantized Laplacian, shape (nrows, 2, N).

    nrows = N//2+1 (skew-Hermitian pack) or N (wrapped pack).  With ``bc`` the
    singular m=0 system is regularised by op[0,0,0] -= 1/2 (trace boundary
    condition; cf. reference tridiagonal.py:130-131).
    """
    if nrows is None:
        nrows = N // 2 + 1
    m = np.arange(nrows)[:, None].astype(np.float64)
    i = np.arange(N)[None, :].astype(np.float64)
    Nf = float(N)

    in_first = i < Nf - m
    # main diagonal: block 1 indexes position i along diagonal m; block 2
    # indexes position k = i-(N-m) along diagonal N-m.
    k = i - (Nf - m)
    mm = Nf - m
    d1 = -((Nf - 1) * (2 * i + 1 + m) - 2 * i * (i + m))
    d2 = -((Nf - 1) * (2 * k + 1 + mm) - 2 * k * (k + mm))
    d = np.where(in_first, d1, d2)

    # off-diagonal at slot j couples j <-> j+1 (zero between the blocks)
    e1 = (i + 1 + m) * (Nf - i - 1 - m) * (i + 1) * (Nf - i - 1)
    kk = k + 1  # local position of slot j+1 in block 2
    e2 = (kk + mm) * (m - kk) * kk * (Nf - kk)
    e = np.where(
        i < Nf - m - 1, e1, np.where((i >= Nf - m) & (i < Nf - 1), e2, 0.0)
    )
    e = np.sqrt(np.maximum(e, 0.0))

    op = np.stack([d, e], axis=1).astype(dtype)
    if bc:
        op[0, 0, 0] -= 0.5
    return op


def shear_laplacian(N, bc=False, dtype=np.float64):
    """Quantized Laplacian for the *shear* layout, shape (N+1, 2, N).

    The shear pack (ops/diagpack.mat2shear) is a single pad+reshape: column
    j of the (N, N+1) view holds [upper diagonal j | lower diagonal N+1-j |
    pad].  System j here is that column read top-to-bottom (length N);
    ``op[j, 0]`` = main diagonal, ``op[j, 1, i]`` couples slots i and i+1.
    The junction coupling between the two diagonal segments and the coupling
    into the trailing pad slot are identically zero (the first naturally:
    the off-diagonal coefficient of a length-L system vanishes at its end);
    the pad slot gets main coefficient 1 so the factorization stays regular.

    Same per-diagonal coefficients as :func:`packed_laplacian` (reference
    laplacian/cpu.py:82-83); only the segment pairing differs (j with N+1-j
    instead of m with N-m).
    """
    j = np.arange(N + 1)[:, None].astype(np.float64)
    i = np.arange(N)[None, :].astype(np.float64)
    Nf = float(N)

    in_first = i < Nf - j  # upper diagonal j, position i
    d1 = -((Nf - 1) * (2 * i + 1 + j) - 2 * i * (i + j))
    m2 = Nf + 1 - j  # lower diagonal N+1-j, local position k
    k = i - (Nf - j)
    d2 = -((Nf - 1) * (2 * k + 1 + m2) - 2 * k * (k + m2))
    in_second = (i >= Nf - j) & (i < Nf - 1) & (k < j - 1)
    d = np.where(in_first, d1, np.where(in_second, d2, 1.0))  # pad main = 1

    # coupling at slot i (i <-> i+1): inside segment 1 for i+1 <= N-j-1,
    # inside segment 2 for local k+1 <= j-2; zero at junction and into pad.
    e1 = (i + 1 + j) * (Nf - i - 1 - j) * (i + 1) * (Nf - i - 1)
    kk = k + 1
    e2 = (kk + m2) * (j - 1 - kk) * kk * (Nf - kk)
    e = np.where(
        i < Nf - j - 1,
        e1,
        np.where((i >= Nf - j) & (kk < j - 1), e2, 0.0),
    )
    e = np.sqrt(np.maximum(e, 0.0))

    op = np.stack([d, e], axis=1).astype(dtype)
    if bc:
        op[0, 0, 0] -= 0.5
    return op


@lru_cache(maxsize=64)
def _shear_slots(N):
    """Slot geometry of the shear view (see diagpack.mat2shear): for system
    (column) j, position i, the matrix entry (r, c) it holds and whether the
    slot is a real matrix element (``valid``; the one pad slot per column
    j >= 1 is not)."""
    j = np.arange(N + 1)[:, None]
    i = np.arange(N)[None, :]
    in_first = i + j < N  # upper diagonal j, position i
    r = np.where(in_first, i, i + 1)
    c = np.where(in_first, i + j, i + j - N)
    valid = in_first | (r < N)  # pad slot: i = N-1 in columns j >= 1
    return (np.where(valid, r, 0).astype(np.int64),
            np.where(valid, c, 0).astype(np.int64), valid)


def shear_operator(N, kind="poisson", params=(), dtype=np.float64):
    """Operator family in the shear layout, shape (N+1, 2, N).

    Same families as the row-packed registry (ops/laplacian._factors),
    built for the shear solve (systems along columns, see
    :func:`shear_laplacian`):

      ('poisson', ())                   lap with the trace bc
      ('heat', (h_nu,))                 I - h_nu * lap
      ('helmholtz', (alpha,))           I - alpha * lap
      ('viscdamp', (h, nu, alpha, th))  (1 + h a th) - h nu th * lap
      ('globalqg', (gamma,))            lap - (gamma/2)(z_r^2 + z_c^2)
                                        (reference laplacian/cpu.py:829-877)

    Pad slots keep main coefficient 1 / coupling 0 regardless of the family
    (their values are never read back; the factorization just has to stay
    regular).
    """
    lap = shear_laplacian(N, bc=(kind == "poisson"))
    rr, cc, valid = _shear_slots(N)
    d = np.where(valid, lap[:, 0, :], 0.0)
    e = lap[:, 1, :]  # already 0 at junctions and into pads
    if kind == "poisson":
        return lap.astype(dtype)
    if kind == "heat":
        (h_nu,) = params
        od, oe = 1.0 - h_nu * d, -h_nu * e
    elif kind == "helmholtz":
        (alpha,) = params
        od, oe = 1.0 - alpha * d, -alpha * e
    elif kind == "viscdamp":
        h, nu, alpha, theta = params
        od = (1.0 + h * alpha * theta) - (h * nu * theta) * d
        oe = -(h * nu * theta) * e
    elif kind == "globalqg":
        from .geometry import hbar

        (gamma,) = params
        s = (N - 1) / 2.0
        z = hbar(N) * np.arange(-s, s + 1)
        od = d - (gamma / 2.0) * (z[rr] ** 2 + z[cc] ** 2)
        oe = e
    else:  # pragma: no cover
        raise ValueError(kind)
    od = np.where(valid, od, 1.0)
    return np.stack([od, oe], axis=1).astype(dtype)


class TridiagFactors:
    """Host-prefactorized batched tridiagonal operator.

    Attributes (device arrays, shape (R, N)):
      w     forward-elimination multipliers (w[:, 0] = 0)
      binv  reciprocal of the eliminated main diagonal
      u     back-substitution multipliers  a_j / btilde_j (u[:, -1] = 0)
    """

    def __init__(self, op: np.ndarray):
        op = np.asarray(op, dtype=np.float64)
        R, _, N = op.shape[0], op.shape[1], op.shape[2]
        b = op[:, 0, :].copy()
        a = op[:, 1, :].copy()
        a[:, -1] = 0.0
        w = np.zeros_like(b)
        bt = b.copy()
        for j in range(1, N):
            w[:, j] = a[:, j - 1] / bt[:, j - 1]
            bt[:, j] = b[:, j] - w[:, j] * a[:, j - 1]
        binv = 1.0 / bt
        u = a * binv
        # Stored as host numpy: factors may be built inside a jit trace (via
        # the operator registry), where device arrays would leak tracers.
        # jnp treats these as embedded constants at use sites.
        dt = op.dtype
        self.w = w.astype(dt)
        self.binv = binv.astype(dt)
        self.u = u.astype(dt)
        self.op = op.astype(dt)


def _affine_scan(c, v, axis=-1):
    """All prefix evaluations of the affine chain s -> c_i s + v_i from s=0."""

    def comb(p, q):
        cp, vp = p
        cq, vq = q
        return cp * cq, cq * vp + vq

    _, y = lax.associative_scan(comb, (c, v), axis=axis % v.ndim)
    return y


def solve_factored(fac: TridiagFactors, rhs, refine=0, op=None, base=None,
                   axis=-1):
    """Solve op @ x = rhs for batched rhs (..., R, N) (real or complex).

    ``axis`` selects the recurrence direction: -1 (default) for row-major
    packed layouts (systems along the last axis), -2 for the shear layout
    (systems along columns; factors and ``op`` pre-transposed to (N, N+1)
    and (2, N, N+1) respectively).

    ``refine`` > 0 applies that many steps of mixed-precision iterative
    refinement x += solve(rhs - op @ x): the residual is evaluated in the
    dtype of ``op`` (pass the f64 operator for an f32 solve - the residual
    is elementwise-only, no matmuls), then downcast for the correction
    solve.  This recovers the accuracy of the ill-conditioned m=0 system to
    f32 roundoff (measured 1.9e-3 -> 3.6e-6 abs at N=1024), the caveat the
    reference's CUDA f32 path special-cases (cuda.py:457-492).  Refinement
    with a residual at working precision is useless (pure cancellation
    noise) - always pass a higher-precision ``op``.

    ``base`` overrides the inner solver (signature d -> x, same shape/
    dtype); used to route the base solve through the fused Pallas Thomas
    kernel while keeping the refinement logic shared.
    """
    # match factor precision to the rhs working precision (a complex64 state
    # on an accelerator solves in f32; the stored factors are f64)
    rd = jnp.asarray(rhs).real.dtype
    w = jnp.asarray(fac.w, dtype=rd)
    u = jnp.asarray(fac.u, dtype=rd)
    binv = jnp.asarray(fac.binv, dtype=rd)

    if base is None:
        def base(d):
            if jnp.iscomplexobj(d):
                return lax.complex(
                    _solve_real(w, u, binv, d.real, axis=axis),
                    _solve_real(w, u, binv, d.imag, axis=axis),
                )
            return _solve_real(w, u, binv, d, axis=axis)

    dot = dot_packed if axis == -1 else dot_cols
    x = base(rhs)
    if refine:
        opd = jnp.asarray(op if op is not None else fac.op)
        rd = opd.dtype
        ld = rhs.real.dtype
        if jnp.iscomplexobj(rhs):
            # refine re/im channels separately in real f64: complex f64 does
            # not exist on TPU (c64->c128 converts crash the compiler)
            rhs_re = rhs.real.astype(rd)
            rhs_im = rhs.imag.astype(rd)
            for _ in range(refine):
                rr = (rhs_re - dot(opd, x.real.astype(rd))).astype(ld)
                ri = (rhs_im - dot(opd, x.imag.astype(rd))).astype(ld)
                x = x + base(lax.complex(rr, ri))
        else:
            rhs_hi = rhs.astype(rd)
            for _ in range(refine):
                r = rhs_hi - dot(opd, x.astype(rd))
                x = x + base(r.astype(ld))
    return x


def _solve_real(w, u, binv, d, axis=-1):
    cfwd = jnp.broadcast_to(-w, d.shape)
    y = _affine_scan(cfwd, d, axis=axis)
    g = y * binv
    cbwd = jnp.broadcast_to(jnp.flip(-u, axis), d.shape)
    x = jnp.flip(_affine_scan(cbwd, jnp.flip(g, axis), axis=axis), axis)
    return x


def dot_packed(op, d):
    """Apply the packed tridiagonal operator: (..., R, N) -> (..., R, N)."""
    main = op[:, 0, :]
    off = op[:, 1, :]
    out = main * d
    out = out.at[..., :, 1:].add(off[:, :-1] * d[..., :, :-1])
    out = out.at[..., :, :-1].add(off[:, :-1] * d[..., :, 1:])
    return out


@lru_cache(maxsize=16)
def _m0_semisep(N, kind="poisson", params=()):
    """Semiseparable factors (u, v) of the m=0 system inverse for any
    operator family (bc'd Poisson by default):
    T^-1[i, j] = u_j v_i for j <= i and u_i v_j for j > i (any tridiagonal
    inverse has this structure).  Obtained from two O(N) banded solves
    (first/last columns of T^-1), scale-balanced; entries are O(1) - the
    trace bc (or the family's zeroth-order term) caps the spectrum away
    from 0.  The refinement correction T^-1 @ r then costs two cumsums +
    elementwise, with two length-N constants: a dense inverse here (67 MB
    at N=4096) overflows the compile-request size limit of remote-compile
    tunnels, and a scan solve costs minutes of compile time."""
    from scipy.linalg import solve_banded

    opb = shear_operator(N, kind, params)
    main = opb[0, 0, :]
    off = opb[0, 1, :]
    ab = np.zeros((3, N))
    ab[0, 1:] = off[:-1]
    ab[1] = main
    ab[2, :-1] = off[:-1]
    eL = np.zeros(N)
    eL[-1] = 1.0
    e0 = np.zeros(N)
    e0[0] = 1.0
    u = solve_banded((1, 1), ab, eL)          # G[:, -1] = u_i * v_{N-1}
    v = solve_banded((1, 1), ab, e0)          # G[:, 0] = G[0, :] (symmetry)
    v = v / v[-1]                             # now u_i * v_j = G_ij, j >= i
    s = np.sqrt(np.abs(u).max() / np.abs(v).max())
    return (u / s).astype(np.float32), (v * s).astype(np.float32)


def m0_correction(x0, d0, main, off, ham=("poisson", ())):
    """Semiseparable f64-residual correction for the m=0 system alone:
    ``x0``/``d0`` are the (..., N) solution/rhs of the main-diagonal system,
    ``main``/``off`` its f64 coefficients.  Returns the additive correction
    T^-1 (d0 - T x0) via the cached semiseparable inverse factors (two
    cumsums; see :func:`_m0_semisep`).  ``ham`` = (kind, params) selects the
    operator family the cached inverse corresponds to; it must match
    ``main``/``off``."""
    ld = x0.real.dtype
    rd = main.dtype  # f64 host constants
    uu, vv = _m0_semisep(x0.shape[-1], *ham)
    uu = jnp.asarray(uu, dtype=ld)
    vv = jnp.asarray(vv, dtype=ld)

    def channel(xc, dc):
        xh = xc.astype(rd)
        r = dc.astype(rd) - main * xh
        r = r.at[..., 1:].add(-off[:-1] * xh[..., :-1])
        r = r.at[..., :-1].add(-off[:-1] * xh[..., 1:])
        r = r.astype(ld)
        # T^-1 @ r via the semiseparable form: corr_i =
        #   v_i * sum_{j<=i} u_j r_j + u_i * sum_{j>i} v_j r_j
        c1 = jnp.cumsum(uu * r, axis=-1)
        c2 = jnp.cumsum(vv * r, axis=-1)
        return vv * c1 + uu * (c2[..., -1:] - c2)

    if jnp.iscomplexobj(x0):
        return lax.complex(channel(x0.real, d0.real), channel(x0.imag, d0.imag))
    return channel(x0, d0)


def refine_m0(x, d, op, axis, ham=("poisson", ())):
    """One f64-residual refinement of the m=0 (main-diagonal) system only.

    The f32 solve error is concentrated in the ill-conditioned m=0 system
    (~4e-5 relative vs ~1e-6 for the other diagonals); refining just that
    system is O(N) residual work + one (N, N) matvec instead of a full
    O(N^2) refinement pass, and recovers the full-array refinement's
    accuracy (the reference's CUDA f32 path special-cases the same system,
    cuda.py:457-492).

    ``axis`` = -1: row layouts, system 0 is ``[..., 0, :]``, op (R, 2, N).
    ``axis`` = -2: shear layout, system 0 is ``[..., :, 0]``, op channel-
    first (2, N, N+1).  The m=0 coefficients are identical in every layout
    (it is the same main-diagonal system), so the cached factors are shared.
    """
    if axis == -1:
        x0, d0 = x[..., 0, :], d[..., 0, :]
        main = jnp.asarray(op[0, 0, :])
        off = jnp.asarray(op[0, 1, :])
    else:
        x0, d0 = x[..., :, 0], d[..., :, 0]
        main = jnp.asarray(op[0, :, 0])
        off = jnp.asarray(op[1, :, 0])

    corr = m0_correction(x0, d0, main, off, ham=ham)

    # masked write-back (scatters at constant index mispartition under
    # GSPMD when the packed axis is sharded; see diagpack.subtract_row0_mean)
    if axis == -1:
        mask = np.zeros((x.shape[-2], 1), dtype=bool)
        mask[0] = True
        return x + jnp.where(mask, corr[..., None, :], jnp.zeros((), x.dtype))
    mask = np.zeros((1, x.shape[-1]), dtype=bool)
    mask[0, 0] = True
    return x + jnp.where(mask, corr[..., :, None], jnp.zeros((), x.dtype))


def refine_m0_interleaved(x, d, op):
    """f64-residual m=0 refinement for the *interleaved* shear layout
    (lanes 0/1 = re/im of the main-diagonal system; see
    diagpack.mat2shear_interleaved).  Same semiseparable correction as
    :func:`refine_m0`, applied per lane; ``op`` is the standard channel-
    first (2, N, N+1) f64 shear operator (column 0 is the m=0 system - the
    coefficients are lane-independent)."""
    main = jnp.asarray(op[0, :, 0])
    off = jnp.asarray(op[1, :, 0])
    corr_re = m0_correction(x[..., :, 0], d[..., :, 0], main, off)
    corr_im = m0_correction(x[..., :, 1], d[..., :, 1], main, off)
    corr = jnp.stack([corr_re, corr_im], axis=-1)  # (..., N, 2)
    # static-slice update: the interleaved path is single-chip only, so the
    # GSPMD scatter hazard behind refine_m0's masked form does not apply -
    # a dynamic-update-slice writes just the two lanes
    return x.at[..., :, 0:2].add(corr.astype(x.dtype))


def dot_cols(op, d):
    """Apply the shear-layout tridiagonal operator along columns:
    ``op`` (2, N, N+1) channel-first (main, coupling), d (..., N, N+1)."""
    main = op[0]
    off = op[1]
    out = main * d
    out = out.at[..., 1:, :].add(off[:-1, :] * d[..., :-1, :])
    out = out.at[..., :-1, :].add(off[:-1, :] * d[..., 1:, :])
    return out
