"""Diagonal packing: dense N x N matrices <-> batched equal-length rows.

This is the canonical solve-stage layout of quflow_tpu.  Every operator in the
quantized Poisson family is tridiagonal along each matrix diagonal; pairing
diagonal m with diagonal N-m yields N//2+1 (skew-Hermitian case) or N (general
case) *equal-length-N* independent tridiagonal systems.  The reference builds
this layout with numba loops / CUDA gather kernels (reference
quflow/laplacian/tridiagonal.py:19-92 ``mat2diagh``/``diagh2mat``,
quflow/experimental/cuda.py:7-120 ``extract_diag``/``reorder_diag``); here it
is a single XLA gather/scatter with precomputed constant index maps, which XLA
fuses with the surrounding elementwise work.

Layouts
-------
skewh pack, shape (N//2+1, N):
    row m = [lower diagonal m (length N-m) | lower diagonal N-m (length m)]
wrapped pack (general matrices), shape (N, N):
    row m, slot i = W[(i+m) % N, i]
    (first N-m slots: lower diagonal m; remaining m slots: *upper* diagonal
    N-m; the tridiagonal operators act identically on upper and lower
    diagonals of the same index, so the same packed operator rows apply)
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ["mat2diagh", "diagh2mat", "pack_indices", "scatter_indices", "num_rows"]


def num_rows(N, skewh=True):
    return N // 2 + 1 if skewh else N


@lru_cache(maxsize=64)
def pack_indices(N, skewh=True, pad_rows=0):
    """Constant (rows, cols) index maps of shape (R + pad_rows, N) for the
    pack gather.  Padding rows (used to make the row count divisible by the
    device mesh - uneven shardings of gather outputs miscompile in GSPMD)
    simply re-gather row 0; their values are ignored on unpack.
    """
    if skewh:
        m = np.arange(N // 2 + 1)[:, None]
        i = np.arange(N)[None, :]
        in_first = i < N - m
        rows = np.where(in_first, i + m, i)
        cols = np.where(in_first, i, i - (N - m))
    else:
        m = np.arange(N)[:, None]
        i = np.arange(N)[None, :]
        rows = (i + m) % N
        cols = np.broadcast_to(i, rows.shape)
    if pad_rows:
        rows = np.vstack([rows, np.zeros((pad_rows, N), dtype=rows.dtype)])
        cols = np.vstack([cols, np.tile(np.arange(N), (pad_rows, 1))])
    return rows.astype(np.int32), cols.astype(np.int32)


@lru_cache(maxsize=64)
def scatter_indices(N, skewh=True, pad_rows=0):
    """Index maps for the unpack scatter; padding rows map out of bounds and
    are dropped (jnp scatter mode='drop')."""
    rows, cols = pack_indices(N, skewh)
    if pad_rows:
        oob = np.full((pad_rows, N), N, dtype=rows.dtype)
        rows = np.vstack([rows, oob])
        cols = np.vstack([cols, oob])
    return rows.astype(np.int32), cols.astype(np.int32)


def subtract_row0_mean(d):
    """d[..., 0, :] -= mean(d[..., 0, :]), written as a masked elementwise
    update: a scatter at constant row index 0 is mispartitioned by GSPMD
    when the row axis is sharded (the update lands on the first row of every
    shard - verified on jax 0.9), so no .at[0].add here."""
    N = d.shape[-1]
    mask0 = np.zeros((d.shape[-2], 1), dtype=bool)
    mask0[0] = True
    tr = jnp.sum(jnp.where(mask0, d, 0), axis=(-2, -1), keepdims=True) / N
    return d - jnp.where(mask0, tr, jnp.zeros_like(tr))


def mat2diagh(W, skewh=True, tracefree=True, pad_rows=0):
    """Pack a matrix (..., N, N) into diagonal rows (..., R + pad_rows, N).

    With ``tracefree`` the trace/N is subtracted from row 0 (the main
    diagonal), the standard right-hand-side preparation for the singular m=0
    Poisson system.
    """
    N = W.shape[-1]
    rows, cols = pack_indices(N, skewh, pad_rows)
    d = W[..., rows, cols]
    if tracefree:
        d = subtract_row0_mean(d)
    return d


def diagh2mat(d, skewh=True):
    """Unpack diagonal rows (..., R [+ pad], N) into a matrix (..., N, N).

    In the skewh layout the upper triangle is reconstructed as the negative
    conjugate of the packed lower diagonals, so the result is skew-Hermitian
    by construction.  Rows beyond the true packed count R are treated as
    padding and dropped.
    """
    N = d.shape[-1]
    pad_rows = d.shape[-2] - num_rows(N, skewh)
    rows, cols = scatter_indices(N, skewh, pad_rows)
    batch = d.shape[:-2]
    A = jnp.zeros(batch + (N, N), dtype=d.dtype)
    A = A.at[..., rows, cols].set(d, mode="drop")
    if skewh:
        # lower triangle (incl. main diagonal) is populated; mirror it.
        Dg = jnp.diagonal(A, axis1=-2, axis2=-1)
        At = jnp.conj(jnp.swapaxes(A, -1, -2))
        A = A - At + _diag_embed(jnp.conj(Dg))
    return A


def _diag_embed(dg):
    N = dg.shape[-1]
    out = jnp.zeros(dg.shape + (N,), dtype=dg.dtype)
    idx = jnp.arange(N)
    return out.at[..., idx, idx].set(dg)


# ---------------------------------------------------------------------------
# Barrel-shift (roll/select) pack - the TPU fast path.
#
# XLA scatter on TPU serializes (~60 ms for an N=1024 c64 unpack, measured),
# so the hot loop uses a log2(N)-stage barrel shifter instead: the wrapped
# layout V[m, i] = W[(m+i) % N, i] is "roll column i upward by i", realized
# as nbits stages of (roll by 2^b along the row axis) + (select on columns
# whose bit b is set) - pure VPU traffic, no gathers or scatters anywhere.
# The skewh (R, N) packing then differs from the wrapped layout only by an
# elementwise conjugate-flip mask on the second blocks.
# ---------------------------------------------------------------------------

@lru_cache(maxsize=64)
def _barrel_masks(N):
    nbits = max(1, (N - 1).bit_length())
    col = np.arange(N)
    return [
        ((col >> b) & 1).astype(bool)[None, :] for b in range(nbits)
    ]


def _barrel(X, sign):
    """Roll column i of X (..., N, N) by -sign*i along the row axis."""
    N = X.shape[-1]
    for b, mask in enumerate(_barrel_masks(N)):
        sh = -sign * (1 << b)
        X = jnp.where(mask, jnp.roll(X, sh, axis=-2), X)
    return X


@lru_cache(maxsize=64)
def _skewh_masks(N, pad_rows=0):
    R = N // 2 + 1
    m = np.arange(R + pad_rows)[:, None]
    i = np.arange(N)[None, :]
    in_first = i < N - m  # first block (lower diagonal m)
    # per-row lane-roll masks for the unpack's second half: row m' rolled by m'
    nbits = max(1, (N - 1).bit_length())
    rowm = np.arange(R)[:, None]
    roll_masks = [((rowm >> b) & 1).astype(bool) for b in range(nbits)]
    in_upper = i >= m  # after rolling row m' by m', positions i >= m' held upper diag
    return in_first, roll_masks, in_upper


def mat2wrapped(W, tracefree=True):
    """Pure-barrel wrapped pack: (..., N, N) -> all N wrapped diagonal rows
    V[m, i] = W[(m+i) % N, i].  No masks, slices, or conjugations - for
    skew-Hermitian solves, use the wrapped (nrows=N) operator whose row m
    acts on [lower diag m | upper diag N-m] (same tridiagonal coefficients),
    so the solution comes back in wrapped layout and unpacks with the
    inverse barrel alone."""
    V = _barrel(W, +1)
    if tracefree:
        V = subtract_row0_mean(V)
    return V


def wrapped2mat(V):
    """Inverse of mat2wrapped."""
    return _barrel(V, -1)


def subtract_col0_mean(d):
    """Shear-layout trace projection: d[..., :, 0] -= mean(d[..., :, 0])
    (column 0 holds the main diagonal; masked elementwise form for the same
    GSPMD reason as subtract_row0_mean)."""
    N = d.shape[-2]
    mask0 = np.zeros((1, d.shape[-1]), dtype=bool)
    mask0[0, 0] = True
    tr = jnp.sum(jnp.where(mask0, d, 0), axis=(-2, -1), keepdims=True) / N
    return d - jnp.where(mask0, tr, jnp.zeros_like(tr))


def mat2shear(W, tracefree=True):
    """Shear pack: (..., N, N) -> (..., N, N+1) in ONE relayout copy.

    Row-major-flatten W, append N pad slots, reshape to (N, N+1): column j
    of the result is [upper diagonal j | lower diagonal N+1-j | pad]
    (classic shear trick - padding each row by one slot makes diagonals fall
    into columns).  This replaces the log2(N)-stage barrel-shift pack with a
    single O(N^2) pass; the solve then scans along axis -2 (positions are
    consecutive within each column; see ops/tridiag.shear_laplacian)."""
    *b, N, _ = W.shape
    flat = jnp.concatenate(
        [jnp.reshape(W, (*b, N * N)), jnp.zeros((*b, N), W.dtype)], axis=-1
    )
    D = jnp.reshape(flat, (*b, N, N + 1))
    if tracefree:
        D = subtract_col0_mean(D)
    return D


def shear2mat(D):
    """Inverse shear pack: (..., N, N+1) -> (..., N, N) (drop the N pad
    slots off the flattened tail; every matrix element appears exactly once
    in the shear view)."""
    *b, N, _ = D.shape
    flat = jnp.reshape(D, (*b, N * (N + 1)))[..., : N * N]
    return jnp.reshape(flat, (*b, N, N))


def subtract_col01_mean(d):
    """Interleaved-shear trace projection: lanes 0 and 1 hold re/im of the
    main diagonal; subtract each lane's own mean (one fused elementwise
    pass; the per-lane sums are a single keepdims reduction)."""
    N = d.shape[-2]
    mask01 = np.zeros((1, d.shape[-1]), dtype=bool)
    mask01[0, :2] = True
    tr = jnp.sum(jnp.where(mask01, d, 0), axis=-2, keepdims=True) / N
    return d - jnp.where(mask01, tr, jnp.zeros_like(tr))


def mat2shear_interleaved(W, tracefree=True):
    """Interleaved shear pack: complex (..., N, N) -> real (..., N, 2(N+1)).

    Same shear trick as :func:`mat2shear` applied to the re/im-interleaved
    real reading of W (lane 2j+c = channel c of shear column j; flat f32
    index 2*(k*(N+1)+j)+c).  This keeps the whole Poisson solve in one real
    array: no per-solve complex->planes stack, channel pad, or plane
    re-complexification copies (measured at N=4096 on v5e those glue copies
    cost ~8 ms of the 9.6 ms poisson core around a 1.6 ms Thomas kernel).
    Each lane is an independent tridiagonal system, so the solve just runs
    with column-duplicated factors.

    The interleave itself is ONE stack pass (jnp .view() of complex arrays
    lowers to strided scatters - the one TPU pathology this module exists
    to avoid)."""
    *b, N, _ = W.shape
    rd = W.real.dtype
    F = jnp.stack([W.real, W.imag], axis=-1)  # (..., N, N, 2)
    flat = jnp.concatenate(
        [jnp.reshape(F, (*b, 2 * N * N)), jnp.zeros((*b, 2 * N), rd)],
        axis=-1,
    )
    D = jnp.reshape(flat, (*b, N, 2 * (N + 1)))
    if tracefree:
        D = subtract_col01_mean(D)
    return D


def shear2mat_interleaved(D):
    """Inverse interleaved shear pack: real (..., N, 2(N+1)) -> complex
    (..., N, N).  Strided lane slices (stride-2 lax.slice, TPU-friendly)
    recombine through one lax.complex pass."""
    *b, N, _ = D.shape
    flat = jnp.reshape(D, (*b, 2 * N * (N + 1)))[..., : 2 * N * N]
    F = jnp.reshape(flat, (*b, N, N, 2))
    return lax.complex(F[..., 0], F[..., 1])


def mat2diagh_rolls(W, tracefree=True, pad_rows=0):
    """Scatter-free skewh pack of (..., N, N) -> (..., R + pad_rows, N)."""
    N = W.shape[-1]
    R = N // 2 + 1
    in_first, _, _ = _skewh_masks(N, pad_rows)
    V = _barrel(W, +1)[..., : R + pad_rows, :]
    d = jnp.where(in_first, V, -jnp.conj(V))
    if tracefree:
        d = subtract_row0_mean(d)
    return d


def diagh2mat_rolls(d):
    """Scatter-free skewh unpack of (..., R [+ pad], N) -> (..., N, N)."""
    N = d.shape[-1]
    R = N // 2 + 1
    in_first, roll_masks, in_upper = _skewh_masks(N, 0)
    x = d[..., :R, :]
    # rows 0..R-1 of the wrapped layout
    top = jnp.where(in_first, x, -jnp.conj(x))
    # rows R..N-1: V'[N - m'] = roll(x[m'], m') with -conj where i >= m'
    z = x
    for b, rmask in enumerate(roll_masks):
        z = jnp.where(rmask, jnp.roll(z, 1 << b, axis=-1), z)
    z = jnp.where(in_upper, -jnp.conj(z), z)
    # m' = 1 .. N-R-1  ->  row N-m' = N-1 .. R+1... flip ordering
    bottom = jnp.flip(z[..., 1 : N - R + 1, :], axis=-2)
    V = jnp.concatenate([top, bottom], axis=-2)
    return _barrel(V, -1)
