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
