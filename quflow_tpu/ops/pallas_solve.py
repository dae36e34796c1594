"""Pallas TPU kernel: batched prefactorized Thomas solve.

This is the Pallas counterpart of ops/tridiag.solve_factored (the W -> P hot
kernel), playing the role of the reference's cuSPARSE gtsv2StridedBatch path
(reference quflow/experimental/cuda.py:358-418).

Layout: the packed right-hand side is held *transposed* as (N, R) so that
the sequential Thomas recurrence runs along the sublane dimension while the
R independent systems vectorize across lanes (128-wide VPU ops per
recurrence step).  The grid tiles the R axis; each program solves a
(N, TR) block entirely in VMEM - forward elimination and back substitution
fused with zero HBM round-trips, since the factor arrays are resident too.

Two real channels (re, im) are solved per call (the operator is real).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["solve_factored_pallas", "pallas_base", "pallas_base_cols", "pad_cols"]


def pad_cols(R, tile):
    return (-R) % tile


def _thomas_kernel(w_ref, binv_ref, u_ref, d_ref, out_ref):
    """Refs are (N, TR) blocks: solve in place along the first axis.

    Loop bounds are explicit int32: under global x64 the default i64 indices
    fail Mosaic verification (tpu.memref_slice wants i32).
    """
    N = d_ref.shape[0]
    i32 = jnp.int32

    # forward elimination: y_k = d_k - w_k * y_{k-1}
    def fwd(k, y_prev):
        y = d_ref[k, :] - w_ref[k, :] * y_prev
        d_ref[k, :] = y
        return y

    y0 = d_ref[0, :]
    ylast = lax.fori_loop(i32(1), i32(N), fwd, y0)

    # back substitution: x_k = y_k * binv_k - u_k * x_{k+1}
    xlast = ylast * binv_ref[N - 1, :]
    out_ref[N - 1, :] = xlast

    def bwd(i, x_next):
        k = i32(N - 2) - i
        x = d_ref[k, :] * binv_ref[k, :] - u_ref[k, :] * x_next
        out_ref[k, :] = x
        return x

    lax.fori_loop(i32(0), i32(N - 1), bwd, xlast)


@partial(jax.jit, static_argnames=("tile", "interpret"))
def _solve_T(wT, binvT, uT, dT, tile=128, interpret=False):
    """Solve with transposed layout: all arrays (C, N, Rp) with Rp % tile == 0.
    Returns xT (C, N, Rp)."""
    C, N, Rp = dT.shape
    grid = (C, Rp // tile)
    # Index maps derive their zero from the i32 grid index (c * 0): a literal
    # 0 is traced as a weak i64 under global x64 and Mosaic then fails to
    # legalize the index-map function's (i64, i32) return.
    spec_f = pl.BlockSpec((N, tile), lambda c, r: (c * 0, r), memory_space=pltpu.VMEM)
    # None squeezes the channel dim: refs arrive as (N, tile) with no leading
    # block index (a manual ref.at[0] squeeze emits an i64 memref_slice under
    # global x64, which Mosaic rejects).
    spec_d = pl.BlockSpec(
        (None, N, tile), lambda c, r: (c, c * 0, r), memory_space=pltpu.VMEM
    )

    return pl.pallas_call(
        _thomas_kernel,
        out_shape=jax.ShapeDtypeStruct(dT.shape, dT.dtype),
        grid=grid,
        in_specs=[spec_f, spec_f, spec_f, spec_d],
        out_specs=spec_d,
        interpret=interpret,
    )(wT, binvT, uT, dT)


def solve_factored_pallas(w, binv, u, d_planes, tile=128, interpret=False):
    """Solve the batched systems for real channel planes.

    Parameters
    ----------
    w, binv, u: (R, N) factor arrays (numpy or jax, any float dtype)
    d_planes:   (C, R, N) right-hand-side channels
    Returns (C, R, N) solution.
    """
    C, R, N = d_planes.shape
    pad = pad_cols(R, tile)
    dt = d_planes.dtype

    def prep(f, fill):
        f = jnp.asarray(f, dtype=dt)
        if pad:
            f = jnp.concatenate(
                [f, jnp.full((pad, N), fill, dtype=dt)], axis=0
            )
        return jnp.swapaxes(f, 0, 1)  # (N, Rp)

    wT = prep(w, 0.0)
    binvT = prep(binv, 1.0)
    uT = prep(u, 0.0)
    dT = jnp.swapaxes(
        jnp.pad(d_planes, ((0, 0), (0, pad), (0, 0))), 1, 2
    )  # (C, N, Rp)
    xT = _solve_T(wT, binvT, uT, dT, tile=tile, interpret=interpret)
    x = jnp.swapaxes(xT, 1, 2)[:, :R, :]
    return x


def _fwd_chunk_kernel(w_ref, d_ref, y_ref, carry):
    """One (CH, T) chunk of the forward elimination y_i = d_i - w_i y_{i-1};
    ``carry`` persists y across the sequential chunk grid dimension and is
    reset at chunk 0 (w[0] = 0 makes the first step exact with carry 0)."""
    CH = d_ref.shape[0]
    i32 = jnp.int32

    @pl.when(pl.program_id(2) == 0)
    def _():
        carry[0, :] = jnp.zeros_like(carry[0, :])

    def body(i, y_prev):
        y = d_ref[i, :] - w_ref[i, :] * y_prev
        y_ref[i, :] = y
        return y

    last = lax.fori_loop(i32(0), i32(CH), body, carry[0, :])
    carry[0, :] = last


def _bwd_chunk_kernel(binv_ref, u_ref, y_ref, x_ref, carry):
    """One (CH, T) chunk of back substitution x_i = y_i binv_i - u_i x_{i+1},
    chunks visited in reverse; u[N-1] = 0 makes the first step exact with
    carry 0."""
    CH = y_ref.shape[0]
    i32 = jnp.int32

    @pl.when(pl.program_id(2) == 0)
    def _():
        carry[0, :] = jnp.zeros_like(carry[0, :])

    def body(i, x_next):
        k = i32(CH - 1) - i
        x = y_ref[k, :] * binv_ref[k, :] - u_ref[k, :] * x_next
        x_ref[k, :] = x
        return x

    last = lax.fori_loop(i32(0), i32(CH), body, carry[0, :])
    carry[0, :] = last


@partial(jax.jit, static_argnames=("tile", "chunk", "interpret"))
def _solve_T_chunked(wT, binvT, uT, dT, tile=256, chunk=512, interpret=False):
    """Chunked variant of :func:`_solve_T` for large N: VMEM holds only a
    (chunk, tile) window per array, with the recurrence carry in persistent
    scratch across the sequential chunk grid axis.  Two pallas calls
    (forward, then backward over reversed chunks); the eliminated rhs makes
    one HBM round trip - total traffic stays O(N^2) where the
    associative-scan solver pays O(N^2 log N)."""
    C, N, Rp = dT.shape
    K = N // chunk
    grid = (C, Rp // tile, K)
    dt = dT.dtype

    spec_f = pl.BlockSpec(
        (chunk, tile), lambda c, r, k: (k, r), memory_space=pltpu.VMEM
    )
    spec_d = pl.BlockSpec(
        (None, chunk, tile), lambda c, r, k: (c, k, r), memory_space=pltpu.VMEM
    )
    scratch = [pltpu.VMEM((1, tile), dt)]
    seq = ("arbitrary", "arbitrary", "arbitrary")

    y = pl.pallas_call(
        _fwd_chunk_kernel,
        out_shape=jax.ShapeDtypeStruct(dT.shape, dt),
        grid=grid,
        in_specs=[spec_f, spec_d],
        out_specs=spec_d,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(dimension_semantics=seq),
    )(wT, dT)

    rev_f = pl.BlockSpec(
        (chunk, tile), lambda c, r, k: (K - 1 - k, r), memory_space=pltpu.VMEM
    )
    rev_d = pl.BlockSpec(
        (None, chunk, tile), lambda c, r, k: (c, K - 1 - k, r),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _bwd_chunk_kernel,
        out_shape=jax.ShapeDtypeStruct(dT.shape, dt),
        grid=grid,
        in_specs=[rev_f, rev_f, rev_d],
        out_specs=rev_d,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(dimension_semantics=seq),
    )(binvT, uT, y)


def pallas_base_cols(w, binv, u, tile=None, interpret=False):
    """Base solver for the *shear* layout: rhs (..., N, M) with the
    recurrence along axis -2 and the M systems across lanes - already the
    kernel's native orientation, so unlike :func:`pallas_base` (row
    layouts) no transposes are needed.  ``w``/``binv``/``u`` are the
    (N, M) column-transposed factors (stepper._shear_factors_cached)."""
    import os

    interpret = interpret or jax.default_backend() != "tpu"
    N, M = np.shape(w)
    if tile is None:
        tile = int(os.environ.get("QUFLOW_PALLAS_TILE",
                                  "128" if N <= 2048 else "512"))
    # the monolithic kernel holds 5 (N, tile) blocks double-buffered in
    # VMEM - past N=2048 that overflows ~16 MB, so switch to the chunked
    # two-kernel pipeline (fixed (chunk, tile) windows, carry in scratch)
    chunked = N > 2048
    chunk = int(os.environ.get("QUFLOW_PALLAS_CHUNK", "512"))
    if chunked and N % chunk != 0:
        # largest divisor of N not exceeding the requested chunk: falling
        # back to chunk=N would re-create the VMEM overflow this pipeline
        # exists to avoid
        chunk = max(c for c in range(1, chunk + 1) if N % c == 0)
    elif not chunked:
        chunk = N
    # keep the factors jax-resident: converting to host numpy and back
    # inside the traced base would re-embed three O(N^2) literals in the
    # HLO, breaking the remote-compile transport at large N (the failure
    # the runtime-parameter factors exist to fix)
    wn = jnp.asarray(w)
    bn = jnp.asarray(binv)
    un = jnp.asarray(u)
    pad = pad_cols(M, tile)
    if pad:
        wn = jnp.concatenate([wn, jnp.zeros((N, pad), wn.dtype)], axis=1)
        bn = jnp.concatenate([bn, jnp.ones((N, pad), bn.dtype)], axis=1)
        un = jnp.concatenate([un, jnp.zeros((N, pad), un.dtype)], axis=1)

    def base(d):
        cplx = jnp.iscomplexobj(d)
        planes = jnp.stack([d.real, d.imag]) if cplx else d[None]
        lead = planes.shape[:-2]
        flat = planes.reshape((int(np.prod(lead)), N, M))
        if pad:
            flat = jnp.pad(flat, ((0, 0), (0, 0), (0, pad)))
        dt = flat.dtype
        args = (
            wn.astype(dt), bn.astype(dt), un.astype(dt),
            flat,
        )
        if chunked:
            xT = _solve_T_chunked(*args, tile=tile, chunk=chunk,
                                  interpret=interpret)
        else:
            xT = _solve_T(*args, tile=tile, interpret=interpret)
        x = xT[..., :M].reshape(lead + (N, M))
        return lax.complex(x[0], x[1]) if cplx else x[0]

    return base


def pallas_base(w, binv, u, tile=128, interpret=False):
    """Base-solver callable ``d -> x`` for :func:`tridiag.solve_factored`.

    Accepts real or complex rhs of shape (..., R, N); complex channels and
    any leading batch dims are flattened into the kernel's channel grid
    axis, so one pallas_call covers the whole batch.  On non-TPU backends
    the kernel runs in interpret mode (bit-equivalent; lets layout='pallas'
    be exercised by the CPU test suite).
    """
    interpret = interpret or jax.default_backend() != "tpu"

    def base(d):
        cplx = jnp.iscomplexobj(d)
        planes = jnp.stack([d.real, d.imag]) if cplx else d[None]
        lead = planes.shape[:-2]
        R, N = planes.shape[-2:]
        flat = planes.reshape((int(np.prod(lead)), R, N))
        x = solve_factored_pallas(w, binv, u, flat, tile=tile, interpret=interpret)
        x = x.reshape(lead + (R, N))
        return lax.complex(x[0], x[1]) if cplx else x[0]

    return base
