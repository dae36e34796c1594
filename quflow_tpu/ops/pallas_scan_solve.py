"""Pallas TPU kernel: blocked-affine-scan batched tridiagonal solve.

Successor to the serial-Thomas kernels in ops/pallas_solve.py.  Profiling the
chunked Thomas pipeline at N=4096 showed ~75 us per (chunk, tile) grid cell
against a ~8 us bandwidth bound: the inner ``fori_loop`` issues one (1, tile)
row FMA per recurrence step - thousands of latency-bound tiny VPU ops, 1/8
sublane utilization (benchmarks/sweep_round2.json: solve_bw_util 0.04 where
the XLA scan layout reaches 0.17).

This kernel evaluates the same first-order affine recurrence

    y_i = c_i * y_{i-1} + v_i        (c = -w forward; c = -u backward)

with a Hillis-Steele inclusive scan over the whole (CH, T) block: log2(CH)
stages of full-width VPU ops (compose (c,v) pairs shifted by 1,2,4,...),
then one fused carry application y = v + c * carry_in.  Work goes from CH
latency-bound row ops to ~5*log2(CH) full-block passes; HBM traffic stays
O(N^2) (the associative-scan XLA solver pays O(N^2 log N)).

Grid/layout contract matches ops/pallas_solve._solve_T_chunked: arrays are
(C, N, Rp) channel-major with the recurrence along axis -2 and the
independent systems across lanes; the chunk axis is the sequential grid
dimension with the cross-chunk carry in VMEM scratch.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["solve_scan_chunked", "scan_base_cols"]


def _shift_down(x, s):
    """x shifted down s rows along axis 0, top filled with identity values
    supplied by the caller's mask (the fill rows are masked out, so their
    content is irrelevant - a static slice + concat avoids tpu.dynamic_rotate,
    which fails Mosaic verification on v5e)."""
    return jnp.concatenate([x[:s, :], x[:-s, :]], axis=0)


def _block_affine_scan(c, v):
    """Inclusive affine-prefix scan along axis 0 of (CH, T) blocks:
    returns (C, y0) with C the composed coefficient prefix and y0 the
    zero-carry prefix value."""
    CH = c.shape[0]
    s = 1
    while s < CH:
        # rows >= s compose with the prefix ending s rows above; rows < s
        # compose with the identity map (1, 0)
        mask = lax.broadcasted_iota(jnp.int32, c.shape, 0) >= s
        c_prev = jnp.where(mask, _shift_down(c, s), jnp.ones_like(c))
        v_prev = jnp.where(mask, _shift_down(v, s), jnp.zeros_like(v))
        c, v = c * c_prev, v + c * v_prev
        s *= 2
    return c, v


def _fwd_scan_kernel(w_ref, d_ref, y_ref, carry):
    """Forward elimination y_i = d_i - w_i y_{i-1} on one (CH, T) chunk."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        carry[0, :] = jnp.zeros_like(carry[0, :])

    C, y0 = _block_affine_scan(-w_ref[...], d_ref[...])
    y = y0 + C * carry[0, :][None, :]
    y_ref[...] = y
    carry[0, :] = y[y.shape[0] - 1, :]


def _shift_up(x, s):
    """x shifted up s rows along axis 0 (fill rows are masked by caller)."""
    return jnp.concatenate([x[s:, :], x[-s:, :]], axis=0)


def _block_affine_scan_up(c, v):
    """Suffix (bottom-up) affine scan along axis 0: evaluates the upward
    recurrence x_i = c_i x_{i+1} + v_i with zero carry below the block
    (jnp.flip is not lowerable in Mosaic, so the reversal is built into the
    shift direction instead)."""
    CH = c.shape[0]
    s = 1
    while s < CH:
        mask = lax.broadcasted_iota(jnp.int32, c.shape, 0) < (CH - s)
        c_next = jnp.where(mask, _shift_up(c, s), jnp.ones_like(c))
        v_next = jnp.where(mask, _shift_up(v, s), jnp.zeros_like(v))
        c, v = c * c_next, v + c * v_next
        s *= 2
    return c, v


def _bwd_scan_kernel(binv_ref, u_ref, y_ref, x_ref, carry):
    """Back substitution x_i = y_i binv_i - u_i x_{i+1}, chunks visited in
    reverse grid order with the carry crossing chunk boundaries."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        carry[0, :] = jnp.zeros_like(carry[0, :])

    g = y_ref[...] * binv_ref[...]
    C, x0 = _block_affine_scan_up(-u_ref[...], g)
    x = x0 + C * carry[0, :][None, :]
    x_ref[...] = x
    carry[0, :] = x[0, :]


@partial(jax.jit, static_argnames=("tile", "chunk", "interpret"))
def solve_scan_chunked(wT, binvT, uT, dT, tile=512, chunk=512, interpret=False):
    """Blocked-scan solve with the _solve_T_chunked layout: all arrays
    (C, N, Rp) with Rp % tile == 0 and N % chunk == 0; recurrences along
    axis -2.  Returns xT (C, N, Rp)."""
    Cc, N, Rp = dT.shape
    K = N // chunk
    grid = (Cc, Rp // tile, K)
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
        _fwd_scan_kernel,
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
        _bwd_scan_kernel,
        out_shape=jax.ShapeDtypeStruct(dT.shape, dt),
        grid=grid,
        in_specs=[rev_f, rev_f, rev_d],
        out_specs=rev_d,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(dimension_semantics=seq),
    )(binvT, uT, y)


def scan_base_cols(w, binv, u, tile=None, chunk=None, interpret=False):
    """Base solver ``d -> x`` for the *shear* layout (rhs (..., N, M),
    recurrence along axis -2), backed by the blocked-scan kernel.  Factors
    are the column-transposed (N, M) arrays (stepper._shear_factors_cached).

    Drop-in alternative to ops/pallas_solve.pallas_base_cols.
    """
    import os

    interpret = interpret or jax.default_backend() != "tpu"
    N, M = np.shape(w)
    if tile is None:
        tile = int(os.environ.get("QUFLOW_PALLAS_TILE", "512"))
        tile = min(tile, _round_up(M, 128))
    if chunk is None:
        chunk = int(os.environ.get("QUFLOW_PALLAS_CHUNK", "512"))
    if N % chunk != 0:
        chunk = max(c for c in range(1, min(chunk, N) + 1) if N % c == 0)
    wn = jnp.asarray(w)
    bn = jnp.asarray(binv)
    un = jnp.asarray(u)
    pad = (-M) % tile
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
        xT = solve_scan_chunked(
            wn.astype(dt), bn.astype(dt), un.astype(dt), flat,
            tile=tile, chunk=chunk, interpret=interpret,
        )
        x = xT[..., :M].reshape(lead + (N, M))
        return lax.complex(x[0], x[1]) if cplx else x[0]

    return base


def _round_up(x, m):
    return ((x + m - 1) // m) * m
