"""Double-word (f64-accurate) matmul on the bf16 MXU via Ozaki-style splitting.

TPU v5e has no float64 matmul; its MXU multiplies bf16 operands exactly and
accumulates in float32.  The reference framework relies on complex128 BLAS for
its machine-precision Casimir conservation (reference README.md:73-76,
quflow/integrators/isospectral.py:553-586) - this module provides the
TPU-native equivalent: an error-free-transformation GEMM in the style of the
Ozaki scheme.

How it works
------------
Each float64 operand is split into ``q`` bf16 slices whose mantissas carry
``t`` bits each, aligned to a power-of-two grid that is *constant along the
contraction axis* (per-row grid for the left operand, per-column for the
right).  Then every slice-pair product is an integer multiple of a fixed grid
``gA[i] * gB[j]`` with at most ``2t`` significant bits, so the MXU's f32
accumulation of K such products is EXACT as long as

    2*t + ceil(log2 K) <= 24          (f32 mantissa)

(verified on this chip: max error exactly 0.0 for grid-aligned products at
K=1024).  Summing the q(q+1)/2 slice-pair products with ``i+j < q`` in
float64 (elementwise f64 works on v5e) yields a product with relative error
~2^(-t*q) - beyond double precision for the default budgets below - at the
cost of q(q+1)/2 single-pass bf16 MXU passes (vs 6 passes for XLA's
f32-"highest" matmul, which carries ~2^-24 sqrt(K) accumulation error).

Slice budget per contraction length K (t = (24 - ceil(log2 K)) // 2):

    K <= 1024:  t=7, q=8  -> 36 passes, error ~2^-56
    K <= 4096:  t=6, q=9  -> 45 passes, error ~2^-54
    K <= 16384: t=5, q=11 -> 66 passes, error ~2^-55
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = [
    "dw_matmul",
    "dw_matmul_planes",
    "dw_split",
    "dw_split_planes",
    "dw_matmul_planes_split",
    "split_params",
]


def split_params(K, target_bits=53):
    """(t, q): bits per slice and slice count for contraction length K.

    ``t`` is the largest slice width with exact f32 accumulation of K
    products (2t + ceil(log2 K) <= 24); ``q`` covers ``target_bits`` of the
    operand mantissa (53 = full f64)."""
    # exact f32 accumulation: 2t + log2 K <= 24; exact bf16 slice storage:
    # t <= 8 (bf16 carries 8 significand bits, so |round(x/g)| <= 2^t is
    # exact only up to t = 8)
    t = min(8, (24 - max(1, int(np.ceil(np.log2(K))))) // 2)
    if t < 2:
        raise ValueError(f"contraction length {K} too large for exact bf16 split")
    q = int(np.ceil(target_bits / t)) + 1  # +1: one guard slice
    return t, q


def dw_split(A, t, q, axis):
    """Split a float array into q bf16 slices plus the alignment exponents.

    ``axis`` is the contraction axis of the *operand* (the one the matmul
    sums over): the power-of-two alignment grid is constant along it (max
    taken over it), which is what makes slice-pair products grid-aligned and
    the MXU accumulation exact.

    Returns a list of q bf16 arrays whose (f64) sum reconstructs A to
    t*q bits.

    f64 elementwise is software-emulated on TPU and the naive q-round loop
    (4 f64 ops per slice) costs as much as the matmuls themselves, so the
    split cascades through THREE levels extracted with f64 (9 f64 ops
    total), each holding <= 21 bits and therefore exactly representable in
    f32; the per-level slices are then peeled off in cheap f32 arithmetic.
    """
    A = jnp.asarray(A)
    f64 = A.dtype == jnp.float64
    mu = jnp.max(jnp.abs(A), axis=axis, keepdims=True)
    # power-of-two >= mu; zero rows get grid 1.0 (their slices are all zero)
    e = jnp.exp2(jnp.ceil(jnp.log2(jnp.where(mu > 0, mu, 1.0))))
    if not f64:
        # f32 input: plain loop (f32 elementwise is native)
        slices = []
        resid = A
        for s in range(q):
            g = (e * (2.0 ** (-t * (s + 1)))).astype(A.dtype)
            sl = jnp.round(resid / g) * g
            resid = resid - sl
            slices.append(sl.astype(jnp.bfloat16))
        return slices

    # ---- f64 fast path: cascade of 3t-bit levels, f32 slice extraction ----
    # scaled to [-1, 1] exactly (e is a power of two)
    scaled = A / e
    lvl_bits = 3 * t  # bits per f32 level; 3t <= 24 for t <= 8
    n_levels = (q + 2) // 3
    levels = []
    resid64 = scaled
    for li in range(n_levels - 1):
        sc = 2.0 ** (lvl_bits * (li + 1))
        lv = jnp.round(resid64 * sc) / sc       # bits [3t*li, 3t*(li+1))
        # rescale the level to O(1) on its own scale (exact: powers of two)
        levels.append((lv * 2.0 ** (lvl_bits * li)).astype(jnp.float32))
        resid64 = resid64 - lv
    levels.append(
        (resid64 * 2.0 ** (lvl_bits * (n_levels - 1))).astype(jnp.float32)
    )
    e32 = e.astype(jnp.float32)
    slices = []
    for li, lev in enumerate(levels):
        resid = lev
        for sj in range(3):
            if 3 * li + sj >= q:
                break
            gl = np.float32(2.0 ** (-t * (sj + 1)))  # grid on this level
            sl = jnp.round(resid / gl) * gl
            resid = resid - sl
            # restore the global scale: level li sits at 2^(-3t*li) * e
            scale = e32 * np.float32(2.0 ** (-lvl_bits * li))
            slices.append((sl * scale).astype(jnp.bfloat16))
    return slices[:q]


def _pair_products(asl, bsl, q, out_dtype):
    """Sum the slice-pair matmuls with i+j < q in float64."""
    out = None
    for i in range(q):
        for j in range(q - i):
            p = jnp.matmul(
                asl[i],
                bsl[j],
                precision=lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            ).astype(out_dtype)
            out = p if out is None else out + p
    return out


def dw_matmul(A, B, target_bits=53, out_dtype=jnp.float64):
    """Error-free-transformed A @ B for real arrays (..., m, k) x (..., k, n).

    Relative error ~2^(-t*q) (beyond f64 for the default budget); all MXU
    work is single-pass bf16, all corrections are elementwise float64.
    """
    K = A.shape[-1]
    t, q = split_params(K, target_bits)
    asl = dw_split(A, t, q, axis=-1)
    bsl = dw_split(B, t, q, axis=-2)
    return _pair_products(asl, bsl, q, out_dtype)


def dw_split_planes(Ap, t, q, axis):
    """Split both planes of a split-real complex operand (2, ..., m, k):
    returns (re_slices, im_slices).  Splitting is the f64-elementwise part
    of the scheme, so operands appearing in several products should be
    split ONCE and multiplied via :func:`dw_matmul_planes_split` (the MHD
    midpoint reuses P as a right operand in three products)."""
    return dw_split(Ap[0], t, q, axis), dw_split(Ap[1], t, q, axis)


def dw_matmul_planes_split(Asl, Bsl, q, out_dtype=jnp.float64):
    """Complex matmul from pre-split operands (see dw_split_planes):
    Asl split along the contraction axis -1, Bsl along -2.

    Four real double-word products (the 4-multiplication form; Karatsuba
    is avoided because its ``t3 - t1 - t2`` cancellation would reintroduce
    f64-level error on the near-exact products)."""
    ar, ai = Asl
    br, bi = Bsl
    re = _pair_products(ar, br, q, out_dtype) - _pair_products(ai, bi, q, out_dtype)
    im = _pair_products(ar, bi, q, out_dtype) + _pair_products(ai, br, q, out_dtype)
    return jnp.stack([re, im])


def dw_matmul_planes(Ap, Bp, target_bits=53, out_dtype=jnp.float64):
    """Complex matmul on split-real planes: Ap, Bp of shape (2, ..., m, k)
    and (2, ..., k, n) as (re, im); returns (2, ..., m, n)."""
    K = Ap.shape[-1]
    t, q = split_params(K, target_bits)
    return dw_matmul_planes_split(
        dw_split_planes(Ap, t, q, axis=-1),
        dw_split_planes(Bp, t, q, axis=-2),
        q, out_dtype,
    )
