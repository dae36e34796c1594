"""Jittable band-limited quantization maps (device-side shr <-> mat).

The host transforms (quantization/transforms.py) loop over m with per-m
matvecs - exact and general, but not traceable.  For band-limited
coefficients (el <= lmax, the practical case for initial data and on-device
diagnostics; cf. reference quantization.py:192-196 truncation logic and
SURVEY.md section 7.1.6), the whole map is one padded einsum against a
precomputed (lmax+1, N, lmax+1) basis tensor - MXU-shaped, fully
differentiable and shardable.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import elm2ind
from .basis import get_basis, basis_break_index
from ..ops.diagpack import diagh2mat, mat2diagh, num_rows

__all__ = ["build_shr2mat_fn", "build_mat2shr_fn", "basis_tensor"]


@lru_cache(maxsize=16)
def basis_tensor(N, lmax):
    """(lmax+1, N, lmax+1) real tensor B with B[m, i, l-m] = basis block
    column entry; zero-padded outside each block's support.

    Built from *truncated* per-m eigendecompositions (never materializes the
    O(N^3/3) full basis), so it scales to large N for band-limited work."""
    assert lmax < N, "lmax must be < N"
    assert lmax + 1 <= num_rows(N, True), "band limit too large for skewh packing"
    from .basis import basis_block, _basis_cache
    from .transforms import _block

    L = lmax + 1
    B = np.zeros((L, N, L))
    key = (N, np.dtype(np.float64))
    if key in _basis_cache:  # full basis already resident: reuse it
        basis = _basis_cache[key]
        for m in range(L):
            B[m, : N - m, : L - m] = _block(basis, N, m)[:, : L - m]
    else:
        for m in range(L):
            B[m, : N - m, : L - m] = basis_block(N, m, columns=L - m)
    return B


@lru_cache(maxsize=16)
def _coef_maps(lmax):
    """Index/sign maps turning a flat omega (L^2,) into the per-m complex
    combination oc[m, l-m] = (omega(l,m) - i omega(l,-m)) * sgn / sqrt(2)."""
    L = lmax + 1
    idx_pos = np.zeros((L, L), dtype=np.int32)
    idx_neg = np.zeros((L, L), dtype=np.int32)
    valid = np.zeros((L, L))
    sgn = np.zeros((L, L))
    for m in range(L):
        for l in range(m, L):
            c = l - m
            idx_pos[m, c] = elm2ind(l, m)
            idx_neg[m, c] = elm2ind(l, -m)
            valid[m, c] = 1.0
            sgn[m, c] = 1.0 if m % 2 == 0 else -1.0
    return idx_pos, idx_neg, valid, sgn


def build_shr2mat_fn(N, lmax, dtype=np.complex128):
    """Jitted omega (lmax+1)^2 -> W (N, N) skew-Hermitian."""
    B = jnp.asarray(
        basis_tensor(N, lmax), dtype=np.zeros(1, dtype=dtype).real.dtype
    )
    idx_pos, idx_neg, valid, sgn = _coef_maps(lmax)
    c = 1.0 / np.sqrt(2.0)
    R = num_rows(N, True)

    @jax.jit
    def shr2mat_fn(omega):
        om = omega.astype(B.dtype)
        re = om[idx_pos] * valid * sgn * c
        im = -om[idx_neg] * valid * sgn * c
        # m = 0 row: diag built from omega(l, 0) directly (real, no sqrt2)
        re = re.at[0].set(om[idx_pos[0]] * valid[0])
        im = im.at[0].set(0.0)
        diag_re = jnp.einsum("mnl,ml->mn", B, re)
        diag_im = jnp.einsum("mnl,ml->mn", B, im)
        # packed lower diagonals of W = i * conj(diag_m)  (row 0: i * diag_0)
        low = jax.lax.complex(diag_im, diag_re)  # i*(a - i b) = b + i a
        low = low.at[0].set(jax.lax.complex(jnp.zeros_like(diag_re[0]), diag_re[0]))
        d = jnp.zeros((R, N), dtype=low.dtype)
        d = d.at[: lmax + 1].set(low)
        return diagh2mat(d, skewh=True)

    return shr2mat_fn


def build_mat2shr_fn(N, lmax, dtype=np.complex128):
    """Jitted W (N, N) -> omega (lmax+1)^2 (adjoint projection / N)."""
    rd = np.zeros(1, dtype=dtype).real.dtype
    B = jnp.asarray(basis_tensor(N, lmax), dtype=rd)
    idx_pos, idx_neg, valid, sgn = _coef_maps(lmax)
    L = lmax + 1
    sqrt2 = np.sqrt(2.0)

    @jax.jit
    def mat2shr_fn(W):
        d = mat2diagh(W, skewh=True, tracefree=False)[: L]
        opc = jnp.einsum("mn,mnl->ml", d, B.astype(d.dtype))
        omega = jnp.zeros(L * L, dtype=rd)
        om_pos = sqrt2 * sgn * opc.imag * valid
        om_neg = -sqrt2 * sgn * opc.real * valid
        # m = 0: omega(l, 0) = Re(diag . B0 / i) = Im(diag . B0)
        om_pos = om_pos.at[0].set(opc[0].imag * valid[0])
        omega = omega.at[idx_pos.ravel()].add(
            jnp.where(valid.astype(bool), om_pos, 0.0).ravel()
        )
        mneg = valid.copy()
        mneg[0] = 0.0  # m=0 stored once
        omega = omega.at[idx_neg.ravel()].add(
            jnp.where(mneg.astype(bool), om_neg, 0.0).ravel()
        )
        return omega / N

    return mat2shr_fn
