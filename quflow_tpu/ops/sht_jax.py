"""Jitted device-side spherical-harmonic transform (Gauss-Legendre grid).

Device counterpart of ops/sht.py for on-accelerator visualization pipelines
and differentiable objectives: the per-m Legendre contractions become one
padded einsum against a precomputed (L, ntheta, L) tensor (MXU) and the
longitude transform a (i)FFT (batched, VPU) - no host round-trip.

Suitable for moderate band limits (the basis tensor is L^2(L+1)/2-ish dense,
~L^3 floats; L=256 -> 134 MB f64 / 67 MB f32); the host implementation
remains the general path.

Split-complex I/O variants are provided because the TPU runtime here cannot
transfer complex arrays.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .sht import legendre_blocks, _gl

__all__ = ["build_synthesis_fn", "build_analysis_fn", "legendre_tensor"]


@lru_cache(maxsize=8)
def legendre_tensor(L, dtype_str="float64"):
    """(L, ntheta, L) tensor P with P[m, k, l-m] = Pbar_lm(x_k), zero-padded."""
    x, wq = _gl(L)
    T = np.zeros((L, L, L), dtype=np.dtype(dtype_str))
    for m, block in legendre_blocks(L, x):
        T[m, :, : L - m] = block
    return T, wq.astype(np.dtype(dtype_str))


@lru_cache(maxsize=8)
def _flm_maps(L):
    """Index maps between the flat pyssht layout and the (m, l-m) grid."""
    lidx = np.arange(L) * (np.arange(L) + 1)
    pos = np.zeros((L, L), dtype=np.int32)
    neg = np.zeros((L, L), dtype=np.int32)
    valid = np.zeros((L, L))
    for m in range(L):
        for l in range(m, L):
            pos[m, l - m] = lidx[l] + m
            neg[m, l - m] = lidx[l] - m
            valid[m, l - m] = 1.0
    csphase = (-1.0) ** np.arange(L)  # (-1)^m for the negative-m Legendre
    return pos, neg, valid, csphase


def build_synthesis_fn(L, dtype=np.float64, reality=True):
    """Jitted flm (planes (2, L^2)) -> grid planes (2, L, 2L-1)
    (imaginary plane is zero for reality=True)."""
    rd = np.dtype(dtype)
    T, _ = legendre_tensor(L, str(rd))
    pos, neg, valid, cs = _flm_maps(L)
    nphi = 2 * L - 1
    Tj = jnp.asarray(T)

    @jax.jit
    def synthesis(flm_planes):
        flm = jax.lax.complex(flm_planes[0].astype(rd), flm_planes[1].astype(rd))
        cpos = flm[pos] * valid  # (L=m, L=l-m)
        cneg = flm[neg] * valid
        Gpos = jnp.einsum("mkl,ml->km", Tj, cpos)  # (ntheta, m)
        Gneg = jnp.einsum("mkl,ml->km", Tj, cneg * cs[:, None])
        G = jnp.zeros((L, nphi), dtype=flm.dtype)
        G = G.at[:, :L].set(Gpos)
        G = G.at[:, nphi - L + 1 :].set(Gneg[:, 1:][:, ::-1])
        f = jnp.fft.ifft(G, axis=1) * nphi
        out = f.real if reality else f
        return jnp.stack([out if reality else out.real,
                          jnp.zeros_like(f.real) if reality else f.imag])

    return synthesis


def build_analysis_fn(L, dtype=np.float64, reality=True):
    """Jitted grid planes (2, L, 2L-1) -> flm planes (2, L^2)."""
    rd = np.dtype(dtype)
    T, wq = legendre_tensor(L, str(rd))
    pos, neg, valid, cs = _flm_maps(L)
    nphi = 2 * L - 1
    Tw = jnp.asarray(T * wq[None, :, None])

    @jax.jit
    def analysis(f_planes):
        f = jax.lax.complex(f_planes[0].astype(rd), f_planes[1].astype(rd))
        F = jnp.fft.fft(f, axis=1) * (2.0 * np.pi / nphi)
        cpos = jnp.einsum("mkl,km->ml", Tw, F[:, :L])
        Fneg = jnp.concatenate([F[:, :1], F[:, nphi - L + 1 :][:, ::-1]], axis=1)
        cneg = jnp.einsum("mkl,km->ml", Tw, Fneg) * cs[:, None]
        flm = jnp.zeros(L * L, dtype=f.dtype)
        flm = flm.at[pos.ravel()].add(jnp.where(valid.astype(bool), cpos, 0.0).ravel())
        mneg = valid.copy()
        mneg[0] = 0.0
        flm = flm.at[neg.ravel()].add(jnp.where(mneg.astype(bool), cneg, 0.0).ravel())
        if reality:
            # project to real-signal coefficients like the host path
            fpos = flm[pos] * valid
            fneg = flm[neg] * valid
            avg = 0.5 * (fpos + cs[:, None] * jnp.conj(fneg))
            flm2 = jnp.zeros(L * L, dtype=f.dtype)
            flm2 = flm2.at[pos.ravel()].add(jnp.where(valid.astype(bool), avg, 0.0).ravel())
            flm2 = flm2.at[neg.ravel()].add(
                jnp.where(mneg.astype(bool), cs[:, None] * jnp.conj(avg), 0.0).ravel()
            )
            # m=0 coefficients real
            lidx = np.arange(L) * (np.arange(L) + 1)
            flm2 = flm2.at[lidx].set(flm2[lidx].real.astype(f.dtype))
            flm = flm2
        return jnp.stack([flm.real, flm.imag])

    return analysis
