"""Spectral analysis and random initial data.

Parity with reference quflow/analysis.py (``scale_decomposition`` :8-34,
``energy_spectrum``/``enstrophy_spectrum`` :37-75, ``random_shr`` :78-123,
``gamma_ratio`` :126-147); spectra are vectorized with bincount instead of a
per-el Python loop.
"""

from __future__ import annotations

import numpy as np

from .ops.laplacian import solve_poisson
from .transforms import as_shr
from .quantization import mat2shr
from .utils import ind2elm

__all__ = [
    "scale_decomposition",
    "energy_spectrum",
    "enstrophy_spectrum",
    "random_shr",
    "gamma_ratio",
]


def scale_decomposition(W, P=None, hamiltonian=None):
    """Canonical scale separation: Ws = diagonal part of W in the eigenframe
    of P (large scales), Wr = W - Ws (small scales)."""
    if P is None:
        P = hamiltonian(W) if hamiltonian is not None else solve_poisson(W, skewh=True)
    P = np.asarray(P)
    W = np.asarray(W)
    D, E = np.linalg.eig(P)
    EWE = E.conj().T @ W @ E
    D2 = np.diag(np.diag(EWE))
    Ws = E @ D2 @ E.conj().T
    Wr = W - Ws
    return Ws, Wr


def _per_el_power(omegar):
    N = round(np.sqrt(omegar.shape[0]))
    els = ind2elm(np.arange(N**2))[0]
    power = np.bincount(els, weights=np.asarray(omegar) ** 2, minlength=N)
    return N, power


def energy_spectrum(data, beta=0):
    """Energy per spherical-harmonic degree el (H^{1-beta/2} weighting)."""
    omegar = as_shr(data)
    N, power = _per_el_power(omegar)
    el = np.arange(1, N)
    energy = power[1:] / (el * (el + 1.0)) ** (1 - beta / 2)
    return el, energy


def enstrophy_spectrum(data):
    """Enstrophy per spherical-harmonic degree el."""
    omegar = as_shr(data)
    N, power = _per_el_power(omegar)
    return np.arange(1, N), power[1:]


def random_shr(lmax=127, s=1.0, gamma=0.0, seed=None, **kwargs):
    """Random H^s-smooth real SH coefficients with unit L^2 norm and
    controlled angular-momentum ratio gamma (0 <= gamma < 1)."""
    N = lmax + 1
    rng = np.random.RandomState(seed) if seed is not None else np.random
    omega = rng.randn(N**2)
    omega[0] = 0.0
    if s != 0.0:
        els = ind2elm(np.arange(N**2))[0]
        omega[1:] = omega[1:] / (els[1:] * (els[1:] + 1.0)) ** (s / 2)
    if gamma == 0.0:
        omega[1:4] = 0.0
    elif gamma is not None:
        ens = (omega[4:] ** 2).sum()
        angmom = np.sqrt(ens / (1 - gamma**2)) * gamma
        omega[1:4] *= angmom / np.linalg.norm(omega[1:4])
    omega /= np.linalg.norm(omega)
    return omega


def gamma_ratio(data):
    """Ratio between total angular momentum and sqrt of enstrophy."""
    data = np.asarray(data)
    if data.ndim == 2:
        omega = mat2shr(data)
    else:
        omega = data
    return np.linalg.norm(omega[1:4]) / np.linalg.norm(omega)
