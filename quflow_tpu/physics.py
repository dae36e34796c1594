"""Physical functionals: energies, enstrophy, Sobolev inner products,
sectional curvature.  Parity with reference quflow/physics.py:9-58; all
functions are jax-traceable and usable as jitted device-side loggers.
"""

from __future__ import annotations

import jax.numpy as jnp

from .ops.laplacian import solve_poisson, laplace
from .ops.geometry import inner_L2
from .integrators.isospectral import commutator

__all__ = [
    "inner_Hm1",
    "norm_Hm1",
    "inner_H1",
    "norm_H1",
    "energy_euler",
    "enstrophy",
    "sectional_curvature",
]


def inner_Hm1(W1, W2):
    P2 = solve_poisson(W2, skewh=True)
    return -inner_L2(W1, P2)


def norm_Hm1(W):
    return jnp.sqrt(inner_Hm1(W, W))


def inner_H1(P1, P2):
    W2 = laplace(P2, skewh=True)
    return -inner_L2(P1, W2)


def norm_H1(P):
    return jnp.sqrt(inner_H1(P, P))


def energy_euler(W):
    """Kinetic energy -<W, P>/2 of the Euler state W."""
    P = solve_poisson(W, skewh=True)
    return -inner_L2(W, P) / 2.0


def enstrophy(W):
    """Enstrophy <W, W>/2."""
    return inner_L2(W, W) / 2.0


def sectional_curvature(F, G):
    """Sectional curvature of the quantized diffeomorphism group along the
    plane spanned by stream matrices F, G (reference physics.py:41-58)."""
    DeltaF = laplace(F, skewh=True)
    DeltaG = laplace(G, skewh=True)
    FGcomm = commutator(F, G)
    DeltaFGcomm = commutator(DeltaF, G)
    DeltaGFcomm = commutator(DeltaG, F)
    DeltaFFcomm = commutator(DeltaF, F)
    DeltaGGcomm = commutator(DeltaG, G)

    s = DeltaFGcomm + DeltaGFcomm
    C = -inner_L2(s, solve_poisson(s, skewh=True)) / 4.0
    C -= inner_L2(FGcomm, DeltaFGcomm - DeltaGFcomm) / 2.0
    C += inner_L2(FGcomm, laplace(FGcomm, skewh=True)) * (3.0 / 4.0)
    C += inner_L2(DeltaFFcomm, solve_poisson(DeltaGGcomm, skewh=True))
    return C
