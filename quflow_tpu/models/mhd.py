"""Quantized magnetohydrodynamics on the sphere: two-component state
(W, Theta) stepped by the magnetic midpoint method (reference
quflow/integrators/mhd.py)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..integrators.mhd import magmp_fixedpoint, solve_mhd
from ..analysis import random_shr
from ..quantization import shr2mat
from .euler import EulerFlow


@dataclass
class MHDFlow(EulerFlow):
    def hamiltonian(self, state):
        return solve_mhd(state)

    def random_initial(self, lmax=10, s=1.0, theta_scale=0.1, seed=42, **kwargs):
        W = shr2mat(random_shr(lmax=lmax, s=s, seed=seed), N=self.N)
        Theta = theta_scale * shr2mat(
            random_shr(lmax=lmax, s=s, seed=seed + 1), N=self.N
        )
        return np.stack([W, Theta]).astype(self.dtype)

    def step(self, state, dt, steps=1, **kwargs):
        return magmp_fixedpoint(state, dt, steps=steps, **kwargs)
