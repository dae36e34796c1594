"""Global quasi-geostrophic flow: Euler dynamics with the QG stream operator
(Delta - (gamma/2)(Z^2 . + . Z^2))^-1 as Hamiltonian (reference
cpu.py:829-877 ``solve_globalqg``)."""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

from ..ops.laplacian import solve_globalqg
from ..integrators.isospectral import isomp_fixedpoint
from .euler import EulerFlow


@dataclass
class GlobalQGFlow(EulerFlow):
    gamma: float = 1.0

    def hamiltonian(self, W):
        return solve_globalqg(W, gamma=self.gamma, skewh=True)

    def step(self, W, dt, steps=1, **kwargs):
        ham = partial(solve_globalqg, gamma=self.gamma, skewh=True)
        return isomp_fixedpoint(W, dt, steps=steps, hamiltonian=ham, **kwargs)

    def stepper(self, dt, steps, maxit=5, minit=5, compsum=True,
                forcing=None, strang_splitting=None, **kwargs):
        """Jitted production runner with the prefactorized QG stream
        operator as Hamiltonian - same cost as the Euler fast path (the QG
        operator is the same tridiagonal family with a shifted main
        diagonal).  ``forcing``/``strang_splitting`` hook the
        forced-dissipative QG configuration straight into the hot path
        (see parallel.stepper.build_step_fn)."""
        from ..parallel.stepper import build_step_fn

        return build_step_fn(
            self.N, dt, steps=steps, maxit=maxit, dtype=self.dtype,
            compsum=compsum, hamiltonian=("globalqg", float(self.gamma)),
            forcing=forcing, strang_splitting=strang_splitting, **kwargs
        )
