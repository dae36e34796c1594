"""The flagship model: 2-D incompressible Euler on the sphere, quantized.

In the reference this model is implicit (solve_poisson is the default
hamiltonian everywhere); here it is an explicit model object that owns its
configuration, builds jitted/sharded steppers, and provides initial data -
the TPU-native equivalent of reference simulation defaults
(quflow/simulation.py:722-729) + experimental/isospectral_cuda.py ``IsompCUDA``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..ops.laplacian import solve_poisson
from ..ops.geometry import hbar
from ..analysis import random_shr
from ..quantization import shr2mat
from ..integrators.isospectral import isomp_fixedpoint, estimate_stepsize


@dataclass
class EulerFlow:
    """Quantized Euler flow at band limit N.

    Parameters
    ----------
    N: matrix size (band limit + 1)
    dtype: complex state dtype (complex128 for accuracy gates, complex64 for
        the TPU fast path - TPU v5e has no C128 support)
    """

    N: int
    dtype: np.dtype = np.complex128

    def hamiltonian(self, W):
        return solve_poisson(W, skewh=True)

    @property
    def hbar(self):
        return hbar(self.N)

    def random_initial(self, lmax=10, s=1.0, gamma=0.0, seed=42):
        """Random smooth band-limited vorticity (the reference's canonical
        demo initial data, analysis.py:78-123)."""
        omega0 = random_shr(lmax=lmax, s=s, gamma=gamma, seed=seed)
        return shr2mat(omega0, N=self.N).astype(self.dtype)

    def stepsize(self, W, safety_factor=0.1):
        return estimate_stepsize(np.asarray(W), safety_factor=safety_factor)

    def step(self, W, dt, steps=1, **kwargs):
        """Advance ``steps`` isospectral midpoint steps."""
        return isomp_fixedpoint(W, dt, steps=steps, **kwargs)

    def stepper(self, dt, steps, maxit=5, minit=5, compsum=True, **kwargs):
        """Return a pure jittable W -> W function taking ``steps`` branch-free
        midpoint steps with a fixed number of fixed-point iterations (the
        TPU production configuration: no host syncs inside the loop).
        Physics hooks (``forcing``, ``strang_splitting``, ``hamiltonian``)
        and all other build_step_fn options pass through ``kwargs``."""
        from ..parallel.stepper import build_step_fn

        return build_step_fn(
            self.N, dt, steps=steps, maxit=maxit, dtype=self.dtype,
            compsum=compsum, **kwargs
        )
