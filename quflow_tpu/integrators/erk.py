"""Classical explicit Runge-Kutta integrators (non-conservative references).

Functional parity with reference quflow/integrators/erk.py (euler :17-62,
heun :65-112, rk4 :115-160) on the vector field W' = (1/hbar)[P, W]
(+ forcing); implemented as jitted lax.scan step loops.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.laplacian import solve_poisson
from ..ops.geometry import bracket
from .isospectral import update_stats

__all__ = ["euler", "heun", "rk4", "explicit"]

_cache: dict = {}


def _runner(method, hamiltonian, forcing):
    key = (method, hamiltonian, forcing)
    if key in _cache:
        return _cache[key]

    if forcing is None:
        def rhs(P, W):
            return bracket(P, W)
    else:
        def rhs(P, W):
            return bracket(P, W) + forcing(P, W)

    def f(W):
        return rhs(hamiltonian(W), W)

    if method == "euler":
        def step(W, dt):
            return W + dt * f(W), None
    elif method == "heun":
        def step(W, dt):
            F0 = f(W)
            F1 = f(W + dt * F0)
            return W + (dt / 2.0) * (F0 + F1), None
    elif method == "rk4":
        def step(W, dt):
            K1 = f(W)
            K2 = f(W + (dt / 2.0) * K1)
            K3 = f(W + (dt / 2.0) * K2)
            K4 = f(W + dt * K3)
            return W + (dt / 6.0) * (K1 + 2 * K2 + 2 * K3 + K4), None
    else:  # pragma: no cover
        raise ValueError(method)

    @partial(jax.jit, static_argnames=("steps",))
    def run(W, dt, steps):
        def body(W, _):
            return step(W, dt)

        W, _ = lax.scan(body, W, None, length=steps)
        return W

    _cache[key] = run
    return run


def _integrate(method, W, dt, steps, hamiltonian, forcing, stats=None):
    from ..config import device_for_dtype, device_put_complex, device_get_complex

    if hamiltonian is None:
        hamiltonian = partial(solve_poisson, skewh=True)
    run = _runner(method, hamiltonian, forcing)
    # dt in the STATE's real dtype: with x64 enabled a f64 scalar would
    # promote a c64 carry to c128 inside the scan (carry type mismatch)
    rdt = np.zeros(1, np.dtype(W.dtype)).real.dtype
    with device_for_dtype(W.dtype):
        out = device_get_complex(
            run(device_put_complex(W), jnp.asarray(dt, rdt), steps))
    if stats is not None:
        update_stats(stats, steps=steps)
    if isinstance(W, np.ndarray):
        np.copyto(W, out)
        return W
    return out


def euler(W, dt, steps=100, hamiltonian=None, forcing=None, stats=None, **kwargs):
    """Explicit Euler (first order)."""
    return _integrate("euler", W, dt, steps, hamiltonian, forcing, stats)


def heun(W, dt, steps=100, hamiltonian=None, forcing=None, stats=None, **kwargs):
    """Heun's method (second order)."""
    return _integrate("heun", W, dt, steps, hamiltonian, forcing, stats)


def rk4(W, dt, steps=100, hamiltonian=None, forcing=None, stats=None, **kwargs):
    """Classical fourth-order Runge-Kutta."""
    return _integrate("rk4", W, dt, steps, hamiltonian, forcing, stats)


explicit = heun
