"""Declarative callable registry for simulation persistence.

The reference pickles callables (hamiltonian/integrator/loggers) into HDF5
attrs and exec's stored 'prerun' source on load (reference
quflow/simulation.py:136-142, 203-234, 258-263) - a security and portability
hazard SURVEY.md section 5 flags as not-to-copy.  Here persisted callables
are stored *by name* and resolved through this registry; arbitrary code never
runs on load (a stored ``prerun`` string is only executed when the user opts
in with ``trusted=True``).
"""

from __future__ import annotations

import warnings

_REGISTRY: dict = {}

_RAISE = object()  # sentinel: resolve() raises on unknown names by default


def register(name, fn=None):
    """Register a callable for by-name persistence.  Usable as decorator."""
    if fn is None:
        def deco(f):
            _REGISTRY[name] = f
            return f

        return deco
    _REGISTRY[name] = fn
    return fn


def resolve(name, default=_RAISE, warn=True):
    """Name -> callable.

    Unknown names raise ``KeyError`` with a ``register()`` hint at resolve
    time (not later, deep inside ``solve()``, as a confusing TypeError).
    Callers that can degrade gracefully (e.g. optional loggers) pass an
    explicit ``default``.
    """
    if name in _REGISTRY:
        return _REGISTRY[name]
    if default is not _RAISE:
        if not warn:
            return default
        warnings.warn(
            f"Callable '{name}' is not registered in quflow_tpu.sim.registry; "
            f"using default {default!r}.  Register it with "
            f"quflow_tpu.sim.registry.register({name!r}, fn) before resuming."
        )
        return default
    raise KeyError(
        f"Callable '{name}' is not registered in quflow_tpu.sim.registry. "
        f"A simulation persisted it by name; register the implementation "
        f"before resuming:  from quflow_tpu.sim import registry; "
        f"registry.register({name!r}, your_function)"
    )


def name_of(fn):
    """Callable -> registered name (or its __name__ if registered that way)."""
    for k, v in _REGISTRY.items():
        if v is fn:
            return k
    nm = getattr(fn, "__name__", None)
    if nm in _REGISTRY:
        return nm
    return None


def _register_defaults():
    from ..ops import laplacian as lap
    from ..integrators import isospectral as iso
    from ..integrators import erk, mhd
    from .. import physics
    from ..ops import geometry

    def isomp_tpu(W, dt, steps=100, **kwargs):
        """Registrable TPU-stepper integrator (module-level warm instance)."""
        from ..parallel.stepper import IsompTPU

        global _ISOMP_TPU
        try:
            inst = _ISOMP_TPU
        except NameError:
            inst = None
        if inst is None:
            import numpy as _np

            inst = IsompTPU(
                maxit=int(kwargs.pop("maxit", 5)),
                dtype=_np.complex64 if kwargs.pop("fast", True) else _np.complex128,
            )
            globals()["_ISOMP_TPU"] = inst
        for k in ("tol", "minit", "compsum", "verbatim", "time", "maxit", "fast"):
            kwargs.pop(k, None)
        return inst(W, dt, steps=steps, **kwargs)

    _REGISTRY.setdefault("isomp_tpu", isomp_tpu)

    def magmp_tpu(W, dt, steps=100, **kwargs):
        """Registrable device-resident MHD integrator (warm module-level
        instance; MHD twin of isomp_tpu)."""
        from ..parallel.stepper import MagmpTPU

        global _MAGMP_TPU
        try:
            inst = _MAGMP_TPU
        except NameError:
            inst = None
        if inst is None:
            import numpy as _np

            inst = MagmpTPU(
                maxit=int(kwargs.pop("maxit", 5)),
                dtype=_np.complex64 if kwargs.pop("fast", True) else _np.complex128,
            )
            globals()["_MAGMP_TPU"] = inst
        for k in ("tol", "minit", "compsum", "verbatim", "time", "maxit", "fast"):
            kwargs.pop(k, None)
        return inst(W, dt, steps=steps, **kwargs)

    _REGISTRY.setdefault("magmp_tpu", magmp_tpu)

    for mod, names in (
        (lap, ["solve_poisson", "solve_heat", "solve_helmholtz", "solve_viscdamp",
               "solve_globalqg", "laplace"]),
        (iso, ["isomp", "isomp_fixedpoint", "isomp_quasinewton", "isomp_simple"]),
        (erk, ["euler", "heun", "rk4"]),
        (mhd, ["magmp", "magmp_fixedpoint", "solve_mhd"]),
        (physics, ["energy_euler", "enstrophy", "norm_H1", "norm_Hm1"]),
        (geometry, ["norm_L2", "norm_Linf", "norm_L1", "integral"]),
    ):
        for nm in names:
            _REGISTRY.setdefault(nm, getattr(mod, nm))


_register_defaults()
