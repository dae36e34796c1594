"""Reference-compatible alias module: ``quflow.simulation`` -> quflow_tpu.sim."""

from .sim.simulation import (
    QuSimulation,
    _default_qutypes,
    _default_qutype2varname,
)
from .sim.solve import solve
from .sim.runfile import create_runfile

__all__ = [
    "QuSimulation",
    "solve",
    "create_runfile",
    "_default_qutypes",
    "_default_qutype2varname",
]
