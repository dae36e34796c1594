from .erk import euler, heun, rk4, explicit
from .isospectral import (
    isomp,
    isomp_fixedpoint,
    isomp_quasinewton,
    isomp_simple,
    commutator,
    commutator_skewherm,
    commutator_generic,
    estimate_stepsize,
    update_stats,
)
