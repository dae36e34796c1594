"""Reference-namespace alias: ``quflow.experimental`` held the accelerator
fast path (DiagTriDiagOp + IsompCUDA).  The TPU-native equivalents live in
quflow_tpu.parallel.stepper; re-exported here for discoverability.
"""

from .parallel.stepper import (
    IsompTPU,
    MagmpTPU,
    build_step_fn,
    build_poisson_fn,
    build_mhd_step_fn,
    build_dw_step_fn,
    build_dw_mhd_step_fn,
    to_planes,
    from_planes,
)

#: closest analog of the reference's DiagTriDiagOp (cuda.py:123-492)
DiagTriDiagOp = build_poisson_fn
#: closest analog of the reference's IsompCUDA (isospectral_cuda.py:50-517)
IsompCUDA = IsompTPU

__all__ = [
    "IsompTPU",
    "MagmpTPU",
    "build_step_fn",
    "build_poisson_fn",
    "build_mhd_step_fn",
    "build_dw_step_fn",
    "build_dw_mhd_step_fn",
    "to_planes",
    "from_planes",
    "DiagTriDiagOp",
    "IsompCUDA",
]
