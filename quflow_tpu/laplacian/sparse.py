"""Reference quflow.laplacian.sparse backend alias.

The reference's five backends are numerically interchangeable (its
cross-backend tests, reference tests/test_laplacian.py:226-252); quflow_tpu
consolidates them into one TPU-native implementation
(quflow_tpu/ops/laplacian.py).  This module keeps user code written against
quflow.laplacian.sparse importable unchanged.
"""

from ..ops.laplacian import (
    laplacian,
    laplace,
    solve_poisson,
    solve_heat,
    solve_helmholtz,
    solve_viscdamp,
    solve_globalqg,
    select_skewherm,
)
