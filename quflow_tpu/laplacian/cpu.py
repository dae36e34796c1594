"""Reference quflow.laplacian.cpu backend alias.

The reference's five backends are numerically interchangeable (its
cross-backend tests, reference tests/test_laplacian.py:226-252); quflow_tpu
consolidates them into one TPU-native implementation
(quflow_tpu/ops/laplacian.py).  This module keeps user code written against
quflow.laplacian.cpu importable unchanged.
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

def mk2ij(m, k):
    """Map (diagonal m, position k) -> matrix entry (i, j)
    (reference laplacian/cpu.py:34-43; negative m = lower diagonals)."""
    if m >= 0:
        return k, k + m
    return k - m, k


def ij2mk(i, j):
    """Inverse of :func:`mk2ij` (reference laplacian/cpu.py:46-52)."""
    m = j - i
    return m, (i if m >= 0 else j)
