"""Reference-import-path compatibility package.

The reference exposes five interchangeable Poisson backends under
``quflow.laplacian`` (``from .cpu import *`` is its default,
reference laplacian/__init__.py:1).  quflow_tpu has a single unified
TPU-native implementation (quflow_tpu/ops/laplacian.py); this package makes
the reference's import paths resolve to it:

    from quflow_tpu.laplacian import solve_poisson            # default backend
    from quflow_tpu.laplacian import tridiagonal, cpu, direct, sparse, gpu

Each backend submodule aliases the same unified solver (they were
numerically equivalent in the reference - its own cross-backend tests
enforce that, reference tests/test_laplacian.py:226-252), except
``tridiagonal``, which additionally implements the reference's documented
array formats (``compute_tridiagonal_laplacian``, ``dot_tridiagonal``,
``solve_tridiagonal``; reference laplacian/tridiagonal.py:95-258).
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
    select_first,
    select_sum,
)

from . import tridiagonal, cpu, direct, sparse, gpu

__all__ = [
    "laplacian",
    "laplace",
    "select_first",
    "select_sum",
    "solve_poisson",
    "solve_heat",
    "solve_helmholtz",
    "solve_viscdamp",
    "solve_globalqg",
    "select_skewherm",
    "tridiagonal",
    "cpu",
    "direct",
    "sparse",
    "gpu",
]
