"""Device mesh helpers.

The reference has no in-process distribution (its 'cluster' layer is
rsync+ssh+Slurm, single node per job; SURVEY.md section 2.7).  quflow_tpu
scales with jax.sharding over a named mesh:

  axis 'dp' - ensemble/data parallel (independent trajectories; zero-comm)
  axes 'i','j' - 2-D tensor parallel for the N x N state (GEMM sharding);
                 the diag-packed solve shards its rows over ('i','j') jointly,
                 which is the sequence-parallel analog of this workload
                 (independent tridiagonal systems; zero-comm solve).
"""

from __future__ import annotations

import math

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "state_sharding", "rows_spec", "P", "NamedSharding"]


def _factor2(n):
    """Split n into (a, b) with a*b = n, as square as possible."""
    a = int(math.isqrt(n))
    while n % a:
        a -= 1
    return a, n // a


def make_mesh(devices=None, dp=1, axis_names=("dp", "i", "j")):
    """Mesh over ``devices`` (default: all) with a leading ensemble axis of
    size ``dp`` and the rest split 2-D over ('i', 'j')."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % dp == 0, f"dp={dp} must divide device count {n}"
    a, b = _factor2(n // dp)
    arr = np.array(devices).reshape(dp, a, b)
    return Mesh(arr, axis_names)


def state_sharding(mesh, batched=False):
    """Sharding for the dense state: (E, N, N) over ('dp','i','j') or
    (N, N) over ('i','j')."""
    if batched:
        return NamedSharding(mesh, P("dp", "i", "j"))
    return NamedSharding(mesh, P("i", "j"))


def rows_spec(batched=False):
    """PartitionSpec for the diag-packed rows ((E,) R, N): rows over all
    tensor axes, scan axis unsharded (the solve is then communication-free)."""
    if batched:
        return P("dp", ("i", "j"), None)
    return P(("i", "j"), None)
