"""Eigenspace projections, initial-data helpers, and the legacy solve loop.

Parity with reference quflow/dynamics.py (``project_el`` :20-124,
``solve`` :131-237, ``blob``/``north_blob`` :244-304); the projection is a
vectorized per-diagonal rank-1 projection onto the basis columns.
"""

from __future__ import annotations

import numpy as np

from .ops.laplacian import solve_heat
from .ops.geometry import rotate
from .integrators import isomp
from .utils import seconds2qtime
from .quantization import get_basis
from .quantization.transforms import _block

__all__ = ["project_el", "solve", "blob", "north_blob"]


def project_el(W, el=1, complement=False):
    """Project W onto (or off, with ``complement``) the el-eigenspace of the
    quantized Laplacian, i.e. onto span{T_elm : |m| <= el}.

    Note: this is the true orthogonal projection (idempotent).  The reference
    implementation (quflow/dynamics.py:54-80) omits the 1/||column||^2 = 1/N
    normalization and therefore returns N x the projection; that scaling bug
    is deliberately not reproduced here.
    """
    W = np.asarray(W)
    N = W.shape[-1]
    basis = get_basis(N)
    if complement:
        W_out = W.copy()
        mult = -1.0
    else:
        W_out = np.zeros_like(W)
        mult = 1.0
    if np.isscalar(el):
        el = [el]
    for eli in el:
        if eli < 0:
            eli = N + eli
        for m in range(eli + 1):
            Bm = _block(basis, N, m)
            col = Bm[:, eli - m]
            nrm2 = col @ col
            # lower diagonal
            dl = np.diagonal(W, -m)
            a = (dl @ col) * mult / nrm2
            idx = (np.arange(N - m) + m, np.arange(N - m))
            W_out[idx] += a * col
            if m != 0:
                sgn = 1.0 if m % 2 == 0 else -1.0
                colu = sgn * col
                du = np.diagonal(W, m)
                a = (du @ colu) * mult / (colu @ colu)
                idxu = (np.arange(N - m), np.arange(N - m) + m)
                W_out[idxu] += a * colu
    return W_out


def solve(
    W,
    stepsize=0.1,
    steps=None,
    time=None,
    inner_steps=None,
    inner_time=None,
    method=isomp,
    method_kwargs=None,
    callback=None,
    callback_kwargs=None,
    progress_bar=True,
    progress_file=None,
    **kwargs,
):
    """Legacy qtime-units solve loop (reference dynamics.py:131-237).
    The modern entry point is quflow_tpu.sim.solve."""
    N = W.shape[-1]
    if method_kwargs is None:
        method_kwargs = {}
    method_kwargs = {**method_kwargs, **kwargs}

    if sum(x is not None for x in (steps, time)) != 1:
        raise ValueError("One, and only one, of steps or time should be specified.")
    if time is not None:
        steps = round(seconds2qtime(time, N) / abs(stepsize))
    if callback is not None and not isinstance(callback, tuple):
        callback = (callback,)
    if callback_kwargs is None:
        callback_kwargs = {}

    if inner_steps is None:
        if inner_time is not None:
            inner_steps = round(seconds2qtime(inner_time, N) / abs(stepsize))
        else:
            inner_steps = 100
    inner_steps = min(inner_steps, steps)

    pbar = None
    if progress_bar:
        try:
            from tqdm.auto import tqdm

            pbar = tqdm(total=steps, unit=" steps", file=progress_file)
        except ModuleNotFoundError:
            pbar = None

    for k in range(0, steps, inner_steps):
        no_steps = min(inner_steps, steps - k)
        W = method(W, stepsize, steps=no_steps, **method_kwargs)
        delta_time = seconds2qtime(no_steps * abs(stepsize), N=N)
        if pbar is not None:
            pbar.update(no_steps)
        if callback is not None:
            for cfun in callback:
                cfun(W, inner_time=delta_time, inner_steps=no_steps, **callback_kwargs)

    if pbar is not None:
        pbar.close()
    return W


def north_blob(N, sigma=0):
    """Point vortex at the north pole (W = i E_NN), optionally smoothed by
    the heat flow exp((sigma/4) Delta)."""
    W = np.zeros((N, N), dtype=complex)
    W[-1, -1] = 1.0j
    if sigma != 0:
        W = np.asarray(solve_heat(sigma / 4.0, W))
    return W


def blob(N, pos=np.array([0.0, 0.0, 1.0]), sigma=0):
    """Vorticity blob at an arbitrary position on the sphere, obtained by
    rotating a north-pole blob."""
    a = np.zeros((3, 3))
    a[:, 0] = pos
    q, r = np.linalg.qr(a)
    if np.dot(q[:, 0], pos) < 0:
        q[:, 0] *= -1
    if np.linalg.det(q) < 0:
        q[:, -1] *= -1
    q = np.roll(q, 2, axis=-1)
    from scipy.spatial.transform import Rotation as R

    xi = R.from_matrix(q).as_rotvec()
    W = north_blob(N, sigma)
    return np.asarray(rotate(xi, W))
