"""Magnetic (MHD) isospectral midpoint integrator.

Functional parity with reference quflow/integrators/mhd.py
(``solve_mhd`` :10-18, ``magmp_fixedpoint`` :235-456): two-component state
(2, N, N) with state[0] = W (vorticity) and state[1] = Theta (magnetic flux
function), evolving W' = [P, W] + [B, Theta], Theta' = [P, Theta] with
P = Delta^-1 W and B = Delta Theta.  Implemented like isomp_fixedpoint as a
jitted lax.scan over steps with a lax.while_loop fixed-point iteration.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.laplacian import solve_poisson, laplace
from ..ops.geometry import hbar
from .isospectral import _norm_inf, _conj_t, _get_stepper

__all__ = ["solve_mhd", "magmp_fixedpoint", "magmp"]


def solve_mhd(state):
    """Hamiltonian of the quantized MHD system: (P, B) = (Delta^-1 W, Delta Theta)."""
    W = state[..., 0, :, :]
    Theta = state[..., 1, :, :]
    P = solve_poisson(W, skewh=True)
    B = laplace(Theta, skewh=True)
    return P, B


def _build_magmp_scan(hamiltonian, forcing, reinitialize, timed, autonomous,
                      autonomous_force, maxit, minit):
    def fixed_point(W, dW0, time, vareps, tol, dt):
        zero = jnp.zeros_like(W)
        zsingle = jnp.zeros_like(W[0])

        def eval_ham(Whalf):
            if timed and not autonomous:
                return hamiltonian(Whalf, time=time + dt / 2)
            return hamiltonian(Whalf)

        def body(st):
            i, dW, _PWc, _BTc, _FW, rn, _rn_old = st
            Whalf = W + dW
            Thetahalf = Whalf[1]
            Phalf, Bhalf = eval_ham(Whalf)
            Phalf = Phalf * vareps
            Bhalf = Bhalf * vareps
            PWc = Phalf @ Whalf               # broadcasts over the 2 components
            BTc = Bhalf @ Thetahalf
            dW_new = PWc @ Phalf
            BTP = BTc @ Phalf
            PWc = PWc - _conj_t(PWc)
            BTc = BTc - _conj_t(BTc)
            dW_new = dW_new + PWc
            dW_new = dW_new.at[0].add(BTP - _conj_t(BTP) + BTc)
            if forcing is not None:
                if timed and not autonomous_force:
                    FW = forcing(Phalf / vareps, Whalf, time=time + dt / 2) * (dt / 2)
                else:
                    FW = forcing(Phalf / vareps, Whalf) * (dt / 2)
                dW_new = dW_new + FW
            else:
                FW = _FW
            rn_new = _norm_inf(dW - dW_new)
            return (i + 1, dW_new, PWc, BTc, FW, rn_new, rn)

        def cond(st):
            i, _dW, _PWc, _BTc, _FW, rn, rn_old = st
            done = (i >= minit) & ((rn <= tol) | (rn >= rn_old))
            return (i < maxit) & ~done

        inf = jnp.asarray(np.inf, dtype=W.real.dtype)
        # FW gets its own buffer (scalar placeholder without forcing):
        # aliasing one device buffer into two while-carry slots is input
        # aliasing a minimal TPU runtime may not implement (see
        # isospectral._build_isomp_scan)
        FW0 = (jnp.zeros_like(W) if forcing is not None
               else jnp.zeros((), W.dtype))
        st0 = (jnp.asarray(0, dtype=jnp.int32), dW0, zero, zsingle, FW0,
               inf, inf)
        i, dW, PWc, BTc, FW, rn, rn_old = lax.while_loop(cond, body, st0)
        hit = (i >= maxit) & ~((rn <= tol) | (rn >= rn_old))
        return dW, PWc, BTc, FW, i, hit

    def step(carry, _):
        W, dW, time, vareps, tol, dt, iters, nmaxit = carry
        if reinitialize:
            dW = jnp.zeros_like(dW)
        dW, PWc, BTc, FW, i, hit = fixed_point(W, dW, time, vareps, tol, dt)
        W = W + 2.0 * PWc
        W = W.at[0].add(2.0 * BTc)
        if forcing is not None:
            W = W + 2.0 * FW
        if timed:
            time = time + dt
        return (W, dW, time, vareps, tol, dt, iters + i, nmaxit + hit.astype(jnp.int32)), None

    def _scan_core(W, dW, time, vareps, tol, dt, steps):
        i0 = jnp.asarray(0, dtype=jnp.int32)
        carry0 = (W, dW, time, vareps, tol, dt, i0, i0)
        carry, _ = lax.scan(step, carry0, None, length=steps)
        W, dW, time, _, _, _, iters, nmaxit = carry
        return W, dW, time, iters, nmaxit

    @partial(jax.jit, static_argnames=("steps",))
    def run(W, dW, time, vareps, tol, dt, steps):
        return _scan_core(W, dW, time, vareps, tol, dt, steps)

    @partial(jax.jit, static_argnames=("steps",))
    def run_planes(Sp, time, vareps, tol, dt, steps):
        """Split-planes twin for accelerator targets: one real
        (2, 2, ..., 2, N, N) array carries (state, dW) as
        (re/im, slot, ..., component, N, N).  This TPU runtime executes at
        most one complex array parameter per jitted program (see
        isospectral._build_isomp_scan.run_planes)."""
        W = lax.complex(Sp[0, 0], Sp[1, 0])
        dW = lax.complex(Sp[0, 1], Sp[1, 1])
        W, dW, time, iters, nmaxit = _scan_core(
            W, dW, time, vareps, tol, dt, steps)
        Sp_out = jnp.stack([
            jnp.stack([W.real, dW.real]),
            jnp.stack([W.imag, dW.imag]),
        ])
        return Sp_out, time, iters, nmaxit

    run.planes = run_planes
    return run


def magmp_fixedpoint(
    W,
    dt,
    steps=100,
    hamiltonian=solve_mhd,
    time=None,
    forcing=None,
    stats=None,
    callback=None,
    tol="auto",
    maxit=10,
    minit=1,
    verbatim=False,
    reinitialize=False,
):
    """Magnetic midpoint method on the (2, N, N) state (W, Theta)."""
    assert minit >= 1, "minit must be at least 1."
    assert maxit >= minit, "maxit must be at least minit."

    from ..config import device_for_dtype, device_put_complex, device_get_complex

    cdtype = np.dtype(W.dtype)
    with device_for_dtype(cdtype):
        Wj = device_put_complex(W)
    N = Wj.shape[-1]
    hb = hbar(N)
    vareps = dt / (2.0 * hb)

    autonomous = True
    autonomous_force = True
    if time is not None:
        try:
            hamiltonian(Wj, time=time)
        except TypeError:
            pass
        else:
            autonomous = False
        if forcing is not None:
            try:
                forcing(Wj, Wj, time=time)
            except TypeError:
                pass
            else:
                autonomous_force = False

    if tol == "auto" or (np.isscalar(tol) and tol < 0):
        mach_eps = np.sqrt(np.finfo(np.dtype(Wj.dtype)).eps)
        tol = float(mach_eps * dt / hb * np.linalg.norm(np.asarray(W)[0], np.inf))
        if stats is not None:
            stats["tol"] = tol

    timed = time is not None
    key = ("magmp", hamiltonian, forcing, reinitialize, timed, autonomous,
           autonomous_force, maxit, minit)
    run = _get_stepper(
        key,
        lambda: _build_magmp_scan(
            hamiltonian, forcing, reinitialize, timed, autonomous,
            autonomous_force, maxit, minit
        ),
    )

    total_iters = 0
    total_maxit = 0
    with device_for_dtype(cdtype):
        rdt = Wj.real.dtype
        t = jnp.asarray(0.0 if time is None else time, dtype=rdt)
        args = (jnp.asarray(vareps, rdt), jnp.asarray(tol, rdt), jnp.asarray(dt, rdt))
        try:
            on_cpu = list(Wj.devices())[0].platform == "cpu"
        except Exception:
            on_cpu = True
        if not on_cpu:
            # single split-planes array across the boundary (one complex
            # parameter max on this runtime; see run.planes)
            Wn = np.asarray(W)
            zr = np.zeros_like(Wn.real)
            Sp = jnp.asarray(np.stack([
                np.stack([Wn.real, zr]),
                np.stack([Wn.imag, zr]),
            ]).astype(rdt))
        if callback is None:
            if on_cpu:
                dW = jnp.zeros_like(Wj)
                Wj, dW, t, iters, nmaxit = run(Wj, dW, t, *args, steps)
            else:
                Sp, t, iters, nmaxit = run.planes(Sp, t, *args, steps)
            total_iters, total_maxit = int(iters), int(nmaxit)
        else:
            if on_cpu:
                dW = jnp.zeros_like(Wj)
            for _ in range(steps):
                if on_cpu:
                    Wnew, dW, t, iters, nmaxit = run(Wj, dW, t, *args, 1)
                    callback(Wj, np.asarray(Wnew - Wj))
                    Wj = Wnew
                else:
                    Wp_prev = np.asarray(Sp[:, 0])
                    W_prev = Wp_prev[0] + 1j * Wp_prev[1]
                    Sp, t, iters, nmaxit = run.planes(Sp, t, *args, 1)
                    Wp_new = np.asarray(Sp[:, 0])
                    W_new = Wp_new[0] + 1j * Wp_new[1]
                    callback(W_prev, W_new - W_prev)
                total_iters += int(iters)
                total_maxit += int(nmaxit)
        if not on_cpu:
            Wp = np.asarray(Sp[:, 0])
            Wj = (Wp[0] + 1j * Wp[1]).astype(cdtype)

    if verbatim:
        print(
            "Average number of iterations per step: {:.2f}".format(total_iters / steps)
        )
    if stats is not None:
        stats["iterations"] = total_iters / steps
        stats["maxit"] = total_maxit / steps

    out = Wj if isinstance(Wj, np.ndarray) else device_get_complex(Wj)
    if isinstance(W, np.ndarray):
        np.copyto(W, out)
        return W
    return out


magmp = magmp_fixedpoint
