"""Isospectral midpoint integrators (Modin-Viviani, JFM 884:A22, 2020).

Functional parity with reference quflow/integrators/isospectral.py
(``isomp_fixedpoint`` :338-613, ``isomp_quasinewton`` :155-255,
``isomp_simple`` :258-335, ``estimate_stepsize`` :121-148), re-architected
for XLA: the step loop is a ``lax.scan``, the fixed-point iteration a
``lax.while_loop`` with the same tolerance/stall exit rule as the reference,
and Kahan compensated summation is carried through the scan for Brouwer's-law
rounding growth.  Mode switches (skew-Hermitian or not, compsum, etc.) are
static arguments instead of the reference's module-global function pointers.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.laplacian import solve_poisson
from ..ops.geometry import hbar, norm_Linf

__all__ = [
    "isomp_fixedpoint",
    "isomp",
    "isomp_quasinewton",
    "isomp_simple",
    "commutator",
    "commutator_skewherm",
    "commutator_generic",
    "select_skewherm",
    "estimate_stepsize",
    "update_stats",
    "conj_subtract_",
    "project_skewherm",
]


def commutator_generic(W, P):
    return W @ P - P @ W


def commutator_skewherm(W, P):
    VF = W @ P
    return VF - jnp.conj(jnp.swapaxes(VF, -1, -2))


commutator = commutator_skewherm


def conj_subtract_(A, out=None):
    """Host helper: ``out = A - A^dagger`` (in-place into ``out``;
    reference integrators/isospectral.py:66-81 - on device this is a fused
    XLA expression, see ``commutator_skewherm``)."""
    A = np.asarray(A)
    if out is None:
        out = np.empty_like(A)
    np.subtract(A, np.conj(np.swapaxes(A, -1, -2)), out=out)
    return out


def project_skewherm(W):
    """Host helper: project onto skew-Hermitian matrices in place,
    W <- (W - W^dagger)/2 (reference integrators/isospectral.py:61-63)."""
    W /= 2.0
    W -= np.conj(np.swapaxes(W, -1, -2))
    return W


def select_skewherm(flag):
    """Reference-compatible mode switch (reference isospectral.py:97-118):
    sets the default commutator and the laplacian-solver default.  Prefer the
    explicit ``skewh`` keyword in new code."""
    global commutator
    commutator = commutator_skewherm if flag else commutator_generic
    from ..ops.laplacian import select_skewherm as _lap_select

    return _lap_select(flag)


def update_stats(stats: dict, **kwargs):
    for arg, val in kwargs.items():
        if arg in stats and np.isscalar(val):
            stats[arg] += val
        else:
            stats[arg] = val


def estimate_stepsize(W, P=None, safety_factor=0.1):
    """Dimension-free stepsize estimate safety*pi/lambda_max(P)."""
    if P is None:
        P = solve_poisson(W)
    lambda_max = float(norm_Linf(P))
    return safety_factor * np.pi / lambda_max


def _norm_inf(A):
    """Matrix inf-norm (max abs row sum), reduced over any batch dims."""
    return jnp.max(jnp.sum(jnp.abs(A), axis=-1))


def _conj_t(A):
    return jnp.conj(jnp.swapaxes(A, -1, -2))


# ---------------------------------------------------------------------------
# fixed-point isospectral midpoint: traced step machinery
# ---------------------------------------------------------------------------

_stepper_cache: dict = {}


def _get_stepper(key, builder):
    if key not in _stepper_cache:
        _stepper_cache[key] = builder()
    return _stepper_cache[key]


def _build_isomp_scan(
    hamiltonian,
    forcing,
    strang_splitting,
    skewh,
    compsum,
    reinitialize,
    autonomous,
    autonomous_force,
    timed,
    maxit,
    minit,
    dt_static=None,
):
    """Build the jitted multi-step runner.  Returns
    run(W, dW, csum, time, vareps, tol, dt, steps)->(W,dW,csum,time,iters,nmaxit,PWc)
    """

    def fixed_point(W, dW0, time, vareps, tol, dt):
        zero = jnp.zeros_like(W)

        def eval_ham(Whalf):
            if timed and not autonomous:
                return hamiltonian(Whalf, time=time + dt / 2)
            return hamiltonian(Whalf)

        def eval_force(Phalf, Whalf):
            if timed and not autonomous_force:
                return forcing(Phalf, Whalf, time=time + dt / 2)
            return forcing(Phalf, Whalf)

        def body(st):
            i, dW, _PWc, _FW, rn, _rn_old = st
            Whalf = W + dW
            Phalf = eval_ham(Whalf) * vareps
            PW = Phalf @ Whalf
            dW_new = PW @ Phalf
            if skewh:
                PWc = PW - _conj_t(PW)
            else:
                PWc = PW - Whalf @ Phalf
            dW_new = dW_new + PWc
            if forcing is not None:
                FW = eval_force(Phalf / vareps, Whalf) * (dt / 2)
                dW_new = dW_new + FW
            else:
                FW = _FW
            rn_new = _norm_inf(dW - dW_new)
            return (i + 1, dW_new, PWc, FW, rn_new, rn)

        def cond(st):
            i, _dW, _PWc, _FW, rn, rn_old = st
            done = (i >= minit) & ((rn <= tol) | (rn >= rn_old))
            return (i < maxit) & ~done

        inf = jnp.asarray(np.inf, dtype=W.real.dtype)
        # NOTE: FW gets its own zero buffer (zeros_like, not the `zero`
        # object already used for the PWc slot) and degrades to a scalar
        # placeholder when there is no forcing: an (N,N) carry slot that is
        # never written is wasted buffer traffic, and ALIASING one device
        # buffer into two carry slots of the same while_loop is exactly the
        # kind of input aliasing a minimal TPU runtime may not implement
        # (this runtime raises UNIMPLEMENTED at execution).
        FW0 = (jnp.zeros_like(W) if forcing is not None
               else jnp.zeros((), W.dtype))
        st0 = (jnp.asarray(0, dtype=jnp.int32), dW0, zero, FW0, inf, inf)
        i, dW, PWc, FW, rn, rn_old = lax.while_loop(cond, body, st0)
        hit_maxit = (i >= maxit) & ~((rn <= tol) | (rn >= rn_old))
        return dW, PWc, FW, i, hit_maxit

    def step(carry, _):
        W, dW, csum, upd, time, vareps, tol, dt, iters, nmaxit = carry
        if strang_splitting is not None:
            # the CONCRETE dt (not the traced carry value) goes to the
            # splitting hook: operator-building callables like
            # solve_viscdamp/solve_heat factorize per h and need a python
            # float, exactly as in the reference (isospectral.py:466-467)
            W = strang_splitting(dt_static / 2, W)
        if reinitialize:
            dW = jnp.zeros_like(dW)
        dW, PWc, FW, i, hit = fixed_point(W, dW, time, vareps, tol, dt)
        upd = 2.0 * PWc
        if compsum:
            # Kahan compensated summation W += upd
            y = upd - csum
            t = W + y
            csum = (t - W) - y
            W = t
        else:
            W = W + upd
        if forcing is not None:
            W = W + 2.0 * FW
        if timed:
            time = time + dt
        if strang_splitting is not None:
            W = strang_splitting(dt_static / 2, W)
        return (
            W,
            dW,
            csum,
            upd,
            time,
            vareps,
            tol,
            dt,
            iters + i,
            nmaxit + hit.astype(jnp.int32),
        ), None

    def _scan_core(W, dW, csum, time, vareps, tol, dt, steps):
        i0 = jnp.asarray(0, dtype=jnp.int32)
        carry0 = (W, dW, csum, jnp.zeros_like(W), time, vareps, tol, dt, i0, i0)
        carry, _ = lax.scan(step, carry0, None, length=steps)
        W, dW, csum, upd, time, _, _, _, iters, nmaxit = carry
        return W, dW, csum, time, iters, nmaxit, upd

    @partial(jax.jit, static_argnames=("steps",))
    def run(W, dW, csum, time, vareps, tol, dt, steps):
        return _scan_core(W, dW, csum, time, vareps, tol, dt, steps)

    @partial(jax.jit, static_argnames=("steps",))
    def run_planes(Sp, time, vareps, tol, dt, steps):
        """Split-planes twin of ``run`` for accelerator targets: ONE real
        (2, 3, ..., N, N) array carries (W, dW, csum) as (re/im, state).
        This TPU runtime cannot execute jitted programs with more than one
        complex64 array PARAMETER (measured: one complex argument runs,
        three raise UNIMPLEMENTED at execution; tests/test_tpu_device.py),
        and complex host<->device transfers don't exist either - planes
        I/O solves both, exactly as the production stepper does
        (parallel/stepper.py)."""
        W = lax.complex(Sp[0, 0], Sp[1, 0])
        dW = lax.complex(Sp[0, 1], Sp[1, 1])
        csum = lax.complex(Sp[0, 2], Sp[1, 2])
        W, dW, csum, time, iters, nmaxit, upd = _scan_core(
            W, dW, csum, time, vareps, tol, dt, steps)
        Sp_out = jnp.stack([
            jnp.stack([W.real, dW.real, csum.real, upd.real]),
            jnp.stack([W.imag, dW.imag, csum.imag, upd.imag]),
        ])
        return Sp_out, time, iters, nmaxit

    run.planes = run_planes
    return run


def _probe_autonomous(fn, args, time):
    """Mirror the reference's TypeError probing (isospectral.py:404-423)."""
    if time is None:
        return True
    try:
        fn(*args, time=time)
    except TypeError:
        return True
    return False


def isomp_fixedpoint(
    W,
    dt,
    steps=100,
    hamiltonian=None,
    time=None,
    forcing=None,
    strang_splitting=None,
    stats=None,
    callback=None,
    tol="auto",
    maxit=10,
    minit=1,
    verbatim=False,
    compsum=False,
    reinitialize=False,
    skewh=True,
):
    """Isospectral midpoint method with fixed-point iterations.

    Same contract as the reference isomp_fixedpoint (tolerance rule, stall
    exit, warm-started dW, final update W += 2(PW - (PW)^H) from the last
    iteration, optional forcing / Strang splitting / Kahan summation /
    per-step callback and stats).  ``hamiltonian``, ``forcing`` and
    ``strang_splitting`` must be jax-traceable.
    """
    assert minit >= 1, "minit must be at least 1."
    assert maxit >= minit, "maxit must be at least minit."

    if hamiltonian is None:
        hamiltonian = partial(solve_poisson, skewh=skewh)

    N = W.shape[-1]
    hb = hbar(N)
    vareps = dt / (2.0 * hb)

    from ..config import device_for_dtype, device_put_complex, device_get_complex

    cdtype = np.dtype(W.dtype)
    # 64-bit state cannot live on the TPU (no c128) - route everything,
    # including the upload, to CPU in that case.  complex64 runs on the
    # accelerator, crossing the boundary as split planes (no complex
    # host<->device transfers on this TPU runtime).
    with device_for_dtype(cdtype):
        Wj = device_put_complex(W)

        autonomous = _probe_autonomous(hamiltonian, (Wj,), time)
        autonomous_force = True
        if forcing is not None:
            autonomous_force = _probe_autonomous(forcing, (Wj, Wj), time)

    if tol == "auto" or (np.isscalar(tol) and tol < 0):
        mach_eps = np.finfo(cdtype).eps
        if not compsum:
            mach_eps = np.sqrt(mach_eps)
        Wn = np.asarray(W)
        W0 = Wn[(0,) * (Wn.ndim - 2)] if Wn.ndim > 2 else Wn
        tol = float(mach_eps * dt / hb * np.linalg.norm(W0, np.inf))
        if verbatim:
            print(f"Tolerance set to {tol}.")
        if stats is not None:
            stats["tol_auto"] = tol

    timed = time is not None
    # dt enters the step program as a traced carry value EXCEPT for the
    # Strang hook, which receives the concrete float (operator-building
    # callables factorize per h); the cache key therefore includes dt only
    # when a splitting hook is present.
    dt_static = float(dt) if strang_splitting is not None else None
    key = (
        hamiltonian,
        forcing,
        strang_splitting,
        skewh,
        compsum,
        reinitialize,
        autonomous,
        autonomous_force,
        timed,
        maxit,
        minit,
        dt_static,
    )
    run = _get_stepper(
        key,
        lambda: _build_isomp_scan(
            hamiltonian,
            forcing,
            strang_splitting,
            skewh,
            compsum,
            reinitialize,
            autonomous,
            autonomous_force,
            timed,
            maxit,
            minit,
            dt_static,
        ),
    )

    total_iters = 0
    total_maxit = 0
    with device_for_dtype(cdtype):
        rdt = Wj.real.dtype
        t = jnp.asarray(0.0 if time is None else time, dtype=rdt)
        vareps_j = jnp.asarray(vareps, dtype=rdt)
        tol_j = jnp.asarray(tol, dtype=rdt)
        dt_j = jnp.asarray(dt, dtype=rdt)
        try:
            on_cpu = list(Wj.devices())[0].platform == "cpu"
        except Exception:
            on_cpu = True
        if not on_cpu:
            # accelerator: ONE stacked split-planes array carries the
            # whole complex state (W, dW, csum) across the jit boundary -
            # this runtime executes at most one complex array parameter
            # per program and has no complex transfers (see run.planes)
            Wn = np.asarray(W)
            zr = np.zeros_like(Wn.real)
            Sp = jnp.asarray(np.stack([
                np.stack([Wn.real, zr, zr]),
                np.stack([Wn.imag, zr, zr]),
            ]).astype(rdt))
        if callback is None:
            if on_cpu:
                dW = jnp.zeros_like(Wj)
                csum = jnp.zeros_like(Wj)
                Wj, dW, csum, t, iters, nmaxit, _ = run(
                    Wj, dW, csum, t, vareps_j, tol_j, dt_j, steps
                )
            else:
                Sp, t, iters, nmaxit = run.planes(
                    Sp, t, vareps_j, tol_j, dt_j, steps)
            total_iters = int(iters)
            total_maxit = int(nmaxit)
        else:
            if on_cpu:
                dW = jnp.zeros_like(Wj)
                csum = jnp.zeros_like(Wj)
            for _ in range(steps):
                if on_cpu:
                    Wnew, dW, csum, t, iters, nmaxit, upd = run(
                        Wj, dW, csum, t, vareps_j, tol_j, dt_j, 1
                    )
                    W_prev = Wj
                    Wj = Wnew
                else:
                    W_prev_p = np.asarray(Sp[:, 0])
                    W_prev = W_prev_p[0] + 1j * W_prev_p[1]
                    Sp_new, t, iters, nmaxit = run.planes(
                        Sp, t, vareps_j, tol_j, dt_j, 1)
                    Sp = Sp_new[:, :3]
                    up = np.asarray(Sp_new[:, 3])
                    upd = up[0] + 1j * up[1]
                callback(W_prev, upd)
                total_iters += int(iters)
                total_maxit += int(nmaxit)
        if not on_cpu:
            Wp = np.asarray(Sp[:, 0])
            Wj = (Wp[0] + 1j * Wp[1]).astype(cdtype)

    if verbatim:
        print(
            "Average number of iterations per step: {:.2f}".format(
                total_iters / steps
            )
        )
    if stats is not None:
        stats["iterations"] = total_iters / steps
        stats["number_of_maxit"] = total_maxit / steps

    out = Wj if isinstance(Wj, np.ndarray) else device_get_complex(Wj)
    if isinstance(W, np.ndarray):
        np.copyto(W, out)
        return W
    return out


isomp = isomp_fixedpoint


# ---------------------------------------------------------------------------
# quasi-Newton and simplified variants (host/scipy validation integrators)
# ---------------------------------------------------------------------------

def isomp_quasinewton(
    W, dt, steps=100, hamiltonian=None, forcing=None, tol="auto", maxit=10,
    verbatim=False, skewh=True, **kwargs
):
    """Isospectral midpoint via quasi-Newton iteration: exactly isospectral
    (conjugation update W <- A^H Wtilde A with A = I - (eps/2) Ptilde)."""
    import scipy.linalg

    if forcing is not None:
        raise NotImplementedError("Forcing for isomp_quasinewton is not implemented.")
    if hamiltonian is None:
        hamiltonian = partial(solve_poisson, skewh=skewh)

    stepsize = dt / hbar(W.shape[-1])
    if tol == "auto" or (np.isscalar(tol) and tol < 0):
        tol = float(
            np.finfo(np.asarray(W).dtype).eps
            * stepsize
            * np.linalg.norm(np.asarray(W), np.inf)
        )

    Id = np.eye(W.shape[-1])
    Wtilde = np.array(W, copy=True)
    W_host = np.array(W, copy=True)
    total_iterations = 0

    for k in range(steps):
        for _i in range(maxit):
            total_iterations += 1
            Ptilde = np.asarray(hamiltonian(Wtilde))
            A = Id - (stepsize / 2.0) * Ptilde
            luA, piv = scipy.linalg.lu_factor(A)
            B = scipy.linalg.lu_solve((luA, piv), W_host)
            Wtilde_new = scipy.linalg.lu_solve((luA, piv), -B.conj().T)
            resnorm = scipy.linalg.norm(Wtilde - Wtilde_new, np.inf)
            Wtilde = Wtilde_new
            if resnorm < tol:
                break
        else:
            if verbatim:
                print(f"Max iterations {maxit} reached at step {k}.")
        W_host = A.conj().T @ Wtilde @ A

    if verbatim:
        print(
            "Average number of iterations per step: {:.2f}".format(
                total_iterations / steps
            )
        )
    if isinstance(W, np.ndarray):
        np.copyto(W, W_host)
        return W
    return W_host


def isomp_simple(W, dt, steps=100, hamiltonian=None, forcing=None, skewh=True, **kwargs):
    """Simplified (explicit, isospectral, non-symplectic) midpoint variant."""
    import scipy.linalg

    if forcing is not None:
        raise NotImplementedError("Forcing for isomp_simple is not implemented.")
    if hamiltonian is None:
        hamiltonian = partial(solve_poisson, skewh=skewh)

    Id = np.eye(W.shape[-1])
    stepsize = dt / hbar(W.shape[-1])
    W_host = np.array(W, copy=True)
    Wtilde = W_host.copy()

    for _k in range(steps):
        Ptilde = np.asarray(hamiltonian(Wtilde))
        A = Id - (stepsize / 2.0) * Ptilde
        if skewh:
            luA, piv = scipy.linalg.lu_factor(A)
            X = scipy.linalg.lu_solve((luA, piv), W_host)
            Wtilde = scipy.linalg.lu_solve((luA, piv), -X.conj().T)
            W_new = A.conj().T @ Wtilde @ A
        else:
            X = np.linalg.solve(A, W_host)
            Aalt = Id + (stepsize / 2.0) * Ptilde
            Wtilde = np.linalg.solve(Aalt.conj().T, X.conj().T).conj().T
            W_new = Aalt @ Wtilde @ A
        W_host = W_new

    if isinstance(W, np.ndarray):
        np.copyto(W, W_host)
        return W
    return W_host
