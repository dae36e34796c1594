"""Production-stepper physics hooks: forcing, Strang splitting, pluggable
Hamiltonian (build_step_fn / build_mhd_step_fn / IsompTPU).

The reference's hot path accepts any hamiltonian and supports forcing and
Strang hooks inside the fixed-point loop (reference
quflow/integrators/isospectral.py:404-423, 466-520, 601-603); these tests
pin the production TPU stepper to the reference-semantics integrator
(isomp_fixedpoint, itself oracle-pinned) with both paths forced to the same
fixed iteration count (minit=maxit, tol tiny => exactly maxit iterations).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from functools import partial

from quflow_tpu.models import EulerFlow
from quflow_tpu.integrators.isospectral import isomp_fixedpoint
from quflow_tpu.parallel.stepper import IsompTPU, build_step_fn
from quflow_tpu.ops.laplacian import (
    solve_globalqg,
    solve_heat,
    solve_viscdamp,
)

N = 48
STEPS, MAXIT = 6, 5
ATOL = 1e-13


@pytest.fixture(scope="module")
def W0():
    return EulerFlow(N=N, dtype=np.complex128).random_initial(lmax=8, seed=3)


def _dt():
    from quflow_tpu.ops.geometry import hbar

    return 0.3 * hbar(N)


def run_prod(W0, **kw):
    fn = build_step_fn(N, _dt(), steps=STEPS, maxit=MAXIT,
                       dtype=np.complex128, compsum=True, planes_io=False,
                       **kw)
    z = jnp.zeros_like(jnp.asarray(W0))
    return np.asarray(fn(jnp.asarray(W0), z, z)[0])


def run_ref(W0, **kw):
    return np.asarray(
        isomp_fixedpoint(W0.copy(), _dt(), steps=STEPS, maxit=MAXIT,
                         minit=MAXIT, tol=1e-300, compsum=True, **kw)
    )


def test_forcing_parity(W0):
    def force(P, W):
        return 0.05 * (P @ W - W @ P)

    a = run_prod(W0, forcing=force)
    b = run_ref(W0, forcing=force)
    assert np.abs(a - b).max() < ATOL
    # and the forcing actually changes the trajectory
    assert np.abs(a - run_ref(W0)).max() > 1e-8


def test_time_dependent_forcing_parity(W0):
    def force_t(P, W, time=0.0):
        return 0.03 * jnp.sin(time) * (P - W)

    fn = build_step_fn(N, _dt(), steps=STEPS, maxit=MAXIT,
                       dtype=np.complex128, compsum=True, planes_io=False,
                       forcing=force_t)
    z = jnp.zeros_like(jnp.asarray(W0))
    out = np.asarray(fn(jnp.asarray(W0), z, z, 0.7)[0])  # timed: extra t0 arg
    ref = run_ref(W0, forcing=force_t, time=0.7)
    assert np.abs(out - ref).max() < ATOL


def test_strang_splitting_callable_and_named(W0):
    cb = partial(solve_viscdamp, nu=1e-3, alpha=0.02, theta=1, skewh=True)
    ref = run_ref(W0, strang_splitting=cb)
    assert np.abs(run_prod(W0, strang_splitting=cb) - ref).max() < ATOL
    named = ("viscdamp", dict(nu=1e-3, alpha=0.02))
    assert np.abs(run_prod(W0, strang_splitting=named) - ref).max() < ATOL


def test_strang_theta_scheme_and_heat(W0):
    cn = partial(solve_viscdamp, nu=1e-3, alpha=0.02, theta=0.5, skewh=True)
    named = ("viscdamp", dict(nu=1e-3, alpha=0.02, theta=0.5))
    assert np.abs(run_prod(W0, strang_splitting=named)
                  - run_ref(W0, strang_splitting=cn)).max() < ATOL
    heat_cb = lambda h, W: solve_heat(h * 2e-3, W, skewh=True)
    assert np.abs(run_prod(W0, strang_splitting=("heat", dict(nu=2e-3)))
                  - run_ref(W0, strang_splitting=heat_cb)).max() < ATOL


def test_globalqg_hamiltonian_family(W0):
    ham = partial(solve_globalqg, gamma=1.7, skewh=True)
    ref = run_ref(W0, hamiltonian=ham)
    # named prefactorized family (the production path)
    assert np.abs(run_prod(W0, hamiltonian=("globalqg", 1.7)) - ref).max() < ATOL
    # callable escape hatch
    assert np.abs(run_prod(W0, hamiltonian=ham) - ref).max() < ATOL


def test_forced_dissipative_qg_combined(W0):
    """The forced-dissipative QG production configuration: named QG
    Hamiltonian + forcing + named viscdamp Strang, all in one program."""
    ham = partial(solve_globalqg, gamma=1.7, skewh=True)
    cb = partial(solve_viscdamp, nu=1e-3, alpha=0.02, theta=1, skewh=True)

    def force(P, W):
        return 0.05 * (P @ W - W @ P)

    a = run_prod(W0, hamiltonian=("globalqg", 1.7), forcing=force,
                 strang_splitting=("viscdamp", dict(nu=1e-3, alpha=0.02)))
    b = run_ref(W0, hamiltonian=ham, forcing=force, strang_splitting=cb)
    assert np.abs(a - b).max() < ATOL


def test_globalqg_f32_m0_refinement(W0):
    """refine='m0' builds the semiseparable m0 inverse per family: the f32
    globalqg solve must be refined against the *globalqg* m=0 system."""
    fn = build_step_fn(N, _dt(), steps=STEPS, maxit=MAXIT,
                       dtype=np.complex64, compsum=True, planes_io=False,
                       refine="m0", hamiltonian=("globalqg", 1.7))
    z = jnp.zeros_like(jnp.asarray(W0.astype(np.complex64)))
    out = np.asarray(fn(jnp.asarray(W0.astype(np.complex64)), z, z)[0])
    ham = partial(solve_globalqg, gamma=1.7, skewh=True)
    ref = run_ref(W0, hamiltonian=ham)
    assert np.abs(out - ref).max() < 5e-5  # f32 trajectory accuracy


def test_adaptive_tol_with_forcing(W0):
    """The adaptive (while_loop) fixed point composes with the forcing
    hook and still reports per-step iteration counts."""
    def force(P, W):
        return 0.05 * (P @ W - W @ P)

    fn = build_step_fn(N, _dt(), steps=STEPS, maxit=10, dtype=np.complex128,
                       compsum=True, planes_io=False, tol=1e-12, minit=1,
                       forcing=force)
    z = jnp.zeros_like(jnp.asarray(W0))
    W, dW, csum, iters = fn(jnp.asarray(W0), z, z)
    ref = np.asarray(isomp_fixedpoint(W0.copy(), _dt(), steps=STEPS, maxit=10,
                                      minit=1, tol=1e-12, compsum=True,
                                      forcing=force))
    assert np.abs(np.asarray(W) - ref).max() < ATOL
    counts = np.asarray(iters)
    assert counts.shape == (STEPS,) and (counts >= 1).all() and (counts <= 10).all()


def test_isomp_tpu_rejects_per_call_kwargs(W0):
    stepper = IsompTPU(dtype=np.complex128)
    with pytest.raises(TypeError, match="constructor"):
        stepper(W0.copy(), _dt(), steps=2, hamiltonian=lambda W: W)
    with pytest.raises(TypeError, match="constructor"):
        stepper(W0.copy(), _dt(), steps=2, forcing=lambda P, W: P)
    # `time` and `stats` remain accepted (sim.solve passes both)
    stats = {}
    stepper(W0.copy(), _dt(), steps=2, stats=stats, time=0.0)
    assert stats["iterations"] == 5.0


def test_isomp_tpu_constructor_hooks(W0):
    """IsompTPU with constructor-configured physics matches the
    reference-semantics integrator (the drop-in sim.solve contract)."""
    ham = partial(solve_globalqg, gamma=1.7, skewh=True)

    def force(P, W):
        return 0.05 * (P @ W - W @ P)

    stepper = IsompTPU(dtype=np.complex128, maxit=MAXIT,
                       hamiltonian=("globalqg", 1.7), forcing=force)
    out = stepper(W0.copy(), _dt(), steps=STEPS)
    ref = run_ref(W0, hamiltonian=ham, forcing=force)
    assert np.abs(out - ref).max() < ATOL


def test_isomp_tpu_timed_forcing_threads_time(W0):
    """Non-autonomous forcing through IsompTPU: time passed per call must
    reach the program (two calls = one 2*STEPS call)."""
    def force_t(P, W, time=0.0):
        return 0.03 * jnp.sin(time) * (P - W)

    dt = _dt()
    stepper = IsompTPU(dtype=np.complex128, maxit=MAXIT, forcing=force_t,
                       warm=True)
    out = stepper(W0.copy(), dt, steps=3, time=0.0)
    out = stepper(out, dt, steps=3, time=3 * dt)
    ref = np.asarray(isomp_fixedpoint(W0.copy(), dt, steps=6, maxit=MAXIT,
                                      minit=MAXIT, tol=1e-300, compsum=True,
                                      forcing=force_t, time=0.0))
    assert np.abs(out - ref).max() < ATOL


# ---------------------------------------------------------------------------
# MHD production stepper hooks
# ---------------------------------------------------------------------------

def _mhd_setup():
    from quflow_tpu.models import MHDFlow

    flow = MHDFlow(N=40, dtype=np.complex128)
    S0 = flow.random_initial(lmax=8, seed=5)
    return S0, 0.3 * flow.hbar


def test_mhd_forcing_parity():
    from quflow_tpu.integrators.mhd import magmp_fixedpoint
    from quflow_tpu.parallel.stepper import build_mhd_step_fn

    S0, dt = _mhd_setup()

    def force(P, S):
        return 0.04 * (P[..., None, :, :] @ S - S @ P[..., None, :, :])

    fn = build_mhd_step_fn(40, dt, steps=5, maxit=5, dtype=np.complex128,
                           compsum=False, planes_io=False, forcing=force)
    z = jnp.zeros_like(jnp.asarray(S0))
    out = np.asarray(fn(jnp.asarray(S0), z, z)[0])
    ref = np.asarray(magmp_fixedpoint(S0.copy(), dt, steps=5, maxit=5,
                                      minit=5, tol=1e-300, forcing=force))
    assert np.abs(out - ref).max() < ATOL


def test_mhd_strang_named_matches_callable():
    from quflow_tpu.parallel.stepper import build_mhd_step_fn

    S0, dt = _mhd_setup()
    cb = partial(solve_viscdamp, nu=1e-3, alpha=0.02, theta=1, skewh=True)

    def strang_S(h, S):
        return jnp.stack(
            [cb(h, S[..., 0, :, :]), cb(h, S[..., 1, :, :])], axis=-3)

    def run(**kw):
        fn = build_mhd_step_fn(40, dt, steps=5, maxit=5, dtype=np.complex128,
                               compsum=False, planes_io=False, **kw)
        z = jnp.zeros_like(jnp.asarray(S0))
        return np.asarray(fn(jnp.asarray(S0), z, z)[0])

    a = run(strang_splitting=("viscdamp", dict(nu=1e-3, alpha=0.02)))
    b = run(strang_splitting=strang_S)
    assert np.abs(a - b).max() < 1e-13


def test_mhd_callable_hamiltonian_raises():
    from quflow_tpu.parallel.stepper import build_mhd_step_fn

    with pytest.raises(NotImplementedError, match="named"):
        build_mhd_step_fn(40, 0.1, hamiltonian=lambda W: W)


def test_forced_qg_under_mesh():
    """The full forced-dissipative QG production program (named QG
    Hamiltonian + forcing + named Strang) composes with the sharded solve:
    8-device CPU mesh result == single-device result."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from quflow_tpu.parallel.mesh import make_mesh
    from quflow_tpu.parallel.stepper import to_planes, from_planes

    Nm = 32
    W0 = EulerFlow(N=Nm, dtype=np.complex128).random_initial(lmax=8, seed=3)
    from quflow_tpu.ops.geometry import hbar

    dt = 0.3 * hbar(Nm)

    def force(P_, W_):
        return 0.05 * (P_ @ W_ - W_ @ P_)

    kw = dict(hamiltonian=("globalqg", 1.7), forcing=force,
              strang_splitting=("viscdamp", dict(nu=1e-3, alpha=0.02)))
    mesh = make_mesh(jax.devices(), dp=1)
    fn = build_step_fn(Nm, dt, steps=3, maxit=4, dtype=np.complex128,
                       compsum=False, mesh=mesh, planes_io=True, **kw)
    sh = NamedSharding(mesh, P(None, "i", "j"))
    Wp = jax.device_put(jnp.asarray(to_planes(W0)), sh)
    z = jax.device_put(jnp.zeros_like(Wp), sh)
    out = from_planes(np.asarray(fn(Wp, z, z)[0]))

    fn1 = build_step_fn(Nm, dt, steps=3, maxit=4, dtype=np.complex128,
                        compsum=False, planes_io=True, **kw)
    Wp1 = jnp.asarray(to_planes(W0))
    z1 = jnp.zeros_like(Wp1)
    ref = from_planes(np.asarray(fn1(Wp1, z1, z1)[0]))
    np.testing.assert_allclose(out, ref, atol=1e-11)


def test_isomp_tpu_warm_auto_default():
    """The round-5 production default: warm_precision='auto' resolves to
    the 3-pass warm schedule for c64 'highest' runs and to None (pure
    schedule) for f64/c128 or non-highest precisions."""
    assert IsompTPU().warm_precision == "high"
    assert IsompTPU(precision="highest_karatsuba").warm_precision \
        == "high_karatsuba"
    assert IsompTPU(dtype=np.complex128).warm_precision is None
    assert IsompTPU(precision="high").warm_precision is None
    assert IsompTPU(warm_precision=None).warm_precision is None
    assert IsompTPU(warm_precision="default").warm_precision == "default"
