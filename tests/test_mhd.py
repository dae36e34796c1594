"""Magnetic midpoint integrator tests: reference-oracle parity, cross-Casimir
conservation, and model wrapper."""

import numpy as np
import pytest

import quflow_tpu as qf
from quflow_tpu.integrators import magmp, solve_mhd
from quflow_tpu.ops.geometry import hbar
from quflow_tpu.models import MHDFlow


@pytest.fixture(scope="module")
def oracle():
    return np.load("tests/data/oracle.npz")


def test_magmp_oracle(oracle):
    st = oracle["mhd_state0"].copy()
    out = magmp(st, float(oracle["mhd_dt"]), steps=20, tol=1e-12, maxit=20)
    np.testing.assert_allclose(out, oracle["mhd_state20"], atol=1e-10)


def test_solve_mhd_hamiltonian(oracle):
    st = oracle["mhd_state0"]
    P, B = solve_mhd(st)
    np.testing.assert_allclose(
        np.asarray(P), np.asarray(qf.solve_poisson(st[0], skewh=True)), atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(B), np.asarray(qf.laplace(st[1], skewh=True)), atol=1e-10
    )


def test_magmp_conservation(oracle):
    """magmp conserves the spectra of W and the cross-helicity-like Casimir
    tr(W Theta^k) structure approximately; check spectrum of state[1]
    (advected Theta -> isospectral) and energy-ish boundedness."""
    st = oracle["mhd_state0"].copy()
    dtm = float(oracle["mhd_dt"])
    e0 = np.sort(np.linalg.eigvalsh(-1j * st[1]))
    out = magmp(st.copy(), dtm, steps=100, tol=1e-12, maxit=20)
    e1 = np.sort(np.linalg.eigvalsh(-1j * out[1]))
    np.testing.assert_allclose(e1, e0, atol=1e-9)


def test_mhd_model():
    flow = MHDFlow(N=12)
    st = flow.random_initial(lmax=5)
    assert st.shape == (2, 12, 12)
    out = flow.step(st.copy(), 0.1 * flow.hbar, steps=3)
    assert out.shape == st.shape
    assert np.abs(out - st).max() > 0


def test_mhd_production_stepper(oracle):
    """Branch-free planes MHD stepper == magmp at fixed iteration count."""
    import jax.numpy as jnp
    from quflow_tpu.parallel.stepper import (
        build_mhd_step_fn, to_planes, from_planes,
    )

    st0 = oracle["mhd_state0"]
    dtm = float(oracle["mhd_dt"])
    ref = magmp(st0.copy(), dtm, steps=20, tol=1e-18, maxit=8, minit=8)
    fn = build_mhd_step_fn(12, dtm, steps=20, maxit=8, dtype=np.complex128)
    Sp = jnp.asarray(to_planes(st0))
    z = jnp.zeros_like(Sp)
    out, _, _ = fn(Sp, z, z)
    np.testing.assert_allclose(from_planes(np.asarray(out)), ref, atol=1e-12)


def _rand_mhd_state(N, seed=7, scale_theta=0.1):
    rng = np.random.RandomState(seed)

    def skewh(scale):
        A = rng.randn(N, N) + 1j * rng.randn(N, N)
        A = A - A.conj().T
        A = A - np.eye(N) * np.trace(A) / N
        return scale * A / np.abs(np.linalg.eigvalsh(-1j * A)).max()

    return np.stack([skewh(1.0), skewh(scale_theta)]).astype(np.complex128)


def test_mhd_stepper_adaptive_matches_magmp(oracle):
    """tol= on the MHD production stepper reproduces magmp's adaptive
    fixed-point semantics, and returns per-step iteration counts."""
    import jax.numpy as jnp
    from quflow_tpu.parallel.stepper import (
        build_mhd_step_fn, to_planes, from_planes,
    )

    st0 = oracle["mhd_state0"]
    dtm = float(oracle["mhd_dt"])
    fn = build_mhd_step_fn(12, dtm, steps=20, maxit=10, dtype=np.complex128,
                           compsum=False, tol=1e-10, minit=1)
    Sp = jnp.asarray(to_planes(st0))
    z = jnp.zeros_like(Sp)
    out = fn(Sp, z, z)
    assert len(out) == 4
    iters = np.asarray(out[3])
    assert iters.shape == (20,) and (iters >= 1).all() and (iters <= 10).all()
    ref = magmp(st0.copy(), dtm, steps=20, tol=1e-10, maxit=10, minit=1)
    np.testing.assert_allclose(from_planes(np.asarray(out[0])), ref, atol=1e-12)


def test_mhd_stepper_compsum_trajectory():
    """Kahan compensation changes nothing at c128 beyond rounding level."""
    import jax.numpy as jnp
    from quflow_tpu.parallel.stepper import (
        build_mhd_step_fn, to_planes, from_planes,
    )

    N = 16
    S = _rand_mhd_state(N)
    dt = 0.2 * hbar(N)
    outs = {}
    for cs in (False, True):
        fn = build_mhd_step_fn(N, dt, steps=10, maxit=5, dtype=np.complex128,
                               compsum=cs)
        Sp = jnp.asarray(to_planes(S))
        z = jnp.zeros_like(Sp)
        outs[cs] = from_planes(np.asarray(fn(Sp, z, z)[0]))
    np.testing.assert_allclose(outs[True], outs[False], atol=1e-13)


def test_mhd_sharded_step_equals_single():
    """Mesh parity for the MHD stepper (mirrors
    test_sharded_step_equals_single): sharded poisson + laplace cores under
    the O(1)-collective relayout match the single-device trajectory."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from quflow_tpu.parallel import make_mesh
    from quflow_tpu.parallel.stepper import (
        build_mhd_step_fn, to_planes, from_planes,
    )

    N = 32
    mesh = make_mesh(jax.devices(), dp=1)
    S = _rand_mhd_state(N, seed=11)
    dt = 0.2 * hbar(N)
    fn_mesh = build_mhd_step_fn(N, dt, steps=5, maxit=5, dtype=np.complex128,
                                compsum=False, mesh=mesh)
    sh = NamedSharding(mesh, P(None, None, ("i", "j"), None))
    Sp = jax.device_put(jnp.asarray(to_planes(S)), sh)
    z = jax.device_put(jnp.zeros_like(Sp), sh)
    out = from_planes(np.asarray(fn_mesh(Sp, z, z)[0]))

    fn1 = build_mhd_step_fn(N, dt, steps=5, maxit=5, dtype=np.complex128,
                            compsum=False)
    Sp1 = jnp.asarray(to_planes(S))
    z1 = jnp.zeros_like(Sp1)
    ref = from_planes(np.asarray(fn1(Sp1, z1, z1)[0]))
    np.testing.assert_allclose(out, ref, atol=1e-11)


def test_magmp_tpu_adapter_matches_magmp(oracle):
    """MagmpTPU (the drop-in sim.solve integrator) == magmp at a fixed
    iteration count, including stats filling and warm-state threading
    across calls."""
    from quflow_tpu.parallel.stepper import MagmpTPU

    st0 = oracle["mhd_state0"]
    dtm = float(oracle["mhd_dt"])
    ref = magmp(st0.copy(), dtm, steps=20, tol=1e-18, maxit=8, minit=8)
    integ = MagmpTPU(maxit=8, dtype=np.complex128)
    stats = {}
    out = integ(st0.copy(), dtm, steps=10, stats=stats)
    out = integ(out, dtm, steps=10, stats=stats)
    np.testing.assert_allclose(out, ref, atol=1e-12)
    assert stats["iterations"] == 8.0 and stats["maxit"] == 8.0


def test_magmp_tpu_adapter_adaptive_stats(oracle):
    """Adaptive tol on the adapter returns device-true per-step iteration
    counts (the reference's iterations-vs-time health diagnostic)."""
    from quflow_tpu.parallel.stepper import MagmpTPU

    st0 = oracle["mhd_state0"]
    dtm = float(oracle["mhd_dt"])
    integ = MagmpTPU(maxit=10, tol=1e-10, minit=1, dtype=np.complex128,
                     compsum=False)
    stats = {}
    out = integ(st0.copy(), dtm, steps=20, stats=stats)
    ref = magmp(st0.copy(), dtm, steps=20, tol=1e-10, maxit=10, minit=1)
    np.testing.assert_allclose(out, ref, atol=1e-12)
    assert stats["iterations_series"].shape == (20,)
    assert 1 <= stats["iterations"] <= 10


def test_magmp_tpu_in_solve(oracle):
    """qf.solve drives an MHD simulation through the device-resident
    adapter exactly as through the reference-semantics magmp."""
    from quflow_tpu.parallel.stepper import MagmpTPU

    st0 = oracle["mhd_state0"]
    dtm = float(oracle["mhd_dt"])
    ref = magmp(st0.copy(), dtm, steps=10, tol=1e-18, maxit=5, minit=5)
    out = qf.solve(st0.copy(), dt=dtm, steps=10, steps_out=5,
                   integrator=MagmpTPU(maxit=5, dtype=np.complex128),
                   progress_bar=False)
    np.testing.assert_allclose(out, ref, atol=1e-12)


def test_magmp_tpu_rejects_per_call_kwargs(oracle):
    """Physics is BUILD-time configuration: unsupported per-call kwargs are
    a hard error, same contract as IsompTPU."""
    from quflow_tpu.parallel.stepper import MagmpTPU

    st0 = oracle["mhd_state0"]
    integ = MagmpTPU(maxit=5, dtype=np.complex128)
    with pytest.raises(TypeError, match="per-call integrator kwargs"):
        integ(st0.copy(), 0.1, steps=1, forcing=lambda P, W: W)
    with pytest.raises(ValueError, match="two-component"):
        integ(st0[0].copy(), 0.1, steps=1)


def test_magmp_tpu_registry_roundtrip():
    """The declarative config registry resolves 'magmp_tpu' (runfile /
    QuSimulation attr surface for the device MHD integrator)."""
    from quflow_tpu.sim.registry import resolve, name_of

    fn = resolve("magmp_tpu")
    assert callable(fn)
    assert name_of(fn) == "magmp_tpu"


def test_magmp_tpu_adapter_under_mesh():
    """MagmpTPU(mesh=...) shards the magnetic midpoint across the virtual
    8-device mesh and matches the single-device adapter trajectory."""
    import jax
    from quflow_tpu.parallel import make_mesh
    from quflow_tpu.parallel.stepper import MagmpTPU

    N = 32
    S = _rand_mhd_state(N, seed=13)
    dt = 0.2 * hbar(N)
    mesh = make_mesh(jax.devices(), dp=1)
    out = MagmpTPU(maxit=5, dtype=np.complex128, compsum=False,
                   mesh=mesh)(S.copy(), dt, steps=5)
    ref = MagmpTPU(maxit=5, dtype=np.complex128, compsum=False)(
        S.copy(), dt, steps=5)
    np.testing.assert_allclose(out, ref, atol=1e-11)
