"""Multi-chip sharding tests on the 8-device virtual CPU mesh:
sharded-vs-single-device equivalence, ensemble data parallelism, and the
production stepper's parity with the reference-semantics integrator."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import quflow_tpu as qf
from quflow_tpu.parallel import make_mesh, build_step_fn, build_poisson_fn
from quflow_tpu.parallel.stepper import to_planes, from_planes


def rsk(N, seed=0, batch=None):
    rng = np.random.RandomState(seed)
    shape = (N, N) if batch is None else (batch, N, N)
    W = rng.randn(*shape) + 1j * rng.randn(*shape)
    return W - np.conj(np.swapaxes(W, -1, -2))


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_poisson_equals_single():
    N = 32
    mesh = make_mesh(jax.devices(), dp=1)
    W = rsk(N, seed=1)
    Wp = to_planes(W)
    fn_sharded = build_poisson_fn(N, dtype=np.complex128, mesh=mesh, planes_io=True)
    sh = NamedSharding(mesh, P(None, "i", "j"))
    Wj = jax.device_put(jnp.asarray(Wp), sh)
    P_sh = from_planes(np.asarray(fn_sharded(Wj)))
    P_ref = np.asarray(qf.solve_poisson(W, skewh=True))
    np.testing.assert_allclose(P_sh, P_ref, atol=1e-12)


def test_sharded_step_equals_single():
    N = 32
    mesh = make_mesh(jax.devices(), dp=2)
    E = 2
    W = rsk(N, seed=2, batch=E)
    dt = 0.2 * qf.hbar(N)
    fn_mesh = build_step_fn(
        N, dt, steps=5, maxit=5, dtype=np.complex128, compsum=False,
        mesh=mesh, batched=True, planes_io=True,
    )
    sh = NamedSharding(mesh, P(None, "dp", "i", "j"))
    Wj = jax.device_put(jnp.asarray(to_planes(W)), sh)
    z = jax.device_put(jnp.zeros_like(Wj), sh)
    out = from_planes(np.asarray(fn_mesh(Wj, z, z)[0]))

    # single-device per-trajectory reference
    fn1 = build_step_fn(
        N, dt, steps=5, maxit=5, dtype=np.complex128, compsum=False, planes_io=True
    )
    for e in range(E):
        Wp = jnp.asarray(to_planes(W[e]))
        ze = jnp.zeros_like(Wp)
        ref = from_planes(np.asarray(fn1(Wp, ze, ze)[0]))
        np.testing.assert_allclose(out[e], ref, atol=1e-11)


def test_stepper_matches_isomp_fixed_iterations():
    """Branch-free stepper == isomp with minit=maxit (exact same math)."""
    d = np.load("tests/data/oracle.npz")
    W0 = d["isomp_W0"]
    dt = qf.hbar(16) * float(d["isomp_stepsize"])
    fn = build_step_fn(
        16, dt, steps=50, maxit=8, dtype=np.complex128, compsum=False, planes_io=True
    )
    Wp = jnp.asarray(to_planes(W0))
    z = jnp.zeros_like(Wp)
    out = from_planes(np.asarray(fn(Wp, z, z)[0]))
    ref = qf.isomp(W0.copy(), dt, 50, tol=1e-18, maxit=8, minit=8)
    np.testing.assert_allclose(out, ref, atol=1e-13)


def test_stepper_compsum_casimir_drift():
    """Kahan-compensated c64 stepping keeps Casimirs to f32 precision over a
    long run (the accuracy story for the TPU fast path)."""
    d = np.load("tests/data/oracle.npz")
    W0 = d["isomp_W0"].astype(np.complex64)
    dt = qf.hbar(16) * float(d["isomp_stepsize"])
    fn = build_step_fn(
        16, dt, steps=500, maxit=6, dtype=np.complex64, compsum=True, planes_io=True
    )
    Wp = jnp.asarray(to_planes(W0))
    z = jnp.zeros_like(Wp)
    out = from_planes(np.asarray(fn(Wp, z, z)[0]))
    e0 = np.sort(np.linalg.eigvalsh(-1j * W0.astype(np.complex128)))
    e1 = np.sort(np.linalg.eigvalsh(-1j * out.astype(np.complex128)))
    assert np.abs(e1 - e0).max() < 5e-5  # f32 scale spectral drift


def test_dryrun_entrypoints():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    fn, args = ge.entry()
    out = fn(*args)
    jax.block_until_ready(out)
    assert not bool(jnp.any(jnp.isnan(out[0])))


def test_isomp_tpu_adapter():
    """IsompTPU drop-in integrator: bit-parity with isomp at fixed
    iterations, warm state carried across calls."""
    from quflow_tpu.parallel.stepper import IsompTPU

    d = np.load("tests/data/oracle.npz")
    W0 = d["isomp_W0"]
    dt = qf.hbar(16) * float(d["isomp_stepsize"])
    integ = IsompTPU(maxit=8, dtype=np.complex128)
    W = integ(W0.copy(), dt, steps=25)
    W = integ(W, dt, steps=25)
    # two chunks with carried dW == one 50-step call of the raw stepper
    fn = build_step_fn(
        16, dt, steps=50, maxit=8, dtype=np.complex128, compsum=True,
        planes_io=True,
    )
    Wp = jnp.asarray(to_planes(W0))
    z = jnp.zeros_like(Wp)
    ref = from_planes(np.asarray(fn(Wp, z, z)[0]))
    np.testing.assert_allclose(W, ref, atol=1e-13)


def test_shard_pack_matches_wrapped():
    """The shard_map relayout (local barrel + ppermute halo + all_to_all)
    is bit-identical to the single-chip wrapped pack, including
    non-power-of-two block sizes and a dp-sharded ensemble axis."""
    from quflow_tpu.parallel.shard_pack import (
        flat_mesh_view,
        pack_wrapped_sharded,
        unpack_wrapped_sharded,
    )
    from quflow_tpu.ops.diagpack import mat2wrapped

    mesh = make_mesh(jax.devices(), dp=1)
    fm = flat_mesh_view(mesh)
    for N in (32, 48):
        W = rsk(N, seed=3)
        Wj = jax.device_put(jnp.asarray(W), NamedSharding(fm, P("tp", None)))
        V = jax.jit(lambda x: pack_wrapped_sharded(x, mesh))(Wj)
        Vref = np.asarray(mat2wrapped(jnp.asarray(W), tracefree=False))
        np.testing.assert_array_equal(np.asarray(V), Vref)
        back = jax.jit(lambda x: unpack_wrapped_sharded(x, mesh))(V)
        np.testing.assert_array_equal(np.asarray(back), W)

    mesh2 = make_mesh(jax.devices(), dp=2)
    fm2 = flat_mesh_view(mesh2)
    W = rsk(32, seed=4, batch=4)
    Wj = jax.device_put(jnp.asarray(W), NamedSharding(fm2, P("dp", "tp", None)))
    V = jax.jit(lambda x: pack_wrapped_sharded(x, mesh2, batched=True))(Wj)
    Vref = np.asarray(mat2wrapped(jnp.asarray(W), tracefree=False))
    np.testing.assert_array_equal(np.asarray(V), Vref)
    back = jax.jit(lambda x: unpack_wrapped_sharded(x, mesh2, batched=True))(V)
    np.testing.assert_array_equal(np.asarray(back), W)


def _collective_counts(txt):
    import re

    def count(op):
        return len(re.findall(re.escape(op) + r"\(", txt))

    return {op: count(op) for op in
            ("all-to-all", "collective-permute", "all-reduce", "all-gather")}


def test_sharded_poisson_o1_collectives_wrapped():
    """The wrapped-layout mesh relayout must be O(1) collectives: exactly one
    all-to-all and one collective-permute per pack/unpack (2 each per solve),
    at most 2 small all-reduces (trace projections), and no all-gather or
    scatter anywhere - the round-1 scatter fallback was ~250x pack-dominated."""
    from quflow_tpu.parallel.shard_pack import flat_mesh_view

    N = 64
    mesh = make_mesh(jax.devices(), dp=1)
    fm = flat_mesh_view(mesh)
    fn = build_poisson_fn(N, dtype=np.complex128, mesh=mesh, planes_io=True,
                          layout="shard")
    Wp = jax.device_put(
        jnp.asarray(to_planes(rsk(N, seed=5))),
        NamedSharding(fm, P(None, "tp", None)),
    )
    txt = jax.jit(fn).lower(Wp).compile().as_text()
    c = _collective_counts(txt)
    assert c["all-to-all"] == 2, c
    assert c["collective-permute"] == 2, c
    assert c["all-reduce"] <= 2, c
    assert c["all-gather"] == 0, c
    assert " scatter(" not in txt


def test_sharded_poisson_o1_collectives_shear():
    """The default mesh layout (sharded shear) must do strictly cheaper
    communication: NO all-to-all at all (the shear pack is a flat reshape -
    only the shard-boundary overlap moves, one neighbor ppermute each way),
    plus a handful of tiny carry/m0 all-gathers (O(s*N) elements) for the
    distributed affine scan."""
    from quflow_tpu.parallel.shard_pack import flat_mesh_view

    N = 64
    mesh = make_mesh(jax.devices(), dp=1)
    fm = flat_mesh_view(mesh)
    fn = build_poisson_fn(N, dtype=np.complex128, mesh=mesh, planes_io=True)
    Wp = jax.device_put(
        jnp.asarray(to_planes(rsk(N, seed=5))),
        NamedSharding(fm, P(None, "tp", None)),
    )
    txt = jax.jit(fn).lower(Wp).compile().as_text()
    c = _collective_counts(txt)
    assert c["all-to-all"] == 0, c
    assert c["collective-permute"] == 2, c
    # carries: fwd+bwd per re/im channel; each gathers s*(N+1) elements
    assert c["all-gather"] <= 8, c
    assert " scatter(" not in txt


def test_sharded_step_contains_collectives():
    """The mesh-sharded step must actually distribute: its optimized HLO
    contains cross-device collectives (GSPMD-inserted for the 2-D GEMMs and
    the solve relayout), and per-device argument shards are 1/ndev of the
    global state."""
    N = 32
    mesh = make_mesh(jax.devices(), dp=1)
    dt = 0.2 * qf.hbar(N)
    fn = build_step_fn(
        N, dt, steps=1, maxit=2, dtype=np.complex128, compsum=False,
        mesh=mesh, batched=False, planes_io=True,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(None, "i", "j"))
    Wp = jax.device_put(jnp.asarray(to_planes(rsk(N, seed=7))), sh)
    z = jax.device_put(jnp.zeros_like(Wp), sh)
    txt = jax.jit(fn).lower(Wp, z, z).compile().as_text()
    assert any(
        coll in txt
        for coll in ("all-reduce", "collective-permute", "all-gather", "all-to-all")
    ), "no collectives found - step not actually distributed"


def test_stepper_device_diagnostics():
    """with_diagnostics returns on-device [energy, enstrophy] matching the
    host functionals."""
    from quflow_tpu import physics

    d = np.load("tests/data/oracle.npz")
    W0 = d["isomp_W0"]
    dt = qf.hbar(16) * float(d["isomp_stepsize"])
    fn = build_step_fn(
        16, dt, steps=10, maxit=6, dtype=np.complex128, compsum=True,
        planes_io=True, with_diagnostics=True,
    )
    Wp = jnp.asarray(to_planes(W0))
    z = jnp.zeros_like(Wp)
    Wout, _, _, diag = fn(Wp, z, z)
    Wf = from_planes(np.asarray(Wout))
    np.testing.assert_allclose(
        np.asarray(diag),
        [float(physics.energy_euler(Wf)), float(physics.enstrophy(Wf))],
        rtol=1e-10,
    )


def test_stepper_adaptive_tolerance_matches_isomp():
    """tol= on the production stepper reproduces the reference's adaptive
    fixed-point semantics (while_loop with converged/stalled exit) - parity
    with isomp at the same tol/maxit/minit."""
    d = np.load("tests/data/oracle.npz")
    W0 = d["isomp_W0"]
    dt = qf.hbar(16) * float(d["isomp_stepsize"])
    fn = build_step_fn(
        16, dt, steps=50, maxit=10, dtype=np.complex128, compsum=False,
        planes_io=True, tol=1e-10, minit=1,
    )
    Wp = jnp.asarray(to_planes(W0))
    z = jnp.zeros_like(Wp)
    out = from_planes(np.asarray(fn(Wp, z, z)[0]))
    ref = qf.isomp(W0.copy(), dt, 50, tol=1e-10, maxit=10, minit=1)
    np.testing.assert_allclose(out, ref, atol=1e-13)


def test_stepper_adaptive_iteration_stats_device_true():
    """Adaptive mode reports the device while_loop's true per-step iteration
    counts (the reference's iterations-vs-time health diagnostic,
    isospectral.py:609-612) through the scan ys and IsompTPU.stats."""
    from quflow_tpu.parallel.stepper import IsompTPU

    d = np.load("tests/data/oracle.npz")
    W0 = d["isomp_W0"]
    dt = qf.hbar(16) * float(d["isomp_stepsize"])
    fn = build_step_fn(
        16, dt, steps=50, maxit=10, dtype=np.complex128, compsum=False,
        planes_io=True, tol=1e-10, minit=1,
    )
    Wp = jnp.asarray(to_planes(W0))
    z = jnp.zeros_like(Wp)
    res = fn(Wp, z, z)
    assert len(res) == 4
    iters = np.asarray(res[3])
    assert iters.shape == (50,) and iters.dtype == np.int32
    assert (iters >= 1).all() and (iters <= 10).all()
    # reference oracle: same mean iteration count
    stats_ref = {}
    qf.isomp(W0.copy(), dt, 50, tol=1e-10, maxit=10, minit=1, stats=stats_ref)
    np.testing.assert_allclose(iters.mean(), stats_ref["iterations"], atol=1e-12)

    # and via the drop-in integrator
    integ = IsompTPU(maxit=10, tol=1e-10, minit=1, dtype=np.complex128,
                     compsum=False)
    stats = {}
    integ(W0.copy(), dt, steps=50, stats=stats)
    np.testing.assert_allclose(stats["iterations"], stats_ref["iterations"],
                               atol=1e-12)
    assert stats["iterations_series"].shape == (50,)


def test_stepper_adaptive_under_mesh():
    """Adaptive while_loop composes with the sharded solve (residual is a
    global cross-shard reduction)."""
    N = 32
    mesh = make_mesh(jax.devices(), dp=1)
    W = rsk(N, seed=9)
    dt = 0.2 * qf.hbar(N)
    fn = build_step_fn(
        N, dt, steps=3, maxit=10, dtype=np.complex128, compsum=False,
        mesh=mesh, batched=False, planes_io=True, tol=1e-10,
    )
    sh = NamedSharding(mesh, P(None, "i", "j"))
    Wp = jax.device_put(jnp.asarray(to_planes(W)), sh)
    z = jax.device_put(jnp.zeros_like(Wp), sh)
    out = from_planes(np.asarray(fn(Wp, z, z)[0]))
    fn1 = build_step_fn(
        N, dt, steps=3, maxit=10, dtype=np.complex128, compsum=False,
        planes_io=True, tol=1e-10,
    )
    Wp1 = jnp.asarray(to_planes(W))
    z1 = jnp.zeros_like(Wp1)
    ref = from_planes(np.asarray(fn1(Wp1, z1, z1)[0]))
    np.testing.assert_allclose(out, ref, atol=1e-11)


def test_isomptpu_cold_restart_bit_exact():
    """IsompTPU(warm=False) is a pure function of (W, dt, steps): splitting
    a run across two integrator instances (the checkpoint/restart session
    boundary) is bit-exact vs one instance straight through."""
    from quflow_tpu.parallel.stepper import IsompTPU

    N = 24
    W0 = rsk(N, seed=13)
    dt = 0.2 * qf.hbar(N)
    a = IsompTPU(maxit=5, dtype=np.complex128, warm=False)
    W_mid = a(W0.copy(), dt, steps=10)
    b = IsompTPU(maxit=5, dtype=np.complex128, warm=False)
    W_two = b(W_mid.copy(), dt, steps=10)
    c = IsompTPU(maxit=5, dtype=np.complex128, warm=False)
    W_one = c(W0.copy(), dt, steps=10)
    W_one = c(W_one, dt, steps=10)
    np.testing.assert_array_equal(W_two, W_one)


def test_stepper_mixed_precision_schedule():
    """Mixed-precision fixed point (warm 'high' GEMMs, final 'highest'):
    on CPU all precision specs lower to the same f32 matmul, so the mixed
    schedule must reproduce the pure schedule exactly (planes path) /
    to f32 roundoff (complex path, karatsuba warm reorders the sums).
    Device accuracy is covered by benchmarks/mixed_precision.json."""
    from quflow_tpu.parallel.stepper import build_planes_step_fn

    N = 32
    W0 = rsk(N, seed=3).astype(np.complex64)
    W0 = W0 - np.eye(N) * np.trace(W0) / N
    dt = 0.25 * qf.hbar(N)
    Wp = jnp.asarray(to_planes(W0).astype(np.float32))
    z = jnp.zeros_like(Wp)

    g0 = build_planes_step_fn(N, dt, steps=5, maxit=5, layout="shear")
    g1 = build_planes_step_fn(
        N, dt, steps=5, maxit=5, layout="shear",
        warm_precision="high_karatsuba", warm_iters=3,
    )
    a = np.asarray(g0(Wp, z, z)[0])
    b = np.asarray(g1(Wp, z, z)[0])
    np.testing.assert_array_equal(a, b)

    f0 = build_step_fn(N, dt, steps=5, maxit=5, dtype=np.complex64,
                       planes_io=True)
    f1 = build_step_fn(N, dt, steps=5, maxit=5, dtype=np.complex64,
                       planes_io=True, warm_precision="high", warm_iters=3)
    c = np.asarray(f0(Wp, z, z)[0])
    d = np.asarray(f1(Wp, z, z)[0])
    np.testing.assert_allclose(c, d, atol=1e-6)

    # adaptive mode: warm phase runs before the while_loop; iteration
    # counts (full-precision phase only) still come back per step
    f2 = build_step_fn(N, dt, steps=4, maxit=10, dtype=np.complex64,
                       planes_io=True, tol=1e-7,
                       warm_precision="high", warm_iters=2)
    out = f2(Wp, z, z)
    iters = np.asarray(out[3])
    assert iters.shape == (4,) and (iters >= 1).all() and (iters <= 10).all()
