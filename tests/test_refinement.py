"""Mixed-precision iterative refinement of the f32 solve (the m=0 caveat)."""

import numpy as np
import pytest
import jax.numpy as jnp

import quflow_tpu as qf
from quflow_tpu.ops.laplacian import _factors
from quflow_tpu.ops.diagpack import mat2diagh
from quflow_tpu.ops.tridiag import solve_factored
from quflow_tpu.parallel.stepper import _Fac


def test_mixed_refinement_recovers_m0():
    N = 512
    rng = np.random.RandomState(N)
    lmax = 32
    omegaP = rng.randn(lmax**2)
    omegaP[0] = 0
    omegaW = omegaP.copy()
    ells = qf.ind2elm(np.arange(lmax**2))[0][1:]
    omegaW[1:] *= -ells * (ells + 1)
    W = qf.shr2mat(omegaW, N=N)
    Pex = qf.shr2mat(omegaP, N=N)
    d64 = np.array(mat2diagh(jnp.asarray(W), skewh=True, tracefree=True))
    dex = np.array(mat2diagh(jnp.asarray(Pex), skewh=True, tracefree=False))
    fac = _factors(N, True, "poisson", ())
    F32 = _Fac(
        fac.w.astype(np.float32), fac.binv.astype(np.float32),
        fac.u.astype(np.float32),
    )
    d32 = jnp.asarray(np.stack([d64.real, d64.imag]).astype(np.float32))

    def err(x):
        xc = (np.array(x)[0] + 1j * np.array(x)[1]).astype(np.complex128)
        xc[0] -= xc[0].mean()
        return np.abs(xc - dex).max(axis=1)

    e0 = err(solve_factored(F32, d32))
    e1 = err(solve_factored(F32, d32, refine=1, op=fac.op))
    # refinement brings row 0 down to the level of the other rows
    assert e1[0] < e0[0] / 10
    assert e1[0] < 10 * e1[1:].max()


def test_refine_default_on_for_f32_off_for_f64():
    """Production default (benchmarks/conservation_1024.json: f64-residual
    refinement cuts Casimir drift 38x at N=1024/10k steps in f32): f32
    steppers refine the m=0 system ('m0', O(N) targeted refinement with
    accuracy equal to the full-array refine=1 - the f32 error concentrates
    there), f64 steppers do not (base solve already at roundoff)."""
    import numpy as np
    import jax.numpy as jnp
    from quflow_tpu.parallel.stepper import build_step_fn, to_planes, from_planes
    from quflow_tpu.ops.geometry import hbar

    N = 32
    rng = np.random.RandomState(3)
    W = rng.randn(N, N) + 1j * rng.randn(N, N)
    W = W - W.conj().T
    W = W - np.eye(N) * np.trace(W) / N
    dt = 0.25 * hbar(N)

    def run(dtype, refine):
        fn = build_step_fn(N, dt, steps=5, dtype=dtype, planes_io=True,
                           refine=refine)
        rd = np.zeros(1, dtype=dtype).real.dtype
        Wp = jnp.asarray(to_planes(W.astype(dtype)).astype(rd))
        st = fn(Wp, jnp.zeros_like(Wp), jnp.zeros_like(Wp))
        return from_planes(np.asarray(st[0]))

    # f32: default (None) == explicit refine='m0', differs from refine=0
    assert np.array_equal(run(np.complex64, None), run(np.complex64, "m0"))
    assert not np.array_equal(run(np.complex64, None), run(np.complex64, 0))
    # f64: default == refine=0
    assert np.array_equal(run(np.complex128, None), run(np.complex128, 0))


def test_refine_m0_matches_full_refinement_accuracy():
    """Targeted m=0 refinement recovers the same accuracy as full-array
    refinement: the f32 solve error is concentrated in the m=0 system
    (reference's CUDA f32 path special-cases it, cuda.py:457-492)."""
    import numpy as np
    import jax.numpy as jnp
    import quflow_tpu as qf
    from quflow_tpu.parallel.stepper import _real_factors, _poisson_core

    N = 128
    rng = np.random.RandomState(5)
    W = qf.shr2mat(rng.randn(N**2), N=N)
    Pex = np.asarray(qf.solve_poisson(W))  # f64 exact

    w32, b32, u32, op = _real_factors(N, np.float32, with_op=True, shear=True)
    Wc = jnp.asarray(W.astype(np.complex64))

    def err(refine):
        P = np.asarray(
            _poisson_core(Wc, w32, b32, u32, layout="shear", refine=refine,
                          op=op)
        ).astype(np.complex128)
        return np.abs(P - Pex).max()

    e0, em0, e1 = err(0), err("m0"), err(1)
    assert em0 < e0 / 3  # targeted refinement clearly helps
    assert em0 <= 1.5 * e1  # ... and matches full refinement
