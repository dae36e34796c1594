"""Double-word (Ozaki-split) GEMM and the f64-accurate stepper.

This is the TPU-native replacement for the complex128 BLAS stepping that the
reference's machine-precision Casimir conservation rests on (reference
README.md:73-76); on-device validation lives in
benchmarks/conservation_device.py (--dw).
"""

import numpy as np
import jax
import jax.numpy as jnp

import quflow_tpu as qf
from quflow_tpu.ops.dwgemm import (
    dw_matmul,
    dw_matmul_planes,
    dw_split,
    split_params,
)
from quflow_tpu.parallel.stepper import build_dw_step_fn, to_planes, from_planes


def test_split_reconstruction_exact_to_budget():
    rng = np.random.RandomState(0)
    A = rng.randn(16, 256) * np.exp(2 * rng.randn(16, 1))
    t, q = split_params(256)
    sl = dw_split(A, t, q, axis=-1)
    rec = sum(np.asarray(s).astype(np.float64) for s in sl)
    rel = np.abs(rec - A).max() / np.abs(A).max()
    # slice sum reconstructs beyond f64; the f64 comparison itself
    # bounds the observable error at ~eps_f64
    assert rel < max(2.0 ** (-t * q + 2), 4e-16), rel


def test_dw_matmul_f64_accuracy():
    rng = np.random.RandomState(1)
    for K in (64, 512, 1024):
        A = rng.randn(24, K) * np.exp(rng.randn(24, 1))
        B = rng.randn(K, 24) * np.exp(rng.randn(1, 24))
        C = np.asarray(jax.jit(dw_matmul)(A, B))
        Cx = A @ B
        rel = np.abs(C - Cx).max() / np.abs(Cx).max()
        assert rel < 1e-14, (K, rel)


def test_dw_matmul_planes_complex():
    rng = np.random.RandomState(2)
    Ap = rng.randn(2, 16, 128)
    Bp = rng.randn(2, 128, 16)
    Cp = np.asarray(jax.jit(dw_matmul_planes)(Ap, Bp))
    Cx = (Ap[0] + 1j * Ap[1]) @ (Bp[0] + 1j * Bp[1])
    rel = max(
        np.abs(Cp[0] - Cx.real).max(), np.abs(Cp[1] - Cx.imag).max()
    ) / np.abs(Cx).max()
    assert rel < 1e-14, rel


def test_dw_stepper_matches_c128_host():
    """Pure-dw schedule == the complex128 host integrator at fixed
    iteration count (machine-precision trajectory parity; on the real TPU
    this held to 4.4e-15 over 20 steps)."""
    N = 32
    W0 = qf.shr2mat(qf.random_shr(lmax=7, seed=3), N=N).astype(np.complex128)
    dt = 0.2 * qf.hbar(N)
    fn = build_dw_step_fn(N, dt, steps=20, maxit=8, dw_iters=8, compsum=True)
    Wp = jnp.asarray(to_planes(W0))
    z = jnp.zeros_like(Wp)
    out = from_planes(np.asarray(fn(Wp, z, z)[0]))
    ref = qf.isomp(W0.copy(), dt, 20, tol=1e-18, maxit=8, minit=8, compsum=True)
    np.testing.assert_allclose(out, ref, atol=1e-13)


def test_dw_stepper_mixed_schedule_conserves():
    """The production mixed schedule (f32 iterations + dw finish) conserves
    the Casimirs at dw level over a short run."""
    N = 32
    W0 = qf.shr2mat(qf.random_shr(lmax=7, seed=4), N=N).astype(np.complex128)
    dt = 0.2 * qf.hbar(N)
    spec0 = np.sort(np.linalg.eigvalsh(-1j * W0))
    fn = build_dw_step_fn(N, dt, steps=50, maxit=5, dw_iters=2)
    Wp = jnp.asarray(to_planes(W0))
    z = jnp.zeros_like(Wp)
    Wf = from_planes(np.asarray(fn(Wp, z, z)[0]))
    spec = np.sort(np.linalg.eigvalsh(-1j * Wf))
    assert np.abs(spec - spec0).max() < 1e-11


def test_dw_stepper_diagnostics():
    N = 24
    W0 = qf.shr2mat(qf.random_shr(lmax=5, seed=5), N=N).astype(np.complex128)
    fn = build_dw_step_fn(N, 0.2 * qf.hbar(N), steps=3, with_diagnostics=True)
    Wp = jnp.asarray(to_planes(W0))
    z = jnp.zeros_like(Wp)
    *_, diag = fn(Wp, z, z)
    e, z2 = np.asarray(diag)
    assert abs(e - float(qf.energy_euler(W0))) < 1e-6
    assert abs(z2 - float(qf.enstrophy(W0))) < 1e-6


def test_dw_stepper_adaptive_reaches_f64_floor():
    """tol-mode dw stepping: the while_loop drives the residual to the f64
    stall floor (6-7 iterations at N=32) and the trajectory matches the
    complex128 host integrator to machine precision."""
    N = 32
    W0 = qf.shr2mat(qf.random_shr(lmax=7, seed=3), N=N).astype(np.complex128)
    dt = 0.2 * qf.hbar(N)
    fn = build_dw_step_fn(N, dt, steps=20, maxit=20, dw_iters=18, tol=1e-16)
    Wp = jnp.asarray(to_planes(W0))
    z = jnp.zeros_like(Wp)
    Wp_o, _, _, iters = fn(Wp, z, z)
    it = np.asarray(iters)
    assert it.shape == (20,) and (it >= 2).all() and (it < 20).all()
    ref = qf.isomp(W0.copy(), dt, 20, tol=1e-18, maxit=22, minit=1,
                   compsum=True)
    np.testing.assert_allclose(from_planes(np.asarray(Wp_o)), ref, atol=1e-14)
