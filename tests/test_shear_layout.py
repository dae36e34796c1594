"""Shear solve layout: single pad+reshape pack (columns = diagonals)
replacing the log2(N)-stage barrel-shift pack.  See
ops/diagpack.mat2shear and ops/tridiag.shear_laplacian."""

import numpy as np
import jax.numpy as jnp
import pytest

from quflow_tpu.ops.diagpack import mat2shear, shear2mat, subtract_col0_mean
from quflow_tpu.ops.tridiag import (
    shear_laplacian,
    TridiagFactors,
    solve_factored,
    dot_cols,
)
from quflow_tpu.ops.laplacian import solve_poisson, laplace
from quflow_tpu.ops.geometry import hbar
from quflow_tpu.parallel.stepper import (
    build_step_fn,
    build_poisson_fn,
    to_planes,
    from_planes,
)


def _rand_skewh(N, seed=0, tracefree=True, dtype=np.complex128):
    rng = np.random.RandomState(seed)
    W = rng.randn(N, N) + 1j * rng.randn(N, N)
    W = W - W.conj().T
    if tracefree:
        W = W - np.eye(N) * np.trace(W) / N
    return W.astype(dtype)


@pytest.mark.parametrize("N", [7, 8, 16, 33])
def test_shear_pack_roundtrip_and_placement(N):
    rng = np.random.RandomState(0)
    W = rng.randn(N, N) + 1j * rng.randn(N, N)
    D = np.asarray(mat2shear(jnp.asarray(W), tracefree=False))
    assert D.shape == (N, N + 1)
    # column j = upper diagonal j, then lower diagonal N+1-j
    for j in (0, 1, N // 2, N - 1, N):
        upper = np.diagonal(W, j)
        np.testing.assert_array_equal(D[: N - j, j] if j <= N else [], upper)
        if j >= 2:
            lower = np.diagonal(W, -(N + 1 - j))
            np.testing.assert_array_equal(D[N - j : N - 1, j], lower)
    np.testing.assert_array_equal(np.asarray(shear2mat(jnp.asarray(D))), W)


@pytest.mark.parametrize("N", [8, 9, 16, 33])
def test_shear_operator_matches_dense_laplace(N):
    W = _rand_skewh(N, seed=1, tracefree=False)
    op = shear_laplacian(N)
    op_cols = np.stack([op[:, 0, :].T, op[:, 1, :].T])
    D = mat2shear(jnp.asarray(W), tracefree=False)
    LD = np.asarray(dot_cols(jnp.asarray(op_cols), D))
    expect = np.asarray(
        mat2shear(jnp.asarray(np.asarray(laplace(W, skewh=False))), tracefree=False)
    )
    # pad slots: main coeff 1, rhs element 0 -> stays 0 on both sides
    np.testing.assert_allclose(LD, expect, atol=1e-10)


@pytest.mark.parametrize("N", [8, 9, 16, 33])
def test_shear_solve_matches_unified_poisson(N):
    W = _rand_skewh(N, seed=2)
    fac_row = TridiagFactors(shear_laplacian(N, bc=True))

    class F:
        pass

    f = F()
    f.w, f.binv, f.u, f.op = fac_row.w.T, fac_row.binv.T, fac_row.u.T, None
    d = mat2shear(jnp.asarray(W), tracefree=True)
    x = subtract_col0_mean(solve_factored(f, d, axis=-2))
    P = np.asarray(shear2mat(x))
    np.testing.assert_allclose(P, np.asarray(solve_poisson(W)), atol=1e-12)


@pytest.mark.parametrize("refine", [0, 1])
def test_shear_step_equals_wrapped_step(refine):
    N = 48
    W = _rand_skewh(N, seed=42)
    dt = 0.25 * hbar(N)
    outs = {}
    for layout in ("wrapped", "shear"):
        fn = build_step_fn(
            N, dt, steps=10, maxit=5, dtype=np.complex128, compsum=True,
            planes_io=True, layout=layout, refine=refine,
        )
        Wp = jnp.asarray(to_planes(W))
        st = fn(Wp, jnp.zeros_like(Wp), jnp.zeros_like(Wp))
        outs[layout] = from_planes(np.asarray(st[0]))
    np.testing.assert_allclose(outs["shear"], outs["wrapped"], atol=1e-12)


def test_shear_poisson_fn_batched():
    N = 24
    Ws = np.stack([_rand_skewh(N, seed=s) for s in range(3)])
    pf_s = build_poisson_fn(N, dtype=np.complex128, layout="shear", batched=True)
    pf_w = build_poisson_fn(N, dtype=np.complex128, layout="wrapped", batched=True)
    Wp = jnp.asarray(to_planes(Ws))
    np.testing.assert_allclose(
        np.asarray(pf_s(Wp)), np.asarray(pf_w(Wp)), atol=1e-12
    )


def test_mhd_stepper_shear_equals_rolls():
    """build_mhd_step_fn with the auto (shear) layout matches the rolls
    layout (two-component state, laplace + poisson cores)."""
    from quflow_tpu.parallel.stepper import build_mhd_step_fn

    N = 32
    rng = np.random.RandomState(7)

    def skewh(seed):
        A = rng.randn(N, N) + 1j * rng.randn(N, N)
        A = A - A.conj().T
        return A - np.eye(N) * np.trace(A) / N

    S = np.stack([skewh(0), 0.1 * skewh(1)]).astype(np.complex128)
    dt = 0.25 * hbar(N)
    outs = {}
    for layout in ("rolls", "auto"):
        fn = build_mhd_step_fn(N, dt, steps=5, maxit=5, dtype=np.complex128,
                               planes_io=True, layout=layout)
        Sp = jnp.asarray(np.stack([S.real, S.imag]))
        st = fn(Sp, jnp.zeros_like(Sp), jnp.zeros_like(Sp))
        outs[layout] = np.asarray(st[0])
    np.testing.assert_allclose(outs["auto"], outs["rolls"], atol=1e-12)


def test_mhd_stepper_pallas_equals_rolls():
    """layout='pallas' in the MHD stepper must pair the all-N-rows wrapped
    factors with the wrapped pack (a mismatch silently produced garbage:
    rolls-shaped factors are zero-padded to the kernel tile instead of
    raising).  Stable normalized state, interpret-mode kernel on CPU."""
    from quflow_tpu.parallel.stepper import build_mhd_step_fn

    N = 32
    rng = np.random.RandomState(7)

    def skewh(scale):
        A = rng.randn(N, N) + 1j * rng.randn(N, N)
        A = A - A.conj().T
        A = A - np.eye(N) * np.trace(A) / N
        return scale * A / np.abs(np.linalg.eigvalsh(-1j * A)).max()

    S = np.stack([skewh(1.0), skewh(0.1)]).astype(np.complex128)
    dt = 0.25 * hbar(N)
    outs = {}
    for layout in ("rolls", "pallas"):
        fn = build_mhd_step_fn(N, dt, steps=5, maxit=5, dtype=np.complex128,
                               planes_io=True, layout=layout)
        Sp = jnp.asarray(np.stack([S.real, S.imag]))
        st = fn(Sp, jnp.zeros_like(Sp), jnp.zeros_like(Sp))
        outs[layout] = np.asarray(st[0])
        assert np.isfinite(outs[layout]).all(), layout
    np.testing.assert_allclose(outs["pallas"], outs["rolls"], atol=1e-11)


def test_interleaved_shear_pack_roundtrip():
    """mat2shear_interleaved: lane 2j+c of the real view = channel c of
    shear column j; exact roundtrip back to the complex matrix."""
    from quflow_tpu.ops.diagpack import (
        mat2shear_interleaved,
        shear2mat_interleaved,
    )

    N = 16
    W = _rand_skewh(N, seed=3, tracefree=False)
    D = np.asarray(mat2shear_interleaved(jnp.asarray(W), tracefree=False))
    assert D.shape == (N, 2 * (N + 1))
    Dc = np.asarray(mat2shear(jnp.asarray(W), tracefree=False))
    np.testing.assert_array_equal(D[:, 0::2], Dc.real)
    np.testing.assert_array_equal(D[:, 1::2], Dc.imag)
    back = np.asarray(shear2mat_interleaved(jnp.asarray(D)))
    np.testing.assert_array_equal(back, W)


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
@pytest.mark.parametrize("refine", [0, "m0", 1])
@pytest.mark.parametrize("layout", ["shear", "shear_pallas"])
def test_interleaved_poisson_core_matches_complex_path(
    dtype, refine, layout, monkeypatch
):
    """The interleaved variant (QUFLOW_SHEAR_INTERLEAVE, opt-in - measured
    as a large v5e regression, see _poisson_core) is bit-identical to the
    complex shear path: same factors, same scan, lanes are independent
    systems."""
    from quflow_tpu.parallel.stepper import _poisson_core, _real_factors

    N = 48
    W = _rand_skewh(N, seed=5, dtype=dtype)
    rd = np.zeros(1, dtype=dtype).real.dtype
    w, binv, u, op = _real_factors(N, rd, with_op=True, shear=True)
    Wj = jnp.asarray(W)
    monkeypatch.setenv("QUFLOW_SHEAR_INTERLEAVE", "0")
    P0 = np.asarray(
        _poisson_core(Wj, w, binv, u, layout=layout, refine=refine, op=op)
    )
    monkeypatch.setenv("QUFLOW_SHEAR_INTERLEAVE", "1")
    P1 = np.asarray(
        _poisson_core(Wj, w, binv, u, layout=layout, refine=refine, op=op)
    )
    np.testing.assert_array_equal(P1, P0)
    # and it actually solves: laplace(P) == W (f64 only; f32 is approximate)
    if dtype == np.complex128:
        np.testing.assert_allclose(
            np.asarray(laplace(P1, skewh=False)), W, atol=1e-11 * N
        )


@pytest.mark.parametrize("refine", [0, "m0"])
def test_shear_pallas_il_layout_matches_complex_path(refine, monkeypatch):
    """'shear_pallas_il' (first-class interleave+kernel layout, no env
    needed) is bit-identical to the complex 'shear_pallas' path.  This is
    the large-N glue-fusion candidate: the interleaved pack preserves
    complex64's storage order, and the serial Thomas kernel is purely
    lane-elementwise (benchmarks/glue_fusion_device.py measures it on
    device)."""
    from quflow_tpu.parallel.stepper import _poisson_core, _real_factors

    monkeypatch.delenv("QUFLOW_SHEAR_INTERLEAVE", raising=False)
    N = 48
    W = _rand_skewh(N, seed=7, dtype=np.complex64)
    w, binv, u, op = _real_factors(N, np.float32, with_op=True, shear=True)
    Wj = jnp.asarray(W)
    P0 = np.asarray(
        _poisson_core(Wj, w, binv, u, layout="shear_pallas",
                      refine=refine, op=op)
    )
    P1 = np.asarray(
        _poisson_core(Wj, w, binv, u, layout="shear_pallas_il",
                      refine=refine, op=op)
    )
    np.testing.assert_array_equal(P1, P0)


def test_shear_pallas_il_step_matches():
    """A full production step under layout='shear_pallas_il' matches the
    complex shear_pallas step (same GEMMs, interleaved solve)."""
    from quflow_tpu.parallel.stepper import build_step_fn, to_planes

    N = 32
    W = _rand_skewh(N, seed=11, dtype=np.complex64)
    W /= np.abs(W).max()
    dt = 0.25 * hbar(N)
    Wp = jnp.asarray(to_planes(W).astype(np.float32))
    z = jnp.zeros_like(Wp)
    outs = {}
    for layout in ("shear_pallas", "shear_pallas_il"):
        fn = build_step_fn(N, dt, steps=3, maxit=3, dtype=np.complex64,
                           compsum=True, planes_io=True, refine="m0",
                           layout=layout)
        outs[layout] = np.asarray(fn(Wp, z, z)[0])
    np.testing.assert_allclose(
        outs["shear_pallas_il"], outs["shear_pallas"], atol=1e-6
    )


def test_interleaved_batched_poisson_core():
    """Leading ensemble axes pass through the interleaved pack unchanged."""
    from quflow_tpu.parallel.stepper import _poisson_core, _real_factors

    N = 24
    Ws = np.stack([_rand_skewh(N, seed=s) for s in (1, 2, 3)])
    w, binv, u, op = _real_factors(N, np.float64, with_op=True, shear=True)
    P_batch = np.asarray(
        _poisson_core(jnp.asarray(Ws), w, binv, u, layout="shear")
    )
    for k in range(3):
        Pk = np.asarray(
            _poisson_core(jnp.asarray(Ws[k]), w, binv, u, layout="shear")
        )
        np.testing.assert_array_equal(P_batch[k], Pk)


def test_pallas_layout_redirects_to_chunked_at_4096():
    """Explicit layout='pallas' at N>=4096 resolves to the chunked kernel
    (the monolithic kernel's VMEM window fails Mosaic compile there,
    sweep_round2.json round 2) instead of dying at compile time - and warns
    that the explicit request was overridden."""
    import warnings

    from quflow_tpu.parallel.stepper import _resolve_layout

    with pytest.warns(UserWarning, match="shear_pallas"):
        assert _resolve_layout(4096, None, "pallas") == "shear_pallas"
    with pytest.warns(UserWarning, match="shear_pallas"):
        assert _resolve_layout(8192, None, "pallas") == "shear_pallas"
    # below the crossover the explicit request is honored, silently
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert _resolve_layout(2048, None, "pallas") == "pallas"
