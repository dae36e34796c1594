"""Pallas solve kernel: interpret-mode equivalence with the associative-scan
solver (device validation happens in the TPU bench)."""

import numpy as np
import pytest

import quflow_tpu as qf
from quflow_tpu.ops.laplacian import _factors
from quflow_tpu.ops.diagpack import mat2diagh
from quflow_tpu.ops.tridiag import solve_factored
from quflow_tpu.ops.pallas_solve import solve_factored_pallas


@pytest.mark.parametrize("N", [16, 33])
def test_pallas_thomas_equivalence(N):
    rng = np.random.RandomState(N)
    W = rng.randn(N, N) + 1j * rng.randn(N, N)
    W = W - W.conj().T
    fac = _factors(N, True, "poisson", ())
    d = np.asarray(mat2diagh(W, skewh=True, tracefree=True))
    planes = np.stack([d.real, d.imag])
    out = np.asarray(
        solve_factored_pallas(fac.w, fac.binv, fac.u, planes, tile=8, interpret=True)
    )
    ref = np.asarray(solve_factored(fac, d))
    np.testing.assert_allclose(out[0] + 1j * out[1], ref, atol=1e-11)


def test_pallas_layout_in_stepper():
    """layout='pallas' end-to-end through the production Poisson core
    (interpret mode on CPU) matches the wrapped scan layout."""
    from quflow_tpu.parallel.stepper import build_poisson_fn, to_planes, from_planes

    N = 64
    rng = np.random.RandomState(3)
    W = rng.randn(N, N) + 1j * rng.randn(N, N)
    W = W - W.conj().T
    import jax.numpy as jnp

    Wp = jnp.asarray(to_planes(W))
    Pw = from_planes(np.asarray(build_poisson_fn(N, dtype=np.complex128, layout="wrapped")(Wp)))
    Pp = from_planes(np.asarray(build_poisson_fn(N, dtype=np.complex128, layout="pallas")(Wp)))
    np.testing.assert_allclose(Pp, Pw, atol=1e-12)


def test_pallas_layout_refine():
    """refine=1 routes its correction solves through the pallas base."""
    from quflow_tpu.parallel.stepper import _poisson_core, _real_factors
    import jax.numpy as jnp

    N = 64
    rng = np.random.RandomState(4)
    W = (rng.randn(N, N) + 1j * rng.randn(N, N)).astype(np.complex64)
    W = W - W.conj().T
    w, binv, u, op = _real_factors(N, np.float32, with_op=True, wrapped=True)
    Pp = np.asarray(_poisson_core(jnp.asarray(W), w, binv, u, layout="pallas",
                                  refine=1, op=op))
    w2, binv2, u2, op2 = _real_factors(N, np.float64, with_op=True, wrapped=True)
    Pref = np.asarray(_poisson_core(jnp.asarray(W.astype(np.complex128)),
                                    w2, binv2, u2, layout="wrapped"))
    assert np.abs(Pp - Pref).max() < 5e-6


def test_chunked_solver_matches_monolithic():
    """The chunked two-kernel pipeline (used for N > 2048, where the
    monolithic kernel's VMEM blocks overflow) must reproduce the monolithic
    kernel exactly: same recurrence, carry threaded through scratch."""
    import numpy as np
    import jax.numpy as jnp
    from quflow_tpu.ops.pallas_solve import _solve_T, _solve_T_chunked, pad_cols
    from quflow_tpu.parallel.stepper import _shear_factors_cached

    N = 256
    w, binv, u, _op = _shear_factors_cached(N)
    rng = np.random.RandomState(0)
    tile = 128
    pad = pad_cols(N + 1, tile)

    def padf(f, fill):
        return np.concatenate(
            [f.astype(np.float32), np.full((N, pad), fill, np.float32)], axis=1
        )

    wp, bp, up = padf(w, 0.0), padf(binv, 1.0), padf(u, 0.0)
    d = rng.randn(2, N, N + 1 + pad).astype(np.float32)
    x_mono = _solve_T(
        jnp.asarray(wp), jnp.asarray(bp), jnp.asarray(up), jnp.asarray(d),
        tile=tile, interpret=True,
    )
    x_chunk = _solve_T_chunked(
        jnp.asarray(wp), jnp.asarray(bp), jnp.asarray(up), jnp.asarray(d),
        tile=tile, chunk=64, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(x_mono), np.asarray(x_chunk))
