"""Utility-layer tests: index maps, dtype pairing, Berezin multipliers,
coordinate transforms, time units."""

import numpy as np
import pytest

import quflow_tpu as qf
from quflow_tpu.utils import gauss_legendre_thetas


def test_elm2ind_ind2elm_roundtrip():
    ind = np.arange(400)
    el, m = qf.ind2elm(ind)
    np.testing.assert_equal(qf.elm2ind(el, m), ind)
    assert np.all(np.abs(m) <= el)


def test_dtype_pairing():
    assert qf.complex_dtype(np.float32) == np.complex64
    assert qf.complex_dtype(np.float64) == np.complex128
    assert qf.real_dtype(np.complex64) == np.float32
    assert qf.real_dtype(np.complex128) == np.float64
    assert qf.real_dtype(np.float64) == np.float64


def test_berezin_multipliers():
    N = 16
    bw = qf.berezin_multipliers(N)
    assert bw.shape == (N**2,)
    # w_0 = 1; direct product formula for small el
    np.testing.assert_allclose(bw[0], 1.0)
    el = 3
    expected = np.sqrt(np.prod([(N - j) / (N + j) for j in range(el + 1)]))
    np.testing.assert_allclose(bw[qf.elm2ind(el, 0)], expected, rtol=1e-12)
    # decreasing in el
    els = qf.ind2elm(np.arange(N**2))[0]
    diag = bw[qf.elm2ind(np.arange(N), 0)]
    assert np.all(np.diff(diag) < 0)


def test_cart_sph_roundtrip():
    rng = np.random.RandomState(0)
    v = rng.randn(3, 100)
    v /= np.linalg.norm(v, axis=0)
    theta, phi = qf.cart2sph(*v)
    x, y, z = qf.sph2cart(theta, phi)
    np.testing.assert_allclose(np.stack([x, y, z]), v, atol=1e-12)


def test_qtime_seconds_roundtrip():
    N = 33
    t = 2.34
    np.testing.assert_allclose(
        qf.qtime2seconds(qf.seconds2qtime(t, N), N), t, rtol=1e-14
    )
    np.testing.assert_allclose(qf.qtime2seconds(1.0, N), qf.hbar(N), rtol=1e-14)


def test_sphgrid_gl_quadrature():
    """GL thetas integrate band-limited polynomials in cos(theta) exactly."""
    from scipy.special import roots_legendre

    N = 16
    theta, phi = qf.sphgrid(N)
    assert theta.shape == (N, 2 * N - 1)
    x, w = roots_legendre(N)
    # integral of cos^2(theta) over the sphere = 4 pi / 3
    val = (np.cos(np.arccos(x)) ** 2 * w).sum() * 2 * np.pi
    np.testing.assert_allclose(val, 4 * np.pi / 3, rtol=1e-12)


def test_sphgrid_mw_option():
    theta, phi = qf.sphgrid(8, grid="mw")
    np.testing.assert_allclose(theta[:, 0], (2 * np.arange(8) + 1) * np.pi / 15)
