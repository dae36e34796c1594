"""Transform tests: SHT round trips and exactness on the Gauss-Legendre grid,
real<->complex coefficient maps, image conversions, dispatchers, and the
bracket-convergence cross-check tying the SHT convention to the quantization
basis convention (reference tests/test_transforms.py + test_geometry.py:138)."""

import numpy as np
import pytest

import quflow_tpu as qf


def get_fun(N=128):
    theta, phi = qf.sphgrid(N)
    return np.sin(phi) ** 2 * np.sin(theta / 2)


@pytest.mark.parametrize("N", [64, 128, 501])
def test_sht_forward_roundtrip(N):
    f = get_fun(N)
    omega = qf.fun2shc(f)
    f2 = qf.shc2fun(omega, isreal=True, berezin=False)
    omega2 = qf.fun2shc(f2)
    np.testing.assert_allclose(omega2, omega, atol=1e-14, rtol=1e-4)


@pytest.mark.parametrize("N", [16, 64])
def test_sht_bandlimited_exact(N):
    """Analysis o synthesis is the identity on band-limited signals."""
    rng = np.random.RandomState(N)
    omega = rng.randn(N**2)
    omega[0] = 0
    f = qf.shr2fun(omega, N=N, berezin=False)
    omega2 = qf.fun2shr(f)
    np.testing.assert_allclose(omega2, omega, atol=1e-11)


def test_sht_analytic_y10():
    om = np.zeros(16)
    om[qf.elm2ind(1, 0)] = 1.0
    f = qf.shr2fun(om, N=32, berezin=False)
    theta, phi = qf.sphgrid(32)
    np.testing.assert_allclose(f, np.sqrt(3) * np.cos(theta), atol=1e-13)


def test_sht_analytic_y11():
    om = np.zeros(16)
    om[qf.elm2ind(1, 1)] = 1.0
    f = qf.shr2fun(om, N=32, berezin=False)
    theta, phi = qf.sphgrid(32)
    np.testing.assert_allclose(
        f, np.sqrt(3) * np.sin(theta) * np.cos(phi), atol=1e-13
    )


@pytest.mark.parametrize("n", [17, 128])
def test_real_to_complex_harmonics(n):
    rng = np.random.RandomState(n)
    omega_real = rng.randn(n**2)
    omega_complex = qf.shr2shc(omega_real)
    np.testing.assert_allclose(qf.shc2shr(omega_complex), omega_real)


@pytest.mark.parametrize("n", [17, 128])
def test_complex_to_real_harmonics(n):
    rng = np.random.RandomState(n)
    omega_complex = qf.shr2shc(rng.randn(n**2))
    omega_real = qf.shc2shr(omega_complex)
    np.testing.assert_allclose(qf.shr2shc(omega_real), omega_complex)


def test_shr2shc_parity_with_reference():
    d = np.load("tests/data/oracle.npz")
    np.testing.assert_allclose(
        qf.shr2shc(d["omega17"]), d["shr2shc_17"], atol=1e-14
    )


def test_fun2img_roundtrip():
    f = get_fun(32)
    img = qf.fun2img(f, lim=1.0)
    assert img.dtype == np.uint8
    f2 = qf.img2fun(img, lim=1.0)
    assert np.abs(f - f2).max() < 1e-2


def test_as_fun_as_shr_dispatch():
    rng = np.random.RandomState(1)
    omega = rng.randn(16**2)
    omega[0] = 0
    W = qf.shr2mat(omega)
    # mat -> shr
    np.testing.assert_allclose(qf.as_shr(W), omega, atol=1e-12)
    # mat -> fun -> shr (berezin smoothing off for exactness)
    f = qf.as_fun(W, berezin=False)
    np.testing.assert_allclose(qf.as_shr(f)[:256], omega, atol=1e-10)
    # shr passthrough
    np.testing.assert_allclose(qf.as_shr(omega), omega)


def test_bracket_convergence():
    """Quantized bracket converges to the classical Poisson bracket: ties the
    SHT sign/orientation conventions to the quantization basis conventions
    (reference tests/test_geometry.py:138-161)."""
    N = 256
    rng = np.random.RandomState(42)
    omega = rng.randn(16)
    omega[0] = 0.0
    ell = np.floor(np.sqrt(np.arange(1, omega.shape[0]))).astype(int)
    psi = np.zeros_like(omega)
    psi[1:] = -omega[1:] / (ell * (ell + 1))

    f = qf.shr2fun(omega, N=512, berezin=False)
    g = qf.shr2fun(psi, N=512, berezin=False)
    fg = qf.poisson_finite_differences(f, g)
    omegapsi = qf.fun2shr(fg)

    W = qf.shr2mat(omega, N=N)
    P = qf.shr2mat(psi, N=N)
    WP = qf.shr2mat(omegapsi, N=N)
    WPprime = np.asarray(qf.bracket(W, P))
    np.testing.assert_allclose(WP, WPprime, atol=0.05)


def test_mw_grid_interop():
    """MW-sampled fun data (the reference's ducc0/pyssht sampling) reads,
    analyzes, and round-trips.  The 'reference-produced' input is built
    independently by brute-force scipy sph_harm evaluation at the MW nodes,
    which is exactly what ducc0 synthesis yields for band-limited data
    (reference quflow/transforms.py:10-21, 117-183)."""
    from scipy.special import sph_harm_y
    from quflow_tpu.ops.sht import mw_thetas
    from quflow_tpu.transforms import shr2shc, mw2gl, gl2mw

    L = 12
    rng = np.random.RandomState(5)
    omega = rng.randn(L * L)
    flm = shr2shc(omega) * np.sqrt(4.0 * np.pi)

    th = mw_thetas(L)
    ph = 2 * np.pi * np.arange(2 * L - 1) / (2 * L - 1)
    T, PH = np.meshgrid(th, ph, indexing="ij")
    f_mw = np.zeros_like(T)
    for el in range(L):
        for m in range(-el, el + 1):
            f_mw = f_mw + (flm[el * el + el + m] * sph_harm_y(el, m, T, PH)).real

    # analyze reference-style MW data back to real coefficients
    np.testing.assert_allclose(qf.as_shr(f_mw, grid="mw"), omega, atol=1e-10)
    np.testing.assert_allclose(qf.fun2shr(f_mw, grid="mw"), omega, atol=1e-10)

    # exact resampling MW <-> GL for band-limited data
    f_gl = qf.shr2fun(omega, N=L, berezin=False)
    np.testing.assert_allclose(mw2gl(f_mw), f_gl, atol=1e-10)
    np.testing.assert_allclose(gl2mw(f_gl), f_mw, atol=1e-10)

    # synthesis onto the MW grid writes reference-consumable data
    np.testing.assert_allclose(
        qf.shr2fun(omega, N=L, berezin=False, grid="mw"), f_mw, atol=1e-10
    )


def test_pyssht_style_forward_inverse():
    """forward/inverse parity with the pyssht-style API the reference
    emulates (reference transforms.py:117-183): MW and GL methods, real and
    complex, round trip to machine precision."""
    from quflow_tpu.transforms import forward, inverse

    L = 16
    rng = np.random.RandomState(6)
    for reality in (False, True):
        flm = rng.randn(L * L) + (0 if reality else 1j * rng.randn(L * L))
        if reality:
            # valid coefficients of a real signal
            from quflow_tpu.transforms import shr2shc

            flm = shr2shc(rng.randn(L * L))
        for method in ("MW", "GL"):
            f = inverse(flm, L, Method=method, Reality=reality)
            back = forward(f, L, Method=method, Reality=reality)
            np.testing.assert_allclose(back, flm, atol=1e-11)
