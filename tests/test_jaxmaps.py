"""Jittable band-limited quantization maps: parity with the host transforms,
differentiability, vmap."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import quflow_tpu as qf
from quflow_tpu.quantization.jaxmaps import build_shr2mat_fn, build_mat2shr_fn


@pytest.mark.parametrize("N,lmax", [(17, 5), (33, 10), (64, 16)])
def test_shr2mat_parity(N, lmax):
    rng = np.random.RandomState(N)
    omega = rng.randn((lmax + 1) ** 2)
    W_ref = qf.shr2mat(omega, N=N)
    W_jax = np.asarray(build_shr2mat_fn(N, lmax)(omega))
    np.testing.assert_allclose(W_jax, W_ref, atol=1e-13)


@pytest.mark.parametrize("N,lmax", [(17, 5), (33, 10)])
def test_mat2shr_parity(N, lmax):
    rng = np.random.RandomState(N + 1)
    W = qf.shr2mat(rng.randn(N**2), N=N)
    om_ref = qf.mat2shr(W)[: (lmax + 1) ** 2]
    om_jax = np.asarray(build_mat2shr_fn(N, lmax)(W))
    np.testing.assert_allclose(om_jax, om_ref, atol=1e-13)


def test_roundtrip_and_grad():
    N, lmax = 17, 6
    fn = build_shr2mat_fn(N, lmax)
    gn = build_mat2shr_fn(N, lmax)
    rng = np.random.RandomState(2)
    omega = jnp.asarray(rng.randn((lmax + 1) ** 2))
    np.testing.assert_allclose(np.asarray(gn(fn(omega))), omega, atol=1e-12)

    # differentiable through the map (enables adjoint/optimization workflows
    # the reference cannot express)
    def loss(om):
        W = fn(om)
        return jnp.sum(jnp.abs(W) ** 2)

    g = jax.grad(loss)(omega)
    # d/d om ||T om||^2 = 2 T^T T om; with the L2 isometry ||W||_F^2 = N ||om||^2
    np.testing.assert_allclose(np.asarray(g), 2 * N * np.asarray(omega), rtol=1e-10)


def test_vmap_batched():
    N, lmax = 17, 4
    fn = build_shr2mat_fn(N, lmax)
    rng = np.random.RandomState(3)
    oms = jnp.asarray(rng.randn(5, (lmax + 1) ** 2))
    Ws = jax.vmap(fn)(oms)
    assert Ws.shape == (5, N, N)
    np.testing.assert_allclose(
        np.asarray(Ws[2]), qf.shr2mat(np.asarray(oms[2]), N=N), atol=1e-13
    )
