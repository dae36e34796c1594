"""io layer: basis persistence (reference-compatible HDF5 format), generic
save/load, QuData legacy callback."""

import os

import numpy as np
import pytest

import quflow_tpu as qf
from quflow_tpu import io as qio


def test_basis_roundtrip_hdf5(tmpdir, monkeypatch):
    basis = qf.compute_basis(9)
    monkeypatch.setenv("QUFLOW_BASIS_PATH", str(tmpdir))
    monkeypatch.setenv("QUFLOW_BASIS_FILENAME", "testbasis.hdf5")
    path = qio.save_basis(basis, path=str(tmpdir.join("testbasis.hdf5")))
    assert os.path.exists(path)
    loaded = qio.load_basis(9)
    np.testing.assert_allclose(loaded, basis)
    assert qio.load_basis(33) is None  # other N not present


def test_get_N_for_basis():
    for N in (3, 9, 17, 64):
        ln = N * (N + 1) * (2 * N + 1) // 6
        assert qio.get_N_for_basis(ln) == N
    with pytest.raises(ValueError):
        qio.get_N_for_basis(12345)


def test_save_load_state(tmpdir):
    f = str(tmpdir.join("state.hdf5"))
    omega = np.random.RandomState(0).randn(25)
    qio.save(f, omega, qtype="shr", attrs={"N": 5})
    back = qio.load(f)
    np.testing.assert_equal(back, omega)


def test_qudata_flush(tmpdir):
    import h5py

    f = str(tmpdir.join("qudata.hdf5"))
    qd = qio.QuData(f, cache_size=3, qtype="shr")
    W = qf.shr2mat(np.random.RandomState(1).randn(49), N=7)
    for k in range(5):
        qd(W, inner_time=0.5)
    qd.flush()
    with h5py.File(f, "r") as h:
        assert h["state"].shape[0] == 5
        np.testing.assert_allclose(h["qtime"][:], 0.5 * np.arange(1, 6))
        np.testing.assert_allclose(h["state"][0], qf.mat2shr(W), atol=1e-12)
