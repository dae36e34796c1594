"""Graphics (headless) and cluster-launcher (local backend) tests."""

import os
import time

import numpy as np
import pytest

import quflow_tpu as qf
from quflow_tpu import graphics, cluster, analysis


def smooth_W(N=16, lmax=8, seed=3):
    return qf.shr2mat(analysis.random_shr(lmax=lmax, seed=seed), N=N)


def test_resample_coeffs():
    omega = analysis.random_shr(lmax=7, seed=1)
    up = graphics.resample(omega, 16)
    assert up.shape == (256,)
    np.testing.assert_equal(up[:64], omega)
    down = graphics.resample(up, 8)
    np.testing.assert_equal(down, omega)


def test_resample_mat_and_fun():
    W = smooth_W()
    om = graphics.resample(W, 32)
    assert om.shape == (32**2,)
    f = qf.shr2fun(qf.mat2shr(W))
    f2 = graphics.resample(f, 32)
    assert f2.shape == (32, 63)
    assert graphics.resample(f, 16) is f


def test_plot_projections(tmpdir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    W = smooth_W()
    for proj in ("hammer", "mollweide", None):
        im = qf.graphics.plot(W, projection=proj, colorbar=True, time=1.0,
                              contours=True, title="t")
        assert im is not None
        plt.close("all")


def test_spy(tmpdir):
    import matplotlib.pyplot as plt

    im = graphics.spy(smooth_W())
    assert im is not None
    plt.close("all")


def test_animation(tmpdir):
    out = str(tmpdir.join("anim.mp4"))
    states = [smooth_W(seed=s) for s in range(3)]
    path = graphics.create_animation(out, states, progress_bar=False)
    assert os.path.exists(path)
    assert os.path.getsize(path) > 0


def test_cluster_local_roundtrip(tmpdir):
    """Launch a tiny simulation as a local background job, poll status,
    verify the state advanced, delete."""
    from quflow_tpu.sim import QuSimulation

    W = smooth_W(N=12, lmax=5)
    filename = str(tmpdir.join("clustersim.hdf5"))
    sim = QuSimulation(filename, overwrite=True, state=W)
    sim["stepsize"] = 0.1
    sim["steps"] = 20
    sim["steps_out"] = 10
    sim["progress_bar"] = False

    jobid = cluster.solve(
        filename, backend="local",
        env={"JAX_PLATFORMS": "cpu", "PYTHONPATH": os.getcwd()},
    )
    assert isinstance(jobid, int)

    deadline = time.time() + 120
    while time.time() < deadline:
        info = cluster.status(filename, verbatim=False)
        if not info["running"]:
            break
        time.sleep(1)
    assert not cluster.status(filename, verbatim=False)["running"]

    log = open(str(tmpdir.join("clustersim_job.log"))).read()
    sim2 = QuSimulation(filename)
    assert sim2["step"][-1] == 20, f"job log:\n{log}"
    assert cluster.retrieve(filename) == os.path.abspath(filename)
    cluster.delete(filename, local=True)
    assert not os.path.exists(str(tmpdir.join("clustersim_cluster.json")))


def test_get_auto_cores():
    assert cluster.get_auto_cores(128) == 4
    assert cluster.get_auto_cores(512) == 8
    assert cluster.get_auto_cores(1024) == 16
    assert cluster.get_auto_cores(4096) == 32
