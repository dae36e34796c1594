#!/usr/bin/env python
"""Flagship physics demos on device (BASELINE.json config list):

  * N=512 two-blob merger (dynamics.blob initial data) over 1e4 steps
  * N=512 double-shear layer (band initial vorticity) over 1e4 steps

Each runs the production TPU stepper (c64 planes, refine='m0', compsum) with
on-device energy/enstrophy series, measures Casimir/energy/enstrophy drift,
and renders vorticity frames (initial / middle / final) through the
band-limited streamed mat2shr -> shr2fun pipeline.  Artifacts:
benchmarks/flagship_demos.json + docs/demos/*.png.

The reference demonstrates the same physics in its notebooks
(/root/reference/notebooks/, blob initial data quflow/dynamics.py:244-304)
but never at this scale or with committed conservation series.

Run (device):  timeout 3000 python benchmarks/flagship_demos.py [--N 512]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "flagship_demos.json")
FRAMES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "demos")


def two_blob_initial(N):
    """Two like-signed vorticity blobs a quarter-sphere apart (merger)."""
    import numpy as np
    import quflow_tpu as qf

    def pos(theta, phi):
        return np.array([np.sin(theta) * np.cos(phi),
                         np.sin(theta) * np.sin(phi), np.cos(theta)])

    # two like-signed blobs near the equator, ~0.55 rad apart
    p1 = pos(np.pi / 2 - 0.15, -0.25)
    p2 = pos(np.pi / 2 + 0.15, +0.25)
    W = qf.blob(N, pos=p1, sigma=0.05) + qf.blob(N, pos=p2, sigma=0.05)
    W = W - np.trace(W) / N * np.eye(N)
    return W / qf.norm_L2(W)


def double_shear_initial(N, lmax=128):
    """Two opposite-signed shear bands + a small symmetry-breaking ripple,
    band-limited to lmax (streamed shr2mat - no O(N^3/3) basis needed)."""
    import numpy as np
    import quflow_tpu as qf

    theta, phi = qf.sphgrid(lmax + 1)
    d = 0.15
    f = (np.exp(-((theta - np.pi / 2 + 0.35) / d) ** 2)
         - np.exp(-((theta - np.pi / 2 - 0.35) / d) ** 2))
    f = f * (1.0 + 0.05 * np.cos(6 * phi))
    omega = qf.fun2shr(f)
    omega[0] = 0.0
    W = qf.shr2mat(omega.astype(np.float64), N=N)
    return np.asarray(W) / qf.norm_L2(np.asarray(W))


def render(W, path, elmax=170, title=None):
    """Band-limited vorticity frame via the streamed adjoint transform."""
    import numpy as np
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import quflow_tpu as qf

    omega = qf.mat2shr(np.asarray(W).astype(np.complex128), elmax=elmax)
    f = qf.shr2fun(omega, N=elmax + 1)
    fig = plt.figure(figsize=(7, 3.2))
    ax = fig.add_subplot(111, projection="hammer")
    theta, phi = qf.sphgrid(elmax + 1)
    lim = np.abs(f).max()
    ax.pcolormesh(phi - np.pi, np.pi / 2 - theta, f, cmap="RdBu_r",
                  vmin=-lim, vmax=lim, rasterized=True)
    ax.set_xticks([]); ax.set_yticks([])
    if title:
        ax.set_title(title, fontsize=9)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def run_demo(name, W0, N, steps, chunk, results):
    import numpy as np
    import jax.numpy as jnp
    import quflow_tpu as qf
    from quflow_tpu.parallel.stepper import build_step_fn, to_planes, from_planes

    dt = 0.25 * qf.hbar(N)
    spec0 = np.sort(np.linalg.eigvalsh(-1j * W0))
    e0 = float(qf.energy_euler(W0))
    z0 = float(qf.enstrophy(W0))
    os.makedirs(FRAMES, exist_ok=True)
    render(W0, os.path.join(FRAMES, f"{name}_t0.png"),
           title=f"{name}  t = 0")

    fn = build_step_fn(N, dt, steps=chunk, maxit=5, dtype=np.complex64,
                       compsum=True, planes_io=True, with_diagnostics=True)
    Wp = jnp.asarray(to_planes(W0.astype(np.complex64)).astype(np.float32))
    st = (Wp, jnp.zeros_like(Wp), jnp.zeros_like(Wp))
    series = []
    Wmid = None
    t0 = time.time()
    nchunks = steps // chunk
    for c in range(nchunks):
        *st, diag = fn(*st)
        series.append(np.asarray(diag))
        if c == nchunks // 2 - 1:
            Wmid = from_planes(np.asarray(st[0]))
    el = time.time() - t0
    series = np.asarray(series, dtype=np.float64)
    Wf = from_planes(np.asarray(st[0])).astype(np.complex128)

    render(Wmid, os.path.join(FRAMES, f"{name}_tmid.png"),
           title=f"{name}  t = {steps // 2 * dt:.3f}")
    render(Wf, os.path.join(FRAMES, f"{name}_tfinal.png"),
           title=f"{name}  t = {steps * dt:.3f}")

    spec = np.sort(np.linalg.eigvalsh(-1j * Wf))
    row = {
        "N": N, "steps": steps, "dt_over_hbar": 0.25,
        "casimir_drift": float(np.abs(spec - spec0).max()),
        "energy_drift": abs(float(qf.energy_euler(Wf)) - e0),
        "enstrophy_drift": abs(float(qf.enstrophy(Wf)) - z0),
        "initial_energy": e0, "initial_enstrophy": z0,
        "energy_series_every_chunk": [round(float(x), 10)
                                      for x in series[:, 0]],
        "enstrophy_series_every_chunk": [round(float(x), 10)
                                         for x in series[:, 1]],
        "steps_per_sec": round(steps / el, 1),
        "frames": [f"docs/demos/{name}_{t}.png"
                   for t in ("t0", "tmid", "tfinal")],
    }
    results["demos"][name] = row
    print(f"{name}: Casimir {row['casimir_drift']:.3e}  "
          f"energy {row['energy_drift']:.3e}  "
          f"enstrophy {row['enstrophy_drift']:.3e}  "
          f"{row['steps_per_sec']} steps/s")
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--N", type=int, default=512)
    parser.add_argument("--steps", type=int, default=10000)
    parser.add_argument("--chunk", type=int, default=500)
    parser.add_argument("--only", default=None)
    args = parser.parse_args()

    import jax

    results = {"device": jax.devices()[0].device_kind,
               "config": "production stepper, c64 planes, maxit=5, "
                         "refine='m0', compsum, layout auto",
               "demos": {}}
    if args.only and os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)

    N = args.N
    if not args.only or "blob" in args.only:
        run_demo("two_blob_merger", two_blob_initial(N), N,
                 args.steps, args.chunk, results)
    if not args.only or "shear" in args.only:
        run_demo("double_shear", double_shear_initial(N), N,
                 args.steps, args.chunk, results)
    print(f"written {OUT}")


if __name__ == "__main__":
    main()
