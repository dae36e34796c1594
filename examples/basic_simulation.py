#!/usr/bin/env python
"""End-to-end demo: the reference's canonical 'basic simulation' workflow
(notebooks/basic-simulation) on quflow_tpu.

Random smooth initial vorticity -> isospectral midpoint integration with
energy/enstrophy logging to HDF5 -> conservation report -> sphere plot.

Run:  python examples/basic_simulation.py [--N 128] [--simtime 5.0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--N", type=int, default=128)
    parser.add_argument("--lmax", type=int, default=10)
    parser.add_argument("--simtime", type=float, default=5.0)
    parser.add_argument("--stepsize", type=float, default=0.25)
    parser.add_argument("--outfile", default="basic_simulation.hdf5")
    parser.add_argument("--plot", default=None, help="save a PNG of the final state")
    args = parser.parse_args()

    import numpy as np
    import quflow_tpu as qf
    from quflow_tpu.models import EulerFlow

    flow = EulerFlow(N=args.N)
    W0 = flow.random_initial(lmax=args.lmax, seed=42)
    print(f"N={args.N}, initial energy {float(qf.energy_euler(W0)):.6f}, "
          f"enstrophy {float(qf.enstrophy(W0)):.6f}")

    sim = qf.QuSimulation(
        args.outfile, overwrite=True, state=W0,
        loggers={"energy": qf.energy_euler, "enstrophy": qf.enstrophy},
    )
    qf.solve(
        W0.copy(), stepsize=args.stepsize, simtime=args.simtime,
        steps_out=50, callback=sim, progress_bar=True,
    )

    Wf = sim["mat", -1]
    c0 = np.sort(np.linalg.eigvalsh(-1j * W0))
    c1 = np.sort(np.linalg.eigvalsh(-1j * Wf))
    print(f"steps: {sim['step'][-1]},  time: {sim['time'][-1]:.4f}s")
    print(f"energy drift:    {sim['energy'][-1] - sim['energy'][0]:+.3e}")
    print(f"enstrophy drift: {sim['enstrophy'][-1] - sim['enstrophy'][0]:+.3e}")
    print(f"spectral (Casimir) drift: {np.abs(c1 - c0).max():.3e}")

    if args.plot:
        qf.graphics.plot(Wf, colorbar=True, time=float(sim["time"][-1]))
        import matplotlib.pyplot as plt

        plt.savefig(args.plot, dpi=120, bbox_inches="tight")
        print("saved", args.plot)


if __name__ == "__main__":
    main()
