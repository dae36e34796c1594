#!/usr/bin/env python
"""Quantized spherical MHD demo: two-component state (W, Theta) under the
magnetic midpoint method (reference quflow/integrators/mhd.py:235-459).

Random smooth vorticity + weak magnetic potential -> magmp integration ->
conservation report (total energy = kinetic + magnetic, cross helicity
tr(W Theta), and the Casimirs of each component).

Run:  python examples/mhd_simulation.py [--N 64] [--steps 500]
On a TPU host, pass --device to run device-resident through MagmpTPU
(the drop-in sim.solve integrator over build_mhd_step_fn; c64 planes,
warm mixed-precision production default).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--N", type=int, default=64)
    parser.add_argument("--lmax", type=int, default=10)
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--stepsize", type=float, default=0.25)
    parser.add_argument("--theta-scale", type=float, default=0.1)
    parser.add_argument("--device", action="store_true",
                        help="run device-resident (MagmpTPU, c64 planes)")
    args = parser.parse_args()

    import numpy as np
    import quflow_tpu as qf
    from quflow_tpu.models import MHDFlow
    from quflow_tpu.integrators.mhd import solve_mhd

    flow = MHDFlow(N=args.N)
    state0 = flow.random_initial(lmax=args.lmax, seed=42,
                                 theta_scale=args.theta_scale)
    dt = args.stepsize * flow.hbar

    def inner(A, B):
        return float(np.sum(A * np.conj(B)).real) / args.N

    def energies(state):
        W, Theta = state
        P, B = solve_mhd(state)
        kinetic = float(qf.energy_euler(W))          # -<W, P>/2 > 0
        magnetic = -0.5 * inner(B, Theta)            # -<Delta Theta, Theta>/2 > 0
        cross = inner(W, Theta)                      # cross helicity
        return kinetic, magnetic, cross

    k0, m0, c0 = energies(state0)
    print(f"N={args.N}: kinetic {k0:.6f}, magnetic {m0:.6f}, "
          f"cross helicity {c0:.6f}")

    if args.device:
        import numpy as _np
        from quflow_tpu.parallel.stepper import MagmpTPU

        integ = MagmpTPU(maxit=10)
        state = integ(state0.astype(_np.complex64).copy(), dt,
                      steps=args.steps).astype(state0.dtype)
    else:
        state = flow.step(state0.copy(), dt, steps=args.steps, maxit=10)

    k1, m1, c1 = energies(state)
    print(f"after {args.steps} magmp steps (dt = {args.stepsize}*hbar):")
    print(f"  total energy drift:   {k1 + m1 - (k0 + m0):+.3e}")
    print(f"  cross-helicity drift: {c1 - c0:+.3e}")
    # In MHD only Theta's Casimirs survive (W exchanges with the magnetic
    # field through the Lorentz term); magmp conserves them structurally.
    s0 = np.sort(np.linalg.eigvalsh(-1j * state0[1]))
    s1 = np.sort(np.linalg.eigvalsh(-1j * state[1]))
    print(f"  Casimir drift (Theta): {np.abs(s1 - s0).max():.3e}")


if __name__ == "__main__":
    main()
