#!/usr/bin/env python
"""Forced-dissipative long run to a statistically steady state (round-5
VERDICT item 3): the forcing/Strang hooks doing what they exist for
(reference quflow/integrators/isospectral.py:404-423, 466-520).

Setup: quantized Euler at N (default 1024), dt = 0.25*hbar, constant
band-limited forcing F0 (spherical-harmonic degrees lf +- 1, a fixed
Kolmogorov-type pattern) through the production forcing hook, and Strang
viscdamp dissipation (friction alpha + viscosity nu).  The damped-driven
system settles into a statistically steady state where the energy budget

    dE/dt = inj - 2*(alpha*E + nu*Z)        (E energy, Z enstrophy)

closes: injection inj = -Re<F0, P>/N (P the stream matrix) balances the
friction+viscous dissipation.  Derivation: E = -1/2 <W, P>/N with
P = Delta^-1 W, so a forcing term dW/dt = F contributes
dE/dt = -Re<F, P>/N, and the viscdamp flow dW/dt = nu*Delta W - alpha*W
contributes -2*(alpha*E + nu*Z) (Delta self-adjoint).

Measured per chunk (device diagnostics: energy/enstrophy computed on
device, two f32 scalars per call; injection from one host pull of W per
sample interval):

  * E(t), Z(t) series  -> steady-state plateau check (relative change of
    the E mean between the 3rd and 4th quarter of the run)
  * inj(t) series      -> budget closure: <inj> vs 2*(alpha<E> + nu<Z>)
    averaged over the steady half

Run (device):  timeout 3600 python benchmarks/forced_dissipative_device.py
Writes benchmarks/forced_dissipative_device.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "forced_dissipative_device.json")


def band_limited_pattern(N, lf, width=1, seed=7):
    """Fixed forcing pattern: random shr coefficients restricted to degrees
    [lf - width, lf + width], quantized to an N x N vorticity matrix."""
    import numpy as np
    import quflow_tpu as qf

    shr = qf.random_shr(lmax=lf + width + 1, seed=seed)
    # zero everything outside the band: shr index layout is l^2 + (m + l)
    keep = np.zeros_like(shr)
    for ell in range(lf - width, lf + width + 1):
        keep[ell * ell:(ell + 1) * (ell + 1)] = 1.0
    F = qf.shr2mat(shr * keep, N=N)
    return F / np.abs(F).max()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--N", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=40000)
    parser.add_argument("--chunk", type=int, default=500)
    parser.add_argument("--lf", type=int, default=10)
    parser.add_argument("--amp", type=float, default=0.4,
                        help="forcing amplitude (units of dW/dt)")
    parser.add_argument("--alpha", type=float, default=0.6,
                        help="friction (sets the equilibration time 1/alpha)")
    parser.add_argument("--nu-hbar", type=float, default=20.0,
                        help="viscosity in units of hbar")
    parser.add_argument("--out", default=OUT)
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import quflow_tpu as qf
    from quflow_tpu.models import EulerFlow
    from quflow_tpu.parallel.stepper import build_step_fn, to_planes, from_planes
    from quflow_tpu.ops.geometry import hbar

    N = args.N
    hb = hbar(N)
    dt = 0.25 * hb
    nu = args.nu_hbar * hb
    alpha = args.alpha
    flow = EulerFlow(N=N)
    W0 = flow.random_initial(lmax=10, seed=42)

    F0 = args.amp * band_limited_pattern(N, args.lf)
    F0j = jnp.asarray(np.stack([F0.real, F0.imag]).astype(np.float32))

    def forcing(P, W):
        # fixed deterministic band-limited pattern (Kolmogorov-type):
        # closure constant, zero extra GEMMs
        return jax.lax.complex(F0j[0], F0j[1]).astype(W.dtype)

    fn = build_step_fn(
        N, dt, steps=args.chunk, maxit=5, dtype=np.complex64, compsum=True,
        planes_io=True, refine="m0", forcing=forcing,
        strang_splitting=("viscdamp", dict(nu=nu, alpha=alpha)),
        with_diagnostics=True,
    )

    def injection(W):
        P = qf.solve_poisson(W.astype(np.complex128), skewh=True)
        return -float(np.sum(F0 * np.conj(P)).real) / N

    Wp = jnp.asarray(to_planes(W0.astype(np.complex64)).astype(np.float32))
    st = (Wp, jnp.zeros_like(Wp), jnp.zeros_like(Wp))
    E_series, Z_series, inj_series, t_series = [], [], [], []
    n_chunks = args.steps // args.chunk
    out = fn(*st)  # compile
    st = out[:3]
    times = []
    for k in range(n_chunks):
        t0 = time.time()
        out = fn(*st)
        st = out[:3]
        diag = np.asarray(out[-1])  # [energy, enstrophy] on device
        times.append(time.time() - t0)
        E_series.append(float(diag[0]))
        Z_series.append(float(diag[1]))
        W = from_planes(np.asarray(st[0]))
        inj_series.append(injection(W))
        t_series.append((k + 1) * args.chunk * dt)
        if (k + 1) % 10 == 0:
            print(f"step {(k + 1) * args.chunk:>7}: E={E_series[-1]:.5f} "
                  f"Z={Z_series[-1]:.4f} inj={inj_series[-1]:.5f} "
                  f"diss={2 * (alpha * E_series[-1] + nu * Z_series[-1]):.5f}",
                  flush=True)
    E = np.asarray(E_series)
    Z = np.asarray(Z_series)
    inj = np.asarray(inj_series)
    q = len(E) // 4
    E_q3, E_q4 = float(E[2 * q:3 * q].mean()), float(E[3 * q:].mean())
    steady_rel_change = abs(E_q4 - E_q3) / max(abs(E_q4), 1e-30)
    inj_ss = float(inj[len(inj) // 2:].mean())
    diss_ss = float(2 * (alpha * E[len(E) // 2:] + nu * Z[len(Z) // 2:]).mean())
    results = {
        "device": jax.devices()[0].device_kind,
        "config": (f"N={N}, dt=0.25*hbar, c64 production stepper (maxit=5, "
                   f"compsum, refine='m0'), constant band forcing lf={args.lf}"
                   f" amp={args.amp}, Strang viscdamp nu={nu:.3e} "
                   f"alpha={alpha}, {args.steps} steps"),
        "steps": args.steps,
        "steps_per_sec": round(args.chunk / float(np.median(times)), 1),
        "initial_energy": float(qf.energy_euler(W0)),
        "energy_series_every_chunk": [round(float(x), 6) for x in E],
        "enstrophy_series_every_chunk": [round(float(x), 5) for x in Z],
        "injection_series_every_chunk": [round(float(x), 6) for x in inj],
        "sim_time_horizon": t_series[-1],
        "friction_time_units_simulated": t_series[-1] * alpha,
        "steady_state": {
            "E_mean_q3": E_q3,
            "E_mean_q4": E_q4,
            "relative_change_q3_to_q4": steady_rel_change,
            "injection_mean_steady_half": inj_ss,
            "dissipation_mean_steady_half": diss_ss,
            "budget_closure_rel": abs(inj_ss - diss_ss) / max(abs(inj_ss),
                                                              1e-30),
        },
    }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"steady-state E: q3 {E_q3:.5f} -> q4 {E_q4:.5f} "
          f"(rel change {steady_rel_change:.2%})")
    print(f"budget: inj {inj_ss:.5f} vs diss {diss_ss:.5f} "
          f"(closure {results['steady_state']['budget_closure_rel']:.2%})")
    print(f"written {args.out}")


if __name__ == "__main__":
    main()
