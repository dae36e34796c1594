#!/usr/bin/env python
"""Forced-dissipative MHD long run to a statistically steady state — the
magnetic counterpart of benchmarks/forced_dissipative_device.py (round-5
item 3): the MHD stepper's forcing/Strang hooks doing what they exist for
(reference quflow/integrators/mhd.py:295-299, 395-405 forcing plumbing).

Setup: quantized spherical MHD at N (default 1024), dt = 0.25*hbar,
constant band-limited forcing on BOTH components (kinetic injection F_W
into the vorticity, magnetic injection F_T into the potential Theta)
through the production forcing hook, and Strang viscdamp (friction alpha +
viscosity nu, equal on both components — the named form).  The
damped-driven system settles into a steady state where the total-energy
budget closes:

    dE/dt = inj_W + inj_T - 2*alpha*E - 2*nu*(Z + M2)

with E = E_kin + E_mag,  E_kin = -<W,P>/2N,  E_mag = -<B,Theta>/2N
(B = Delta Theta),  Z = <W,W>/2N (enstrophy),  M2 = <B,B>/2N (mean-square
current).  Derivation mirrors the Euler harness: a forcing term
dW/dt = F_W contributes -Re<F_W, P>/N, dTheta/dt = F_T contributes
-Re<F_T, B>/N (Delta self-adjoint), and the viscdamp flow
dX/dt = nu*Delta X - alpha*X contributes -2*alpha*E - 2*nu*(Z + M2).

Per chunk: one host pull of the state (16 MB at N=1024) for the
injection/energy diagnostics in complex128; E/Z/M2/cross-helicity series
committed for the steady-state and closure checks.

Run (device):  timeout 3600 python benchmarks/forced_mhd_device.py
Writes benchmarks/forced_mhd_device.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "forced_mhd_device.json")


def band_limited_pattern(N, lf, width=1, seed=7):
    """Fixed forcing pattern: random shr coefficients restricted to degrees
    [lf - width, lf + width], quantized to an N x N vorticity matrix
    (same construction as the Euler harness)."""
    import numpy as np
    import quflow_tpu as qf

    shr = qf.random_shr(lmax=lf + width + 1, seed=seed)
    keep = np.zeros_like(shr)
    for ell in range(lf - width, lf + width + 1):
        keep[ell * ell:(ell + 1) * (ell + 1)] = 1.0
    F = qf.shr2mat(shr * keep, N=N)
    return F / np.abs(F).max()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--N", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=30000)
    parser.add_argument("--chunk", type=int, default=500)
    parser.add_argument("--lf", type=int, default=10)
    parser.add_argument("--amp", type=float, default=0.4,
                        help="kinetic forcing amplitude (units of dW/dt)")
    parser.add_argument("--amp-theta", type=float, default=0.02,
                        help="magnetic forcing amplitude (units of "
                             "dTheta/dt; Theta ~ 0.1*W scale)")
    parser.add_argument("--alpha", type=float, default=0.6,
                        help="friction (equilibration time 1/alpha)")
    parser.add_argument("--nu-hbar", type=float, default=20.0,
                        help="viscosity in units of hbar")
    parser.add_argument("--out", default=OUT)
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import quflow_tpu as qf
    from quflow_tpu.models import MHDFlow
    from quflow_tpu.parallel.stepper import (
        build_mhd_step_fn, to_planes, from_planes)
    from quflow_tpu.ops.geometry import hbar

    N = args.N
    hb = hbar(N)
    dt = 0.25 * hb
    nu = args.nu_hbar * hb
    alpha = args.alpha
    flow = MHDFlow(N=N)
    S0 = flow.random_initial(lmax=10, seed=42)

    FW = args.amp * band_limited_pattern(N, args.lf, seed=7)
    FT = args.amp_theta * band_limited_pattern(N, args.lf, seed=8)
    Fj = jnp.asarray(np.stack([
        np.stack([FW.real, FT.real]),
        np.stack([FW.imag, FT.imag]),
    ]).astype(np.float32))  # (2 re/im, 2 component, N, N)

    def forcing(P, S):
        # constant band-limited injection into both components
        return jax.lax.complex(Fj[0], Fj[1]).astype(S.dtype)

    fn = build_mhd_step_fn(
        N, dt, steps=args.chunk, maxit=5, dtype=np.complex64, compsum=True,
        refine="m0", warm_precision="high", forcing=forcing,
        strang_splitting=("viscdamp", dict(nu=nu, alpha=alpha)),
    )

    def inner(A, B):
        return float(np.sum(A * np.conj(B)).real) / N

    def diagnostics(S):
        W, Theta = S[0], S[1]
        P = qf.solve_poisson(W, skewh=True)
        B = qf.laplace(Theta, skewh=True)
        E_kin = -0.5 * inner(W, P)
        E_mag = -0.5 * inner(B, Theta)
        Z = 0.5 * inner(W, W)
        M2 = 0.5 * inner(B, B)
        inj = -inner(FW, P) - inner(FT, B)
        hc = inner(W, Theta)
        return E_kin, E_mag, Z, M2, inj, hc

    Sp = jnp.asarray(to_planes(S0.astype(np.complex64)).astype(np.float32))
    st = (Sp, jnp.zeros_like(Sp), jnp.zeros_like(Sp))
    series = {k: [] for k in ("E_kin", "E_mag", "Z", "M2", "inj", "hc")}
    n_chunks = args.steps // args.chunk
    out = fn(*st)  # compile
    st = out[:3]
    times = []
    for k in range(n_chunks):
        t0 = time.time()
        out = fn(*st)
        st = out[:3]
        S = from_planes(np.asarray(st[0])).astype(np.complex128)
        times.append(time.time() - t0)
        vals = diagnostics(S)
        for key, v in zip(("E_kin", "E_mag", "Z", "M2", "inj", "hc"), vals):
            series[key].append(float(v))
        if (k + 1) % 10 == 0:
            E = vals[0] + vals[1]
            diss = 2 * (alpha * E + nu * (vals[2] + vals[3]))
            print(f"step {(k + 1) * args.chunk:>7}: E_kin={vals[0]:.5f} "
                  f"E_mag={vals[1]:.5f} inj={vals[4]:.5f} diss={diss:.5f}",
                  flush=True)
    E = np.asarray(series["E_kin"]) + np.asarray(series["E_mag"])
    Z = np.asarray(series["Z"])
    M2 = np.asarray(series["M2"])
    inj = np.asarray(series["inj"])
    q = len(E) // 4
    E_q3, E_q4 = float(E[2 * q:3 * q].mean()), float(E[3 * q:].mean())
    steady_rel_change = abs(E_q4 - E_q3) / max(abs(E_q4), 1e-30)
    half = len(E) // 2
    inj_ss = float(inj[half:].mean())
    diss_ss = float((2 * (alpha * E[half:] + nu * (Z[half:] + M2[half:])))
                    .mean())
    t_hor = args.steps * dt
    results = {
        "device": jax.devices()[0].device_kind,
        "config": (f"N={N}, dt=0.25*hbar, c64 MHD stepper (maxit=5, compsum,"
                   f" refine='m0', warm_precision='high'), band forcing "
                   f"lf={args.lf} amp_W={args.amp} amp_T={args.amp_theta}, "
                   f"Strang viscdamp nu={nu:.3e} alpha={alpha}, "
                   f"{args.steps} steps"),
        "steps": args.steps,
        "steps_per_sec": round(args.chunk / float(np.median(times)), 1),
        "series_every_chunk": {k: [round(x, 6) for x in v]
                               for k, v in series.items()},
        "sim_time_horizon": t_hor,
        "friction_times_simulated": t_hor * alpha,
        "steady_state": {
            "E_mean_q3": E_q3,
            "E_mean_q4": E_q4,
            "relative_change_q3_to_q4": steady_rel_change,
            "E_mag_fraction_steady_half": float(
                np.asarray(series["E_mag"])[half:].mean() / E[half:].mean()),
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
