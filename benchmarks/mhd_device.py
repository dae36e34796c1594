#!/usr/bin/env python
"""MHD (magnetic midpoint) on device: throughput sweep + conservation.

The reference has no accelerated magmp at all (reference
integrators/mhd.py:235-456 is CPU-only numpy); build_mhd_step_fn is new
TPU-native capability, so these are the first committed device artifacts
for it (VERDICT round-2 item 4).

Throughput: steps/s at --sweep-N (default 1024, 2048), same protocol as
bench.py (latency-subtracted, median of 5).  The MHD step costs 2x the
Euler GEMMs (4 complex GEMMs/iteration: PW, WP-via-conj, BTheta, PTheta)
plus a double Poisson solve, so expect ~0.4x the Euler steps/s.

Conservation at --N over --steps steps: total energy (kinetic+magnetic),
cross helicity tr(W Theta), and the Theta-Casimirs (Theta evolves by
conjugation under magmp, so its spectrum is exactly invariant - the
structural analog of the Euler Casimir gate).

Precision ladder (--ladder): unrefined / refine='m0' / refine=1 rows at
--N over --ladder-steps, the MHD counterpart of the Euler ladder
(conservation_2048.json).

Double-word row (--dw): the dw magnetic midpoint (build_dw_mhd_step_fn,
Ozaki-split bf16 GEMMs + f64 elementwise) with the same adaptive
stall-floor schedule as the Euler conservation gate (maxit=12 dw
iterations after 3 fixed f32 warm iterations, tol = eps64 * vareps-scale,
exit on residual non-decrease).  This is the config that matches the
reference's c128 machine-precision Theta-Casimir / cross-helicity
conservation (reference README.md:73-76, integrators/mhd.py:235-456).

Run (device):  timeout 3600 python benchmarks/mhd_device.py
               timeout 3600 python benchmarks/mhd_device.py --skip-sweep \
                   --skip-conservation --dw --ladder
Writes benchmarks/mhd_device.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "mhd_device.json")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--N", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=10000)
    parser.add_argument("--chunk", type=int, default=500)
    parser.add_argument("--sweep-N", default="1024,2048")
    parser.add_argument("--skip-sweep", action="store_true")
    parser.add_argument("--skip-conservation", action="store_true")
    parser.add_argument("--dw", action="store_true",
                        help="double-word conservation row at --N")
    parser.add_argument("--dw-steps", type=int, default=4000)
    parser.add_argument("--ladder", action="store_true",
                        help="precision ladder (unrefined/m0/refine=1)")
    parser.add_argument("--ladder-steps", type=int, default=4000)
    parser.add_argument("--warm", action="store_true",
                        help="warm mixed-precision sweep rows + a "
                             "conservation spot-check at --N")
    parser.add_argument("--warm-steps", type=int, default=4000)
    args = parser.parse_args()

    import numpy as np
    import jax

    if args.dw:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import quflow_tpu as qf
    from quflow_tpu.models import MHDFlow
    from quflow_tpu.integrators.mhd import solve_mhd
    from quflow_tpu.parallel.stepper import (
        build_mhd_step_fn, build_dw_mhd_step_fn, to_planes, from_planes)

    results = {
        "device": jax.devices()[0].device_kind,
        "config": "magmp production stepper, c64 planes (2,2,N,N), maxit=5, "
                  "compsum, refine='m0', precision highest, dt=0.25*hbar",
        "sweep": {},
        "conservation": {},
    }
    if os.path.exists(OUT):
        with open(OUT) as f:
            old = json.load(f)
        for k in ("sweep", "conservation"):
            results[k].update(old.get(k, {}))

    probe = jax.jit(lambda x: jnp.sum(jnp.ravel(x)[:8]))

    def latency():
        x0 = jnp.zeros((8,), jnp.float32)
        float(probe(x0))
        t0 = time.time()
        for _ in range(5):
            float(probe(x0))
        return (time.time() - t0) / 5

    # ---- throughput sweep --------------------------------------------------
    def sweep_rows(warm=None, suffix=""):
        LAT = latency()
        for N in [int(x) for x in args.sweep_N.split(",")]:
            flow = MHDFlow(N=N)
            state0 = flow.random_initial(lmax=10, seed=42)
            dt = 0.25 * flow.hbar
            steps = max(2000 // max(N // 512, 1) ** 3, 10)
            fn = build_mhd_step_fn(N, dt, steps=steps, maxit=5,
                                   dtype=np.complex64, compsum=True,
                                   warm_precision=warm)
            Sp = jnp.asarray(to_planes(state0.astype(np.complex64))
                             .astype(np.float32))
            st = (Sp, jnp.zeros_like(Sp), jnp.zeros_like(Sp))
            st = fn(*st)[:3]
            float(probe(st[0]))
            times = []
            for _ in range(5):
                t0 = time.time()
                out = fn(*st)[:3]
                float(probe(out[0]))
                times.append(time.time() - t0 - LAT)
            med = float(np.median(times))
            spread = float((np.max(times) - np.min(times)) / med * 100)
            sps = steps / med
            print(f"MHD sweep N={N}{suffix}: {sps:.2f} steps/s "
                  f"(spread {spread:.1f}%)", flush=True)
            row = {
                "steps_per_sec": round(sps, 2),
                "steps_per_call": steps,
                "run_spread_pct": round(spread, 1),
            }
            if warm is not None:
                row["warm_precision"] = warm
            results["sweep"][f"N{N}{suffix}"] = row
            with open(OUT, "w") as f:
                json.dump(results, f, indent=2)

    if not args.skip_sweep:
        sweep_rows()
    if args.warm:
        # warm mixed-precision rows: the Euler stepper's round-5 production
        # default (warm fixed-point iterations at 3-pass bf16 'high', final
        # ones at 6-pass 'highest'; benchmarks/mixed_precision.json) applied
        # to the magnetic midpoint, which runs 4 complex GEMMs/iteration so
        # should pay at least as much as Euler's +14-22%
        sweep_rows(warm="high", suffix="_warm")

    # ---- conservation / ladder / dw ---------------------------------------
    N = args.N
    flow = MHDFlow(N=N)
    state0 = flow.random_initial(lmax=10, seed=42)
    dt = 0.25 * flow.hbar
    W0, T0 = state0[0], state0[1]
    specT0 = np.sort(np.linalg.eigvalsh(-1j * T0))

    def inner(A, B):
        return float(np.sum(A * np.conj(B)).real) / N

    def invariants(state):
        W, Theta = state[0], state[1]
        P, B = solve_mhd(np.stack([W, Theta]))
        kinetic = float(qf.energy_euler(W))
        magnetic = -0.5 * inner(B, Theta)
        cross = inner(W, Theta)
        return kinetic, magnetic, cross

    k0, m0, c0 = invariants(state0)

    def conservation_run(key, fn, Sp0, steps, chunk, meta, adaptive=False):
        """Run fn in chunks from Sp0, measure invariant drifts + steps/s,
        store under results['conservation'][key]."""
        st = (Sp0, jnp.zeros_like(Sp0), jnp.zeros_like(Sp0))
        out = fn(*st)
        st = out[:3]  # compile + first chunk excluded from timing
        float(probe(st[0]))
        times = []
        iters_sum, iters_n, iters_max = 0.0, 0, 0
        for _ in range(max(steps // chunk - 1, 1)):
            t0 = time.time()
            out = fn(*st)
            st = out[:3]
            float(probe(st[0]))
            times.append(time.time() - t0)
            if adaptive:
                its = np.asarray(out[3])
                iters_sum += float(its.sum())
                iters_n += its.size
                iters_max = max(iters_max, int(its.max()))
        Sf_planes = np.asarray(st[0])
        Sf = (Sf_planes[0] + 1j * Sf_planes[1]).astype(np.complex128)
        k1, m1, c1 = invariants(Sf)
        specT = np.sort(np.linalg.eigvalsh(-1j * Sf[1]))
        row = dict(meta)
        row.update({
            "steps": steps,
            "theta_casimir_drift": float(np.abs(specT - specT0).max()),
            "total_energy_drift": abs((k1 + m1) - (k0 + m0)),
            "cross_helicity_drift": abs(c1 - c0),
            "initial": {"kinetic": k0, "magnetic": m0, "cross_helicity": c0},
            "steps_per_sec": round(chunk / float(np.median(times)), 2),
        })
        if adaptive and iters_n:
            row["dw_iterations"] = {
                "mean": round(iters_sum / iters_n, 2), "max": iters_max}
        print(f"MHD {key} over {steps} steps: "
              f"Theta-Casimir {row['theta_casimir_drift']:.3e}, "
              f"energy {row['total_energy_drift']:.3e}, "
              f"cross-helicity {row['cross_helicity_drift']:.3e}, "
              f"{row['steps_per_sec']} steps/s", flush=True)
        results["conservation"][key] = row
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)

    Sp32 = jnp.asarray(to_planes(state0.astype(np.complex64))
                       .astype(np.float32))

    if not args.skip_conservation:
        fn = build_mhd_step_fn(N, dt, steps=args.chunk, maxit=5,
                               dtype=np.complex64, compsum=True)
        conservation_run(
            f"N{N} c64 production", fn, Sp32, args.steps, args.chunk,
            {"maxit": 5, "compsum": True, "refine": "m0"})

    if args.ladder:
        # MHD counterpart of the Euler precision ladder
        # (conservation_2048.json): unrefined / m0 (= the production row
        # above) / full refine=1, same step count
        for name, refine in (("unrefined", 0), ("refine1", 1)):
            fn = build_mhd_step_fn(N, dt, steps=args.chunk, maxit=5,
                                   dtype=np.complex64, compsum=True,
                                   refine=refine)
            conservation_run(
                f"N{N} c64 {name}", fn, Sp32, args.ladder_steps, args.chunk,
                {"maxit": 5, "compsum": True, "refine": refine})

    if args.warm:
        # spot-check: does the warm schedule change MHD conservation?  Same
        # protocol as the Euler check (mixed_precision_2048.json): drift at
        # the warm default vs the pure-'highest' production row, plus the
        # short-horizon trajectory deviation between the two schedules
        fn_w = build_mhd_step_fn(N, dt, steps=args.chunk, maxit=5,
                                 dtype=np.complex64, compsum=True,
                                 warm_precision="high")
        conservation_run(
            f"N{N} c64 warm", fn_w, Sp32, args.warm_steps, args.chunk,
            {"maxit": 5, "compsum": True, "refine": "m0",
             "warm_precision": "high"})
        fn_p = build_mhd_step_fn(N, dt, steps=200, maxit=5,
                                 dtype=np.complex64, compsum=True)
        fn_w2 = build_mhd_step_fn(N, dt, steps=200, maxit=5,
                                  dtype=np.complex64, compsum=True,
                                  warm_precision="high")
        zp = jnp.zeros_like(Sp32)
        a = np.asarray(fn_p(Sp32, zp, zp)[0])
        b = np.asarray(fn_w2(Sp32, zp, zp)[0])
        dev = float(np.abs(a - b).max() / max(np.abs(a).max(), 1e-30))
        results["conservation"][f"N{N} c64 warm"]["trajectory_deviation_200steps"] = dev
        print(f"MHD warm trajectory deviation over 200 steps: {dev:.3e}",
              flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)

    if args.dw:
        # the Euler conservation gate's schedule (conservation_1024.json
        # row 'dw adaptive floor'): 3 fixed f32 warm iterations, then dw
        # iterations under a while_loop to the f64 stall floor, cap 12
        tol = float(np.finfo(np.float64).eps) * 0.25 * float(
            np.abs(state0[0]).max())
        chunk = min(args.chunk, 250)
        fn = build_dw_mhd_step_fn(N, dt, steps=chunk, maxit=12, dw_iters=9,
                                  compsum=True, tol=tol, minit=2)
        Sp64 = jnp.asarray(to_planes(state0.astype(np.complex128)))
        conservation_run(
            f"N{N} dw adaptive floor", fn, Sp64, args.dw_steps, chunk,
            {"maxit": 12, "compsum": True, "refine": ["dw_adaptive", 9],
             "tol": tol},
            adaptive=True)
    print(f"written {OUT}")


if __name__ == "__main__":
    main()
