#!/usr/bin/env python
"""Flagship-scale conservation on device: Casimir/energy/enstrophy drift at
N=1024 over 10k+ steps of the production TPU stepper (c64 planes).

This closes the gap between the N=64 CPU conservation table
(measured_round1.json) and the N=1024 headline perf claim: the same
device-resident stepper that produces the steps/s number is driven for
``--steps`` steps, with the zero-transfer on-device energy/enstrophy
diagnostics sampled every ``--chunk`` steps, and the Casimir drift
(spectrum of -iW) measured on host from the final state.

Reference contract: isomp conserves all Casimirs tr(W^k) to machine
precision (reference integrators/isospectral.py:357-360, Modin & Viviani
JFM 2020); with compensated summation the rounding growth follows
Brouwer's law O(sqrt(n)).

Run (device):  timeout 3000 python benchmarks/conservation_device.py
Writes benchmarks/conservation_1024.json.

Chunk sizing: one chunk is ONE device execution; the tunnel's worker kills
executions that run for more than a couple of minutes ("TPU worker process
crashed or restarted").  The dw rows at N=2048 run at ~1-3 steps/s, so use
--chunk 100 (or less) there; the default 500 is fine for c64 rows.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _out_path(N):
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"conservation_{N}.json")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--N", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=10000)
    parser.add_argument("--chunk", type=int, default=500)
    parser.add_argument("--only", default=None,
                        help="run only configs whose name contains this; "
                             "merge into the existing artifact")
    parser.add_argument("--casimir-every", type=int, default=0,
                        help="also measure Casimir drift on host every this "
                             "many steps (0 = final state only); gives the "
                             "drift-vs-time curve for long runs")
    parser.add_argument("--resume", action="store_true",
                        help="resume long runs from the state snapshot saved "
                             "at the last Casimir milestone (requires "
                             "--casimir-every; snapshots live next to the "
                             "artifact as state_<N>_<config>.npz)")
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import quflow_tpu as qf
    from quflow_tpu.models import EulerFlow
    from quflow_tpu.parallel.stepper import (
        build_step_fn, build_dw_step_fn, to_planes, from_planes,
    )

    N = args.N
    out_path = _out_path(N)
    flow = EulerFlow(N=N)
    W0 = flow.random_initial(lmax=10, seed=42)
    dt = 0.25 * flow.hbar
    spec0 = np.sort(np.linalg.eigvalsh(-1j * W0))
    e0 = float(qf.energy_euler(W0))
    z0 = float(qf.enstrophy(W0))

    # (name, maxit, compsum, refine); dw rows use the double-word stepper
    # (Ozaki-split bf16 GEMMs + f64 elementwise, stepper.build_dw_step_fn):
    # refine is reinterpreted as dw_iters there.
    configs = [
        ("c64 compsum+m0 maxit5", 5, True, "m0"),  # f32 production default
        ("c64 compsum maxit5", 5, True, 0),
        ("c64 compsum maxit10", 10, True, 0),
        ("c64 compsum+refine maxit5", 5, True, 1),
        ("c64 plain maxit5", 5, False, 0),
        ("dw f32x3+dwx2 maxit5", 5, True, ("dw", 2)),  # high-precision default
        ("dw pure maxit6", 6, True, ("dw", 6)),
        # the conservation-gate config: 3 fixed f32 warm iterations, then dw
        # iterations under a while_loop until the residual reaches the f64
        # stall floor (capped at 12).  Fixed small dw_iters leaves a residual
        # that grows with the flow's spectral radius - at 1e5 steps the
        # turbulent regime pushes f32x3+dwx2 to 1.25e-7 Casimir while the
        # 10k-step drift is 1.28e-11; adaptive keeps the per-step residual at
        # the floor throughout.
        ("dw adaptive floor", 12, True, ("dw_adaptive", 9)),
    ]
    results = {
        "config": f"N={N}, dt=0.25*hbar, {args.steps} steps, production "
                  f"stepper (planes I/O, layout auto, precision highest)",
        "device": jax.devices()[0].device_kind,
        "initial": {"energy": e0, "enstrophy": z0},
        "rows": {},
    }
    if os.path.exists(out_path):
        # always merge into an existing artifact: stored rows are only
        # replaced by runs that got at least as far (see write_row)
        with open(out_path) as f:
            prev = json.load(f)
        results["rows"] = prev.get("rows", {})
        results["config"] = prev.get("config", results["config"])
    print(f"N={N}, {args.steps} steps on {results['device']}")
    print(f"{'config':<28}{'Casimir':>12}{'energy':>12}{'enstrophy':>12}"
          f"{'series-max dE':>14}{'steps/s':>9}")
    Wp0 = to_planes(W0.astype(np.complex64)).astype(np.float32)
    for name, maxit, compsum, refine in configs:
        if args.only and args.only not in name:
            continue
        adaptive = isinstance(refine, tuple) and refine[0] == "dw_adaptive"
        if adaptive:
            # stall-floor tolerance: eps64 * (dt/(2*hbar)) * ||W0||_inf; the
            # while_loop also exits on residual non-decrease (the f64 floor)
            tol = float(np.finfo(np.float64).eps) * 0.25 * float(
                np.abs(W0).max())
            fn = build_dw_step_fn(
                N, dt, steps=args.chunk, maxit=maxit, dw_iters=refine[1],
                compsum=compsum, with_diagnostics=True, tol=tol, minit=2,
            )
            Wp = jnp.asarray(to_planes(W0.astype(np.complex128)))
        elif isinstance(refine, tuple) and refine[0] == "dw":
            fn = build_dw_step_fn(
                N, dt, steps=args.chunk, maxit=maxit, dw_iters=refine[1],
                compsum=compsum, with_diagnostics=True,
            )
            Wp = jnp.asarray(to_planes(W0.astype(np.complex128)))
        else:
            fn = build_step_fn(
                N, dt, steps=args.chunk, maxit=maxit, dtype=np.complex64,
                compsum=compsum, planes_io=True, refine=refine,
                with_diagnostics=True,
            )
            Wp = jnp.asarray(Wp0)
        st = (Wp, jnp.zeros_like(Wp), jnp.zeros_like(Wp))
        series = []
        iter_chunks = []
        casimir_series = []  # (step, drift) milestones for long runs
        start_step = 0

        slug = "".join(c if c.isalnum() else "_" for c in name)
        state_path = os.path.join(os.path.dirname(out_path),
                                  f"state_{N}_{slug}.npz")
        if args.resume and os.path.exists(state_path):
            snap = np.load(state_path)
            if int(snap["step"]) < args.steps:
                st = tuple(jnp.asarray(snap[k]) for k in ("W", "dW", "csum"))
                start_step = int(snap["step"])
                series = [np.asarray(x) for x in snap["series"]]
                casimir_series = [list(map(float, x))
                                  for x in snap["casimirs"]]
                print(f"  [{name}] resuming from step {start_step}",
                      flush=True)

        def save_state(st, step_no):
            np.savez(state_path, W=np.asarray(st[0]), dW=np.asarray(st[1]),
                     csum=np.asarray(st[2]), step=step_no,
                     series=np.asarray(series, dtype=np.float64),
                     casimirs=np.asarray(casimir_series, dtype=np.float64))

        def write_row(row, step_no):
            # never clobber a more-complete stored row with a provisional
            # one (a re-run killed mid-way must not erase finished data)
            prev = results["rows"].get(name)
            if prev is not None and not prev.get("partial"):
                if step_no <= prev.get("steps", 0):
                    return
            results["rows"][name] = row
            with open(out_path, "w") as f:
                json.dump(results, f, indent=2)

        def call(st):
            out = fn(*st)
            if adaptive:  # extra (chunk,) per-step dw iteration counts
                iter_chunks.append(np.asarray(out[3]))
                return list(out[:3]), out[4]
            return list(out[:3]), out[3]

        def casimir_now(st, step_no):
            Wnow = from_planes(np.asarray(st[0])).astype(np.complex128)
            drift = float(np.abs(
                np.sort(np.linalg.eigvalsh(-1j * Wnow)) - spec0).max())
            casimir_series.append([step_no, drift])
            print(f"  [{name}] step {step_no}: Casimir {drift:.3e}",
                  flush=True)
            # persist a provisional row + a resumable state snapshot at
            # every milestone so a run killed mid-way (wall-clock budget,
            # tunnel wedge) still leaves an honest partial artifact and can
            # be continued with --resume
            write_row({
                "maxit": maxit, "compsum": compsum, "refine": refine,
                "steps": step_no, "partial": True,
                "casimir_drift": drift,
                "casimir_drift_milestones": list(casimir_series),
            }, step_no)
            save_state(st, step_no)

        # first chunk compiles (20-80 s through the tunnel): run it before
        # starting the clock, else steps/s is compile-dominated and wildly
        # inconsistent between near-identical configs (the round-2 artifact's
        # 16.7-vs-168.8 maxit-5 rows were exactly this)
        st, diag = call(st)
        series.append(np.asarray(diag))
        t0 = time.time()
        paused = 0.0
        for k in range((args.steps - start_step) // args.chunk - 1):
            st, diag = call(st)
            series.append(np.asarray(diag))  # [energy, enstrophy] scalars
            done = start_step + (k + 2) * args.chunk
            if (args.casimir_every and done % args.casimir_every == 0
                    and done < args.steps):
                tp = time.time()
                casimir_now(st, done)
                paused += time.time() - tp
        el = time.time() - t0 - paused
        timed_steps = args.steps - start_step - args.chunk
        series = np.asarray(series, dtype=np.float64)
        Wf = from_planes(np.asarray(st[0])).astype(np.complex128)
        spec = np.sort(np.linalg.eigvalsh(-1j * Wf))
        cd = float(np.abs(spec - spec0).max())
        ed = abs(float(qf.energy_euler(Wf)) - e0)
        zd = abs(float(qf.enstrophy(Wf)) - z0)
        # time-resolved drift within the on-device series itself
        sd = float(np.abs(series[:, 0] - series[0, 0]).max())
        sps = timed_steps / el  # compile excluded
        print(f"{name:<28}{cd:>12.3e}{ed:>12.3e}{zd:>12.3e}{sd:>14.3e}"
              f"{sps:>9.1f}")
        row = {
            "maxit": maxit, "compsum": compsum, "refine": refine,
            "steps": args.steps,
            "casimir_drift": cd, "energy_drift": ed, "enstrophy_drift": zd,
            "series_max_energy_drift": sd,
            "energy_series_every_chunk": [round(float(x), 10)
                                          for x in series[:, 0]],
            "steps_per_sec": round(sps, 1),
        }
        if adaptive:
            its = np.concatenate(iter_chunks)
            row["dw_iterations"] = {
                "mean": round(float(its.mean()), 2),
                "max": int(its.max()), "min": int(its.min()),
            }
        if casimir_series:
            row["casimir_drift_milestones"] = casimir_series + [
                [args.steps, cd]]
        if start_step:
            row["resumed_from_step"] = start_step
        write_row(row, args.steps)
        save_state(st, args.steps)
    print(f"written {out_path}")


if __name__ == "__main__":
    main()
