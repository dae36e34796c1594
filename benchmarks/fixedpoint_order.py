#!/usr/bin/env python
"""How many Picard iterations does the production fixed point actually
need?  (round-4 perf experiment)

conservation_1024.json shows maxit=5 and maxit=10 give IDENTICAL drift
(1.263e-4 vs 1.260e-4 Casimir over 10k steps) - the f32 contraction floor
is reached at or before 5 iterations.  The step is GEMM-bound and GEMMs
scale linearly with the iteration count, so if the floor is reached at 3-4
iterations the production default leaves 1.25-1.67x throughput on the
table.  Two measurements at N=1024 (production config: c64 planes,
precision 'highest', compsum, refine='m0', dt=0.25*hbar, warm dW carried
between steps):

  A. stall-floor iteration counts - the adaptive (tol ~ 0, exit on
     residual non-decrease) stepper reports per-step iteration counts:
     the empirical distribution of "iterations to the f32 floor" in the
     warm steady state.

  B. maxit scan - 2000-step runs at maxit = 2..6: Casimir / energy /
     enstrophy drift (host f64 eigenvalues) + steps/s (chunk wall-clock,
     compile excluded, scalar-fenced).

Run (device):  timeout 1800 python benchmarks/fixedpoint_order.py
Writes benchmarks/fixedpoint_order.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "fixedpoint_order.json")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    import quflow_tpu as qf
    from quflow_tpu.models import EulerFlow
    from quflow_tpu.parallel.stepper import build_step_fn, to_planes, from_planes
    from quflow_tpu.ops.geometry import hbar

    parser = argparse.ArgumentParser()
    parser.add_argument("--N", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--chunk", type=int, default=500)
    parser.add_argument("--merge", action="store_true")
    args = parser.parse_args()

    N = args.N
    flow = EulerFlow(N=N)
    W0 = flow.random_initial(lmax=10, seed=42)
    dt = 0.25 * hbar(N)
    spec0 = np.sort(np.linalg.eigvalsh(-1j * W0))
    e0 = float(qf.energy_euler(W0))
    z0 = float(qf.enstrophy(W0))
    Wp0 = to_planes(W0.astype(np.complex64)).astype(np.float32)

    results = {
        "config": f"N={N}, dt=0.25*hbar, c64 planes, precision highest, "
                  f"compsum, refine='m0', {args.steps} steps (B); "
                  "warm dW carried between steps",
        "device": jax.devices()[0].device_kind,
    }
    if args.merge and os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)

    # ---- A. stall-floor iteration counts -------------------------------
    # tol ~ 0 => the while_loop exits when the residual stops decreasing
    # (the f32 floor), capped at maxit=16; counts at the cap are censored
    # (the true iterations-to-floor is >= the cap) and reported as such.
    cap = 16
    fn = build_step_fn(N, dt, steps=100, maxit=cap, tol=1e-30, minit=1,
                       dtype=np.complex64, compsum=True, planes_io=True,
                       refine="m0")
    st = (jnp.asarray(Wp0), jnp.zeros_like(Wp0), jnp.zeros_like(Wp0))
    counts = []
    for k in range(5):
        out = fn(*st)
        st = out[:3]
        its = np.asarray(out[3])
        if k:  # skip the cold-start chunk (zero dW warm start)
            counts.append(its)
    its = np.concatenate(counts)
    results["stall_floor_iterations"] = {
        "mean": round(float(its.mean()), 2),
        "min": int(its.min()), "max": int(its.max()),
        "cap": cap,
        "censored_at_cap": int((its >= cap).sum()),
        "histogram": {str(v): int((its == v).sum())
                      for v in np.unique(its)},
        "note": "iterations until the residual inf-norm stops decreasing "
                "(f32 floor), warm steady state, 400 steps; counts at "
                "'cap' are right-censored (mean understates the true "
                "iterations-to-floor when censored_at_cap > 0)",
    }
    print(f"A. stall-floor iterations: mean {its.mean():.2f} "
          f"min {its.min()} max {its.max()}")
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)

    # ---- B. maxit scan --------------------------------------------------
    # one warm-up chunk + n_chunks timed chunks; steps must cover >= 2
    # chunks or the timed loop body never runs (steps/s would be nonsense)
    n_chunks = args.steps // args.chunk - 1
    assert n_chunks >= 1, (
        f"--steps {args.steps} must be >= 2 * --chunk {args.chunk} "
        "(the first chunk is compile/warm-up and is excluded)")
    rows = results.setdefault("rows", {})
    print(f"{'maxit':>6}{'Casimir':>12}{'energy':>12}{'enstrophy':>12}"
          f"{'steps/s':>9}")
    for maxit in (2, 3, 4, 5, 6):
        fn = build_step_fn(N, dt, steps=args.chunk, maxit=maxit,
                           dtype=np.complex64, compsum=True,
                           planes_io=True, refine="m0")
        st = (jnp.asarray(Wp0), jnp.zeros_like(Wp0), jnp.zeros_like(Wp0))

        # scalar-fenced chunk call: through the tunnel only a scalar
        # returned from inside the jitted program fences execution
        @jax.jit
        def chunk(a, b, c):
            o = fn(a, b, c)
            return o[0], o[1], o[2], jnp.abs(o[0][0, 0, :8]).sum()

        *st, v = chunk(*st)  # compile + warm (excluded from timing)
        float(v)
        t0 = time.time()
        for _ in range(n_chunks):
            *st, v = chunk(*st)
            assert np.isfinite(float(v))
        el = time.time() - t0
        timed_steps = n_chunks * args.chunk
        Wf = from_planes(np.asarray(st[0])).astype(np.complex128)
        cd = float(np.abs(np.sort(np.linalg.eigvalsh(-1j * Wf))
                          - spec0).max())
        ed = abs(float(qf.energy_euler(Wf)) - e0)
        zd = abs(float(qf.enstrophy(Wf)) - z0)
        sps = timed_steps / el
        print(f"{maxit:>6}{cd:>12.3e}{ed:>12.3e}{zd:>12.3e}{sps:>9.1f}")
        key = f"maxit{maxit}" + ("" if args.steps == 2000 else f"_{args.steps}")
        rows[key] = {
            "maxit": maxit, "steps": args.steps,
            "casimir_drift": cd, "energy_drift": ed,
            "enstrophy_drift": zd, "steps_per_sec": round(sps, 1),
        }
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
    print(f"written {OUT}")


if __name__ == "__main__":
    main()
