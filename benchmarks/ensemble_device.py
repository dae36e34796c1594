#!/usr/bin/env python
"""Ensemble (data-parallel) throughput on one chip: batched production
stepper over a leading trajectory axis (the reference accepts stacked
states but never vectorizes the solve over them - cpu.py:672-699,
test_laplacian.py:211-223; here the batch is a first-class vmapped axis,
sharded over 'dp' on a mesh).

Measures aggregate steps/s (batch trajectories advanced per wall-second)
for batch sizes 1..16 at N=512.  Writes benchmarks/ensemble_device.json.

Run (device):  timeout 1800 python benchmarks/ensemble_device.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ensemble_device.json")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from quflow_tpu.parallel.stepper import build_step_fn, to_planes
    from quflow_tpu.ops.geometry import hbar

    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--N", type=int,
                        default=int(os.environ.get("QUFLOW_ENSEMBLE_N", "512")))
    parser.add_argument("--layouts", default="auto",
                        help="comma list: auto, shear, shear_pallas, wrapped")
    parser.add_argument("--batches", default="1,4,8,16")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--merge", action="store_true",
                        help="merge rows into the existing artifact")
    args = parser.parse_args()

    N = args.N
    steps = args.steps
    dt = 0.25 * hbar(N)
    rng = np.random.RandomState(42)

    def skewh():
        W = rng.randn(N, N) + 1j * rng.randn(N, N)
        W = W - W.conj().T
        return W - np.eye(N) * np.trace(W) / N

    results = {
        "config": "c64 planes, maxit=5, compsum, refine='m0', "
                  f"{steps} steps/call; rows keyed N/layout/batch",
        "device": jax.devices()[0].device_kind,
        "rows": {},
    }
    if args.merge and os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
        results["device"] = jax.devices()[0].device_kind
    print(f"N={N} on {results['device']}")
    print(f"{'layout':<14}{'batch':>6}{'agg steps/s':>14}{'per-traj':>10}"
          f"{'scaling':>9}")
    for layout in args.layouts.split(","):
        base = None
        # also measure unbatched (batched=False) as the overhead reference
        for batch in [None] + [int(b) for b in args.batches.split(",")]:
            nb = 1 if batch is None else batch
            Ws = np.stack([skewh() for _ in range(nb)]).astype(np.complex64)
            if batch is None:
                Ws = Ws[0]
            Wp = jnp.asarray(to_planes(Ws).astype(np.float32))
            fn = build_step_fn(N, dt, steps=steps, maxit=5,
                               dtype=np.complex64, compsum=True,
                               planes_io=True, batched=batch is not None,
                               layout=layout)
            st = (Wp, jnp.zeros_like(Wp), jnp.zeros_like(Wp))

            def sync(st, batched=batch is not None):
                sl = st[0][0, :, 0, :8] if batched else st[0][0, 0, :8]
                return float(jnp.sum(sl))

            st = fn(*st)
            sync(st)
            # latency floor of a scalar pull through the device tunnel
            t0 = time.time()
            for _ in range(3):
                sync(st)
            latency = (time.time() - t0) / 3
            times = []
            for _ in range(5):
                t0 = time.time()
                out = fn(*st)
                sync(out)
                times.append(time.time() - t0)
            med = float(np.median(times))
            agg = nb * steps / max(med - latency, 1e-9)
            per = agg / nb
            if batch is None:
                name = f"N{N}_{layout}_unbatched"
                scal = None
                base = agg  # aggregate scaling is measured vs ONE
                # unbatched trajectory (always the first row), not vs the
                # first batch in the --batches list
            else:
                name = f"N{N}_{layout}_batch{batch}"
                scal = agg / base
            print(f"{layout:<14}{nb:>6}{agg:>14.1f}{per:>10.1f}"
                  f"{'' if scal is None else f'{scal:8.2f}x':>9}")
            results["rows"][name] = {
                "aggregate_steps_per_sec": round(agg, 1),
                "per_trajectory_steps_per_sec": round(per, 1),
                "aggregate_vs_unbatched": None if scal is None else round(scal, 2),
                "run_spread_pct": round(
                    100 * (max(times) - min(times)) / med, 1),
            }
            with open(OUT, "w") as f:
                json.dump(results, f, indent=2)
    print(f"written {OUT}")


if __name__ == "__main__":
    main()
