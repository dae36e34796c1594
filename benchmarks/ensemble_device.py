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

    N = int(os.environ.get("QUFLOW_ENSEMBLE_N", "512"))
    steps = 100
    dt = 0.25 * hbar(N)
    rng = np.random.RandomState(42)

    def skewh():
        W = rng.randn(N, N) + 1j * rng.randn(N, N)
        W = W - W.conj().T
        return W - np.eye(N) * np.trace(W) / N

    results = {
        "config": f"N={N}, c64 planes, maxit=5, compsum, refine='m0', "
                  f"layout auto, {steps} steps/call",
        "device": jax.devices()[0].device_kind,
        "rows": {},
    }
    print(f"N={N} on {results['device']}")
    print(f"{'batch':>6}{'agg steps/s':>14}{'per-traj':>10}{'scaling':>9}")
    base = None
    for batch in (1, 4, 8, 16):
        Ws = np.stack([skewh() for _ in range(batch)]).astype(np.complex64)
        Wp = jnp.asarray(to_planes(Ws).astype(np.float32))
        fn = build_step_fn(N, dt, steps=steps, maxit=5, dtype=np.complex64,
                           compsum=True, planes_io=True, batched=True)
        st = (Wp, jnp.zeros_like(Wp), jnp.zeros_like(Wp))

        def sync(st):
            return float(jnp.sum(st[0][0, :, 0, :8]))

        st = fn(*st)
        sync(st)
        # latency floor of a scalar pull through the device tunnel
        t0 = time.time()
        for _ in range(3):
            sync(st)
        latency = (time.time() - t0) / 3
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            out = fn(*st)
            sync(out)
            best = min(best, time.time() - t0)
        agg = batch * steps / max(best - latency, 1e-9)
        per = agg / batch
        if base is None:
            base = agg
        print(f"{batch:>6}{agg:>14.1f}{per:>10.1f}{agg / base:>8.2f}x")
        results["rows"][f"batch{batch}"] = {
            "aggregate_steps_per_sec": round(agg, 1),
            "per_trajectory_steps_per_sec": round(per, 1),
            "scaling_vs_batch1": round(agg / base, 2),
        }
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
    print(f"written {OUT}")


if __name__ == "__main__":
    main()
