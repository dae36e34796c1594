#!/usr/bin/env python
"""Mixed-precision fixed-point schedule on device: accuracy + speed.

The production stepper runs every fixed-point iteration's GEMMs at
'highest' (6-pass bf16, f32-accurate).  The mixed schedule runs the first
warm_iters iterations at 'high' (3-pass) and only the final iterations at
'highest' - the fixed point contracts regardless of per-iteration GEMM
precision (see build_dw_step_fn's f32 warm phase for the same argument at
higher precision).

Measures at N=1024 (and --N) over --steps steps:
  - pure 'highest' (production reference)
  - mixed: warm 'high' x (maxit-2) + 'highest' x 2
  - pure 'high' (floor: what full 3-pass costs in accuracy)
per config: steps/s (median of 5 timed calls), Casimir/energy/enstrophy
drift, and max trajectory deviation from the pure-'highest' run.

Run (device):  timeout 3600 python benchmarks/mixed_precision_device.py
Writes benchmarks/mixed_precision.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "mixed_precision.json")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--N", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--chunk", type=int, default=250)
    parser.add_argument("--maxit", type=int, default=5)
    parser.add_argument("--only", default=None,
                        help="substring filter on config names; merges "
                             "into an existing artifact")
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import quflow_tpu as qf
    from quflow_tpu.models import EulerFlow
    from quflow_tpu.parallel.stepper import build_step_fn, to_planes, from_planes

    N, maxit = args.N, args.maxit
    # one artifact per size: the canonical N=1024 rows live in
    # mixed_precision.json; other sizes get a suffixed file instead of
    # clobbering it
    global OUT
    if N != 1024:
        OUT = OUT.replace(".json", f"_{N}.json")
    flow = EulerFlow(N=N)
    W0 = flow.random_initial(lmax=10, seed=42)
    dt = 0.25 * flow.hbar
    spec0 = np.sort(np.linalg.eigvalsh(-1j * W0))
    e0 = float(qf.energy_euler(W0))
    z0 = float(qf.enstrophy(W0))
    Wp0 = to_planes(W0.astype(np.complex64)).astype(np.float32)

    configs = [
        ("highest (production)", dict(precision="highest")),
        ("mixed high+highest", dict(precision="highest",
                                    warm_precision="high",
                                    warm_iters=maxit - 2)),
        ("mixed kara high+highest", dict(precision="highest_karatsuba",
                                         warm_precision="high_karatsuba",
                                         warm_iters=maxit - 2)),
        ("high (floor)", dict(precision="high")),
    ]
    results = {
        "config": f"N={N}, dt=0.25*hbar, {args.steps} steps, maxit={maxit}, "
                  "c64 planes, compsum, refine='m0', layout auto",
        "device": jax.devices()[0].device_kind,
        "rows": {},
    }
    if os.path.exists(OUT):
        with open(OUT) as f:
            prev = json.load(f)
        if prev.get("config") == results["config"]:
            results["rows"] = prev.get("rows", {})
    print(f"N={N}, {args.steps} steps, maxit={maxit} on "
          f"{results['device']}")
    print(f"{'config':<26}{'steps/s':>9}{'Casimir':>11}{'energy':>11}"
          f"{'enstrophy':>11}{'vs-highest':>12}")
    W_ref = None
    for name, kw in configs:
        if args.only and args.only not in name and name != "highest (production)":
            # the 'highest' run always executes: it defines the
            # deviation-vs-highest reference trajectory
            continue
        fn = build_step_fn(N, dt, steps=args.chunk, maxit=maxit,
                           dtype=np.complex64, compsum=True, planes_io=True,
                           **kw)
        Wp = jnp.asarray(Wp0)
        st = (Wp, jnp.zeros_like(Wp), jnp.zeros_like(Wp))
        st = list(fn(*st))  # compile + first chunk
        float(jnp.sum(st[0][0, 0, :8]))  # block before the clock starts
        # per-chunk median: robust to the tunnel's sporadic multi-second
        # stalls (a single total-elapsed measurement let one stall corrupt
        # a whole config row - the 16.7-vs-168.8 artifact of round 2)
        times = []
        for _ in range(args.steps // args.chunk - 1):
            t0 = time.time()
            st = list(fn(*st))
            float(jnp.sum(st[0][0, 0, :8]))
            times.append(time.time() - t0)
        sps = args.chunk / float(np.median(times))
        Wf = from_planes(np.asarray(st[0])).astype(np.complex128)
        spec = np.sort(np.linalg.eigvalsh(-1j * Wf))
        cd = float(np.abs(spec - spec0).max())
        ed = abs(float(qf.energy_euler(Wf)) - e0)
        zd = abs(float(qf.enstrophy(Wf)) - z0)
        if W_ref is None:
            W_ref = Wf
            dev = 0.0
        else:
            dev = float(np.abs(Wf - W_ref).max() / np.abs(W_ref).max())
        print(f"{name:<26}{sps:>9.1f}{cd:>11.2e}{ed:>11.2e}{zd:>11.2e}"
              f"{dev:>12.2e}", flush=True)
        results["rows"][name] = {
            **{k: v for k, v in kw.items()},
            "steps_per_sec": round(sps, 1),
            "casimir_drift": cd, "energy_drift": ed, "enstrophy_drift": zd,
            "max_rel_deviation_vs_highest": dev,
        }
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
    print(f"written {OUT}")


if __name__ == "__main__":
    main()
