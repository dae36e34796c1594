#!/usr/bin/env python
"""Component-level profile of the batched (ensemble) stepper on device.

Round-2 measurement (benchmarks/ensemble_device.json): aggregate ensemble
throughput at N=512 saturates at ~1170 steps/s for EVERY batch size 4-16 -
i.e. a batched step costs ~batch x the unbatched step, ~6x worse than even
linear-compute scaling (GEMMs are only ~10% of the N=512 step).  Something
in the batched program serializes.  This harness times each stage of the
step in isolation, batched vs unbatched, to localize it:

  * gemm   - the two fixed-point GEMMs (mm(P,W), mm(PW,P)) alone
  * poisson - the full _poisson_core (pack + solve + unpack)
  * step   - the full production step (reference number)

Each stage runs under lax.scan for --steps iterations (same dispatch
amortization as the production runner), median of 5 timed calls.

Run (device):  timeout 1800 python benchmarks/ensemble_profile.py
Writes benchmarks/ensemble_profile.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ensemble_profile.json")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax
    from quflow_tpu.parallel.stepper import (
        _poisson_core, _real_factors, to_planes,
    )
    from quflow_tpu.ops.geometry import hbar

    parser = argparse.ArgumentParser()
    parser.add_argument("--N", type=int, default=512)
    parser.add_argument("--batches", default="1,4,8,16")
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--layout", default="shear")
    parser.add_argument("--precision", default="highest")
    parser.add_argument("--refine", default="m0")
    args = parser.parse_args()

    N = args.N
    steps = args.steps
    refine = 0 if args.refine in ("0", 0) else args.refine
    prec = dict(highest=lax.Precision.HIGHEST, high=lax.Precision.HIGH,
                default=lax.Precision.DEFAULT)[args.precision]
    rng = np.random.RandomState(42)
    w, binv, u, op = _real_factors(N, np.float32, with_op=True, shear=True)
    vareps = np.float32(0.25)

    def skewh():
        W = rng.randn(N, N) + 1j * rng.randn(N, N)
        W = W - W.conj().T
        return W - np.eye(N) * np.trace(W) / N

    def mm(a, b):
        return jnp.matmul(a, b, precision=prec)

    def make_stage(kind):
        def gemm_body(Wc, _):
            PW = mm(Wc, Wc)
            PWc = PW - jnp.conj(jnp.swapaxes(PW, -1, -2))
            out = mm(PW, Wc * vareps) + PWc
            return Wc + 1e-12 * out, None

        def poisson_body(Wc, _):
            P = _poisson_core(Wc, w, binv, u, layout=args.layout,
                              refine=refine, op=op)
            return Wc + 1e-12 * P, None

        def step_body(Wc, _):
            P = _poisson_core(Wc, w, binv, u, layout=args.layout,
                              refine=refine, op=op) * vareps
            PW = mm(P, Wc)
            PWc = PW - jnp.conj(jnp.swapaxes(PW, -1, -2))
            dW = mm(PW, P) + PWc
            return Wc + 1e-12 * dW, None

        body = dict(gemm=gemm_body, poisson=poisson_body, step=step_body)[kind]

        @jax.jit
        def run(Wri):
            Wc = lax.complex(Wri[0], Wri[1])
            Wc, _ = lax.scan(body, Wc, None, length=steps)
            return jnp.stack([Wc.real, Wc.imag])

        return run

    results = {
        "config": f"N={N}, layout={args.layout}, precision={args.precision}, "
                  f"refine={args.refine}, {steps} scan iterations/call, "
                  "median of 5; ms per scan iteration",
        "device": jax.devices()[0].device_kind,
        "interleave": os.environ.get("QUFLOW_SHEAR_INTERLEAVE", "0"),
        "rows": {},
    }
    print(f"N={N} layout={args.layout} precision={args.precision} on "
          f"{results['device']}")
    print(f"{'batch':>6}{'gemm ms':>10}{'poisson ms':>12}{'step ms':>10}"
          f"{'agg step/s':>12}")
    for batch in [None] + [int(b) for b in args.batches.split(",")]:
        nb = 1 if batch is None else batch
        Ws = np.stack([skewh() for _ in range(nb)]).astype(np.complex64)
        if batch is None:
            Ws = Ws[0]
        Wp = jnp.asarray(to_planes(Ws).astype(np.float32))
        row = {}
        for kind in ("gemm", "poisson", "step"):
            run = make_stage(kind)
            out = run(Wp)
            out.block_until_ready()  # compile
            ts = []
            for _ in range(5):
                t0 = time.time()
                run(Wp).block_until_ready()
                ts.append((time.time() - t0) / steps * 1e3)
            row[kind + "_ms"] = round(float(np.median(ts)), 4)
        key = "unbatched" if batch is None else f"batch{batch}"
        row["agg_steps_per_sec_stepkernel"] = round(
            nb / (row["step_ms"] / 1e3), 1)
        results["rows"][key] = row
        print(f"{key:>6}{row['gemm_ms']:>10.3f}{row['poisson_ms']:>12.3f}"
              f"{row['step_ms']:>10.3f}"
              f"{row['agg_steps_per_sec_stepkernel']:>12.1f}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
    print(f"written {OUT}")


if __name__ == "__main__":
    main()
