#!/usr/bin/env python
"""Localize the ensemble batching plateau with the PRODUCTION builders.

ensemble_device.json shows aggregate throughput saturating at ~1.25x by
batch 4 (N=512).  This harness times the production components in
isolation at each batch size:

  * poisson: build_poisson_fn(batched=True) - pack + affine-scan Thomas +
    m0 refine + unpack, the layout the stepper uses (solve+pack is ~90% of
    the N=512 step: sweep gemm_fraction_of_step = 0.102)
  * gemm: the stepper's per-iteration GEMM pair (PW, PW@P + conj-subtract)
    at 'highest' precision on complex64
  * step: build_step_fn(batched=...) - the full 5-iteration production step

Each timed as median of 5 calls over --steps scan iterations (poisson/gemm
bodies chained through a dependency so XLA cannot overlap across
iterations), tunnel latency subtracted.  Writes
benchmarks/ensemble_components.json.

Run (device):  timeout 1200 python benchmarks/ensemble_components.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ensemble_components.json")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax
    from quflow_tpu.parallel.stepper import (
        build_step_fn, _poisson_core, _real_factors, to_planes,
    )
    from quflow_tpu.ops.geometry import hbar

    parser = argparse.ArgumentParser()
    parser.add_argument("--N", type=int, default=512)
    parser.add_argument("--batches", default="1,4,8,16")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--layout", default="shear")
    parser.add_argument("--merge", action="store_true")
    args = parser.parse_args()

    N = args.N
    steps = args.steps
    dt = 0.25 * hbar(N)
    rng = np.random.RandomState(42)
    w, binv, u, op = _real_factors(N, np.float32, with_op=True, shear=True)
    vareps = np.float32(0.25)

    def skewh():
        W = rng.randn(N, N) + 1j * rng.randn(N, N)
        W = W - W.conj().T
        return (W - np.eye(N) * np.trace(W) / N).astype(np.complex64)

    def mm(a, b):
        return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)

    def mm_default(a, b):
        return jnp.matmul(a, b, precision=lax.Precision.DEFAULT)

    def mm_kara(a, b):
        # the stepper's 'highest_karatsuba' 3-mult complex GEMM
        ar, ai = a.real, a.imag
        br, bi = b.real, b.imag
        p = lax.Precision.HIGHEST
        t1 = jnp.matmul(ar, br, precision=p)
        t2 = jnp.matmul(ai, bi, precision=p)
        t3 = jnp.matmul(ar + ai, br + bi, precision=p)
        return lax.complex(t1 - t2, t3 - t1 - t2)

    def make_component(kind):
        """Scan of `steps` iterations of one production component; the
        carry threads a full-array dependency so iterations serialize the
        way they do inside the real fixed point."""

        def renorm(A):
            # keep the chained carry finite in f32 (the dependency is what
            # matters for serialization, not the magnitude)
            s = jnp.max(jnp.abs(A))
            return A / jnp.maximum(s, 1e-30)

        def poisson_body(Wc, _):
            P = _poisson_core(Wc, w, binv, u, layout=args.layout,
                              refine="m0", op=op)
            return renorm(P), None  # next iteration solves the previous P

        def gemm_pair(mmfn):
            def body(Wc, _):
                PW = mmfn(Wc, Wc * vareps)
                PWc = PW - jnp.conj(jnp.swapaxes(PW, -1, -2))
                dW = mmfn(PW, Wc) + PWc
                return renorm(dW), None
            return body

        body = {"poisson": poisson_body, "gemm": gemm_pair(mm),
                "gemm_default": gemm_pair(mm_default),
                "gemm_kara": gemm_pair(mm_kara)}[kind]

        @jax.jit
        def run(Wri):
            # Returns a SCALAR: through the axon tunnel
            # .block_until_ready() does not fence execution; the only
            # reliable fence is a scalar pull to host (glue_fusion fix).
            Wc = lax.complex(Wri[0], Wri[1])
            Wc, _ = lax.scan(body, Wc, None, length=steps)
            return jnp.abs(Wc[..., :8]).sum()

        return run

    results = {
        "config": f"N={N}, layout={args.layout}, refine='m0', precision "
                  f"highest, {steps} chained iterations/call, median of 5, "
                  "latency-subtracted; ms per iteration",
        "device": jax.devices()[0].device_kind,
        "rows": {},
    }
    if args.merge and os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    print(f"N={N} layout={args.layout} on {results['device']}")
    print(f"{'batch':>6}{'poisson ms':>12}{'gemm-pair ms':>14}"
          f"{'full step ms':>14}{'agg steps/s':>13}")
    for batch in [int(b) for b in args.batches.split(",")]:
        Ws = np.stack([skewh() for _ in range(batch)])
        Wp = jnp.asarray(to_planes(Ws).astype(np.float32))
        # tunnel latency floor (scalar pull on a tiny program)
        probe = jax.jit(lambda x: jnp.abs(x[..., :8]).sum())
        float(probe(Wp))
        t0 = time.time()
        for _ in range(3):
            float(probe(Wp))
        lat = (time.time() - t0) / 3

        row = {"batch": batch}
        for kind in ("poisson", "gemm", "gemm_default", "gemm_kara"):
            run = make_component(kind)
            float(run(Wp))  # compile + warm
            ts = []
            for _ in range(5):
                t0 = time.time()
                v = float(run(Wp))
                assert np.isfinite(v)
                # clamp: on fast hosts the latency probe can exceed the run
                ts.append(max(time.time() - t0 - lat, 0.0))
            row[kind + "_ms"] = round(float(np.median(ts)) / steps * 1e3, 4)
        # full production step (scalar-fenced like bench.py)
        fn = build_step_fn(N, dt, steps=steps, maxit=5, dtype=np.complex64,
                           compsum=True, planes_io=True, batched=True,
                           layout=args.layout)
        step_scalar = jax.jit(
            lambda a, b, c: jnp.abs(fn(a, b, c)[0][..., :8]).sum())
        st = (Wp, jnp.zeros_like(Wp), jnp.zeros_like(Wp))
        float(step_scalar(*st))  # compile + warm
        ts = []
        for _ in range(5):
            t0 = time.time()
            v = float(step_scalar(*st))
            assert np.isfinite(v)
            ts.append(max(time.time() - t0 - lat, 0.0))
        step_ms = float(np.median(ts)) / steps * 1e3
        row["step_ms"] = round(step_ms, 4)
        row["agg_steps_per_sec"] = round(batch / (step_ms / 1e3), 1)
        # solve share implied by the components (5 poisson cores/step)
        row["implied_5poisson_plus_5gemm_ms"] = round(
            5 * (row["poisson_ms"] + row["gemm_ms"]), 4)
        results["rows"][f"N{N}_batch{batch}"] = row
        print(f"{batch:>6}{row['poisson_ms']:>12.3f}{row['gemm_ms']:>14.3f}"
              f"{row['step_ms']:>14.3f}{row['agg_steps_per_sec']:>13.1f}",
              flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
    print(f"written {OUT}")


if __name__ == "__main__":
    main()
