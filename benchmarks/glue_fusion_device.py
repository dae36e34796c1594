#!/usr/bin/env python
"""Attribute and attack the large-N poisson-core glue overhead (VERDICT r3 #4).

Round-3 measured (N=4096, v5e): the chunked Pallas Thomas kernel solves the
packed system in 1.62 ms, but the full poisson core costs ~9.6-11.4 ms - the
difference is complex<->planes extraction/stacking/re-complexification around
the kernel (complex64 is ONE interleaved XLA buffer; every .real/.imag/
lax.complex materializes an N^2 strided pass).

Candidate fix measured here: the *interleaved shear* layout
(ops/diagpack.mat2shear_interleaved) packs re/im as adjacent lanes in one
real array - one cheap copy each way that PRESERVES the interleaved storage
order - and the serial Thomas kernel is purely lane-elementwise, so unlike
the scan path (where interleaving defeated Mosaic's lane vectorization and
regressed at N<=2048, CHANGELOG round 3) the kernel should be indifferent
to it.  Round 3 never measured interleave+pallas at N>=4096; this does.

Measures per N in --sizes (default 4096,8192):
  * kernel-only time on pre-packed planes (the floor)
  * full poisson core: complex shear_pallas (current production)
  * full poisson core: interleaved shear_pallas (the candidate)
  * full production STEP both ways (build_step_fn, maxit=5, refine='m0')

Writes benchmarks/glue_fusion.json.  Run on device:
  timeout 3000 python benchmarks/glue_fusion_device.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "glue_fusion.json")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", default="4096,8192")
    parser.add_argument("--maxit", type=int, default=5)
    parser.add_argument("--reps", type=int, default=0,
                        help="override the per-call repetition count "
                             "(CPU smoke runs)")
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from quflow_tpu.ops.geometry import hbar
    from quflow_tpu.ops.pallas_solve import pallas_base_cols
    from quflow_tpu.parallel.stepper import (
        build_step_fn,
        to_planes,
        _poisson_core,
        _real_factors,
    )

    results = {"device": jax.devices()[0].device_kind,
               "maxit": args.maxit, "points": {}}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results["points"] = json.load(f).get("points", {})

    for N in [int(s) for s in args.sizes.split(",")]:
        reps = args.reps or max(2, 2048 // (N // 128))
        rng = np.random.RandomState(0)
        W = (rng.randn(N, N) + 1j * rng.randn(N, N)).astype(np.complex64)
        W = W - W.conj().T
        W -= np.eye(N, dtype=np.complex64) * (np.trace(W) / N)
        W /= np.abs(W).max()
        Wp = jnp.asarray(to_planes(W).astype(np.float32))
        point = {}

        # --- factors as jit ARGUMENTS throughout (closed-over arrays inline
        # as HLO literals; oversized programs break the tunneled
        # remote-compile transport)
        w, binv, u, op = _real_factors(N, np.float32, with_op=True,
                                       shear=True)

        # Through the axon tunnel .block_until_ready() does NOT wait for
        # execution (dispatches pipeline server-side and the whole batch
        # lands on whatever is synced last) - the only reliable fence is a
        # scalar PULL to host, same as bench.py / ensemble_device.py.  So
        # every timed program returns a scalar and we float() it.
        probe = jax.jit(lambda x: jnp.abs(x[..., :8]).sum())
        float(probe(Wp))
        t0 = time.time()
        for _ in range(3):
            float(probe(Wp))
        latency = (time.time() - t0) / 3

        def timed(call, n):
            """median-of-5 seconds per rep for a scalar-returning call."""
            ts = []
            for _ in range(5):
                t0 = time.time()
                v = float(call())
                assert np.isfinite(v)
                ts.append(time.time() - t0)
            return max(float(np.median(ts)) - latency, 1e-9) / n

        # --- kernel floor: chunked Thomas on pre-packed (2, N, M) planes
        @jax.jit
        def kernel_chain(w_, binv_, u_, d, n):
            base = pallas_base_cols(w_, binv_, u_)
            out = lax.fori_loop(0, n, lambda k, a: a + 1e-12 * base(a), d)
            return jnp.abs(out[..., :8]).sum()

        d0 = jnp.zeros((2, N, N + 1), jnp.float32) + 1e-3
        float(kernel_chain(w, binv, u, d0, 1))  # compile + warm
        point["kernel_only_ms"] = round(
            timed(lambda: kernel_chain(w, binv, u, d0, reps), reps) * 1e3, 3)

        # --- poisson cores with the production refine='m0' (complex state
        # in, complex out, chained on device like bench.py's sweep)
        for name, lay in (("complex", "shear_pallas"),
                          ("interleaved", "shear_pallas_il")):
            @jax.jit
            def poisson_chain(w_, binv_, u_, op_, Wri, n, lay=lay):
                W0 = lax.complex(Wri[0], Wri[1])

                def body(k, acc):
                    P = _poisson_core(acc, w_, binv_, u_, layout=lay,
                                      refine="m0", op=op_)
                    return acc + 1e-12 * P

                out = lax.fori_loop(0, n, body, W0)
                return jnp.abs(out.real[:, :8]).sum()

            try:
                float(poisson_chain(w, binv, u, op, Wp, 1))
            except Exception as e:  # record compile/runtime failures honestly
                point[f"poisson_{name}_error"] = str(e).splitlines()[0][:200]
                continue
            point[f"poisson_{name}_ms"] = round(
                timed(lambda: poisson_chain(w, binv, u, op, Wp, reps),
                      reps) * 1e3, 3)

        # --- full production step
        dt = 0.25 * hbar(N)
        sreps = max(1, reps // 4)
        for name, lay in (("complex", "shear_pallas"),
                          ("interleaved", "shear_pallas_il")):
            sfn = build_step_fn(
                N, dt, steps=sreps, maxit=args.maxit, dtype=np.complex64,
                compsum=True, planes_io=True, refine="m0",
                layout=lay,
            )
            z = jnp.zeros_like(Wp)
            st = [Wp, z, z]

            def one_call(st=st, sfn=sfn):
                st[:] = sfn(*st)
                return probe(st[0])

            try:
                float(one_call())  # compile + warm
            except Exception as e:
                point[f"step_{name}_error"] = str(e).splitlines()[0][:200]
                continue
            sec = timed(one_call, sreps)
            point[f"step_{name}_sps"] = round(1.0 / sec, 3)
            # sanity: state stays finite in planes
            out = np.asarray(st[0])
            assert np.isfinite(out).all()
        results["points"][f"N{N}"] = point
        print(f"N={N}: {point}")
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
    print(f"written {OUT}")


if __name__ == "__main__":
    main()
