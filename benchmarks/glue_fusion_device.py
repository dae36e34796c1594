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


def _bench(fn, args, reps, inner_chain=False):
    """Median-of-5 amortized seconds per call.  With inner_chain the callable
    must map its first arg to a like-shaped output; we chain it to defeat
    cross-call caching."""
    import numpy as np

    fn(*args)  # compile
    outs = []
    for _ in range(5):
        t0 = time.time()
        if inner_chain:
            x = args[0]
            for _ in range(reps):
                x = fn(x, *args[1:])
            x.block_until_ready()
        else:
            for _ in range(reps):
                r = fn(*args)
            r = r[0] if isinstance(r, tuple) else r
            r.block_until_ready()
        outs.append((time.time() - t0) / reps)
    return float(np.median(outs))


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

    from quflow_tpu.ops.geometry import hbar
    from quflow_tpu.ops.pallas_solve import pallas_base_cols
    from quflow_tpu.parallel.stepper import (
        build_poisson_fn,
        build_step_fn,
        to_planes,
        _shear_factors_cached,
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

        # --- kernel floor: chunked Thomas on pre-packed (2, N, M) planes
        w, binv, u, _ = _shear_factors_cached(N)
        base = pallas_base_cols(
            np.asarray(w, np.float32), np.asarray(binv, np.float32),
            np.asarray(u, np.float32))
        d0 = jnp.zeros((2, N, N + 1), jnp.float32) + 1e-3
        kfn = jax.jit(base)
        point["kernel_only_ms"] = _bench(kfn, (d0,), reps, inner_chain=True) * 1e3

        # --- poisson cores, refine=0 (build_poisson_fn has no refine arg;
        # the m0 effect is measured in the step rows).  planes I/O - note
        # XLA may fuse the I/O planes->complex->pack chain, so the STEP rows
        # (complex state between iterations) are the ground truth; these
        # isolate the solve for attribution.
        for name, env in (("complex", "0"), ("interleaved", "1")):
            os.environ["QUFLOW_SHEAR_INTERLEAVE"] = env
            pfn = build_poisson_fn(N, layout="shear_pallas")
            ms = _bench(pfn, (Wp,), reps, inner_chain=True) * 1e3
            point[f"poisson_{name}_ms"] = round(ms, 3)

        # --- full production step
        dt = 0.25 * hbar(N)
        sreps = max(1, reps // 4)
        for name, env in (("complex", "0"), ("interleaved", "1")):
            os.environ["QUFLOW_SHEAR_INTERLEAVE"] = env
            sfn = build_step_fn(
                N, dt, steps=sreps, maxit=args.maxit, dtype=np.complex64,
                compsum=True, planes_io=True, refine="m0",
                layout="shear_pallas",
            )
            z = jnp.zeros_like(Wp)
            st = (Wp, z, z)
            st = sfn(*st)  # compile
            ts = []
            for _ in range(5):
                t0 = time.time()
                st = sfn(*st)
                st[0].block_until_ready()
                ts.append((time.time() - t0) / sreps)
            sps = 1.0 / float(np.median(ts))
            point[f"step_{name}_sps"] = round(sps, 3)
            # sanity: state stays finite and skew-symmetric in planes
            out = np.asarray(st[0])
            assert np.isfinite(out).all()
        point["kernel_only_ms"] = round(point["kernel_only_ms"], 3)
        results["points"][f"N{N}"] = point
        print(f"N={N}: {point}")
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
    print(f"written {OUT}")


if __name__ == "__main__":
    main()
