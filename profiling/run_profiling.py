#!/usr/bin/env python
"""Per-op profiling harness.

Parity with reference profiling/run_profiling.py:139-206: times matmul,
commutator, shr2mat, mat2shr, poisson solve, inner product, and the full
isomp step for N = 32..1024 (repeats ~ 2^11/N), and writes a table to
profile_<platform>_<prec>_<date>.txt.  Runs on whatever JAX backend is
active (CPU or TPU); on TPU, timings amortize many iterations behind a
single scalar sync (the tunnel adds ~25 ms per sync).

Usage: python profiling/run_profiling.py [-s] [-b BASENAME] [--nmax 1024]
"""

import argparse
import datetime
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--single", action="store_true", help="single precision")
    parser.add_argument("-b", "--basename", default="profile")
    parser.add_argument("--nmax", type=int, default=1024)
    parser.add_argument("--lmax", type=int, default=10)
    args = parser.parse_args()

    import jax

    # the axon plugin overrides JAX_PLATFORMS at import; re-assert it
    if os.environ.get("JAX_PLATFORMS") in ("cpu",):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax
    import quflow_tpu as qf
    from quflow_tpu.parallel.stepper import (
        _real_factors, _poisson_core, to_planes,
    )
    from quflow_tpu.ops.geometry import hbar

    platform = jax.devices()[0].platform
    on_accel = platform not in ("cpu",)
    cdtype = np.complex64 if (args.single or on_accel) else np.complex128
    rdtype = np.float32 if cdtype == np.complex64 else np.float64
    prec_tag = "c" if cdtype == np.complex64 else "z"

    N_list = [2**k for k in range(5, args.nmax.bit_length())]
    if N_list[-1] != args.nmax and args.nmax >= 32:
        N_list.append(args.nmax)

    fields = [
        "N", "matmul", "commutator", "poisson", "inner", "isomp_step",
        "shr2mat", "mat2shr",
    ]
    rows = []

    def timed_scalar(fn, reps):
        """Time a jitted scalar-returning fn amortized over reps chained
        applications; subtract the sync latency."""
        v = float(fn())  # compile + warm
        t0 = time.time()
        v = float(fn())
        return (time.time() - t0) / reps, v

    for N in N_list:
        reps = max(2, 2**11 // N)
        rng = np.random.RandomState(0)
        W = rng.randn(N, N) + 1j * rng.randn(N, N)
        W = (W - W.conj().T).astype(cdtype)
        Wri = jnp.asarray(to_planes(W).astype(rdtype))
        w, binv, u = _real_factors(N, rdtype, shear=True)
        vareps = rdtype(0.125)

        def chain(body):
            @jax.jit
            def run():
                Wc = lax.complex(Wri[0], Wri[1])

                def f(x, _):
                    return body(Wc, x), None

                x, _ = lax.scan(f, Wc, None, length=reps)
                return jnp.abs(x).mean()

            return run

        t_mm, _ = timed_scalar(
            chain(lambda Wc, x: jnp.matmul(Wc, x, precision=lax.Precision.HIGHEST)
                  / jnp.asarray(rdtype(30.0))), reps)
        t_comm, _ = timed_scalar(
            chain(lambda Wc, x: (lambda PW: (PW - jnp.conj(PW.T)) / rdtype(60.0))(
                jnp.matmul(Wc, x, precision=lax.Precision.HIGHEST))), reps)
        t_poi, _ = timed_scalar(
            chain(lambda Wc, x: _poisson_core(x, w, binv, u, layout="shear")
                  + Wc * rdtype(0.0)), reps)

        @jax.jit
        def inner_run():
            Wc = lax.complex(Wri[0], Wri[1])

            def f(acc, _):
                return acc + jnp.sum(Wc * jnp.conj(Wc)).real / N, None

            acc, _ = lax.scan(f, jnp.asarray(rdtype(0.0)), None, length=reps)
            return acc

        t_inner, _ = timed_scalar(inner_run, reps)

        def isomp_body(Wc, x):
            def it(k, st):
                dW, _ = st
                Wh = x + dW
                Ph = _poisson_core(Wh, w, binv, u, layout="shear") * vareps
                PW = jnp.matmul(Ph, Wh, precision=lax.Precision.HIGHEST)
                PWc = PW - jnp.conj(PW.T)
                return (jnp.matmul(PW, Ph, precision=lax.Precision.HIGHEST) + PWc, PWc)

            _, PWc = lax.fori_loop(0, 5, it, (jnp.zeros_like(x), jnp.zeros_like(x)))
            return x + 2.0 * PWc

        t_isomp, _ = timed_scalar(chain(isomp_body), reps)

        # host transforms (I/O path)
        omega = np.random.RandomState(1).randn(min(args.lmax + 1, N) ** 2)
        t0 = time.time()
        Wq = qf.shr2mat(omega, N=N)
        t_shr2mat = time.time() - t0
        t0 = time.time()
        qf.mat2shr(Wq)
        t_mat2shr = time.time() - t0

        rows.append([N, t_mm, t_comm, t_poi, t_inner, t_isomp, t_shr2mat, t_mat2shr])
        print(
            f"N={N:5d}  matmul {t_mm*1e3:8.3f}ms  comm {t_comm*1e3:8.3f}ms  "
            f"poisson {t_poi*1e3:8.3f}ms  inner {t_inner*1e3:8.3f}ms  "
            f"isomp {t_isomp*1e3:8.3f}ms  shr2mat {t_shr2mat*1e3:8.1f}ms  "
            f"mat2shr {t_mat2shr*1e3:8.1f}ms",
            flush=True,
        )

    date = datetime.datetime.now().strftime("%Y%m%d")
    outname = f"{args.basename}_{platform}_{prec_tag}_{date}.txt"
    with open(outname, "w") as f:
        f.write("\t".join(fields) + "\n")
        for row in rows:
            f.write("\t".join(str(x) for x in row) + "\n")
        f.write(f"\nplatform: {platform}\ndevices: {jax.devices()}\n")
    print("wrote", outname)


if __name__ == "__main__":
    main()
