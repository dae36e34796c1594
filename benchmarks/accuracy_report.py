#!/usr/bin/env python
"""Long-run conservation validation: Casimir (spectrum) and energy drift of
the branch-free stepper across precision modes.

This quantifies the TPU accuracy story: complex64 + Kahan compensation vs
plain complex64 vs complex128, over many thousands of steps (arithmetic is
identical on CPU and TPU at 'highest' matmul precision up to reduction
order, so the CPU run is representative).

Run:  JAX_PLATFORMS=cpu python benchmarks/accuracy_report.py [--N 64]
      [--steps 10000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--N", type=int, default=64)
    parser.add_argument("--steps", type=int, default=10000)
    parser.add_argument("--chunk", type=int, default=500)
    parser.add_argument("--maxit", type=int, default=5)
    args = parser.parse_args()

    import numpy as np
    import jax.numpy as jnp
    import quflow_tpu as qf
    from quflow_tpu.models import EulerFlow
    from quflow_tpu.parallel.stepper import build_step_fn, to_planes, from_planes

    N = args.N
    flow = EulerFlow(N=N)
    W0 = flow.random_initial(lmax=10, seed=42)
    dt = 0.25 * flow.hbar
    spec0 = np.sort(np.linalg.eigvalsh(-1j * W0))
    e0 = float(qf.energy_euler(W0))
    z0 = float(qf.enstrophy(W0))

    configs = [
        ("c128 compsum", np.complex128, True, 0),
        ("c64 plain", np.complex64, False, 0),
        ("c64 compsum", np.complex64, True, 0),
        ("c64 compsum+refine", np.complex64, True, 1),
    ]
    print(f"N={N}, dt=0.25*hbar, {args.steps} steps, maxit={args.maxit}")
    print(f"{'config':<22}{'Casimir drift':>15}{'energy drift':>15}"
          f"{'enstrophy drift':>17}{'time':>8}")
    for name, dtype, compsum, refine in configs:
        fn = build_step_fn(
            N, dt, steps=args.chunk, maxit=args.maxit, dtype=dtype, compsum=compsum,
            planes_io=True, refine=refine,
        )
        rd = np.float32 if dtype == np.complex64 else np.float64
        Wp = jnp.asarray(to_planes(W0.astype(dtype)).astype(rd))
        st = (Wp, jnp.zeros_like(Wp), jnp.zeros_like(Wp))
        t0 = time.time()
        for _ in range(args.steps // args.chunk):
            st = fn(*st)
        Wf = from_planes(np.asarray(st[0])).astype(np.complex128)
        el = time.time() - t0
        spec = np.sort(np.linalg.eigvalsh(-1j * Wf))
        cd = np.abs(spec - spec0).max()
        ed = abs(float(qf.energy_euler(Wf)) - e0)
        zd = abs(float(qf.enstrophy(Wf)) - z0)
        print(f"{name:<22}{cd:>15.3e}{ed:>15.3e}{zd:>17.3e}{el:>7.1f}s")


if __name__ == "__main__":
    main()
