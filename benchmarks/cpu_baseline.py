"""Measure the reference-equivalent CPU implementation of the isospectral
midpoint step, to serve as bench.py's baseline.

The reference's fastest production path is numba-JIT Thomas solves per
diagonal + BLAS zgemm commutators (reference quflow/laplacian/cpu.py +
integrators/isospectral.py); numba is not available in this image, so the
closest faithful stand-in is its own LAPACK backend: scipy.linalg
``solveh_banded`` over the N//2+1 packed tridiagonal systems (reference
quflow/laplacian/tridiagonal.py:218-254) + numpy BLAS zgemm, complex128,
with the same fixed iteration count as the TPU bench.

Result is cached in benchmarks/baseline_cpu.json (per N).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "baseline_cpu.json")


def _packed_lap(N, bc):
    from quflow_tpu.ops.tridiag import packed_laplacian

    return packed_laplacian(N, bc=bc)


def make_cpu_solver(N):
    from scipy.linalg import solveh_banded
    from quflow_tpu.ops.diagpack import pack_indices

    lap = _packed_lap(N, bc=True)
    ab = -lap  # positive definite, solveh_banded lower form
    rows, cols = pack_indices(N, True)

    def solve_poisson(W):
        d = W[rows, cols]
        d[0, :] -= d[0, :].sum() / N
        x = np.empty_like(d)
        for m in range(d.shape[0]):
            x[m] = solveh_banded(ab[m], -d[m], lower=True)
        x[0, :] -= x[0, :].sum() / N
        P = np.zeros_like(W)
        P[rows, cols] = x
        dg = np.diagonal(P).copy()
        P -= P.conj().T
        np.fill_diagonal(P, dg)
        return P

    return solve_poisson


def isomp_cpu_step(W, vareps, solve_poisson, maxit=5):
    dW = np.zeros_like(W)
    for _ in range(maxit):
        Whalf = W + dW
        Phalf = solve_poisson(Whalf) * vareps
        PW = Phalf @ Whalf
        PWc = PW - PW.conj().T
        dW = PW @ Phalf + PWc
    return W + 2 * PWc


def measure(N, steps=10, maxit=5):
    from quflow_tpu.ops.geometry import hbar

    rng = np.random.RandomState(0)
    W = rng.randn(N, N) + 1j * rng.randn(N, N)
    W = W - W.conj().T
    vareps = 0.25 * hbar(N) / (2 * hbar(N))
    solver = make_cpu_solver(N)
    # warm
    W = isomp_cpu_step(W, vareps, solver, maxit)
    t0 = time.time()
    for _ in range(steps):
        W = isomp_cpu_step(W, vareps, solver, maxit)
    dt = (time.time() - t0) / steps
    return dt


def get_baseline(N, maxit=5):
    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
    key = f"N{N}_maxit{maxit}"
    if key not in cache:
        steps = max(3, min(20, 2**21 // N**2))
        cache[key] = {
            "sec_per_step": measure(N, steps=steps, maxit=maxit),
            "impl": "scipy solveh_banded + BLAS zgemm, complex128",
        }
        with open(CACHE, "w") as f:
            json.dump(cache, f, indent=2)
    return cache[key]["sec_per_step"]


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    for N in (256, 512, 1024):
        print(N, get_baseline(N), "s/step")
