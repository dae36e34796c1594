"""Headline benchmark: isospectral-midpoint steps/second at N=1024.

Runs the branch-free production stepper (quflow_tpu/parallel/stepper.py) on
the default JAX backend (the real TPU chip under the driver), complex64
split-planes, fixed 5 fixed-point iterations per step, f32-accurate
('highest') MXU precision, Kahan-compensated updates.

The baseline is the reference-equivalent CPU implementation (scipy
solveh_banded + BLAS zgemm, complex128 - the reference's own LAPACK backend;
see benchmarks/cpu_baseline.py), measured once on this host and cached.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N = int(os.environ.get("QUFLOW_BENCH_N", "1024"))
MAXIT = 5
STEPS_PER_CALL = int(os.environ.get("QUFLOW_BENCH_STEPS", "100"))
PRECISION = os.environ.get("QUFLOW_BENCH_PRECISION", "highest")


def measure_tpu():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from quflow_tpu.parallel.stepper import (
        build_step_fn,
        to_planes,
        _real_factors,
        _poisson_core,
    )
    from quflow_tpu.ops.geometry import hbar

    dt = 0.25 * hbar(N)

    # One jitted program running STEPS_PER_CALL steps and returning a f32
    # scalar: device->host sync of complex arrays is unimplemented on this
    # TPU runtime and the tunnel adds ~25 ms latency per sync, so timing
    # must amortize many steps behind a single scalar pull.
    rdtype = np.float32
    w, binv, u = _real_factors(N, rdtype, wrapped=True)
    vareps = np.float32(dt / (2.0 * hbar(N)))
    prec = dict(
        highest=lax.Precision.HIGHEST,
        high=lax.Precision.HIGH,
        default=lax.Precision.DEFAULT,
    )[PRECISION]

    @jax.jit
    def run(Wri):
        W0 = lax.complex(Wri[0], Wri[1])

        def step(carry, _):
            Wc, dW, csum = carry

            def it(k, st):
                dW, _ = st
                Wh = Wc + dW
                Ph = _poisson_core(Wh, w, binv, u, layout="wrapped") * vareps
                PW = jnp.matmul(Ph, Wh, precision=prec)
                PWc = PW - jnp.conj(jnp.swapaxes(PW, -1, -2))
                return (jnp.matmul(PW, Ph, precision=prec) + PWc, PWc)

            dW, PWc = lax.fori_loop(0, MAXIT, it, (dW, jnp.zeros_like(Wc)))
            upd = 2.0 * PWc
            y = upd - csum
            t = Wc + y
            csum = (t - Wc) - y
            return (t, dW, csum), None

        z = jnp.zeros_like(W0)
        (Wc, _, _), _ = lax.scan(step, (W0, z, z), None, length=STEPS_PER_CALL)
        return jnp.abs(Wc).mean()

    rng = np.random.RandomState(42)
    W = rng.randn(N, N) + 1j * rng.randn(N, N)
    W = W - W.conj().T
    W *= 1.0 / np.abs(np.linalg.eigvalsh(-1j * W)).max()
    Wri = jnp.asarray(to_planes(W).astype(np.float32))

    # latency floor of a scalar pull
    probe = jax.jit(lambda x: jnp.abs(x).mean())
    float(probe(Wri))
    t0 = time.time()
    for _ in range(3):
        float(probe(Wri))
    latency = (time.time() - t0) / 3

    v = float(run(Wri))  # compile + warm
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        v = float(run(Wri))
        best = min(best, time.time() - t0)
    sec_per_step = max(best - latency, 1e-9) / STEPS_PER_CALL
    assert np.isfinite(v), "NaN/Inf in benchmark state"
    return sec_per_step


def main():
    # Watchdog: the TPU tunnel in this environment can wedge indefinitely
    # after failures; never hang the driver.
    import signal

    def _timeout(signum, frame):
        raise TimeoutError("TPU benchmark timed out (device tunnel wedged)")

    signal.signal(signal.SIGALRM, _timeout)
    per_try = int(os.environ.get("QUFLOW_BENCH_TIMEOUT", "480"))
    tpu_sec = None
    last_exc = None
    for attempt in range(2):
        signal.alarm(per_try)
        try:
            tpu_sec = measure_tpu()
            break
        except Exception as exc:
            last_exc = exc
            time.sleep(90)  # tunnel sometimes recovers after a quiet period
        finally:
            signal.alarm(0)
    if tpu_sec is None:
        print(
            json.dumps(
                {
                    "metric": f"isomp_steps_per_sec_N{N}",
                    "value": 0.0,
                    "unit": "steps/s",
                    "vs_baseline": 0.0,
                    "error": f"{type(last_exc).__name__}: {last_exc}"[:160],
                }
            )
        )
        return

    os.environ.setdefault("QUFLOW_BENCH_SKIP_BASELINE", "0")
    vs_baseline = None
    try:
        from benchmarks.cpu_baseline import get_baseline

        cpu_sec = get_baseline(N, maxit=MAXIT)
        vs_baseline = cpu_sec / tpu_sec  # speedup over reference CPU path
    except Exception:
        vs_baseline = float("nan")

    print(
        json.dumps(
            {
                "metric": f"isomp_steps_per_sec_N{N}",
                "value": round(1.0 / tpu_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(vs_baseline, 3)
                if vs_baseline == vs_baseline
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
