"""Headline benchmark + roofline sweep: isospectral-midpoint steps/second.

Default (driver) mode runs the branch-free production stepper at N=1024 on
the default JAX backend (the real TPU chip under the driver), complex64
split-planes, fixed 5 fixed-point iterations per step, f32-accurate
('highest') MXU precision, Kahan-compensated updates - and prints ONE JSON
line:

  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "mfu": ...,
   "sweep": {...from benchmarks/sweep_round2.json if present...}}

``python bench.py --sweep`` measures the full N x layout x precision sweep
(N in {512, 1024, 2048, 4096} at scientific precision, wrapped vs pallas
solve layouts) plus per-op roofline numbers, and writes
benchmarks/sweep_round2.json.  The sweep is run out-of-band (it takes
several minutes of device time); the driver-mode line embeds its artifact.

The baseline is the reference-equivalent CPU implementation (scipy
solveh_banded + BLAS zgemm, complex128 - the reference's own LAPACK backend;
see benchmarks/cpu_baseline.py), measured once on this host and cached.
"""

import json
import os
from functools import partial
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_HEADLINE = int(os.environ.get("QUFLOW_BENCH_N", "1024"))
MAXIT = 5
PRECISION = os.environ.get("QUFLOW_BENCH_PRECISION", "highest")
# headline measures the production default: mixed-precision fixed point
# (3 warm 3-pass iterations + 2 full-precision; IsompTPU warm_precision
# ='auto' since round 5 - accuracy evidence benchmarks/mixed_precision*.json).
# QUFLOW_BENCH_WARM=none measures the pure-'highest' schedule.
WARM = os.environ.get("QUFLOW_BENCH_WARM", "high")
WARM = None if WARM in ("", "none", "0") else WARM
SWEEP_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "benchmarks", "sweep_round2.json"
)

# chip peaks for utilization accounting (per chip)
_PEAKS = {
    # device_kind substring: (bf16 peak flops/s, HBM bytes/s)
    "v5 lite": (197e12, 819e9),
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
    "v6": (918e12, 1640e9),
}
# MXU passes per f32-accurate ('highest') matmul: each f32 operand splits
# into 3 bf16 terms; XLA evaluates the 6 significant cross-products.
_PASSES = {"highest": 6, "high": 3, "default": 1}


def _chip_peaks():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, peaks in _PEAKS.items():
        if key in kind:
            return peaks
    return (197e12, 819e9)  # assume v5e


def _flops_per_step(N, maxit, precision):
    """Algorithmic (model) flops of one isomp step: maxit x 2 complex N^3
    GEMMs, 8 real flops per complex MAC; karatsuba does the same model work
    with 3/4 the hardware multiplies (accounted in passes, not here)."""
    return maxit * 2 * 8 * N**3


def measure_step(N, precision=PRECISION, layout="wrapped", steps=100, maxit=MAXIT,
                 refine=0, warm_precision=None, warm_iters=None):
    """Sync-amortized steps/s of the production stepper on the default
    backend.  Returns (sec_per_step, poisson_core_ms).  ``refine`` matches
    build_step_fn's option (production f32 default is 'm0'; see
    benchmarks/conservation_1024.json).  ``warm_precision``/``warm_iters``
    mirror build_step_fn's mixed-precision fixed-point schedule (first
    warm_iters iterations at warm_precision, rest at precision; accuracy
    evidence in benchmarks/mixed_precision.json)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from quflow_tpu.parallel.stepper import (
        to_planes,
        _real_factors,
        _poisson_core,
        _resolve_layout,
    )
    from quflow_tpu.ops.geometry import hbar

    dt = 0.25 * hbar(N)
    rdtype = np.float32
    layout = _resolve_layout(N, None, layout)
    w, binv, u, op = _real_factors(
        N, rdtype, wrapped=(layout in ("wrapped", "pallas")),
        shear=(layout in ("shear", "shear_pallas")), with_op=True,
    )
    vareps = np.float32(dt / (2.0 * hbar(N)))

    def _mk_mm(spec):
        p = dict(
            highest=lax.Precision.HIGHEST,
            high=lax.Precision.HIGH,
            default=lax.Precision.DEFAULT,
        )[spec.replace("_karatsuba", "")]
        if spec.endswith("_karatsuba"):
            def mm(a, b):
                ar, ai = a.real, a.imag
                br, bi = b.real, b.imag
                t1 = jnp.matmul(ar, br, precision=p)
                t2 = jnp.matmul(ai, bi, precision=p)
                t3 = jnp.matmul(ar + ai, br + bi, precision=p)
                return lax.complex(t1 - t2, t3 - t1 - t2)
        else:
            def mm(a, b):
                return jnp.matmul(a, b, precision=p)
        return mm

    mm = _mk_mm(precision)
    if warm_precision is not None and warm_iters is None:
        warm_iters = max(maxit - 2, 0)
    warm_iters = 0 if warm_precision is None else min(warm_iters, maxit)
    mm_warm = _mk_mm(warm_precision) if warm_iters else None

    # factors as jit ARGUMENTS (not closures): closed-over arrays inline
    # as HLO literals and oversized programs break tunneled remote-compile
    @partial(jax.jit, static_argnames=())
    def run_(w_, binv_, u_, op_, Wri):
        W0 = lax.complex(Wri[0], Wri[1])

        def step(carry, _):
            Wc, dW, csum = carry

            def _it(mmfn):
                def it(k, st):
                    dW, _ = st
                    Wh = Wc + dW
                    Ph = _poisson_core(Wh, w_, binv_, u_, layout=layout,
                                       refine=refine, op=op_) * vareps
                    PW = mmfn(Ph, Wh)
                    PWc = PW - jnp.conj(jnp.swapaxes(PW, -1, -2))
                    return (mmfn(PW, Ph) + PWc, PWc)
                return it

            st = (dW, jnp.zeros_like(Wc))
            if warm_iters:
                st = lax.fori_loop(0, warm_iters, _it(mm_warm), st)
            dW, PWc = lax.fori_loop(0, maxit - warm_iters, _it(mm), st)
            upd = 2.0 * PWc
            y = upd - csum
            t = Wc + y
            csum = (t - Wc) - y
            return (t, dW, csum), None

        z = jnp.zeros_like(W0)
        (Wc, _, _), _ = lax.scan(step, (W0, z, z), None, length=steps)
        return jnp.abs(Wc).mean()

    def run(Wri):
        return run_(w, binv, u, op, Wri)

    @jax.jit
    def poisson_only_(w_, binv_, u_, op_, Wri, reps):
        W0 = lax.complex(Wri[0], Wri[1])

        def body(k, acc):
            P = _poisson_core(acc, w_, binv_, u_, layout=layout,
                              refine=refine, op=op_)
            return acc + 1e-12 * P  # keep the chain data-dependent

        out = lax.fori_loop(0, reps, body, W0)
        return jnp.abs(out).mean()

    def poisson_only(Wri, reps):
        return poisson_only_(w, binv, u, op, Wri, reps)

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
    assert np.isfinite(v), "NaN/Inf in benchmark state"
    # 5 timed runs: single runs through the shared tunnel vary ~10%, so
    # report the median and keep the spread (VERDICT r2 #9: quote
    # median +- spread, not a bare 3-4 significant digit best)
    times = []
    for _ in range(5):
        t0 = time.time()
        float(run(Wri))
        times.append(time.time() - t0)
    times = np.asarray(times)
    sec_per_step = max(float(np.median(times)) - latency, 1e-9) / steps
    spread_pct = float(
        100.0 * (times.max() - times.min()) / max(np.median(times), 1e-9)
    )
    measure_step.last_spread_pct = round(spread_pct, 1)

    # enough reps that the chained-solve wall time dwarfs the ~25 ms sync
    # latency even at small N (at N=512 a solve is ~0.1 ms); off-TPU the
    # sync latency is negligible and the TPU-sized rep count would run for
    # minutes, so cap it
    reps = max(50, int(2**25 / (N * N // 256)))
    if jax.default_backend() != "tpu":
        reps = min(reps, 100)
    float(poisson_only(Wri, reps))
    t0 = time.time()
    float(poisson_only(Wri, reps))
    poisson_ms = max(time.time() - t0 - latency, 1e-9) / reps * 1e3

    return sec_per_step, poisson_ms


def _passes_of(spec):
    p = _PASSES[spec.replace("_karatsuba", "")]
    return p * 0.75 if spec.endswith("_karatsuba") else p


def roofline(N, sec_per_step, poisson_ms, precision, maxit=MAXIT,
             warm_precision=None, warm_iters=None):
    peak_bf16, peak_hbm = _chip_peaks()
    model_flops = _flops_per_step(N, maxit, precision)
    achieved = model_flops / sec_per_step
    passes = _passes_of(precision)
    if warm_precision:
        # mixed schedule: per-iteration pass counts differ; account the
        # average so warm rows don't over-credit MFU
        wi = max(maxit - 2, 0) if warm_iters is None else warm_iters
        passes = (wi * _passes_of(warm_precision)
                  + (maxit - wi) * passes) / maxit
    # solve bytes per Poisson core: read 2 f32 planes + 3 f32 factor arrays
    # (w, binv, u broadcast over N rows) + write 2 planes, ~N^2 each
    solve_bytes = (2 + 3 + 2) * 4 * N * N
    measurable = poisson_ms >= 1e-3  # below ~1 us the timing is noise
    return {
        "model_tflops": round(achieved / 1e12, 2),
        "mfu_vs_bf16_peak": round(achieved * passes / peak_bf16, 3),
        "gemm_fraction_of_step": None,  # filled by caller if measured
        "solve_bw_gbs": round(solve_bytes / (poisson_ms * 1e-3) / 1e9, 1)
        if measurable else None,
        "solve_bw_util": round(solve_bytes / (poisson_ms * 1e-3) / peak_hbm, 3)
        if measurable else None,
    }


def run_sweep(only=None):
    """Out-of-band sweep: N x layout at scientific precision + roofline.
    ``only`` (substring) re-measures matching points, merging into the
    existing artifact."""
    results = {"config": "c64 planes, maxit=5, compsum, refine='m0', "
                         "production stepper",
               "device": None, "points": {}}
    if only and os.path.exists(SWEEP_PATH):
        with open(SWEEP_PATH) as f:
            results = json.load(f)
    import jax

    results["device"] = jax.devices()[0].device_kind
    cases = [
        (512, "highest", 200, None, None),
        (1024, "highest", 100, None, None),
        (2048, "highest", 30, None, None),
        (4096, "highest_karatsuba", 10, None, None),
        # karatsuba is the wall-clock winner at 4096 but counts fewer MXU
        # passes (4.5 vs 6), which deflates the utilization metric; the
        # 'highest' row shows the same hardware at 6-pass accounting.
        # GEMM-only at 4096 measures 0.88 MXU utilization either way; the
        # Thomas solve kernel alone runs at 0.71 of HBM peak (1.62 ms) -
        # the poisson-core number includes complex<->planes glue.
        (4096, "highest", 10, ("shear_pallas",), None),
        # single chip; unlocked by factor-argument programs (the serialized
        # compile request is ~0.05 MB vs ~8 GB of closed-over HLO literals)
        (8192, "highest_karatsuba", 5, ("shear_pallas",), None),
        # mixed-precision fixed-point schedule at the GEMM-bound sizes
        # (gemm_fraction_of_step 0.75-0.82 there): warm 3-pass iterations +
        # full-precision finish (accuracy: benchmarks/mixed_precision.json)
        (2048, "highest", 30, ("shear",), "high"),
        (4096, "highest_karatsuba", 10, ("shear_pallas",), "high_karatsuba"),
        (8192, "highest_karatsuba", 5, ("shear_pallas",), "high_karatsuba"),
        # warm at the smaller sizes: N=1024 backs the warm headline with a
        # sweep-protocol row; N=512 tests the prediction that the
        # latency-bound size pays little (gemm_fraction 0.33)
        (512, "highest", 200, ("shear",), "high"),
        (1024, "highest", 100, ("shear",), "high"),
    ]
    for N, prec, steps, only_layouts, warm in cases:
        layouts = ("wrapped", "shear", "pallas")
        if N >= 4096:
            # explicit 'pallas' redirects to the chunked kernel at this size
            # (stepper._resolve_layout); it is kept in the sweep as evidence
            # that the redirect compiles and runs on device (the round-2
            # artifact recorded the pre-redirect Mosaic failure)
            layouts = ("wrapped", "shear", "shear_pallas", "pallas")
        if only_layouts:
            layouts = only_layouts
        for layout in layouts:
            key = f"N{N}_{layout}"
            if only_layouts:  # precision-variant rows get a suffixed key
                key = f"N{N}_{layout}_{prec}"
            if warm:
                key = f"N{N}_{layout}_warm"
            if only and only not in key:
                continue
            try:
                # production config for the production layout; the
                # alternative layouts are compared at their best config
                # (refine=0 - the m0 write-back interacts badly with the
                # barrel-unpack fusion on row layouts: 0.29 -> 5.36 ms
                # poisson at N=1024)
                sec, pms = measure_step(
                    N, precision=prec, layout=layout, steps=steps,
                    refine="m0" if layout.startswith("shear") else 0,
                    warm_precision=warm)
            except Exception as exc:  # record and continue the sweep
                results["points"][key] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
                print(f"{key}: FAILED {exc}", file=sys.stderr)
                continue
            entry = {
                "precision": prec,
                "warm_precision": warm,
                "refine": "m0" if layout.startswith("shear") else 0,
                "steps_per_sec": round(1.0 / sec, 2),
                "run_spread_pct": getattr(measure_step, "last_spread_pct", None),
                "poisson_core_ms": round(pms, 3),
            }
            entry.update(roofline(N, sec, pms, prec, warm_precision=warm))
            # maxit poisson cores per step; the rest is the GEMM phase
            entry["gemm_fraction_of_step"] = round(
                max(0.0, 1.0 - MAXIT * pms * 1e-3 / sec), 3
            )
            results["points"][key] = entry
            print(f"{key}: {entry}", file=sys.stderr)
            # write after every point: a watchdog kill must not lose the
            # measurements already taken
            os.makedirs(os.path.dirname(SWEEP_PATH), exist_ok=True)
            with open(SWEEP_PATH, "w") as f:
                json.dump(results, f, indent=2)
    os.makedirs(os.path.dirname(SWEEP_PATH), exist_ok=True)
    with open(SWEEP_PATH, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"sweep_written": SWEEP_PATH}))


def main():
    # Watchdog: the TPU tunnel in this environment can wedge indefinitely
    # after failures; never hang the driver.
    import signal

    def _timeout(signum, frame):
        raise TimeoutError("TPU benchmark timed out (device tunnel wedged)")

    signal.signal(signal.SIGALRM, _timeout)
    per_try = int(os.environ.get("QUFLOW_BENCH_TIMEOUT", "480"))
    res = None
    last_exc = None
    for attempt in range(2):
        signal.alarm(per_try)
        try:
            res = measure_step(
                N_HEADLINE,
                precision=PRECISION,
                layout=os.environ.get("QUFLOW_BENCH_LAYOUT", "auto"),
                steps=int(os.environ.get("QUFLOW_BENCH_STEPS", "100")),
                # the production f32 default: targeted m=0 f64-residual
                # refinement (build_step_fn refine=None -> 'm0');
                # QUFLOW_BENCH_REFINE=0/1/m0 overrides
                refine=(lambda v: int(v) if v.isdigit() else v)(
                    os.environ.get("QUFLOW_BENCH_REFINE", "m0")
                ),
                warm_precision=WARM,
            )
            break
        except Exception as exc:
            last_exc = exc
            time.sleep(90)  # tunnel sometimes recovers after a quiet period
        finally:
            signal.alarm(0)
    if res is None:
        print(
            json.dumps(
                {
                    "metric": f"isomp_steps_per_sec_N{N_HEADLINE}",
                    "value": 0.0,
                    "unit": "steps/s",
                    "vs_baseline": 0.0,
                    "error": f"{type(last_exc).__name__}: {last_exc}"[:160],
                }
            )
        )
        return
    tpu_sec, poisson_ms = res

    vs_baseline = None
    try:
        from benchmarks.cpu_baseline import get_baseline

        cpu_sec = get_baseline(N_HEADLINE, maxit=MAXIT)
        vs_baseline = cpu_sec / tpu_sec  # speedup over reference CPU path
    except Exception:
        vs_baseline = float("nan")

    out = {
        "metric": f"isomp_steps_per_sec_N{N_HEADLINE}",
        "value": round(1.0 / tpu_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline == vs_baseline else None,
        "precision": PRECISION,
        "warm_precision": WARM,
        "run_spread_pct": getattr(measure_step, "last_spread_pct", None),
        "mfu": roofline(N_HEADLINE, tpu_sec, poisson_ms, PRECISION,
                        warm_precision=WARM),
    }
    # sweep FIRST, compact headline LAST: the driver keeps only the tail of
    # stdout, so the headline must be the final line (round-4's BENCH_r04
    # lost its own headline to the embedded-sweep ordering)
    if os.path.exists(SWEEP_PATH):
        with open(SWEEP_PATH) as f:
            print(json.dumps({"sweep": json.load(f)}))
    print(json.dumps(out))


if __name__ == "__main__":
    if "--sweep" in sys.argv:
        idx = sys.argv.index("--sweep")
        only = sys.argv[idx + 1] if len(sys.argv) > idx + 1 else None
        run_sweep(only=only)
    else:
        main()
