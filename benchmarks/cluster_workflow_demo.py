#!/usr/bin/env python
"""N=1024 cluster-workload demo: HDF5 simulation + checkpoint/restart cycle
on the TPU fast path (BASELINE.json config #3, mirroring the reference's
basic-cluster-simulation notebook workflow: QuSimulation file, solve in two
sessions, energy/enstrophy logger series, restart continuity).

Run (device):  timeout 1800 python benchmarks/cluster_workflow_demo.py
Writes benchmarks/cluster_workflow.json + /tmp state file.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "cluster_workflow.json")


def main():
    import numpy as np
    import jax
    import quflow_tpu as qf
    from quflow_tpu.sim import QuSimulation
    from quflow_tpu.parallel.stepper import IsompTPU

    N = int(os.environ.get("QUFLOW_DEMO_N", "1024"))
    steps_leg = int(os.environ.get("QUFLOW_DEMO_STEPS", "1000"))
    fname = "/tmp/cluster_workflow_demo.hdf5"
    if os.path.exists(fname):
        os.remove(fname)

    W0 = qf.shr2mat(qf.random_shr(lmax=10, seed=42).astype(np.float64), N=N)
    W0 = np.asarray(W0).astype(np.complex64)
    dt = 0.25 * qf.hbar(N)

    sim = QuSimulation(
        fname, overwrite=True, state=W0, qutypes={"mat": np.complex64},
        loggers={"energy": qf.energy_euler, "enstrophy": qf.enstrophy},
    )
    # warm=False: pure function per call -> bit-exact restart
    integ = IsompTPU(maxit=5, precision="highest", dtype=np.complex64, warm=False)

    # session 1
    t0 = time.time()
    qf.solve(W0.copy(), dt=dt, steps=steps_leg, steps_out=steps_leg // 10,
             integrator=integ, callback=sim, progress_bar=False)
    leg1 = time.time() - t0

    # session 2: resume from the file exactly like a fresh cluster job
    sim2 = QuSimulation(fname)
    t0 = time.time()
    qf.solve(sim2, dt=dt, steps=steps_leg, steps_out=steps_leg // 10,
             integrator=IsompTPU(maxit=5, dtype=np.complex64, warm=False),
             progress_bar=False)
    leg2 = time.time() - t0

    # straight-through reference trajectory with the same chunk cadence
    straight = IsompTPU(maxit=5, dtype=np.complex64, warm=False)
    Wref = W0.copy()
    for _ in range(2 * steps_leg // (steps_leg // 10)):
        Wref = straight(Wref, dt, steps=steps_leg // 10)
    sim3 = QuSimulation(fname)
    Wfile = np.asarray(sim3["mat", -1])
    restart_dev = float(np.abs(Wfile - Wref).max())

    energy = np.asarray(sim3["energy"])
    enstrophy = np.asarray(sim3["enstrophy"])
    res = {
        "device": jax.devices()[0].device_kind,
        "N": N, "steps_per_leg": steps_leg,
        "restart_vs_straight_max_abs": restart_dev,
        "energy_series": [round(float(x), 9) for x in energy],
        "enstrophy_series": [round(float(x), 9) for x in enstrophy],
        "energy_drift": float(abs(energy[-1] - energy[0])),
        "enstrophy_drift": float(abs(enstrophy[-1] - enstrophy[0])),
        "leg1_steps_per_sec": round(steps_leg / leg1, 1),
        "leg2_steps_per_sec": round(steps_leg / leg2, 1),
        "snapshots_in_file": int(len(sim3["time"])),
    }
    print(json.dumps({k: v for k, v in res.items()
                      if not k.endswith("series")}, indent=1))
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    print(f"written {OUT}")


if __name__ == "__main__":
    main()
