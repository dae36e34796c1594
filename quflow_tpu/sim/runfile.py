"""Standalone runfile generation.

Parity with reference quflow/simulation.py:485-577 ``create_runfile``: emits
a self-contained CLI script that opens the simulation file, resumes from the
last state, runs `solve`, and optionally renders an animation.  Where the
reference's runfile auto-selects its CUDA path when cupy is available
(simulation.py:508-562), this one auto-selects the TPU production stepper
when a TPU backend is present.
"""

from __future__ import annotations

import os

__all__ = ["create_runfile"]

_RUNFILE_TEMPLATE = '''\
#!/usr/bin/env python
"""Auto-generated quflow_tpu runfile for {simname}."""
import argparse

parser = argparse.ArgumentParser(description="Run simulation {simname}")
parser.add_argument("-f", "--filename", default="{filename}")
parser.add_argument("-s", "--simulate", action="store_true", default={simulate})
parser.add_argument("-a", "--animate", action="store_true", default={animate})
parser.add_argument("--simtime", type=float, default=None)
parser.add_argument("--tol", default="auto")
parser.add_argument("--compsum", action="store_true", default=False)
parser.add_argument("--maxit", type=int, default=10)
args = parser.parse_args()

import numpy as np
import quflow_tpu as qf
from quflow_tpu.sim import QuSimulation, solve

sim = QuSimulation(args.filename)

if args.simulate:
    kwargs = {{}}
    if args.simtime is not None:
        kwargs["simtime"] = args.simtime
        kwargs["steps"] = None
    tol = args.tol if args.tol == "auto" else float(args.tol)
    import jax
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    if on_tpu:
        # accelerator path: branch-free device-resident stepper (the
        # counterpart of the reference runfile auto-selecting IsompCUDA)
        from quflow_tpu.parallel.stepper import IsompTPU

        kwargs["integrator"] = IsompTPU(maxit=args.maxit, compsum=args.compsum)
        with open("{progress_filename}", "w") as progress_file:
            solve(sim, progress_bar=True, progress_file=progress_file, **kwargs)
    else:
        with open("{progress_filename}", "w") as progress_file:
            solve(
                sim,
                tol=tol,
                compsum=args.compsum,
                maxit=args.maxit,
                progress_bar=True,
                progress_file=progress_file,
                **kwargs,
            )

if args.animate:
    try:
        from quflow_tpu import graphics
        graphics.create_animation(
            "{simname}.mp4", sim["fun"], progress_file="{anim_progress_filename}"
        )
    except Exception as exc:  # animation is best-effort on headless nodes
        print("Animation skipped:", exc)
'''


def create_runfile(sim, runfilename=None, simulate=True, animate=True):
    """Write a standalone runfile next to the simulation file; returns path."""
    filename = sim.filename if hasattr(sim, "filename") else str(sim)
    base = os.path.basename(filename).replace(".hdf5", "").replace(".h5", "")
    dirname = os.path.dirname(filename)
    if runfilename is None:
        runfilename = os.path.join(dirname, base + "_runfile.py")
    content = _RUNFILE_TEMPLATE.format(
        simname=base,
        filename=os.path.basename(filename),
        simulate=simulate,
        animate=animate,
        progress_filename=base + "_progress.txt",
        anim_progress_filename=base + "_anim_progress.txt",
    )
    with open(runfilename, "w") as f:
        f.write(content)
    os.chmod(runfilename, 0o755)
    return runfilename
