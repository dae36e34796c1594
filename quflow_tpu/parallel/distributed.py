"""Multi-host bring-up and sharded checkpointing.

The reference's only multi-machine mechanism is file-level (rsync + ssh +
Slurm, one node per job; reference quflow/cluster.py, SURVEY.md section 2.7).
Here multi-host runs use jax.distributed over ICI/DCN:

* ``initialize()`` wraps jax.distributed.initialize (env-driven: works under
  TPU pod runtimes and plain coordinator/num_processes settings);
* ``global_mesh()`` builds the ('dp','i','j') mesh over all global devices,
  with the ensemble axis preferentially mapped across hosts (DCN) and the
  tensor axes within a slice (ICI), following the standard
  data-across-DCN / tensor-across-ICI recipe;
* ``save_checkpoint``/``load_checkpoint`` store device-resident (possibly
  sharded) split-complex state via orbax when available, with a numpy
  fallback for single-host runs.  The portable HDF5 contract
  (sim.QuSimulation) remains the archival format; these checkpoints are the
  fast in-flight representation.
"""

from __future__ import annotations

import os

import numpy as np
import jax

from .mesh import make_mesh

__all__ = ["initialize", "global_mesh", "save_checkpoint", "load_checkpoint"]


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Bring up jax.distributed.  No-ops on a single process with no
    coordinator configured."""
    if num_processes is None and coordinator_address is None and (
        "COORDINATOR_ADDRESS" not in os.environ
        and "JAX_COORDINATOR_ADDRESS" not in os.environ
    ):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(dp=None):
    """('dp','i','j') mesh over all global devices; by default the ensemble
    axis spans the process (host) count, so dp traffic rides DCN and tensor
    traffic rides ICI."""
    if dp is None:
        dp = max(1, jax.process_count())
        if len(jax.devices()) % dp:
            dp = 1
    return make_mesh(jax.devices(), dp=dp)


def save_checkpoint(path, state, step=0):
    """Save a pytree of (possibly sharded) arrays.

    Uses orbax when importable; falls back to a local ``.npz`` only on a
    single process (``ImportError`` only).  On a multi-host run the fallback
    would silently write per-host garbage, and any orbax *save* failure is a
    real failure - both raise.
    """
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        if jax.process_count() > 1:
            raise RuntimeError(
                "orbax is required for multi-host checkpointing "
                f"(process_count={jax.process_count()}); a local .npz "
                "fallback would write per-host shards, not a global "
                "checkpoint."
            )
        os.makedirs(path, exist_ok=True)
        flat, treedef = jax.tree.flatten(state)
        np.savez(
            os.path.join(path, f"step_{step}.npz"),
            *[np.asarray(x) for x in flat],
        )
        return os.path.join(path, f"step_{step}.npz")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(f"{path}/step_{step}"), state, force=True)
    ckptr.wait_until_finished()
    return f"{path}/step_{step}"


def load_checkpoint(path, like, step=0):
    """Load a checkpoint saved by save_checkpoint; ``like`` is a pytree of
    abstract or concrete arrays fixing structure/sharding."""
    # orbax first: an npz of the same step may be a stale single-host
    # fallback written before orbax became available
    orbax_dir = os.path.abspath(f"{path}/step_{step}")
    if os.path.isdir(orbax_dir):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(orbax_dir, like)
    npz = os.path.join(path, f"step_{step}.npz")
    if os.path.exists(npz):  # written by the single-host fallback
        data = np.load(npz)
        flat, treedef = jax.tree.flatten(like)
        arrs = [data[f"arr_{i}"] for i in range(len(flat))]
        return jax.tree.unflatten(treedef, arrs)
    raise FileNotFoundError(f"no checkpoint for step {step} under {path}")
