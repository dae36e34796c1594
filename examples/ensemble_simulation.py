#!/usr/bin/env python
"""Ensemble (data-parallel) simulation demo: a batch of perturbed initial
conditions stepped together by one jitted program, sharded over the 'dp'
mesh axis - the capability the reference lacks (its stacked states solve
only component 0; reference cpu.py:672-699, SURVEY.md section 2.7).

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/ensemble_simulation.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import quflow_tpu as qf
    from quflow_tpu.models import EulerFlow
    from quflow_tpu.parallel import make_mesh, build_step_fn
    from quflow_tpu.parallel.stepper import to_planes, from_planes

    N, E, lmax = 64, 4, 10
    flow = EulerFlow(N=N)
    base = qf.analysis.random_shr(lmax=lmax, seed=42)
    rng = np.random.RandomState(0)
    states = np.stack(
        [
            qf.shr2mat(base + 1e-3 * rng.randn(base.shape[0]), N=N)
            for _ in range(E)
        ]
    )

    ndev = len(jax.devices())
    dp = E if ndev % E == 0 and ndev >= E else 1
    mesh = make_mesh(jax.devices(), dp=dp) if ndev > 1 else None
    dt = 0.25 * flow.hbar
    fn = build_step_fn(
        N, dt, steps=100, maxit=5, dtype=np.complex128, compsum=True,
        mesh=mesh, batched=True, planes_io=True,
    )

    Wp = jnp.asarray(to_planes(states))
    if mesh is not None:
        sh = NamedSharding(mesh, P(None, "dp", "i", "j"))
        Wp = jax.device_put(Wp, sh)
    z = jnp.zeros_like(Wp)
    out, _, _ = fn(Wp, z, z)
    final = from_planes(np.asarray(out))

    print(f"ensemble of {E} trajectories, N={N}, 100 steps, "
          f"{ndev} devices (dp={dp if mesh else 1})")
    for e in range(E):
        en = float(qf.energy_euler(final[e]))
        drift = np.abs(
            np.sort(np.linalg.eigvalsh(-1j * final[e]))
            - np.sort(np.linalg.eigvalsh(-1j * states[e]))
        ).max()
        print(f"  traj {e}: energy {en:.6f}, Casimir drift {drift:.2e}")
    spread = np.abs(final - final[0]).max()
    print(f"ensemble spread after 100 steps: {spread:.3e}")


if __name__ == "__main__":
    main()
