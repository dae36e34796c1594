"""Worker process for the 2-process jax.distributed test.

Launched by tests/test_distributed.py as
``python distributed_worker.py <port> <pid> <nprocs> <ckdir>``.
Each process exposes 4 virtual CPU devices -> 8 global devices; the worker
brings up jax.distributed, builds the global ('dp','i','j') mesh with dp
across processes (the DCN analog), runs a sharded batched step, compares the
gathered global result against a locally-computed single-device reference,
and round-trips an orbax checkpoint of the sharded state.
"""

import os
import sys

port, pid, nprocs, ckdir = (
    sys.argv[1],
    int(sys.argv[2]),
    int(sys.argv[3]),
    sys.argv[4],
)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from quflow_tpu.parallel import distributed as dist
from quflow_tpu.parallel.shard_pack import flat_mesh_view
from quflow_tpu.parallel.stepper import build_step_fn, to_planes, from_planes
from quflow_tpu.ops.geometry import hbar

assert dist.initialize(f"localhost:{port}", nprocs, pid)
assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

mesh = dist.global_mesh()
assert mesh.shape["dp"] == nprocs  # ensemble across processes (DCN analog)

N, E = 32, 2
rng = np.random.RandomState(11)
W = rng.randn(E, N, N) + 1j * rng.randn(E, N, N)
W = W - np.conj(np.swapaxes(W, -1, -2))
dt = 0.2 * hbar(N)

fn = build_step_fn(
    N, dt, steps=3, maxit=3, dtype=np.complex128, compsum=False,
    mesh=mesh, batched=True, planes_io=True,
)
fm = flat_mesh_view(mesh)
sh = NamedSharding(fm, P(None, "dp", "tp", None))
Wj = jax.device_put(jnp.asarray(to_planes(W)), sh)
z = jax.device_put(jnp.zeros_like(Wj), sh)
out, _, _ = fn(Wj, z, z)
jax.block_until_ready(out)

from jax.experimental import multihost_utils

gathered = from_planes(np.asarray(multihost_utils.process_allgather(out, tiled=True)))

# local single-device reference, computed independently in every process
fn1 = build_step_fn(
    N, dt, steps=3, maxit=3, dtype=np.complex128, compsum=False, planes_io=True
)
for e in range(E):
    Wp = jnp.asarray(to_planes(W[e]))
    ze = jnp.zeros_like(Wp)
    ref = from_planes(np.asarray(fn1(Wp, ze, ze)[0]))
    np.testing.assert_allclose(gathered[e], ref, atol=1e-11)

# sharded checkpoint round-trip through orbax
path = dist.save_checkpoint(ckdir, {"W": out}, step=3)
restored = dist.load_checkpoint(ckdir, {"W": out}, step=3)
np.testing.assert_array_equal(
    np.asarray(multihost_utils.process_allgather(restored["W"], tiled=True)),
    np.asarray(multihost_utils.process_allgather(out, tiled=True)),
)

multihost_utils.sync_global_devices("done")
print(f"WORKER_OK pid={pid}")
