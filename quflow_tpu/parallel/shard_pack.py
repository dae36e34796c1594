"""Communication-minimal sharded diagonal relayout (dense <-> wrapped pack).

The solve stage of the isospectral step needs the wrapped diagonal layout
V[m, i] = W[(m+i) % N, i] (ops/diagpack.mat2wrapped).  On a single chip the
log2(N)-stage barrel shifter builds it with pure VPU traffic; under a mesh
with the row axis sharded, every barrel stage would cross shard boundaries,
and the round-1 fallback (XLA gather/scatter index maps) serializes on TPU
(~70 ms at N=1024 vs 0.28 ms for the whole solve).

Here the column-dependent roll-by-i is decomposed by i = q*c + t
(c = N/n_shards rows per shard, q = i // c, t = i % c) into

  1. a *fine* stage: cyclic roll by t inside each row block (local barrel
     over log2(c) stages) plus one ``lax.ppermute`` halo exchange with the
     next shard and an elementwise select, and
  2. a *coarse* stage: a block-granular roll by q*c, which is exactly one
     ``lax.all_to_all`` over column groups (with local flip/roll chunk
     rotations by the device index).

Total communication per relayout: one neighbor ppermute of the local block
(N^2/s elements) + one all-to-all (N^2 * (s-1)/s elements) - O(1)
collectives, ~1x matrix volume, the minimum possible for a layout change
whose diagonals cross every shard.  This replaces the reference's
single-device CUDA gather kernels (reference quflow/experimental/
cuda.py:7-120 extract_diag/reorder_diag) with a mesh-native design.

All functions are meant to be called inside jit via ``jax.shard_map`` over a
mesh whose row axis is a single named axis (the stepper builds a flattened
('dp', 'tp') view of the user mesh, since lax.all_to_all does not accept
axis-name tuples).  Leading batch dims pass through untouched.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["flat_mesh_view", "pack_wrapped_sharded", "unpack_wrapped_sharded"]


def flat_mesh_view(mesh):
    """('dp', 'i', 'j') mesh -> same devices viewed as ('dp', 'tp').

    Device order is preserved, so NamedShardings on either view describe the
    same physical placement (P('dp', ('i','j'), ...) == P('dp', 'tp', ...)).
    A mesh already shaped ('dp', 'tp') passes through; a mesh without 'dp'
    gets a singleton dp axis.
    """
    if tuple(mesh.axis_names) == ("dp", "tp"):
        return mesh
    dp = mesh.shape.get("dp", 1)
    return Mesh(mesh.devices.reshape(dp, -1), ("dp", "tp"))


def _fine_masks(N, c):
    """Static per-stage column masks for the local barrel (roll by t = i % c)
    and the halo/carry select masks."""
    t = np.arange(N) % c
    nbits = max(1, (c - 1).bit_length())
    stage = [((t >> b) & 1).astype(bool)[None, :] for b in range(nbits)]
    p = np.arange(c)[:, None]
    carry = (p + t[None, :]) >= c  # fine roll wraps into the next block
    before = p < t[None, :]        # inverse roll wraps into the previous block
    return stage, carry, before


def _pack_local(Wd, *, s, c, N, axis):
    """Local block (..., c, N) -> wrapped block (..., c, N) of V."""
    stage, carry, _ = _fine_masks(N, c)
    A = Wd
    if c > 1:
        for b, mask in enumerate(stage):
            A = jnp.where(mask, jnp.roll(A, -(1 << b), axis=-2), A)
        X = lax.ppermute(A, axis, [((k + 1) % s, k) for k in range(s)])
        A = jnp.where(carry, X, A)
    if s == 1:
        return A
    d = lax.axis_index(axis)
    G = A.reshape(A.shape[:-1] + (s, c))     # column groups on axis -2
    H = jnp.roll(jnp.flip(G, axis=-2), d + 1, axis=-2)
    ga = H.ndim - 2
    R = lax.all_to_all(H, axis, split_axis=ga, concat_axis=ga, tiled=True)
    F = jnp.roll(R, -d, axis=-2)
    return F.reshape(A.shape)


def _unpack_local(Vd, *, s, c, N, axis):
    """Inverse of :func:`_pack_local`."""
    stage, _, before = _fine_masks(N, c)
    A = Vd
    if s > 1:
        d = lax.axis_index(axis)
        G = A.reshape(A.shape[:-1] + (s, c))
        H = jnp.roll(G, d, axis=-2)
        ga = H.ndim - 2
        R = lax.all_to_all(H, axis, split_axis=ga, concat_axis=ga, tiled=True)
        F = jnp.roll(jnp.flip(R, axis=-2), d + 1, axis=-2)
        A = F.reshape(A.shape)
    if c > 1:
        B = A
        for b, mask in enumerate(stage):
            B = jnp.where(mask, jnp.roll(B, 1 << b, axis=-2), B)
        X = lax.ppermute(B, axis, [((k - 1) % s, k) for k in range(s)])
        A = jnp.where(before, X, B)
    return A


def _apply(fn, W, mesh, batched):
    fmesh = flat_mesh_view(mesh)
    s = fmesh.shape["tp"]
    N = W.shape[-1]
    if N % s:
        raise ValueError(f"N={N} must be divisible by the shard count {s}")
    lead = ("dp",) if batched else ()
    spec = P(*lead, "tp", None)
    f = shard_map(
        partial(fn, s=s, c=N // s, N=N, axis="tp"),
        mesh=fmesh,
        in_specs=(spec,),
        out_specs=spec,
    )
    return f(W)


def pack_wrapped_sharded(W, mesh, batched=False):
    """Dense (..., N, N) -> wrapped diagonal rows V[m, i] = W[(m+i)%N, i],
    both sharded P([dp,] rows, None) over the mesh.  O(1) collectives."""
    return _apply(_pack_local, W, mesh, batched)


def unpack_wrapped_sharded(V, mesh, batched=False):
    """Wrapped diagonal rows -> dense; inverse of pack_wrapped_sharded."""
    return _apply(_unpack_local, V, mesh, batched)
