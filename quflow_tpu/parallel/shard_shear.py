"""Sharded shear solve: neighbor-exchange relayout + distributed affine scan.

The shear layout (ops/diagpack.mat2shear) is a row-major reshape of the dense
matrix: G = concat(flat(W), zeros(N)) viewed as (N, N+1).  Because it is a
pure reshape, the relayout between a row-sharded dense matrix and the
row-sharded shear view moves only the *boundary overlap* between shards:
shard k's shear rows [k*c, (k+1)*c) cover flat range
[k*c*(N+1), (k+1)*c*(N+1)), which lies inside dense shards k and k+1.  One
``lax.ppermute`` from the next shard (the missing source of the last shard
yields exactly the zero pad) plus a local dynamic slice builds the packed
layout - ~1x matrix volume of neighbor traffic, strictly cheaper than the
wrapped-path relayout (shard_pack.py: ppermute + all-to-all).

The price is that the shear systems run along *columns* (axis -2), i.e.
across the sharded axis.  The tridiagonal solve is two first-order affine
recurrences (ops/tridiag.py), so the standard distributed-scan decomposition
applies: each shard scans its local block (composing both the affine
coefficient prefix and the zero-carry prefix value), the per-shard summaries
are all-gathered (s * (N+1) elements - negligible), the exclusive cross-shard
carry is folded locally, and the local prefix is corrected in one fused
elementwise pass:  y = y0 + Cprefix * carry_in.

Collectives per Poisson solve: 2 ppermute (pack/unpack) + 2 all_gather
(forward/backward carries) + 1 psum (trace projection) - all O(1), with the
all_gathers carrying O(s*N) elements.  The m0 (main-diagonal) refinement
gathers the N-element column 0 to every shard (tiny) and applies the
semiseparable correction redundantly, sidestepping the scan-row-layout
write-back pathology documented in parallel/stepper.py.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from .shard_pack import flat_mesh_view

__all__ = [
    "pack_shear_sharded",
    "unpack_shear_sharded",
    "solve_shear_sharded",
]


def _lead(batched, lead=None):
    """Spec entries for the leading (non-row) axes.  ``lead`` overrides the
    batched default - e.g. ``(None,)`` for split-real f64 planes (2, N, N)
    or ``(None, "dp")`` for batched planes (2, E, N, N) (the double-word
    stepper's state layout); the shard_map bodies are rank-agnostic."""
    if lead is not None:
        return tuple(lead)
    return ("dp",) if batched else ()


def _pack_local(Wl, *, s, c, N, axis):
    """Dense rows (..., c, N) -> shear rows (..., c, N+1) of this shard."""
    flat = jnp.reshape(Wl, Wl.shape[:-2] + (c * N,))
    if s > 1:
        recv = lax.ppermute(flat, axis, [(k + 1, k) for k in range(s - 1)])
    else:
        recv = jnp.zeros_like(flat)
    H = jnp.concatenate([flat, recv], axis=-1)  # covers G[k*c*N : (k+2)*c*N)
    k = lax.axis_index(axis)
    start = k * c  # = k*c*(N+1) - k*c*N
    seg = lax.dynamic_slice_in_dim(H, start, c * (N + 1), axis=-1)
    return jnp.reshape(seg, Wl.shape[:-2] + (c, N + 1))


def _unpack_local(Vl, *, s, c, N, axis):
    """Inverse of :func:`_pack_local`."""
    flat = jnp.reshape(Vl, Vl.shape[:-2] + (c * (N + 1),))
    if s > 1:
        recv = lax.ppermute(flat, axis, [(k, k + 1) for k in range(s - 1)])
    else:
        recv = jnp.zeros_like(flat)
    H = jnp.concatenate([recv, flat], axis=-1)
    k = lax.axis_index(axis)
    start = c * (N + 1) - k * c
    seg = lax.dynamic_slice_in_dim(H, start, c * N, axis=-1)
    return jnp.reshape(seg, Vl.shape[:-2] + (c, N))


def pack_shear_sharded(W, mesh, batched=False, tracefree=True, lead=None):
    """Dense (..., N, N) -> shear rows (..., N, N+1), both sharded
    P([dp,] rows, None).  One neighbor ppermute (+ one psum for the trace).
    ``lead`` overrides the leading-axes spec (see _lead)."""
    fmesh = flat_mesh_view(mesh)
    s = fmesh.shape["tp"]
    N = W.shape[-1]
    if N % s:
        raise ValueError(f"N={N} must be divisible by the shard count {s}")
    spec = P(*_lead(batched, lead), "tp", None)

    def fn(Wl):
        D = _pack_local(Wl, s=s, c=N // s, N=N, axis="tp")
        if tracefree:
            # column 0 of the GLOBAL view holds the main diagonal; its mean
            # is a cross-shard sum (one psum of a scalar per batch element)
            local = jnp.sum(D[..., :, 0], axis=-1, keepdims=True)
            tr = lax.psum(local, "tp") / N
            mask = np.zeros((1, N + 1), dtype=bool)
            mask[0, 0] = True
            D = D - jnp.where(mask, tr[..., None], jnp.zeros_like(tr[..., None]))
        return D

    return shard_map(fn, mesh=fmesh, in_specs=(spec,), out_specs=spec)(W)


def unpack_shear_sharded(V, mesh, batched=False, lead=None):
    """Shear rows -> dense; inverse of pack_shear_sharded."""
    fmesh = flat_mesh_view(mesh)
    s = fmesh.shape["tp"]
    N = V.shape[-2]
    spec = P(*_lead(batched, lead), "tp", None)
    fn = partial(_unpack_local, s=s, c=N // s, N=N, axis="tp")
    return shard_map(fn, mesh=fmesh, in_specs=(spec,), out_specs=spec)(V)


def _dist_affine_scan(cf, v, axis_name, s, reverse=False):
    """Distributed inclusive affine scan along axis -2 of the local block.

    Evaluates y_i = cf_i * y_{i-1} + v_i (i global across shards, carry 0
    before the first element; ``reverse`` runs it bottom-up).  cf and v are
    the local (..., c, M) blocks; the result is the local block of y.
    """
    ax = -2

    def comb(p, q):
        cp, vp = p
        cq, vq = q
        return cp * cq, cq * vp + vq

    if reverse:
        cf = jnp.flip(cf, ax)
        v = jnp.flip(v, ax)
    Cloc, yloc = lax.associative_scan(comb, (cf, v), axis=cf.ndim + ax)
    # per-shard summary = last element of the composed prefix
    Csum = Cloc[..., -1:, :]
    ysum = yloc[..., -1:, :]
    if s > 1:
        # all-gather the s summaries, fold the exclusive prefix locally
        Cg = lax.all_gather(Csum, axis_name)    # (s, ..., 1, M)
        yg = lax.all_gather(ysum, axis_name)
        k = lax.axis_index(axis_name)

        def fold(i, carry):
            # visit shards in scan order: ascending for forward, descending
            # for reverse; include only shards strictly before this one in
            # that order
            j = (s - 1 - i) if reverse else i
            take = (j > k) if reverse else (j < k)
            Ck, yk = carry
            Cj = jnp.where(take, Cg[j], jnp.ones_like(Cg[j]))
            yj = jnp.where(take, yg[j], jnp.zeros_like(yg[j]))
            return (Cj * Ck, Cj * yk + yj)

        ones = jnp.ones_like(Csum)
        zeros = jnp.zeros_like(ysum)
        _, y_in = lax.fori_loop(0, s, fold, (ones, zeros))
        y = yloc + Cloc * y_in
    else:
        y = yloc
    if reverse:
        y = jnp.flip(y, ax)
    return y


def solve_shear_sharded(w, binv, u, D, mesh, batched=False, m0_op=None,
                        ham=("poisson", ()), lead=None):
    """Solve the shear-layout batched tridiagonal systems with the rows
    (recurrence axis) sharded over the mesh.

    ``w``/``binv``/``u`` are the column-transposed (N, N+1) factors
    (stepper._shear_factors_cached); D is the packed rhs (..., N, N+1)
    sharded P([dp,] rows, None).  Real or complex rhs.

    ``m0_op``: the f64 channel-first (2, N, N+1) shear operator enables one
    f64-residual semiseparable refinement of the ill-conditioned m=0 system
    (refine='m0' under the mesh): the N-element column 0 is all-gathered to
    every shard (negligible traffic), the correction is computed redundantly
    and each shard adds its own chunk - no sharded cumsum, no scatter, which
    sidesteps the scan-row-layout m0 write-back pathology (see
    parallel/stepper.py NOTE).  ``ham`` = (kind, params) names the operator
    family of ``m0_op`` (the cached semiseparable inverse must match).
    """
    from ..ops.tridiag import m0_correction

    fmesh = flat_mesh_view(mesh)
    s = fmesh.shape["tp"]
    N = D.shape[-2]
    c = N // s
    spec = P(*_lead(batched, lead), "tp", None)
    fspec = P("tp", None)
    rd = jnp.asarray(D).real.dtype
    w = jnp.asarray(w, dtype=rd)
    binv = jnp.asarray(binv, dtype=rd)
    u = jnp.asarray(u, dtype=rd)
    if m0_op is not None:
        m0_main = jnp.asarray(m0_op[0, :, 0])
        m0_off = jnp.asarray(m0_op[1, :, 0])

    def fn(wl, binvl, ul, Dl):
        def solve_real(d):
            cf = jnp.broadcast_to(-wl, d.shape)
            y = _dist_affine_scan(cf, d, "tp", s)
            g = y * binvl
            cb = jnp.broadcast_to(-ul, d.shape)
            return _dist_affine_scan(cb, g, "tp", s, reverse=True)

        if jnp.iscomplexobj(Dl):
            x = lax.complex(solve_real(Dl.real), solve_real(Dl.imag))
        else:
            x = solve_real(Dl)
        if m0_op is not None:
            # column 0 (the m=0 system) replicated to every shard
            x0 = lax.all_gather(x[..., :, 0], "tp", axis=x.ndim - 2, tiled=True)
            d0 = lax.all_gather(Dl[..., :, 0], "tp", axis=x.ndim - 2, tiled=True)
            corr = m0_correction(x0, d0, m0_main, m0_off, ham=ham)
            k = lax.axis_index("tp")
            corr_loc = lax.dynamic_slice_in_dim(corr, k * c, c, axis=-1)
            mask = np.zeros((1, x.shape[-1]), dtype=bool)
            mask[0, 0] = True
            x = x + jnp.where(mask, corr_loc[..., :, None],
                              jnp.zeros((), x.dtype))
        return x

    return shard_map(
        fn, mesh=fmesh, in_specs=(fspec, fspec, fspec, spec), out_specs=spec
    )(w, binv, u, D)
