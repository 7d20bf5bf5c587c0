"""Collectives with explicitly-defined differentiation.

``all_reduce_sum(axis)`` is a psum whose backward pass psums the
cotangents.  That is the mathematically required rule for the
edge-partitioned aggregation: the psum's output feeds *device-varying*
downstream computation (each device scores its own batch shard), so the
cotangent of the shared aggregate is the sum of every device's cotangent
— made explicit via custom_vjp instead of relying on the ambient
psum transpose rule.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable

import jax


@lru_cache(maxsize=None)
def all_reduce_sum(axis_name: str) -> Callable[[jax.Array], jax.Array]:
    @jax.custom_vjp
    def psum(x):
        return jax.lax.psum(x, axis_name)

    def fwd(x):
        return psum(x), None

    def bwd(_, ct):
        return (jax.lax.psum(ct, axis_name),)

    psum.defvjp(fwd, bwd)
    return psum


@lru_cache(maxsize=None)
def edge_accum(axis_name: str) -> Callable[[jax.Array], jax.Array]:
    """psum whose backward is the IDENTITY.

    Used by the weight-sharded encoder where the cotangent arriving at
    the psum output has already been summed over this axis (by
    ``gather_rows``'s backward): the adjoint of ``block = sum_e part_e``
    w.r.t. ``part_e`` is the total ``block`` cotangent, which each
    device already holds — re-psumming would overcount by the axis
    size."""

    @jax.custom_vjp
    def accum(x):
        return jax.lax.psum(x, axis_name)

    def fwd(x):
        return accum(x), None

    def bwd(_, ct):
        return (ct,)

    accum.defvjp(fwd, bwd)
    return accum


@lru_cache(maxsize=None)
def gather_rows(
    row_axis: str, axes: tuple, n_rows: int, n_block: int, n_row_devices: int
) -> Callable[[jax.Array], jax.Array]:
    """Tiled all_gather over the row axis, trimmed to ``n_rows``, whose
    backward sums cotangents over BOTH mesh axes before slicing back the
    caller's row block.

    The gathered table is replicated over the whole mesh and every
    device consumes it differently (its own adjacency shard, its own
    batch slice), so the true adjoint of each device's input block is
    the ALL-device cotangent sum restricted to that block:

        d total / d block_r = psum_{row,edge}(ct)[r*Nb : (r+1)*Nb]

    Making this explicit keeps gradients exact for weight-sharded
    parameters without relying on the ambient collective-transpose
    rules (``check_vma=False`` shard_maps do not track which arrays are
    device-varying).

    The backward is a REDUCE-SCATTER over the row axis (each device
    keeps only its own summed block: ~N bytes/device on the cross-host
    axis, vs ~2N for the full-table all-reduce it replaces) followed by
    a psum of the already-scattered block over the edge axis (its
    payload shrinks by the row-axis size) — the transpose of the tiled
    all_gather, as the forward/backward symmetry demands."""

    other_axes = tuple(a for a in axes if a != row_axis)

    @jax.custom_vjp
    def gather(x):
        full = jax.lax.all_gather(x, row_axis, axis=0, tiled=True)
        return full[:n_rows]

    def fwd(x):
        return gather(x), None

    def bwd(_, ct):
        padded = jax.numpy.zeros(
            (n_row_devices * n_block,) + ct.shape[1:], ct.dtype
        ).at[:n_rows].set(ct)
        block = jax.lax.psum_scatter(
            padded, row_axis, scatter_dimension=0, tiled=True
        )
        if other_axes:
            block = jax.lax.psum(block, other_axes)
        return (block,)

    gather.defvjp(fwd, bwd)
    return gather
