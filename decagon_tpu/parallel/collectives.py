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
