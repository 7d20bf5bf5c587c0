"""Benchmark timing helpers.

``jax.block_until_ready`` is NOT a reliable execution barrier on
remote-attached backends (the axon TPU tunnel reports buffers ready
while the program is still in flight), so every timing loop here syncs
by reading a tiny dependent scalar back to the host — the device must
finish the producing program before the readback can complete.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def hard_sync(tree) -> None:
    """Block the host until the computation producing ``tree`` has
    actually executed (host readback of a dependent scalar)."""
    leaves = [
        l for l in jax.tree_util.tree_leaves(tree)
        if hasattr(l, "dtype")
    ]
    if not leaves:
        return
    leaf = min(leaves, key=lambda l: l.size)
    jax.device_get(jnp.sum(leaf))


def timed_ms(fn, *args, reps: int = 8, warmup: int = 1) -> float:
    """min-of-``reps`` wall time of ``fn(*args)`` in ms, hard-synced."""
    for _ in range(warmup):
        hard_sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        hard_sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3
