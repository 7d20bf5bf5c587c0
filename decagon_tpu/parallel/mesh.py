"""Device meshes + multi-host initialization.

The framework's mesh has two named axes (see
``decagon_tpu.parallel.rowshard``):

* ``row``  — destination-node row blocks (the cross-host / DCN axis),
* ``edge`` — edge shards / dense relation splits within a row block
  (the intra-host / ICI axis).

``make_mesh(n)`` builds the single-host (1, n) mesh; ``make_mesh(shape=
(nr, ne))`` a 2D one.  On a multi-host slice call ``initialize_
distributed()`` first (``jax.distributed``), then ``make_mesh(shape=...,
multihost=True)`` lays the ``row`` axis across hosts so the per-layer
all_gather rides DCN exactly once per row block while psum stays on ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from decagon_tpu.parallel.rowshard import (  # noqa: F401 (re-exports)
    AXES,
    ShardedGraph,
    build_sharded_device_graph,
    sharded_pspecs,
)

_distributed_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize ``jax.distributed`` for a multi-host run (idempotent).

    With no arguments JAX auto-detects the TPU pod-slice topology from
    the environment; pass explicit values for CPU/GPU multi-process
    simulation.  Safe to call on a single host (no-op on failure to
    detect peers is surfaced, not swallowed)."""
    global _distributed_initialized
    if _distributed_initialized:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _distributed_initialized = True


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = AXES,
    shape: Optional[Tuple[int, int]] = None,
    multihost: bool = False,
) -> Mesh:
    """Build the (row, edge) mesh.

    ``make_mesh(8)`` -> 1 x 8 (pure edge sharding); ``make_mesh(shape=
    (2, 4))`` -> 2 row blocks x 4 edge shards.  ``multihost=True`` uses
    ``mesh_utils.create_hybrid_device_mesh`` so the row axis strides
    across processes (DCN) and the edge axis stays within a host (ICI).
    """
    if shape is None:
        n = n_devices if n_devices is not None else len(jax.devices())
        shape = (1, n)
    if multihost:
        from jax.experimental import mesh_utils

        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, shape[1]),
            dcn_mesh_shape=(shape[0], 1),
        )
        return Mesh(devices, tuple(axes))
    devices = jax.devices()
    need = shape[0] * shape[1]
    if len(devices) < need:
        raise ValueError(
            f"mesh shape {shape} needs {need} devices, have {len(devices)}"
        )
    return Mesh(np.asarray(devices[:need]).reshape(shape), tuple(axes))
