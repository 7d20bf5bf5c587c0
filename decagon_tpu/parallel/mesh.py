"""Device meshes and sharded placement of the device graph.

Parallelism design (new — the reference is strictly single-process,
SURVEY.md §2.9): one mesh axis partitions *edges* of every relation
across devices.  Each device owns an equal slice of the flattened edge
stream of every edge type (padding edges carry zero values, so any
slicing is correct); node embeddings and parameters are replicated; the
per-edge-type aggregation is completed with a psum over the axis.  The
decoder batch is sharded over the same axis (data parallelism over
sampled edges), making one step's math identical to single-chip.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from decagon_tpu.graph.device import DeviceGraph, EdgeTypeAdj, FusedAdj


def make_mesh(n_devices: Optional[int] = None, axis: str = "edge") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def graph_pspecs(graph: DeviceGraph, axis: str = "edge") -> DeviceGraph:
    """A DeviceGraph-shaped pytree of PartitionSpecs: edge streams sharded
    along ``axis``, features / CDFs replicated."""
    adj = {
        key: EdgeTypeAdj(
            senders=P(axis),
            receivers=P(axis),
            rel=P(axis),
            vals=P(axis),
            # Pallas tilings are single-device structures; the sharded
            # path uses the XLA SpMM over per-device edge slices.
            tiles_fwd=None,
            tiles_bwd=None,
            dense=None,
            num_rel=a.num_rel,
            n_rows=a.n_rows,
            n_cols=a.n_cols,
        )
        for key, a in graph.adj.items()
    }
    features = {
        key: (None if feat is None else P())
        for key, feat in graph.features.items()
    }
    neg_cdf = {key: P() for key in graph.neg_cdf}
    fused = None
    if graph.fused is not None:
        fused = FusedAdj(
            src=P(axis),
            dst=P(axis),
            vals=P(axis),
            tiles_fwd=None,
            tiles_bwd=None,
            layout=graph.fused.layout,
            terms=graph.fused.terms,
            n_p_rows=graph.fused.n_p_rows,
            n_t_rows=graph.fused.n_t_rows,
        )
    return DeviceGraph(
        adj=adj,
        features=features,
        neg_cdf=neg_cdf,
        fused=fused,
        num_nodes=graph.num_nodes,
        feature_dims=graph.feature_dims,
        decoders=graph.decoders,
    )


def shard_device_graph(
    graph: DeviceGraph, mesh: Mesh, axis: str = "edge"
) -> DeviceGraph:
    """Place the graph on the mesh: edge arrays sharded, rest replicated.

    Edge streams are re-padded so every per-edge-type stream length
    divides the axis size (zero-valued padding edges are inert).
    """
    n = mesh.shape[axis]

    def pad_to(arr: jax.Array, length: int) -> np.ndarray:
        host = np.asarray(arr)
        if host.shape[0] == length:
            return host
        pad = np.zeros((length - host.shape[0],) + host.shape[1:], host.dtype)
        return np.concatenate([host, pad])

    adj = {}
    for key, a in graph.adj.items():
        e = a.vals.shape[0]
        e_pad = ((e + n - 1) // n) * n
        sharding = NamedSharding(mesh, P(axis))
        adj[key] = EdgeTypeAdj(
            senders=jax.device_put(pad_to(a.senders, e_pad), sharding),
            receivers=jax.device_put(pad_to(a.receivers, e_pad), sharding),
            rel=jax.device_put(pad_to(a.rel, e_pad), sharding),
            vals=jax.device_put(pad_to(a.vals, e_pad), sharding),
            tiles_fwd=None,
            tiles_bwd=None,
            dense=None,
            num_rel=a.num_rel,
            n_rows=a.n_rows,
            n_cols=a.n_cols,
        )
    replicated = NamedSharding(mesh, P())
    features = {
        key: (None if f is None else jax.device_put(f, replicated))
        for key, f in graph.features.items()
    }
    neg_cdf = {
        key: jax.device_put(c, replicated) for key, c in graph.neg_cdf.items()
    }
    fused = None
    if graph.fused is not None:
        f = graph.fused
        e = f.vals.shape[0]
        e_pad = ((e + n - 1) // n) * n
        sharding = NamedSharding(mesh, P(axis))
        fused = FusedAdj(
            src=jax.device_put(pad_to(f.src, e_pad), sharding),
            dst=jax.device_put(pad_to(f.dst, e_pad), sharding),
            vals=jax.device_put(pad_to(f.vals, e_pad), sharding),
            tiles_fwd=None,
            tiles_bwd=None,
            layout=f.layout,
            terms=f.terms,
            n_p_rows=f.n_p_rows,
            n_t_rows=f.n_t_rows,
        )
    return DeviceGraph(
        adj=adj,
        features=features,
        neg_cdf=neg_cdf,
        fused=fused,
        num_nodes=graph.num_nodes,
        feature_dims=graph.feature_dims,
        decoders=graph.decoders,
    )
