"""Row x edge sharded device graph: 2D-mesh partitioning of the
multi-relational adjacency.

Parallelism design (new — the reference is strictly single-process,
SURVEY.md §2.9/§5.8).  The mesh has two named axes:

* ``row`` — destination-node row blocks.  Device row ``r`` owns rows
  ``[r*Nb, (r+1)*Nb)`` of every edge type's output.  This is the
  multi-host axis: after local aggregation each device holds ONLY its
  row block, and one ``all_gather`` per edge type per layer reassembles
  the full node table.  Per-device send volume is ``Nb*H`` (its own
  block), vs the replicate-everything design's psum which sends the full
  ``N*H`` twice — communication now scales down with the row-axis size.
  For this model family the "boundary" IS the full node set (full-batch
  GCN: layer 2 reads every layer-1 embedding), so the all-gather is the
  minimal boundary exchange.  ``encode_sharded`` issues every edge
  type's local aggregation before anything consumes a gathered table,
  so the exchange can overlap the next edge type's einsum — measured
  A/B (overlap on/off via optimization_barrier chains) in
  ``artifacts/perf/multihost_overlap.json``.
* ``edge`` — within a row block, edges are round-robin partitioned (and
  the dense relation stacks are split over relations), so aggregation
  FLOPs scale with the axis; partial row blocks are psum-reduced over
  this (intra-host, ICI) axis.

Features and decoder parameters stay replicated; the per-relation enc
weight stacks (and their Adam moments) shard on the relation axis over
the ``edge`` axis by default (``TrainConfig.shard_weights`` — see
``parallel.sharded``), mirroring the dense relation split, which removes
the full-parameter gradient all-reduce from every step.  Replicated
leaves' gradients are psum-reduced over both axes; the decoder batch is
data-parallel over all devices.  Density dispatch survives sharding:
each device's slice of a densified edge type is a ``[K_loc, Nb, Nj]``
stack consumed by the same batched-einsum SpMM as the single-chip path
(VERDICT round-1 item 3).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from decagon_tpu.graph.container import EdgeType, RelationGraph, RelationKey
from decagon_tpu.graph.device import etkey, parse_etkey, _round_up
from decagon_tpu.graph.split import EdgeSplit
from decagon_tpu.ops.tiling import TiledEdges, build_tiles

AXES = ("row", "edge")


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StackedTiles:
    """Per-shard Pallas tilings, padded to a common tile count and
    stacked on a leading shard axis (shard with ``P(("row","edge"))``).

    Padding tiles sit BEYOND every ``row_ptr`` range, so the kernel
    never executes them.  Inside shard_map, slot 0 of each array plus
    the static fields reconstruct a ``TiledEdges`` for the local kernel
    call."""

    packed: jax.Array  # int32 [S, T, 2, C]
    src_start: jax.Array  # int32 [S, T]
    row_ptr: jax.Array  # int32 [S, num_dst_blocks + 1]
    n_dst: int = dataclasses.field(metadata=dict(static=True))
    n_src: int = dataclasses.field(metadata=dict(static=True))
    block_r: int = dataclasses.field(metadata=dict(static=True))
    block_s: int = dataclasses.field(metadata=dict(static=True))
    tile_c: int = dataclasses.field(metadata=dict(static=True))

    def local(self) -> TiledEdges:
        """TiledEdges view of this device's shard (leading dim 1)."""
        return TiledEdges(
            packed=self.packed[0],
            src_start=self.src_start[0],
            row_ptr=self.row_ptr[0],
            n_dst=self.n_dst,
            n_src=self.n_src,
            block_r=self.block_r,
            block_s=self.block_s,
            tile_c=self.tile_c,
        )


def _stack_tiles(per_shard: List[TiledEdges]) -> StackedTiles:
    t_max = max(t.num_tiles for t in per_shard)
    packed = np.zeros(
        (len(per_shard), t_max) + tuple(per_shard[0].packed.shape[1:]),
        np.int32,
    )
    src_start = np.zeros((len(per_shard), t_max), np.int32)
    row_ptr = np.stack([np.asarray(t.row_ptr) for t in per_shard])
    for s, t in enumerate(per_shard):
        packed[s, : t.num_tiles] = np.asarray(t.packed)
        src_start[s, : t.num_tiles] = np.asarray(t.src_start)
    first = per_shard[0]
    return StackedTiles(
        packed=packed,
        src_start=src_start,
        row_ptr=row_ptr.astype(np.int32),
        n_dst=first.n_dst,
        n_src=first.n_src,
        block_r=first.block_r,
        block_s=first.block_s,
        tile_c=first.tile_c,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedEdgeTypeAdj:
    """One edge type's adjacency, partitioned (row block x edge shard).

    Leading dim S = nr * ne, laid out row-major over mesh (row, edge)
    coordinates; shard with ``P(("row", "edge"))`` so device (r, e) gets
    slot ``r * ne + e``.  ``receivers`` are LOCAL to the row block
    (``global_row - r * n_rows_block``).  Padding entries carry
    ``vals == 0``.
    """

    senders: jax.Array  # int32 [S, E_loc] (global col index)
    receivers: jax.Array  # int32 [S, E_loc] (row-block-local row index)
    rel: jax.Array  # int32 [S, E_loc]
    vals: jax.Array  # float32 [S, E_loc]
    # Optional dense relation stacks per device: [S, K_loc, Nb, Nj]
    # (relations split over the edge axis, rows over the row axis).
    dense: Optional[jax.Array]
    # Optional per-shard Pallas tilings (fwd: scatter into the local row
    # block; bwd: scatter cotangents into the [K * Nj] projected space).
    tiles_fwd: Optional["StackedTiles"]
    tiles_bwd: Optional["StackedTiles"]
    num_rel: int = dataclasses.field(metadata=dict(static=True))
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    n_rows_block: int = dataclasses.field(metadata=dict(static=True))
    k_loc: int = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedGraph:
    """Sharded counterpart of ``DeviceGraph`` for the 2D-mesh train/eval
    path; same static metadata surface (edge_types / num_relations /
    decoder_name)."""

    adj: Dict[str, ShardedEdgeTypeAdj]
    features: Dict[str, Optional[jax.Array]]
    neg_cdf: Dict[str, jax.Array]
    num_nodes: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    feature_dims: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True)
    )
    decoders: Tuple[Tuple[str, str], ...] = dataclasses.field(
        metadata=dict(static=True)
    )
    mesh_shape: Tuple[int, int] = dataclasses.field(
        metadata=dict(static=True)
    )

    @property
    def edge_types(self) -> List[EdgeType]:
        return sorted(parse_etkey(k) for k in self.adj)

    def num_relations(self, edge_type: EdgeType) -> int:
        return self.adj[etkey(edge_type)].num_rel

    def decoder_name(self, edge_type: EdgeType) -> str:
        return dict(self.decoders)[etkey(edge_type)]


def sharded_pspecs(graph: ShardedGraph, axes=AXES) -> ShardedGraph:
    """ShardedGraph-shaped pytree of PartitionSpecs for shard_map."""
    both = P(axes)
    def tile_specs(t: Optional[StackedTiles]) -> Optional[StackedTiles]:
        if t is None:
            return None
        return StackedTiles(
            packed=both, src_start=both, row_ptr=both,
            n_dst=t.n_dst, n_src=t.n_src,
            block_r=t.block_r, block_s=t.block_s, tile_c=t.tile_c,
        )

    adj = {
        key: ShardedEdgeTypeAdj(
            senders=both,
            receivers=both,
            rel=both,
            vals=both,
            dense=None if a.dense is None else both,
            tiles_fwd=tile_specs(a.tiles_fwd),
            tiles_bwd=tile_specs(a.tiles_bwd),
            num_rel=a.num_rel,
            n_rows=a.n_rows,
            n_cols=a.n_cols,
            n_rows_block=a.n_rows_block,
            k_loc=a.k_loc,
        )
        for key, a in graph.adj.items()
    }
    return ShardedGraph(
        adj=adj,
        features={
            key: (None if f is None else P())
            for key, f in graph.features.items()
        },
        neg_cdf={key: P() for key in graph.neg_cdf},
        num_nodes=graph.num_nodes,
        feature_dims=graph.feature_dims,
        decoders=graph.decoders,
        mesh_shape=graph.mesh_shape,
    )


def build_sharded_device_graph(
    graph: RelationGraph,
    splits: Dict[RelationKey, EdgeSplit],
    mesh: Mesh,
    axes=AXES,
    edge_pad_multiple: int = 256,
    densify_max_cells_per_device: int = 8_000_000,
    dense_dtype=np.float32,
    tile_for_pallas: bool = False,
    tile_block: int = 0,
    tile_even_if_dense: bool = False,
) -> ShardedGraph:
    """Partition normalized train adjacencies over a (row, edge) mesh.

    Host-side layout + one ``device_put`` per array with the matching
    NamedSharding (each device receives only its slice)."""
    nr, ne = mesh.shape[axes[0]], mesh.shape[axes[1]]
    s_total = nr * ne
    both = NamedSharding(mesh, P(axes))
    repl = NamedSharding(mesh, P())
    degrees = graph.degrees()

    adj: Dict[str, ShardedEdgeTypeAdj] = {}
    neg_cdf: Dict[str, jax.Array] = {}
    for (i, j), rels in sorted(graph.relations.items()):
        n_i, n_j = graph.num_nodes[i], graph.num_nodes[j]
        nb = -(-n_i // nr)  # rows per row block
        k = len(rels)
        k_loc = -(-k // ne)

        send_parts, recv_parts, rel_parts, val_parts = [], [], [], []
        for kk in range(k):
            split = splits[(i, j, kk)]
            recv_parts.append(split.adj_rows)
            send_parts.append(split.adj_cols)
            val_parts.append(split.adj_vals)
            rel_parts.append(
                np.full(split.adj_rows.shape[0], kk, dtype=np.int32)
            )
        senders = np.concatenate(send_parts)
        receivers = np.concatenate(recv_parts)
        rel = np.concatenate(rel_parts)
        vals = np.concatenate(val_parts)

        # Bucket edges by (row block, round-robin within block).
        blk = receivers // nb
        order = np.argsort(blk, kind="stable")
        senders, receivers, rel, vals, blk = (
            senders[order], receivers[order], rel[order], vals[order],
            blk[order],
        )
        # Per-shard slot: position within the block, mod ne.
        block_starts = np.searchsorted(blk, np.arange(nr))
        pos_in_block = np.arange(len(blk)) - block_starts[blk]
        shard = pos_in_block % ne
        counts = np.zeros((nr, ne), dtype=np.int64)
        np.add.at(counts, (blk, shard), 1)
        e_loc = _round_up(max(1, int(counts.max())), edge_pad_multiple)

        send_a = np.zeros((nr, ne, e_loc), np.int32)
        recv_a = np.zeros((nr, ne, e_loc), np.int32)
        rel_a = np.zeros((nr, ne, e_loc), np.int32)
        val_a = np.zeros((nr, ne, e_loc), np.float32)
        # Stable order within each (block, shard): pos_in_block // ne.
        slot = pos_in_block // ne
        send_a[blk, shard, slot] = senders
        recv_a[blk, shard, slot] = receivers - blk.astype(np.int32) * nb
        rel_a[blk, shard, slot] = rel
        val_a[blk, shard, slot] = vals

        dense = None
        if k_loc * nb * n_j <= densify_max_cells_per_device:
            jdt = (
                jnp.bfloat16
                if dense_dtype in (jnp.bfloat16, "bf16", "bfloat16")
                else jnp.dtype(dense_dtype)
            )
            if jax.default_backend() != "cpu":
                # Scatter the COO stream into the SHARDED dense stack on
                # device (GSPMD partitions the scatter): at paper scale
                # the host fill + multi-GB host->device transfer
                # dominated sharded-graph build time.
                fn = _sharded_scatter_fn(
                    mesh, axes, s_total, k_loc, nb, n_j, jdt
                )
                dense = fn(
                    jnp.asarray(blk * ne + rel // k_loc, jnp.int32),
                    jnp.asarray(rel % k_loc, jnp.int32),
                    jnp.asarray(
                        receivers - blk.astype(np.int64) * nb, jnp.int32
                    ),
                    jnp.asarray(senders, jnp.int32),
                    jnp.asarray(vals, jnp.float32),
                )
            else:
                dense_np = np.zeros(
                    (nr, ne, k_loc, nb, n_j), dtype=np.float32
                )
                dense_np[
                    blk, rel // k_loc, rel % k_loc,
                    receivers - blk.astype(np.int64) * nb, senders,
                ] = vals
                dense = jax.device_put(
                    dense_np.reshape(s_total, k_loc, nb, n_j).astype(
                        _np_dtype(dense_dtype)
                    ),
                    both,
                )
                del dense_np

        tiles_fwd = tiles_bwd = None
        if tile_for_pallas and (dense is None or tile_even_if_dense):
            flat_space = k * n_j
            fwd_parts, bwd_parts = [], []
            for b in range(nr):
                for e in range(ne):
                    sl_send = send_a[b, e].astype(np.int64)
                    sl_recv = recv_a[b, e].astype(np.int64)
                    sl_flat = rel_a[b, e].astype(np.int64) * n_j + sl_send
                    sl_vals = val_a[b, e]
                    fwd_parts.append(build_tiles(
                        sl_flat, sl_recv, sl_vals, flat_space, nb,
                        block_r=0, block_s=0,
                        tile_c=tile_block,
                    ))
                    bwd_parts.append(build_tiles(
                        sl_recv, sl_flat, sl_vals, nb, flat_space,
                        block_r=0, block_s=0,
                        tile_c=tile_block,
                    ))
            st_f, st_b = _stack_tiles(fwd_parts), _stack_tiles(bwd_parts)
            tiles_fwd = StackedTiles(
                packed=jax.device_put(st_f.packed, both),
                src_start=jax.device_put(st_f.src_start, both),
                row_ptr=jax.device_put(st_f.row_ptr, both),
                n_dst=st_f.n_dst, n_src=st_f.n_src,
                block_r=st_f.block_r, block_s=st_f.block_s,
                tile_c=st_f.tile_c,
            )
            tiles_bwd = StackedTiles(
                packed=jax.device_put(st_b.packed, both),
                src_start=jax.device_put(st_b.src_start, both),
                row_ptr=jax.device_put(st_b.row_ptr, both),
                n_dst=st_b.n_dst, n_src=st_b.n_src,
                block_r=st_b.block_r, block_s=st_b.block_s,
                tile_c=st_b.tile_c,
            )

        adj[etkey((i, j))] = ShardedEdgeTypeAdj(
            senders=jax.device_put(send_a.reshape(s_total, e_loc), both),
            receivers=jax.device_put(recv_a.reshape(s_total, e_loc), both),
            rel=jax.device_put(rel_a.reshape(s_total, e_loc), both),
            vals=jax.device_put(val_a.reshape(s_total, e_loc), both),
            dense=dense,
            tiles_fwd=tiles_fwd,
            tiles_bwd=tiles_bwd,
            num_rel=k,
            n_rows=n_i,
            n_cols=n_j,
            n_rows_block=nb,
            k_loc=k_loc,
        )

        # Negative-sampling CDFs (replicated), identical to the
        # single-chip build (graph/device.py).
        deg_list = degrees[i]
        cdf_rows = []
        for kk in range(k):
            deg = deg_list[kk % len(deg_list)].astype(np.float64)
            weights = np.power(np.maximum(deg, 0.0), 0.75)
            total = weights.sum()
            if total <= 0:
                weights = np.ones_like(weights)
                total = weights.sum()
            cdf = np.cumsum(weights) / total
            cdf[-1] = 1.0
            cdf_rows.append(cdf)
        neg_cdf[etkey((i, j))] = jax.device_put(
            np.stack(cdf_rows).astype(np.float32), repl
        )

    features: Dict[str, Optional[jax.Array]] = {}
    feature_dims = []
    for t in range(len(graph.num_nodes)):
        feat = graph.features[t]
        feature_dims.append(feat.dim)
        if feat.kind == "identity":
            features[str(t)] = None
        else:
            features[str(t)] = jax.device_put(
                np.asarray(feat.dense, np.float32), repl
            )

    decoders = tuple(
        (etkey(et), graph.decoders.get(et, "innerproduct"))
        for et in sorted(graph.relations)
    )
    return ShardedGraph(
        adj=adj,
        features=features,
        neg_cdf=neg_cdf,
        num_nodes=tuple(graph.num_nodes),
        feature_dims=tuple(feature_dims),
        decoders=decoders,
        mesh_shape=(nr, ne),
    )


def _np_dtype(dtype):
    if dtype in (jnp.bfloat16, "bf16", "bfloat16"):
        import ml_dtypes

        return ml_dtypes.bfloat16
    return np.dtype(dtype)


@functools.lru_cache(maxsize=None)
def _sharded_scatter_fn(mesh, axes, s_total, k_loc, nb, n_j, dtype):
    """Jitted COO -> sharded [S, K_loc, Nb, Nj] dense-stack scatter."""
    both = NamedSharding(mesh, P(axes))

    @functools.partial(jax.jit, out_shardings=both)
    def scatter(s_idx, kk_idx, row_idx, col_idx, vals):
        dense = jnp.zeros((s_total, k_loc, nb, n_j), dtype)
        return dense.at[s_idx, kk_idx, row_idx, col_idx].add(
            vals.astype(dtype)
        )

    return scatter
