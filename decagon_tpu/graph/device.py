"""Device-resident graph: static-shape flattened relation edge stacks.

TPU-first redesign of the reference's per-step ``feed_dict`` re-upload of
every sparse adjacency (``decagon/deep/minibatch.py:259-267``): here the
normalized train adjacencies live on device once, flattened per edge type
into a single padded COO stream

    senders[e], receivers[e], rel[e], vals[e]        (padding: vals == 0)

so the whole multi-relational aggregation
``sum_k A_k @ P_k`` is ONE gather + segment-sum per edge type
(see ``decagon_tpu.ops.segment``), regardless of how many relations the
edge type holds or how skewed their sizes are.  Negative-sampling
distributions (unigram^0.75 over row degrees,
``decagon/deep/optimizer.py:36-49``) are precomputed as per-relation CDF
rows for in-jit inverse-CDF sampling.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from decagon_tpu.graph.container import EdgeType, RelationGraph, RelationKey
from decagon_tpu.graph.split import EdgeSplit
from decagon_tpu.ops.tiling import TiledEdges, build_tiles


def etkey(edge_type: EdgeType) -> str:
    return f"{edge_type[0]},{edge_type[1]}"


def parse_etkey(key: str) -> EdgeType:
    i, j = key.split(",")
    return (int(i), int(j))


def _round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


from concurrent.futures import ThreadPoolExecutor
from functools import partial

_TILE_POOL = ThreadPoolExecutor(max_workers=8)


@partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _scatter_dense(rel, receivers, senders, vals, k, n_i, n_j, dtype):
    """[K, N_i, N_j] dense stack from a flattened COO stream, on device."""
    dense = jnp.zeros((k, n_i, n_j), dtype)
    return dense.at[rel, receivers, senders].add(vals.astype(dtype))


@partial(jax.jit, static_argnums=(4, 5, 6))
def _scatter_pair_mask(rel, receivers, senders, vals, k_half, k_pad, n_pad):
    """int8 [k_pad, n_pad, n_pad] edge-count mask of the DIRECT half
    (rel < k_half) of a transpose-augmented COO stream."""
    ones = ((vals != 0) & (rel < k_half)).astype(jnp.int8)
    mask = jnp.zeros((k_pad, n_pad, n_pad), jnp.int8)
    return mask.at[rel, receivers, senders].add(ones)


def _recover_rank1(splits, keys, n_i, n_j):
    """Per-relation rank-1 normalization factors for an edge type's
    relations, verified against the stored adjacency values: returns
    (row_scale [K, n_i], col_scale [K, n_j]) or None if any relation's
    normalization is not exactly rank-1 (``normalize.py``: square rule
    uses ONE degree vector; rect uses row/col degrees)."""
    row_scale = np.zeros((len(keys), n_i), np.float32)
    col_scale = np.zeros((len(keys), n_j), np.float32)

    def _dinv(counts):
        with np.errstate(divide="ignore"):
            v = np.power(counts.astype(np.float64), -0.5)
        v[~np.isfinite(v)] = 0.0
        return v

    for k, key in enumerate(keys):
        split = splits[key]
        r_k, c_k, v_k = split.adj_rows, split.adj_cols, split.adj_vals
        dr = _dinv(np.bincount(r_k, minlength=n_i))
        dc = _dinv(np.bincount(c_k, minlength=n_j))
        # Candidate factor pairs: the square rule keys ONE degree vector
        # off the a_rows side — which lands on the OUTPUT cols for a
        # direct relation and the output rows for its transpose
        # (normalize_square's (A+I)^T flip); the rect rule uses both
        # sides.  Accept whichever verifies.
        candidates = [(dr, dc)]
        if n_i == n_j:
            candidates = [(dc, dc), (dr, dr), (dr, dc)]
        for a_vec, b_vec in candidates:
            if np.allclose(
                v_k, (a_vec[r_k] * b_vec[c_k]).astype(np.float32),
                rtol=1e-5, atol=1e-7,
            ):
                row_scale[k] = a_vec
                col_scale[k] = b_vec
                break
        else:
            return None
    return row_scale, col_scale


def _np_dense_dtype(dtype):
    """Host dtype for the dense stacks (bf16 via ml_dtypes)."""
    if dtype in (jnp.bfloat16, "bf16", "bfloat16"):
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EdgeTypeAdj:
    """Flattened, padded COO stack of all relations of one edge type.

    ``receivers`` index rows of the adjacency (output nodes, type ``i``);
    ``senders`` index columns (source nodes, type ``j``).  ``rel`` is the
    within-type relation index.  Padding entries carry ``vals == 0`` and
    index node 0 / relation 0, contributing nothing to the aggregation.
    """

    senders: jax.Array  # int32 [E_pad]
    receivers: jax.Array  # int32 [E_pad]
    rel: jax.Array  # int32 [E_pad]
    vals: jax.Array  # float32 [E_pad]
    # Optional 2D tilings for the Pallas SpMM kernel (forward scatter to
    # [n_rows] and backward scatter to [K * n_cols]); None on the XLA path.
    tiles_fwd: Optional[TiledEdges]
    tiles_bwd: Optional[TiledEdges]
    # Optional dense materialization [K, n_rows, n_cols] for small
    # relations: below a few million cells the MXU batched matmul beats
    # any sparse formulation (gather/scatter can't feed the systolic
    # array), so the aggregation becomes one einsum.  None above the
    # densify threshold.
    dense: Optional[jax.Array]
    num_rel: int = dataclasses.field(metadata=dict(static=True))
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    # Optional FACTORED dense form (``build_device_graph(...,
    # dense_factored=True)``): the degree normalization is rank-1 per
    # relation (``normalize.py``: val[i,j] = a_k[i] * b_k[j]``), so the
    # stack factors into an int8 edge-count mask plus two scale vectors
    # — 1 byte/cell instead of 2, halving the HBM traffic of the
    # memory-bound dense SpMM (``ops.segment.spmm_dense_factored``).
    # ``dense_mask_t`` is the [K, n_cols, n_rows] transpose for the
    # backward pass (MXU-friendly layout; no runtime transposes).
    dense_mask: Optional[jax.Array] = None
    dense_mask_t: Optional[jax.Array] = None
    row_scale: Optional[jax.Array] = None  # f32 [K, n_rows]
    col_scale: Optional[jax.Array] = None  # f32 [K, n_cols]
    # Optional PAIRED factored form (``build_device_graph(...,
    # dense_paired=True)``, square transpose-augmented edge types only):
    # relation K+k's train adjacency is relation k's transpose (the
    # flipped-split invariant, graph/split.py; reference minibatch.py:
    # 143-149), so only the DIRECT half's int8 masks are stored and the
    # Pallas paired kernel (``ops.spmm_paired``) runs both halves off
    # one read — half the mask bytes AND half the mask traffic of the
    # dense_mask/dense_mask_t pair.  ``pair_mask``: int8 [K_pad, Np, Np]
    # (k-padded to the kernel block, N padded to the 2D block for big
    # N); ``pair_scales``: f32 [K_pad, 4, Np] — rows (a_e, a_o, b_e,
    # b_o): row/col scales of the direct (e) and transposed (o) halves,
    # ALL applied inside the kernels (no separate scale/cast passes).
    pair_mask: Optional[jax.Array] = None
    pair_scales: Optional[jax.Array] = None

    @property
    def num_edges_padded(self) -> int:
        return int(self.vals.shape[0])


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FusedAdj:
    """ALL edge types' normalized adjacencies as ONE flat COO stream.

    Source indices address a concatenation of every edge type's
    flattened per-relation projected-feature stack ``[K_et * N_j(et), H]``
    (blocks in sorted edge-type order, offsets in ``layout``); destination
    indices address a concatenation of per-edge-type output *terms*
    ``[N_i(et), H]`` (offsets in ``terms``).  This lets an encoder layer
    run the whole multi-relational aggregation as ONE gather + ONE
    segment-sum, regardless of edge-type count — the op-count-optimal
    shape for small graphs where per-op dispatch dominates (each edge
    type's term is still row-normalized separately afterwards, reference
    ``layers.py:85-94``).
    """

    src: jax.Array  # int32 [E_pad] into the projected space
    dst: jax.Array  # int32 [E_pad] into the term space
    vals: jax.Array  # float32 [E_pad]; padding entries are 0
    # Optional Pallas tilings over the SAME global index spaces (forward
    # scatter into [n_t_rows], backward into [n_p_rows]).
    tiles_fwd: Optional[TiledEdges]
    tiles_bwd: Optional[TiledEdges]
    # (etkey, p_start, num_rel, n_cols) per edge type, sorted-et order
    layout: Tuple[Tuple[str, int, int, int], ...] = dataclasses.field(
        metadata=dict(static=True)
    )
    # (etkey, t_start, n_rows) per edge type, sorted-et order
    terms: Tuple[Tuple[str, int, int], ...] = dataclasses.field(
        metadata=dict(static=True)
    )
    n_p_rows: int = dataclasses.field(metadata=dict(static=True))
    n_t_rows: int = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceGraph:
    """Everything the jitted train/eval steps need, resident on device.

    ``adj``: per edge-type flattened normalized train adjacency.
    ``features``: per node type, a dense [N, F] array or ``None`` for
    symbolic identity features (one-hot; projection short-circuits to the
    weight stack itself).
    ``neg_cdf``: per edge type, [K, N_i] normalized cumulative unigram^0.75
    distributions over row-type nodes for negative sampling.
    """

    adj: Dict[str, EdgeTypeAdj]
    features: Dict[str, Optional[jax.Array]]
    neg_cdf: Dict[str, jax.Array]
    fused: Optional[FusedAdj]
    num_nodes: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    feature_dims: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    decoders: Tuple[Tuple[str, str], ...] = dataclasses.field(
        metadata=dict(static=True)
    )

    @property
    def edge_types(self) -> List[EdgeType]:
        return sorted(parse_etkey(k) for k in self.adj)

    def num_relations(self, edge_type: EdgeType) -> int:
        return self.adj[etkey(edge_type)].num_rel

    def decoder_name(self, edge_type: EdgeType) -> str:
        return dict(self.decoders)[etkey(edge_type)]


def build_device_graph(
    graph: RelationGraph,
    splits: Dict[RelationKey, EdgeSplit],
    edge_pad_multiple: int = 1024,
    tile_for_pallas: bool = False,
    tile_block: int = 0,
    densify_max_cells: int = 8_000_000,
    dense_dtype=np.float32,
    tile_even_if_dense: bool = False,
    build_fused: bool = True,
    dense_factored: bool = False,
    dense_paired: bool = False,
) -> DeviceGraph:
    """Flatten normalized train adjacencies and sampling CDFs onto device.

    With ``tile_for_pallas``, also build the 2D edge tilings consumed by
    the Pallas SpMM kernel (one per aggregation direction).  Edge types
    whose dense stack fits ``densify_max_cells`` are materialized dense
    (and skip tiling unless ``tile_even_if_dense``): on TPU the MXU
    batched matmul beats any sparse formulation whenever the stack fits
    HBM — at paper scale (1926 x 645 x 645 drug-drug) store it as
    ``dense_dtype=jnp.bfloat16`` (~1.6 GB) and the aggregation becomes a
    memory-bound einsum, ~10-20x faster per step than the tiled kernel.
    """
    adj: Dict[str, EdgeTypeAdj] = {}
    neg_cdf: Dict[str, jax.Array] = {}
    degrees = graph.degrees()
    any_tiled = False

    for (i, j), rels in sorted(graph.relations.items()):
        senders_parts, receivers_parts, rel_parts, vals_parts = [], [], [], []
        for k in range(len(rels)):
            split = splits[(i, j, k)]
            receivers_parts.append(split.adj_rows)
            senders_parts.append(split.adj_cols)
            vals_parts.append(split.adj_vals)
            rel_parts.append(
                np.full(split.adj_rows.shape[0], k, dtype=np.int32)
            )
        senders = np.concatenate(senders_parts)
        receivers = np.concatenate(receivers_parts)
        rel = np.concatenate(rel_parts)
        vals = np.concatenate(vals_parts)

        padded = _round_up(max(1, vals.shape[0]), edge_pad_multiple)
        pad = padded - vals.shape[0]
        if pad:
            senders = np.concatenate([senders, np.zeros(pad, np.int32)])
            receivers = np.concatenate([receivers, np.zeros(pad, np.int32)])
            rel = np.concatenate([rel, np.zeros(pad, np.int32)])
            vals = np.concatenate([vals, np.zeros(pad, np.float32)])

        senders_dev = jnp.asarray(senders, jnp.int32)
        receivers_dev = jnp.asarray(receivers, jnp.int32)
        rel_dev = jnp.asarray(rel, jnp.int32)
        vals_dev = jnp.asarray(vals, jnp.float32)

        dense = None
        n_i, n_j = graph.num_nodes[i], graph.num_nodes[j]
        if len(rels) * n_i * n_j <= densify_max_cells:
            if jax.default_backend() != "cpu":
                # Build the stack ON DEVICE by scattering the (already
                # uploaded) COO stream: at paper scale the host fill +
                # host->device transfer of a multi-GB stack dominated
                # graph build time (~90 s of the 122 s round-2
                # host_build_s); the compiled scatter-add costs
                # milliseconds and the compilation is cached.  .add (not
                # .set): padding entries land on cell (0, 0, 0) with
                # value 0, which must not clobber a real edge there.
                dense = _scatter_dense(
                    rel_dev, receivers_dev, senders_dev, vals_dev,
                    len(rels), n_i, n_j,
                    jnp.bfloat16
                    if _np_dense_dtype(dense_dtype) == _np_dense_dtype("bf16")
                    else jnp.dtype(dense_dtype),
                )
            else:
                # Host fill in the target dtype (one pass; bf16 halves
                # host memory at paper scale).
                dense_np = np.zeros(
                    (len(rels), n_i, n_j), dtype=_np_dense_dtype(dense_dtype)
                )
                real = padded - pad  # exclude pad (would clobber (0,0,0))
                dense_np[rel[:real], receivers[:real], senders[:real]] = (
                    vals[:real].astype(dense_np.dtype)
                )
                dense = jnp.asarray(dense_np)
                del dense_np

        rel_keys = [(i, j, k) for k in range(len(rels))]
        factors = None
        if (dense_factored or dense_paired) and (
            len(rels) * n_i * n_j <= densify_max_cells * 2
        ):
            factors = _recover_rank1(splits, rel_keys, n_i, n_j)

        dense_mask = dense_mask_t = row_scale_dev = col_scale_dev = None
        if (
            dense_factored
            and len(rels) * n_i * n_j <= densify_max_cells
            and factors is not None
        ):
            row_scale_np, col_scale_np = factors
            ones = (vals_dev != 0).astype(jnp.int8)
            dense_mask = (
                jnp.zeros((len(rels), n_i, n_j), jnp.int8)
                .at[rel_dev, receivers_dev, senders_dev].add(ones)
            )
            dense_mask_t = (
                jnp.zeros((len(rels), n_j, n_i), jnp.int8)
                .at[rel_dev, senders_dev, receivers_dev].add(ones)
            )
            row_scale_dev = jnp.asarray(row_scale_np)
            col_scale_dev = jnp.asarray(col_scale_np)

        # PAIRED form: square transpose-augmented edge types whose second
        # half is exactly the first half's transposes — store only the
        # direct half's int8 masks (ops/spmm_paired.py runs both halves
        # off one read).  The mask stack may be up to 2x densify_max_cells
        # in LOGICAL cells since only half is materialized.
        pair_mask = pair_scales = None
        is_paired = (
            dense_paired
            and i == j
            and len(rels) % 2 == 0
            and len(rels) > 0
            and factors is not None
            and all(
                rels[len(rels) // 2 + k].transpose_of == (i, j, k)
                for k in range(len(rels) // 2)
            )
            and len(rels) * n_i * n_j <= densify_max_cells * 2
        )
        if is_paired:
            from decagon_tpu.ops import spmm_paired as sp_mod

            row_scale_np, col_scale_np = factors
            k_half = len(rels) // 2
            kb = sp_mod.default_kb(k_half, n_i)
            k_pad = _round_up(k_half, kb)
            n_pad = (
                n_i
                if n_i <= sp_mod.BIG_N_THRESHOLD
                else _round_up(n_i, sp_mod.BIG_BLOCK)
            )
            pair_mask = _scatter_pair_mask(
                rel_dev, receivers_dev, senders_dev, vals_dev,
                k_half, k_pad, n_pad,
            )
            ps = np.zeros((k_pad, 4, n_pad), np.float32)
            ps[:k_half, 0, :n_i] = row_scale_np[:k_half]
            ps[:k_half, 1, :n_i] = row_scale_np[k_half:]
            ps[:k_half, 2, :n_i] = col_scale_np[:k_half]
            ps[:k_half, 3, :n_i] = col_scale_np[k_half:]
            pair_scales = jnp.asarray(ps)

        tiles_fwd = tiles_bwd = None
        if tile_for_pallas and (dense is None or tile_even_if_dense):
            any_tiled = True
            n_rows_i = graph.num_nodes[i]
            flat_src_space = len(rels) * graph.num_nodes[j]
            flat_src = (
                rel.astype(np.int64) * graph.num_nodes[j]
                + senders.astype(np.int64)
            )
            # Per-direction tilings are independent: build them on the
            # pool (the native sort/pack releases the GIL, so the big
            # edge types' fwd/bwd tilings overlap — host-build time).
            tiles_fwd = _TILE_POOL.submit(
                build_tiles, flat_src, receivers, vals, flat_src_space,
                n_rows_i, 0, 0, tile_block,
            )
            tiles_bwd = _TILE_POOL.submit(
                build_tiles, receivers, flat_src, vals, n_rows_i,
                flat_src_space, 0, 0, tile_block,
            )

        adj[etkey((i, j))] = EdgeTypeAdj(
            senders=senders_dev,
            receivers=receivers_dev,
            rel=rel_dev,
            vals=vals_dev,
            tiles_fwd=tiles_fwd,
            tiles_bwd=tiles_bwd,
            dense=dense,
            num_rel=len(rels),
            n_rows=graph.num_nodes[i],
            n_cols=graph.num_nodes[j],
            dense_mask=dense_mask,
            dense_mask_t=dense_mask_t,
            row_scale=row_scale_dev,
            col_scale=col_scale_dev,
            pair_mask=pair_mask,
            pair_scales=pair_scales,
        )

        # Negative-sampling CDFs: relation (i,j,k) draws row-type-i nodes
        # from degrees[i][k % len] ** 0.75 (reference optimizer.py:36-49;
        # the k-indexing quirk into the type's square-relation degree list
        # is preserved, with modular wrap where the reference would crash).
        deg_list = degrees[i]
        cdf_rows = []
        for k in range(len(rels)):
            deg = deg_list[k % len(deg_list)].astype(np.float64)
            weights = np.power(np.maximum(deg, 0.0), 0.75)
            total = weights.sum()
            if total <= 0:
                weights = np.ones_like(weights)
                total = weights.sum()
            cdf = np.cumsum(weights) / total
            cdf[-1] = 1.0
            cdf_rows.append(cdf)
        neg_cdf[etkey((i, j))] = jnp.asarray(
            np.stack(cdf_rows), jnp.float32
        )

    # Resolve pooled tiling builds.
    for a in adj.values():
        if a.tiles_fwd is not None:
            a.tiles_fwd = a.tiles_fwd.result()
            a.tiles_bwd = a.tiles_bwd.result()

    # Fused all-edge-type stream (one gather + segment-sum per layer).
    fused = None
    if build_fused:
        layout, terms = [], []
        p_start = t_start = 0
        fused_src, fused_dst, fused_vals = [], [], []
        for (i, j), rels in sorted(graph.relations.items()):
            key = etkey((i, j))
            n_i, n_j = graph.num_nodes[i], graph.num_nodes[j]
            layout.append((key, p_start, len(rels), n_j))
            terms.append((key, t_start, n_i))
            for k in range(len(rels)):
                split = splits[(i, j, k)]
                fused_src.append(
                    p_start + k * n_j + split.adj_cols.astype(np.int64)
                )
                fused_dst.append(t_start + split.adj_rows.astype(np.int64))
                fused_vals.append(split.adj_vals)
            p_start += len(rels) * n_j
            t_start += n_i
        src = np.concatenate(fused_src) if fused_src else np.zeros(0, np.int64)
        dst = np.concatenate(fused_dst) if fused_dst else np.zeros(0, np.int64)
        vals = (
            np.concatenate(fused_vals) if fused_vals else np.zeros(0, np.float32)
        )
        padded = _round_up(max(1, vals.shape[0]), edge_pad_multiple)
        pad = padded - vals.shape[0]
        if pad:
            src = np.concatenate([src, np.zeros(pad, np.int64)])
            dst = np.concatenate([dst, np.zeros(pad, np.int64)])
            vals = np.concatenate([vals, np.zeros(pad, np.float32)])
        fused_tiles_fwd = fused_tiles_bwd = None
        if tile_for_pallas and (any_tiled or tile_even_if_dense):
            fused_tiles_fwd = build_tiles(
                src, dst, vals, p_start, t_start,
                block_r=0, block_s=0, tile_c=tile_block,
            )
            fused_tiles_bwd = build_tiles(
                dst, src, vals, t_start, p_start,
                block_r=0, block_s=0, tile_c=tile_block,
            )
        fused = FusedAdj(
            src=jnp.asarray(src, jnp.int32),
            dst=jnp.asarray(dst, jnp.int32),
            vals=jnp.asarray(vals, jnp.float32),
            tiles_fwd=fused_tiles_fwd,
            tiles_bwd=fused_tiles_bwd,
            layout=tuple(layout),
            terms=tuple(terms),
            n_p_rows=p_start,
            n_t_rows=t_start,
        )

    features: Dict[str, Optional[jax.Array]] = {}
    feature_dims = []
    for t in range(len(graph.num_nodes)):
        feat = graph.features[t]
        feature_dims.append(feat.dim)
        if feat.kind == "identity":
            features[str(t)] = None
        else:
            features[str(t)] = jnp.asarray(feat.dense, jnp.float32)

    decoders = tuple(
        (etkey(et), graph.decoders.get(et, "innerproduct"))
        for et in sorted(graph.relations)
    )
    return DeviceGraph(
        adj=adj,
        features=features,
        neg_cdf=neg_cdf,
        fused=fused,
        num_nodes=tuple(graph.num_nodes),
        feature_dims=tuple(feature_dims),
        decoders=decoders,
    )
