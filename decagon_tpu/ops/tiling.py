"""Host-side 2D tiling of flattened relation edge streams for the Pallas
SpMM kernel.

The multi-relational aggregation ``out[dst] += val * P_flat[src]`` (with
``src`` indexing the [K*N_src, H] stacked projection) is reorganized into
MXU-shaped work: edges are bucketed by (dst block, src block) and chunked
into fixed-size tiles.  Inside the kernel each tile becomes two small
dense matmuls (gather via a comparison-generated one-hot, scatter via its
transpose) — turning irregular sparse access into systolic-array work,
per the "sparse GNNs on dense hardware" playbook (PAPERS.md).

Tile data is packed as one int32 array [T, 3, C] (src-local | dst-local |
float32-bitcast vals) so the kernel fetches one DMA per tile.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TiledEdges:
    """Tiled edge stream for one aggregation direction.

    ``packed``: [T, 4, C] int32 — per tile: row 0 src index local to the
    tile's source block, row 1 dst index local to the tile's dst block,
    row 2 edge values bitcast from float32.  Padding slots have val == 0.
    ``src_block``: [T] int32 — source-block id per tile.
    ``row_ptr``: [num_dst_blocks + 1] int32 — tiles are sorted by dst
    block; tiles of dst block b are ``row_ptr[b]:row_ptr[b+1]``.
    """

    packed: jax.Array
    src_block: jax.Array
    row_ptr: jax.Array
    n_dst: int = dataclasses.field(metadata=dict(static=True))  # padded
    n_src: int = dataclasses.field(metadata=dict(static=True))  # padded
    block_r: int = dataclasses.field(metadata=dict(static=True))
    block_s: int = dataclasses.field(metadata=dict(static=True))
    tile_c: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_tiles(self) -> int:
        return int(self.packed.shape[0])

    @property
    def num_dst_blocks(self) -> int:
        return self.n_dst // self.block_r


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_tiles(
    src: np.ndarray,
    dst: np.ndarray,
    vals: np.ndarray,
    n_src: int,
    n_dst: int,
    block_r: int = 256,
    block_s: int = 256,
    tile_c: int = 256,
) -> TiledEdges:
    """Bucket edges by (dst block, src block), chunk into C-edge tiles."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float32)
    keep = vals != 0.0
    src, dst, vals = src[keep], dst[keep], vals[keep]

    n_src_pad = _round_up(max(n_src, 1), block_s)
    n_dst_pad = _round_up(max(n_dst, 1), block_r)
    num_dst_blocks = n_dst_pad // block_r

    # Native fast path (C++ sort + pack); identical output layout.
    from decagon_tpu import native

    native_result = native.build_tiles_arrays(
        src, dst, vals, block_r, block_s, tile_c,
        num_dst_blocks, n_src_pad // block_s,
    )
    if native_result is not None:
        packed_arr, src_block_arr, row_ptr = native_result
        return TiledEdges(
            packed=jnp.asarray(packed_arr),
            src_block=jnp.asarray(src_block_arr),
            row_ptr=jnp.asarray(row_ptr),
            n_dst=n_dst_pad,
            n_src=n_src_pad,
            block_r=block_r,
            block_s=block_s,
            tile_c=tile_c,
        )

    db = dst // block_r
    sb = src // block_s
    order = np.lexsort((src, sb, db))
    src, dst, vals, db, sb = (
        src[order], dst[order], vals[order], db[order], sb[order]
    )

    # Group boundaries where (db, sb) changes.
    if src.size:
        group_key = db * (n_src_pad // block_s) + sb
        boundaries = np.flatnonzero(np.diff(group_key)) + 1
        starts = np.concatenate([[0], boundaries])
        ends = np.concatenate([boundaries, [src.size]])
    else:
        starts = ends = np.empty(0, dtype=np.int64)

    tiles_packed = []
    tiles_src_block = []
    tiles_db = []
    for start, end in zip(starts, ends):
        for chunk_start in range(start, end, tile_c):
            chunk_end = min(chunk_start + tile_c, end)
            count = chunk_end - chunk_start
            packed = np.zeros((4, tile_c), dtype=np.int32)
            packed[0, :count] = src[chunk_start:chunk_end] % block_s
            packed[1, :count] = dst[chunk_start:chunk_end] % block_r
            packed[2, :count] = (
                vals[chunk_start:chunk_end].view(np.int32)
            )
            tiles_packed.append(packed)
            tiles_src_block.append(sb[chunk_start])
            tiles_db.append(db[chunk_start])

    num_tiles = max(1, len(tiles_packed))
    if tiles_packed:
        packed_arr = np.stack(tiles_packed)
        src_block_arr = np.asarray(tiles_src_block, dtype=np.int32)
        db_arr = np.asarray(tiles_db, dtype=np.int64)
    else:
        packed_arr = np.zeros((1, 4, tile_c), dtype=np.int32)
        src_block_arr = np.zeros(1, dtype=np.int32)
        db_arr = np.zeros(1, dtype=np.int64)
        db_arr[0] = 0

    row_ptr = np.zeros(num_dst_blocks + 1, dtype=np.int32)
    counts = np.bincount(db_arr, minlength=num_dst_blocks)
    if not tiles_packed:
        counts[:] = 0
        counts[0] = 1  # the single all-padding tile
    row_ptr[1:] = np.cumsum(counts)

    return TiledEdges(
        packed=jnp.asarray(packed_arr),
        src_block=jnp.asarray(src_block_arr),
        row_ptr=jnp.asarray(row_ptr),
        n_dst=n_dst_pad,
        n_src=n_src_pad,
        block_r=block_r,
        block_s=block_s,
        tile_c=tile_c,
    )


def tiling_stats(tiles: TiledEdges) -> dict:
    """Occupancy diagnostics: padding waste drives kernel efficiency."""
    vals = np.asarray(tiles.packed[:, 2, :]).view(np.float32)
    nnz = int(np.count_nonzero(vals))
    capacity = tiles.num_tiles * tiles.tile_c
    return {
        "num_tiles": tiles.num_tiles,
        "nnz": nnz,
        "capacity": capacity,
        "occupancy": nnz / max(1, capacity),
    }
