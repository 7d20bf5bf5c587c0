"""Host-side 2D tiling of flattened relation edge streams for the Pallas
SpMM kernel.

The multi-relational aggregation ``out[dst] += val * P_flat[src]`` (with
``src`` indexing the [K*N_src, H] stacked projection) is reorganized into
MXU-shaped work: edges are sorted by (dst block, src) and greedily packed
into fixed-size tiles of C edges whose sources all fall inside ONE
dynamic window of ``block_s`` rows of the source space.  Inside the
kernel each tile becomes two small dense matmuls (gather via a
comparison-generated one-hot, scatter via its transpose) — turning
irregular sparse access into systolic-array work, per the "sparse GNNs
on dense hardware" playbook (PAPERS.md).

Dynamic windows (this round) replace the round-2 fixed source-block
grid: bucketing by (dst block x src block) forced one tile per nonempty
bucket, which collapsed occupancy to 0.06 on the rectangular
protein<->drug edge types (19k-row source spaces scatter every bucket).
A window that starts at each tile's own first source row keeps tiles
full as long as C src-sorted edges span <= block_s source rows —
occupancy is now bounded by the graph's local density, not by a grid.

Tile data is packed as one int32 array [T, 2, C] — row 0 holds
``(dst_local << 16) | src_local`` (both block-local indices fit 16 bits:
block heights are capped at 4096), row 1 the float32-bitcast edge values
— so the kernel fetches one 8C-byte DMA per tile.
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

    ``packed``: [T, 2, C] int32 — per tile: row 0 is
    ``(dst_local << 16) | src_local`` (dst index local to the tile's dst
    block, src index local to its source window), row 1 edge values
    bitcast from float32.  Padding slots have val == 0.
    ``src_start``: [T] int32 — first source row of the tile's window
    (8-aligned, clamped to ``n_src - block_s``); the kernel DMAs
    ``P[src_start : src_start + block_s]``.
    ``row_ptr``: [num_dst_blocks + 1] int32 — tiles are sorted by dst
    block; tiles of dst block b are ``row_ptr[b]:row_ptr[b+1]``.
    """

    packed: jax.Array
    src_start: jax.Array
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


def _window_tile_bounds(
    src: np.ndarray,
    dst: np.ndarray,
    n_src_pad: int,
    block_r: int,
    block_s: int,
    tile_c: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy windowed tile boundaries over (dst-block, src)-sorted edges.

    Returns (starts [T], window_start [T], dst_block [T]): tile t covers
    edges ``starts[t]:starts[t+1]`` (sentinel appended), all within one
    dst block and with sources inside ``[window_start[t],
    window_start[t] + block_s)``.
    """
    starts, windows, dblocks = [], [], []
    m = src.shape[0]
    db = dst // block_r
    # dst-block group boundaries
    blk_bounds = np.flatnonzero(np.diff(db)) + 1
    group_edges = np.concatenate([[0], blk_bounds, [m]])
    max_ws = n_src_pad - block_s
    for g in range(len(group_edges) - 1):
        i, end = int(group_edges[g]), int(group_edges[g + 1])
        while i < end:
            ws = min(int(src[i]) & ~7, max_ws)
            # next break: window overflow or tile capacity
            j = int(
                np.searchsorted(src[i:end], ws + block_s, side="left")
            ) + i
            j = min(j, i + tile_c)
            starts.append(i)
            windows.append(ws)
            dblocks.append(int(db[i]))
            i = j
    return (
        np.asarray(starts, np.int64),
        np.asarray(windows, np.int64),
        np.asarray(dblocks, np.int64),
    )


_MXU_FLOPS_PER_S = 2.0e14  # ~bf16 MXU rate, relative units only
_HBM_BYTES_PER_S = 8.2e11


def _greedy_tile_count(
    src_sorted: np.ndarray,
    db_sorted: np.ndarray,
    n_src_pad: int,
    block_s: int,
    tile_c: int,
) -> int:
    """Number of greedy windowed tiles over (dst-block, src)-sorted edges."""
    m = src_sorted.size
    tiles = 0
    blk_bounds = np.flatnonzero(np.diff(db_sorted)) + 1
    group_edges = np.concatenate([[0], blk_bounds, [m]])
    max_ws = n_src_pad - block_s
    for g in range(len(group_edges) - 1):
        i, end = int(group_edges[g]), int(group_edges[g + 1])
        while i < end:
            ws = min(int(src_sorted[i]) & ~7, max_ws)
            j = int(
                np.searchsorted(
                    src_sorted[i:end], ws + block_s, side="left"
                )
            ) + i
            i = min(j, i + tile_c)
            tiles += 1
    return tiles


def select_tile_geometry(
    src: np.ndarray,
    dst: np.ndarray,
    n_src: int,
    n_dst: int,
    tile_c: int = 0,
    h: int = 128,
    sample_blocks: int = 8,
    r_candidates=(256, 512, 1024, 2048, 4096),
    s_candidates=(256, 512, 1024, 2048, 4096),
    c_candidates=(256, 512, 1024),
) -> Tuple[int, int, int]:
    """Pick (block_r, block_s, tile_c) minimizing the modeled kernel time.

    Per tile the one-hot kernel costs ``2*C*H*(S+R)`` MXU flops and DMAs
    an ``S x H`` fp32 source window plus ``8*C`` packed bytes, for
    ``C * occupancy`` edges — so per-edge flops scale as
    ``2H(S+R)/occ`` and per-edge DMA as ``(4SH + 8C)/(C*occ)``: tall
    windows/output blocks only pay when they raise occupancy enough,
    while larger C amortizes the window DMA wherever the local density
    supports filling it.  Occupancy (tile counts) is measured
    empirically by running the greedy packer over a uniform sample of
    dst blocks (analytic density estimates are badly pessimistic on
    clustered graphs); every (R, S, C) candidate is scored with the
    flops+DMA model and the argmin wins.
    """
    if tile_c > 0:
        c_candidates = (tile_c,)
    if src.size == 0:
        return r_candidates[0], s_candidates[0], c_candidates[0]
    rng = np.random.default_rng(0)
    best = (float("inf"), r_candidates[0], s_candidates[0], c_candidates[0])
    for r in r_candidates:
        if r > _round_up(max(n_dst, 1), r_candidates[0]) and r != r_candidates[0]:
            break  # output block taller than the whole table
        db = dst // r
        blocks = np.unique(db)
        if len(blocks) <= sample_blocks:
            pick = blocks
            s_src, s_db = src, db
        else:
            pick = rng.choice(blocks, sample_blocks, replace=False)
            mask = np.isin(db, pick)
            s_src, s_db = src[mask], db[mask]
        order = np.lexsort((s_src, s_db))
        s_src, s_db = s_src[order], s_db[order]
        scale = len(blocks) / max(len(pick), 1)
        for s in s_candidates:
            n_src_pad = _round_up(max(n_src, 1), s)
            if s > n_src_pad:
                continue
            saturated = False
            for c in c_candidates:
                tiles = _greedy_tile_count(s_src, s_db, n_src_pad, s, c)
                tiles_est = tiles * scale
                per_tile = (
                    2.0 * c * h * (s + r) / _MXU_FLOPS_PER_S
                    + (s * h * 4.0 + 8.0 * c) / _HBM_BYTES_PER_S
                )
                cost = tiles_est * per_tile
                if cost < best[0]:
                    best = (cost, r, s, c)
                saturated = saturated or tiles * c <= 1.08 * s_src.size
            if s >= n_src_pad:
                break  # window already covers the whole source space
            if saturated:
                # Tiles are already ~full at this window height; taller
                # windows only add flops/DMA per tile.
                break
    return best[1], best[2], best[3]


def build_tiles(
    src: np.ndarray,
    dst: np.ndarray,
    vals: np.ndarray,
    n_src: int,
    n_dst: int,
    block_r: int = 0,
    block_s: int = 0,
    tile_c: int = 0,
) -> TiledEdges:
    """Sort edges by (dst block, src); greedily pack windowed C-edge tiles.

    ``block_r=0`` / ``block_s=0`` / ``tile_c=0`` auto-select the
    output-block height / source-window height / tile capacity via the
    sampled cost model (``select_tile_geometry``)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float32)
    keep = vals != 0.0
    src, dst, vals = src[keep], dst[keep], vals[keep]

    if block_r <= 0 or block_s <= 0 or tile_c <= 0:
        block_r, block_s, tile_c = select_tile_geometry(
            src, dst, n_src, n_dst, tile_c,
            r_candidates=(block_r,) if block_r > 0 else
            (256, 512, 1024, 2048, 4096),
            s_candidates=(block_s,) if block_s > 0 else
            (256, 512, 1024, 2048, 4096),
        )
    n_src_pad = _round_up(max(n_src, 1), block_s)
    n_dst_pad = _round_up(max(n_dst, 1), block_r)
    num_dst_blocks = n_dst_pad // block_r

    # Native fast path (C++ sort + greedy pack); identical output layout.
    from decagon_tpu import native

    native_result = native.build_tiles_arrays(
        src, dst, vals, block_r, block_s, tile_c,
        num_dst_blocks, n_src_pad,
    )
    if native_result is not None:
        packed_arr, src_start_arr, row_ptr = native_result
        return TiledEdges(
            packed=jnp.asarray(packed_arr),
            src_start=jnp.asarray(src_start_arr),
            row_ptr=jnp.asarray(row_ptr),
            n_dst=n_dst_pad,
            n_src=n_src_pad,
            block_r=block_r,
            block_s=block_s,
            tile_c=tile_c,
        )

    order = np.lexsort((src, dst // block_r))
    src, dst, vals = src[order], dst[order], vals[order]

    if src.size:
        starts, windows, dblocks = _window_tile_bounds(
            src, dst, n_src_pad, block_r, block_s, tile_c
        )
    else:
        starts = windows = dblocks = np.empty(0, np.int64)

    num_tiles = max(1, len(starts))
    assert block_r <= 32768 and block_s <= 65536, "locals must fit 16 bits"
    packed_arr = np.zeros((num_tiles, 2, tile_c), dtype=np.int32)
    if len(starts):
        # Vectorized fill: per-edge tile id and in-tile offset.
        edge_tile = np.searchsorted(
            starts, np.arange(src.size), side="right"
        ) - 1
        offset = np.arange(src.size) - starts[edge_tile]
        src_local = (src - windows[edge_tile]).astype(np.int32)
        dst_local = (dst - dblocks[edge_tile] * block_r).astype(np.int32)
        packed_arr[edge_tile, 0, offset] = (dst_local << 16) | src_local
        packed_arr[edge_tile, 1, offset] = vals.view(np.int32)
        src_start_arr = windows.astype(np.int32)
        db_arr = dblocks
    else:
        src_start_arr = np.zeros(1, dtype=np.int32)
        db_arr = np.zeros(1, dtype=np.int64)

    row_ptr = np.zeros(num_dst_blocks + 1, dtype=np.int32)
    counts = np.bincount(db_arr, minlength=num_dst_blocks)
    if not len(starts):
        counts[:] = 0
        counts[0] = 1  # the single all-padding tile
    row_ptr[1:] = np.cumsum(counts)

    return TiledEdges(
        packed=jnp.asarray(packed_arr),
        src_start=jnp.asarray(src_start_arr),
        row_ptr=jnp.asarray(row_ptr),
        n_dst=n_dst_pad,
        n_src=n_src_pad,
        block_r=block_r,
        block_s=block_s,
        tile_c=tile_c,
    )


def tiling_stats(tiles: TiledEdges) -> dict:
    """Occupancy diagnostics: padding waste drives kernel efficiency."""
    vals = np.asarray(tiles.packed[:, 1, :]).view(np.float32)
    nnz = int(np.count_nonzero(vals))
    capacity = tiles.num_tiles * tiles.tile_c
    return {
        "num_tiles": tiles.num_tiles,
        "nnz": nnz,
        "capacity": capacity,
        "occupancy": nnz / max(1, capacity),
    }
