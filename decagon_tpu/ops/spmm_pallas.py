"""Pallas TPU SpMM kernel: tile-blocked one-hot matmul formulation.

Replaces the XLA gather+segment-sum path for the multi-relational
aggregation ``out[dst] += val * P_flat[src]`` (the hot op behind the two
``tf.sparse_tensor_dense_matmul`` calls at reference
``decagon/deep/layers.py:89-90,114``).

Formulation: edges are pre-tiled on host (``decagon_tpu.ops.tiling``)
into per-dst-block tiles of C src-sorted edges whose sources fit one
dynamic ``block_s``-row window of the source space.  Per tile the kernel

  1. DMAs the tile's packed edge data and its source block of ``P_flat``
     from HBM into double-buffered VMEM scratch,
  2. builds a one-hot scatter of edge values against the source block by
     lane-aligned iota comparison (``S x C``; no transposes),
  3. computes ``msgs[C, H] = src_oh^T @ src_window`` on the MXU,
  4. accumulates ``out_block[R, H] += dst_oh @ msgs`` on the MXU,

so the whole sparse aggregation becomes dense systolic-array work —
~2·H·(S+R) FLOPs per edge at full tile occupancy — with DMA overlapped
via two-slot pipelining.  The backward pass is the same kernel run over a
transposed tiling (cotangents scattered into the [K*N_src, H] space).

The kernel is numerically exact (fp32 accumulation) and autodiff-
complete via custom_vjp; ``decagon_tpu.ops.segment.spmm`` dispatches
between this and the XLA path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from decagon_tpu.ops.tiling import TiledEdges


def _spmm_kernel(
    row_ptr_ref,  # SMEM [num_dst_blocks + 1] int32 (scalar prefetch)
    src_start_ref,  # SMEM [T] int32 (scalar prefetch): window start rows
    packed_hbm,  # HBM [T, 2, C] int32 (dst<<16|src, f32-bitcast vals)
    p_hbm,  # HBM [M_pad, H] float32
    out_ref,  # VMEM [R, H] float32
    tile_buf,  # VMEM [2, 2, C] int32 scratch
    src_buf,  # VMEM [2, S, H] float32 scratch
    tile_sem,  # DMA sems (2,)
    src_sem,  # DMA sems (2,)
    *,
    block_s: int,
    precision,
):
    b = pl.program_id(0)
    t0 = row_ptr_ref[b]
    t1 = row_ptr_ref[b + 1]
    out_ref[:] = jnp.zeros_like(out_ref)

    r = out_ref.shape[0]
    s = src_buf.shape[1]
    c = tile_buf.shape[2]

    def tile_dma(slot, t):
        return pltpu.make_async_copy(
            packed_hbm.at[t], tile_buf.at[slot], tile_sem.at[slot]
        )

    def src_dma(slot, t):
        # Dynamic source window: starts at the tile's own first source
        # row (host guarantees 8-aligned, <= n_src_pad - block_s).
        ws = pl.multiple_of(src_start_ref[t], 8)
        return pltpu.make_async_copy(
            p_hbm.at[pl.ds(ws, s), :],
            src_buf.at[slot],
            src_sem.at[slot],
        )

    @pl.when(t1 > t0)
    def _warmup():
        tile_dma(0, t0).start()
        src_dma(0, t0).start()

    def body(i, _):
        t = t0 + i
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        @pl.when(t + 1 < t1)
        def _prefetch():
            tile_dma(nslot, t + 1).start()
            src_dma(nslot, t + 1).start()

        tile_dma(slot, t).wait()
        src_dma(slot, t).wait()

        both = tile_buf[slot, 0:1, :]  # [1, C] int32: dst<<16 | src
        src_local = jax.lax.bitwise_and(both, 0xFFFF)
        dst_local = jax.lax.shift_right_logical(both, 16)
        vals = pltpu.bitcast(tile_buf[slot, 1:2, :], jnp.float32)  # [1, C]

        # One-hot gather matrix [S, C]: column c holds vals[c] at row
        # src_local[c].  Lane-aligned broadcasts only (no relayouts).
        # Built in f32 (Mosaic rejects the sublane-1 bf16 broadcast),
        # then converted whole-tile to the window dtype: with bf16
        # source windows (PALLAS_NOTE lever 3) the window DMA — the
        # kernel's dominant HBM traffic — halves, and the MXU runs a
        # native single-pass bf16 matmul with fp32 accumulation.
        iota_sc = jax.lax.broadcasted_iota(jnp.int32, (s, c), 0)
        src_oh = jnp.where(iota_sc == src_local, vals, 0.0).astype(
            src_buf.dtype
        )
        msgs = jax.lax.dot_general(
            src_oh,
            src_buf[slot],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # [C, H]

        iota_rc = jax.lax.broadcasted_iota(jnp.int32, (r, c), 0)
        dst_oh = jnp.where(iota_rc == dst_local, 1.0, 0.0)  # [R, C]
        out_ref[:] += jnp.dot(
            dst_oh, msgs, preferred_element_type=jnp.float32,
            precision=precision,
        )
        return 0

    jax.lax.fori_loop(0, t1 - t0, body, 0)


def spmm_tiled(
    p_flat: jax.Array,
    tiles: TiledEdges,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """``out[n_dst_pad, H] = scatter-add of tiled edges over p_flat``.

    ``p_flat`` rows are zero-padded to ``tiles.n_src`` here; the returned
    array has ``tiles.n_dst`` (padded) rows — slice to taste.
    """
    m, h_in = p_flat.shape
    # HBM->VMEM DMA slices need lane alignment: pad the feature dim to a
    # multiple of 128 (sliced back off by the caller via [:, :H]).
    h = ((h_in + 127) // 128) * 128
    pad_rows = max(0, tiles.n_src - m)
    if pad_rows or h != h_in:
        p_flat = jnp.pad(p_flat, ((0, pad_rows), (0, h - h_in)))
    # bf16 source windows (PALLAS_NOTE lever 3): at DEFAULT precision
    # the source table lives in HBM as bf16, halving the per-tile window
    # DMA that dominates the kernel's HBM traffic; accumulation and the
    # output stay fp32.
    src_dtype = (
        jnp.bfloat16
        if precision == jax.lax.Precision.DEFAULT
        else jnp.float32
    )
    p_flat = p_flat.astype(src_dtype)
    c = tiles.tile_c
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles.num_dst_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (tiles.block_r, h),
            lambda b, *_: (b, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, c), jnp.int32),
            pltpu.VMEM((2, tiles.block_s, h), src_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    flops = 2 * tiles.num_tiles * c * h * (tiles.block_s + tiles.block_r)
    return pl.pallas_call(
        functools.partial(
            _spmm_kernel, block_s=tiles.block_s, precision=precision
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tiles.n_dst, h), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=tiles.num_tiles
            * (tiles.block_s * h * p_flat.dtype.itemsize + 8 * c)
            + tiles.n_dst * h * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(tiles.row_ptr, tiles.src_start, tiles.packed, p_flat)


_PRECISIONS = {
    # fp32 MXU passes (exact-ish; 6-pass decomposition) vs single-pass
    # bf16 (2x+ faster on the compute-bound one-hot matmuls; values and
    # features rounded to bf16, accumulation stays fp32).
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _spmm_pallas_op(
    p_stack: jax.Array,
    tiles_fwd: TiledEdges,
    tiles_bwd: TiledEdges,
    n_rows: int,
    interpret: bool,
    precision: str,
) -> jax.Array:
    k, n, h = p_stack.shape
    out = spmm_tiled(
        p_stack.reshape(k * n, h), tiles_fwd, interpret,
        precision=_PRECISIONS[precision],
    )
    return out[:n_rows, :h]


def _fwd(p_stack, tiles_fwd, tiles_bwd, n_rows, interpret, precision):
    out = _spmm_pallas_op(
        p_stack, tiles_fwd, tiles_bwd, n_rows, interpret, precision
    )
    return out, (tiles_bwd, p_stack.shape)


def _bwd(n_rows, interpret, precision, residuals, ct):
    tiles_bwd, (k, n, h) = residuals
    d_flat = spmm_tiled(
        ct, tiles_bwd, interpret, precision=_PRECISIONS[precision]
    )  # [K*N padded, Hpad]
    d_p = d_flat[: k * n, :h].reshape(k, n, h)
    # Cotangents for the (integer) tile structures are structural zeros.
    return (d_p, None, None)


_spmm_pallas_op.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _spmm_pallas_flat_op(
    p_flat: jax.Array,
    tiles_fwd: TiledEdges,
    tiles_bwd: TiledEdges,
    n_rows: int,
    interpret: bool,
    precision: str,
) -> jax.Array:
    _, h = p_flat.shape
    out = spmm_tiled(
        p_flat, tiles_fwd, interpret, precision=_PRECISIONS[precision]
    )
    return out[:n_rows, :h]


def _flat_fwd(p_flat, tiles_fwd, tiles_bwd, n_rows, interpret, precision):
    out = _spmm_pallas_flat_op(
        p_flat, tiles_fwd, tiles_bwd, n_rows, interpret, precision
    )
    return out, (tiles_bwd, p_flat.shape)


def _flat_bwd(n_rows, interpret, precision, residuals, ct):
    tiles_bwd, (m, h) = residuals
    d_flat = spmm_tiled(
        ct, tiles_bwd, interpret, precision=_PRECISIONS[precision]
    )
    return (d_flat[:m, :h], None, None)


_spmm_pallas_flat_op.defvjp(_flat_fwd, _flat_bwd)


def spmm_pallas_flat(
    p_flat: jax.Array,
    fused,
    interpret: bool = False,
    precision: str = "highest",
) -> jax.Array:
    """Fused-stream SpMM via the tiled Pallas kernel: scatter the global
    projected table ``p_flat [n_p_rows, H]`` into the term space
    ``[n_t_rows, H]`` in ONE kernel launch (``fused`` must carry tilings
    from ``build_device_graph(..., tile_for_pallas=True)``)."""
    if fused.tiles_fwd is None or fused.tiles_bwd is None:
        raise ValueError(
            "fused stream has no tilings; build the device graph with "
            "tile_for_pallas=True to use the fused Pallas SpMM"
        )
    return _spmm_pallas_flat_op(
        p_flat, fused.tiles_fwd, fused.tiles_bwd, fused.n_t_rows,
        interpret, precision,
    )


def spmm_pallas(
    p_stack: jax.Array,
    adj,
    interpret: bool = False,
    precision: str = "highest",
) -> jax.Array:
    """SpMM via the tiled Pallas kernel; ``adj`` must carry tilings
    (``EdgeTypeAdj.tiles_fwd`` / ``tiles_bwd`` from
    ``build_device_graph(..., tile_for_pallas=True)``)."""
    if adj.tiles_fwd is None or adj.tiles_bwd is None:
        raise ValueError(
            "adjacency has no tilings; build the device graph with "
            "tile_for_pallas=True to use the Pallas SpMM"
        )
    return _spmm_pallas_op(
        p_stack, adj.tiles_fwd, adj.tiles_bwd, adj.n_rows, interpret, precision
    )
