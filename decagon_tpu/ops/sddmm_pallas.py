"""Pallas TPU SDDMM kernel: fused gather + bilinear edge scoring.

The eval-scale decoder scoring op (BASELINE "custom Pallas SpMM and SDDMM
kernels"; reference dense ``Z R Z^T`` reconstruction at
``decagon/deep/layers.py:121-213`` / ``optimizer.py:51-57``) is, in
sampled form, three row gathers plus a tiny bilinear chain per edge:

    score[e] = ((z[rows[e]] * d[ks[e]]) @ G) . (z[cols[e]] * d[ks[e]])

The XLA path (``decagon_tpu.ops.sddmm``) materializes each gathered
``[B, d]`` operand in HBM between fusions.  This kernel keeps the node
and relation tables resident in VMEM for the whole launch and fuses
gather -> scale -> MXU matmul -> row reduction per edge tile, so HBM
traffic is just the ``int32`` edge indices in and one ``f32`` score out
(16 B/edge).

Gathers use Mosaic's ``tpu.dynamic_gather`` (lowered from
``jnp.take_along_axis`` along the sublane axis), which requires the
gather operand and index arrays to share a shape — hence ONE padded size
``T`` serves as both the VMEM table height and the edge-tile length
(tables are zero-padded rows; index tiles arrive as ``[T, 1]`` lane-
broadcast to ``[T, lanes]``).  That caps the kernel at node/relation
tables of a few thousand rows — exactly the drug-drug case (645 drugs x
1926 relations) where 963-relation evaluation concentrates its work; the
protein side falls back to the XLA path.

Decoders: innerproduct, distmult (per-relation diagonal), dedicom
(shared global ``G`` + per-relation diagonal).  Bilinear's per-relation
full ``[d, d]`` matrices need a 3D gather — it stays on the XLA path.

Forward-only by design: training scores 512-edge batches (gather cost
~nothing); this kernel exists for the 10^5-10^6-edge evaluation sweeps.

COMPILED-MODE STATUS (measured on v5e, round 3): Mosaic rejects the
gather — ``tpu.dynamic_gather`` with a 1024x128 table fails with
"Not implemented: Multiple source vregs along gather dimension", i.e.
the lowering only supports gather operands spanning ONE vreg (8 f32
rows) along the gathered dimension.  A one-hot-matmul fallback would
cost ``2*t*H`` MXU flops per gathered row — orders of magnitude more
than XLA's native gather at these table sizes — so the jnp path is the
measured-best TPU implementation and this kernel is interpret-mode
verified only (``ModelConfig.sddmm_impl="pallas"``), retained against
future Mosaic gather support.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Decoder families this kernel supports (see module docstring).
SUPPORTED_DECODERS = ("innerproduct", "distmult", "dedicom")

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _gather_rows(table: jax.Array, idx_col: jax.Array) -> jax.Array:
    """``out[i, :] = table[idx_col[i, 0], :]`` via tpu.dynamic_gather.

    ``table`` [T, L] and the lane-broadcast index array must share a
    shape (Mosaic's supported gather form).
    """
    t, lanes = table.shape
    idx = jnp.broadcast_to(idx_col, (t, lanes))
    return jnp.take_along_axis(table, idx, axis=0)


def _sddmm_kernel(*refs, mode: str, precision):
    if mode == "dedicom":
        z_r_ref, z_c_ref, rel_ref, g_ref, ks_ref, rows_ref, cols_ref, out_ref = refs
    elif mode == "distmult":
        z_r_ref, z_c_ref, rel_ref, ks_ref, rows_ref, cols_ref, out_ref = refs
    else:  # innerproduct
        z_r_ref, z_c_ref, ks_ref, rows_ref, cols_ref, out_ref = refs

    zr = _gather_rows(z_r_ref[:], rows_ref[:])
    zc = _gather_rows(z_c_ref[:], cols_ref[:])
    if mode == "dedicom":
        dk = _gather_rows(rel_ref[:], ks_ref[:])
        left = jnp.dot(
            zr * dk, g_ref[:],
            preferred_element_type=jnp.float32, precision=precision,
        )
        right = zc * dk
    elif mode == "distmult":
        left = zr * _gather_rows(rel_ref[:], ks_ref[:])
        right = zc
    else:
        left, right = zr, zc
    out_ref[:] = jnp.sum(left * right, axis=1, keepdims=True)


def _pad_table(table: jax.Array, t: int) -> jax.Array:
    n, d = table.shape
    return jnp.pad(table, ((0, t - n), (0, _LANES - d)))


def sddmm_pallas_edges(
    z_rows: jax.Array,
    z_cols: jax.Array,
    ks: jax.Array,
    rows: jax.Array,
    cols: jax.Array,
    *,
    name: str,
    glb: Optional[jax.Array] = None,
    rel_diag: Optional[jax.Array] = None,
    tile: Optional[int] = None,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Fused-gather edge scoring: ``[B]`` logits for ``(ks, rows, cols)``.

    ``z_rows`` / ``z_cols``: [N_r, d] / [N_c, d] node embedding tables
    (d <= 128).  ``rel_diag``: [K, d] per-relation diagonal (distmult's
    ``relation_diag`` or dedicom's ``local_diag``).  ``glb``: [d, d]
    shared interaction matrix (dedicom).  ``ks/rows/cols``: int32 index
    arrays of any (identical) shape; padding indices may be anything
    in-table (callers trim).  Exact fp32 numerics vs
    ``decagon_tpu.ops.sddmm.sddmm_pairs`` at precision HIGHEST.
    """
    if name not in SUPPORTED_DECODERS:
        raise ValueError(
            f"sddmm_pallas supports {SUPPORTED_DECODERS}, not {name!r}"
        )
    d = z_rows.shape[1]
    if d > _LANES:
        raise ValueError(f"feature dim {d} exceeds one lane tile ({_LANES})")
    out_shape = ks.shape
    ks = ks.reshape(-1)
    rows = rows.reshape(-1)
    cols = cols.reshape(-1)
    b = ks.shape[0]

    min_rows = max(
        z_rows.shape[0],
        z_cols.shape[0],
        rel_diag.shape[0] if rel_diag is not None else 0,
    )
    t = tile if tile is not None else max(1024, _round_up(min_rows, 256))
    if t < min_rows:
        raise ValueError(f"tile {t} smaller than largest table {min_rows}")
    b_pad = _round_up(max(b, 1), t)

    def pad_idx(a):
        return jnp.pad(a.astype(jnp.int32), (0, b_pad - b)).reshape(-1, 1)

    tables = [_pad_table(z_rows, t), _pad_table(z_cols, t)]
    if name in ("distmult", "dedicom"):
        tables.append(_pad_table(rel_diag, t))
    if name == "dedicom":
        tables.append(
            jnp.pad(glb, ((0, _LANES - d), (0, _LANES - d)))
        )

    table_specs = [
        pl.BlockSpec(
            tab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        for tab in tables
    ]
    idx_spec = pl.BlockSpec((t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_sddmm_kernel, mode=name, precision=precision),
        grid=(b_pad // t,),
        in_specs=table_specs + [idx_spec] * 3,
        out_specs=pl.BlockSpec(
            (t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            # dedicom runs one [t, L] x [L, L] MXU matmul per tile; the
            # diagonal decoders are elementwise multiply + row reduction
            # (~3 VPU ops per element) — no matmul term for them.
            flops=(b_pad // t)
            * (
                2 * t * _LANES * _LANES
                if name == "dedicom"
                else 3 * t * _LANES
            ),
            # Tables are loaded into VMEM once per launch (the block index
            # map is constant), not per grid step.
            bytes_accessed=b_pad * 16 + sum(4 * tab.size for tab in tables),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*tables, pad_idx(ks), pad_idx(rows), pad_idx(cols))
    return out[:b, 0].reshape(out_shape)


def supports(name: str, n_rows: int, n_cols: int, num_rel: int,
             dim: int, max_table: int = 4096,
             vmem_budget: int = 12 * 1024 * 1024) -> bool:
    """Static eligibility check for the kernel (see module docstring).

    Bounds the VMEM footprint, not just the table height: the padded f32
    tables (2-3 of [t, 128] + dedicom's [128, 128] global) stay resident
    for the whole launch, and each grid step materializes ~5 gathered/
    intermediate [t, 128] f32 arrays (zr/zc/dk/left/right) plus the
    [t, 1]-brodcast index tiles — at t=4096 that approaches the ~16 MB
    VMEM; 12 MB leaves headroom for Mosaic's own buffers."""
    if name not in SUPPORTED_DECODERS or dim > _LANES:
        return False
    min_rows = max(n_rows, n_cols, num_rel if name != "innerproduct" else 0)
    if min_rows > max_table:
        return False
    t = max(1024, _round_up(min_rows, 256))
    n_tables = {"innerproduct": 2, "distmult": 3, "dedicom": 3}[name]
    table_bytes = n_tables * t * _LANES * 4
    if name == "dedicom":
        table_bytes += _LANES * _LANES * 4
    intermediate_bytes = 5 * t * _LANES * 4  # zr/zc/dk/left/right
    idx_out_bytes = 4 * t * 4  # three index tiles + one out tile
    return table_bytes + intermediate_bytes + idx_out_bytes <= vmem_budget
