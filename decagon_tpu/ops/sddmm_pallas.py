"""Pallas TPU SDDMM kernel: fused one-hot-matmul gather + bilinear scoring.

The eval-scale decoder scoring op (BASELINE "custom Pallas SpMM and SDDMM
kernels"; reference dense ``Z R Z^T`` reconstruction at
``decagon/deep/layers.py:121-213`` / ``optimizer.py:51-57``) is, in
sampled form, three row gathers plus a tiny bilinear chain per edge:

    score[e] = ((z[rows[e]] * d[ks[e]]) @ G) . (z[cols[e]] * d[ks[e]])

The XLA path (``decagon_tpu.ops.sddmm``) routes the three gathers through
XLA's row-gather, which runs ~226 ns/edge at eval scale on v5e
(``artifacts/perf/sddmm_profile.json``).  This kernel keeps the node and
relation tables resident in VMEM for the whole launch and performs every
gather as a ONE-HOT MATMUL on the MXU — the same trick that makes the
SpMM kernel (``ops/spmm_pallas.py``) compile: ``gather(T, idx) ==
onehot(idx) @ T`` with the one-hot built by lane-aligned iota comparison.
No ``tpu.dynamic_gather`` anywhere, so Mosaic's single-vreg gather
limitation (the round-3 blocker: "Multiple source vregs along gather
dimension") does not apply; the kernel compiles and runs at full speed.

Per edge tile of ``bt`` edges the kernel builds three one-hots
(``[bt, T_rows]``, ``[bt, T_cols]``, ``[bt, T_rel]``), gathers via three
MXU matmuls, then runs the bilinear chain — HBM traffic is just the
``int32`` edge indices in and one ``f32`` score out (16 B/edge).  MXU
cost is ~2*(T_rows + T_cols + T_rel)*128 flops/edge: at drug-drug eval
scale (645-row tables, 1926 relations) ~1 Mflop/edge, a few ms per
full 963-relation sweep — against ~100 ms for the XLA gather path.

One-hot gathers are EXACT at fp32/HIGHEST precision (each output row is
1.0 * table_row summed with zeros; the 6-pass bf16 decomposition of an
fp32 operand is lossless), so "highest" reproduces the jnp path
bit-for-bit up to reduction order.  "default" runs the one-hots and the
chain in bf16 single-pass (fp32 accumulation): ~6x less MXU work, score
error ~1e-2 relative — fine for AUROC ranking, selectable per call.

Decoders: innerproduct, distmult (per-relation diagonal), dedicom
(shared global ``G`` + per-relation diagonal), and bilinear (round 5):
the per-relation full ``[d, d]`` matrices flatten to a ``[K, d*d]``
table gathered by the SAME one-hot matmul, and the per-edge bilinear
form becomes ``rowsum(R_flat[e] * (zr @ E1) * (zc @ E2))`` where
``E1[a, a*d+b] = E2[b, a*d+b] = 1`` are constant lane expanders — one
more matmul, no 3D gather.  The flattened relation table is ``d*d``
lanes wide, so bilinear needs more VMEM than the diagonal decoders;
``supports`` accounts for it per precision.

Forward-only by design: training scores 512-edge batches (gather cost
~nothing); this kernel exists for the 10^5-10^6-edge evaluation sweeps.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Decoder families this kernel supports (see module docstring).
SUPPORTED_DECODERS = ("innerproduct", "distmult", "dedicom", "bilinear")

_LANES = 128

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _onehot_gather(table, idx_col, precision):
    """``out[i, :] = table[idx_col[i, 0], :]`` as an MXU one-hot matmul.

    ``table`` [T, L]; ``idx_col`` [bt, 1] int32.  Exact for fp32 tables at
    HIGHEST precision (1.0 is representable in every bf16 pass)."""
    t = table.shape[0]
    bt = idx_col.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (bt, t), 1)
    oh = (iota == idx_col).astype(table.dtype)
    return jax.lax.dot_general(
        oh,
        table,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _sddmm_kernel(*refs, mode: str, precision, compute_dtype):
    if mode == "dedicom":
        z_r_ref, z_c_ref, rel_ref, g_ref, ks_ref, rows_ref, cols_ref, out_ref = refs
    elif mode == "distmult":
        z_r_ref, z_c_ref, rel_ref, ks_ref, rows_ref, cols_ref, out_ref = refs
    elif mode == "bilinear":
        (z_r_ref, z_c_ref, relf_ref, e1_ref, e2_ref,
         ks_ref, rows_ref, cols_ref, out_ref) = refs
    else:  # innerproduct
        z_r_ref, z_c_ref, ks_ref, rows_ref, cols_ref, out_ref = refs

    zr = _onehot_gather(z_r_ref[:], rows_ref[:], precision)  # [bt, L] f32
    zc = _onehot_gather(z_c_ref[:], cols_ref[:], precision)
    if mode == "bilinear":
        # score[e] = sum_{a,b} zr[e,a] R[k_e,a,b] zc[e,b]
        #          = rowsum(Rflat[k_e] * (zr @ E1) * (zc @ E2))
        rk = _onehot_gather(relf_ref[:], ks_ref[:], precision)  # [bt, d2]
        zr_rep = jax.lax.dot_general(
            zr.astype(compute_dtype), e1_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        zc_rep = jax.lax.dot_general(
            zc.astype(compute_dtype), e2_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        out_ref[:] = jnp.sum(rk * zr_rep * zc_rep, axis=1, keepdims=True)
        return
    if mode == "dedicom":
        dk = _onehot_gather(rel_ref[:], ks_ref[:], precision)
        left = jnp.dot(
            (zr * dk).astype(compute_dtype),
            g_ref[:],
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        right = zc * dk
    elif mode == "distmult":
        left = zr * _onehot_gather(rel_ref[:], ks_ref[:], precision)
        right = zc
    else:
        left, right = zr, zc
    out_ref[:] = jnp.sum(left * right, axis=1, keepdims=True)


def _pad_table(table: jax.Array, t: int, dtype) -> jax.Array:
    n, d = table.shape
    return jnp.pad(table, ((0, t - n), (0, _LANES - d))).astype(dtype)


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
    rel_full: Optional[jax.Array] = None,
    tile: int = 0,
    interpret: bool = False,
    precision: str = "highest",
) -> jax.Array:
    """Fused-gather edge scoring: ``[B]`` logits for ``(ks, rows, cols)``.

    ``z_rows`` / ``z_cols``: [N_r, d] / [N_c, d] node embedding tables
    (d <= 128).  ``rel_diag``: [K, d] per-relation diagonal (distmult's
    ``relation_diag`` or dedicom's ``local_diag``).  ``glb``: [d, d]
    shared interaction matrix (dedicom).  ``ks/rows/cols``: int32 index
    arrays of any (identical) shape; padding indices may be anything
    in-table (callers trim).  ``tile``: edges per grid step.
    ``precision``: "highest" (exact fp32 vs
    ``decagon_tpu.ops.sddmm.sddmm_pairs``) or "default" (bf16 MXU
    passes, ~1e-2 relative error, ~6x less MXU work).
    """
    if name not in SUPPORTED_DECODERS:
        raise ValueError(
            f"sddmm_pallas supports {SUPPORTED_DECODERS}, not {name!r}"
        )
    d = z_rows.shape[1]
    if d > _LANES:
        raise ValueError(f"feature dim {d} exceeds one lane tile ({_LANES})")
    prec = _PRECISIONS[precision]
    compute_dtype = jnp.float32 if precision == "highest" else jnp.bfloat16
    if tile <= 0:
        # bilinear's [tile, d*d] f32 intermediates dominate its VMEM;
        # a half tile keeps the paper-scale footprint under budget.
        tile = 256 if name == "bilinear" else 512
    out_shape = ks.shape
    ks = ks.reshape(-1)
    rows = rows.reshape(-1)
    cols = cols.reshape(-1)
    b = ks.shape[0]

    bt = tile
    t_r = _round_up(max(z_rows.shape[0], 8), _LANES)
    t_c = _round_up(max(z_cols.shape[0], 8), _LANES)
    if name == "bilinear":
        t_k = _round_up(max(rel_full.shape[0], 8), _LANES)
    elif rel_diag is not None and name != "innerproduct":
        t_k = _round_up(max(rel_diag.shape[0], 8), _LANES)
    else:
        t_k = 0
    b_pad = _round_up(max(b, 1), bt)

    def pad_idx(a):
        return jnp.pad(a.astype(jnp.int32), (0, b_pad - b)).reshape(-1, 1)

    tables = [
        _pad_table(z_rows, t_r, compute_dtype),
        _pad_table(z_cols, t_c, compute_dtype),
    ]
    if name in ("distmult", "dedicom"):
        tables.append(_pad_table(rel_diag, t_k, compute_dtype))
    if name == "dedicom":
        tables.append(
            jnp.pad(glb, ((0, _LANES - d), (0, _LANES - d))).astype(
                compute_dtype
            )
        )
    if name == "bilinear":
        import numpy as _np

        k_rel = rel_full.shape[0]
        d2 = _round_up(d * d, _LANES)
        relf = jnp.pad(
            rel_full.reshape(k_rel, d * d),
            ((0, t_k - k_rel), (0, d2 - d * d)),
        ).astype(compute_dtype)
        e1 = _np.zeros((_LANES, d2), _np.float32)
        e2 = _np.zeros((_LANES, d2), _np.float32)
        for a in range(d):
            e1[a, a * d : (a + 1) * d] = 1.0
        for bb in range(d):
            e2[bb, bb::d][: d] = 1.0
        tables += [
            relf,
            jnp.asarray(e1, compute_dtype),
            jnp.asarray(e2, compute_dtype),
        ]

    table_specs = [
        pl.BlockSpec(
            tab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        for tab in tables
    ]
    idx_spec = pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    # MXU flops: 2*bt*T*L per one-hot gather (+ the dedicom chain /
    # bilinear expanders over the d*d-lane flattened relation table).
    d2 = _round_up(d * d, _LANES)
    if name == "bilinear":
        gather_flops = (
            2 * bt * (t_r + t_c) * _LANES + 2 * bt * t_k * d2
        )
        chain_flops = 2 * 2 * bt * _LANES * d2
    else:
        gather_flops = 2 * bt * (t_r + t_c + t_k) * _LANES
        chain_flops = 2 * bt * _LANES * _LANES if name == "dedicom" else 0
    out = pl.pallas_call(
        functools.partial(
            _sddmm_kernel, mode=name, precision=prec,
            compute_dtype=compute_dtype,
        ),
        grid=(b_pad // bt,),
        in_specs=table_specs + [idx_spec] * 3,
        out_specs=pl.BlockSpec(
            (bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=(b_pad // bt) * (gather_flops + chain_flops),
            # Tables load into VMEM once per launch (constant index map);
            # per-step traffic is the index tiles + score tile.
            bytes_accessed=b_pad * 16
            + sum(tab.size * tab.dtype.itemsize for tab in tables),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*tables, pad_idx(ks), pad_idx(rows), pad_idx(cols))
    return out[:b, 0].reshape(out_shape)


def supports(name: str, n_rows: int, n_cols: int, num_rel: int,
             dim: int, max_table: int = 8192, tile: int = 0,
             vmem_budget: int = 12 * 1024 * 1024,
             precision: str = "highest") -> bool:
    """Static eligibility check for the kernel (see module docstring).

    Bounds the VMEM footprint at the given precision: the padded tables
    stay resident for the whole launch, and each grid step materializes
    three ``[tile, T]`` one-hot operands plus gathered/intermediate
    tiles (``[tile, 128]``, or ``[tile, d*d]`` for bilinear's flattened
    relation table).  12 MB of the ~16 MB VMEM leaves headroom for
    Mosaic's own buffers."""
    if name not in SUPPORTED_DECODERS or dim > _LANES:
        return False
    if tile <= 0:
        tile = 256 if name == "bilinear" else 512
    isz = 4 if precision == "highest" else 2
    t_r = _round_up(max(n_rows, 8), _LANES)
    t_c = _round_up(max(n_cols, 8), _LANES)
    t_k = _round_up(max(num_rel, 8), _LANES) if name != "innerproduct" else 0
    if max(t_r, t_c, t_k) > max_table:
        return False
    if name == "bilinear":
        d2 = _round_up(dim * dim, _LANES)
        table_bytes = (
            (t_r + t_c) * _LANES + t_k * d2 + 2 * _LANES * d2
        ) * isz
        onehot_bytes = tile * (t_r + t_c + t_k) * isz
        # rk / zr_rep / zc_rep / product at f32 + zr/zc
        intermediate_bytes = 4 * tile * d2 * 4 + 2 * tile * _LANES * 4
    else:
        table_bytes = (t_r + t_c + t_k) * _LANES * isz
        if name == "dedicom":
            table_bytes += _LANES * _LANES * isz
        onehot_bytes = tile * (t_r + t_c + t_k) * isz
        intermediate_bytes = 5 * tile * _LANES * 4  # zr/zc/dk/left/right
    idx_out_bytes = 4 * tile * 4  # three index tiles + one out tile
    return (
        table_bytes + onehot_bytes + intermediate_bytes + idx_out_bytes
        <= vmem_budget
    )
