"""Paired factored SpMM: one pass over HALF the int8 mask stacks.

Transpose augmentation (reference ``DecagonDataSet.py:212-231``; our
``graph/container.py:with_transposes``) makes every square edge type's
relation list ``[r_0..r_{K-1}, r_0^T..r_{K-1}^T]``, and the flipped-split
invariant (``graph/split.py``; reference ``minibatch.py:143-149``) makes
relation ``K+k``'s train adjacency exactly relation ``k``'s transpose.
With the rank-1 normalization factorization (``ops/segment.
spmm_dense_factored``) the whole aggregation is

    out = sum_k  a_e[k] * (B_k   @ (b_e[k] * p_e[k]))     (direct half)
        + sum_k  a_o[k] * (B_k^T @ (b_o[k] * p_o[k]))     (transposed half)

over ONE int8 mask stack ``B`` of K (not 2K) relations.  The Pallas
kernels below read each ``B_k`` tile ONCE and run BOTH matmuls on it —
halving the dominant HBM traffic of the train step versus the
``dense_mask``/``dense_mask_t`` pair (VERDICT r4 items 1/2/4) — and fuse
IN KERNEL everything the XLA factored path paid extra passes for: the
row-scale reduction over relations (the ``[K, N, H]`` intermediate is
never materialized), the col-scale multiply, and the f32<->bf16 casts
(the projected stack enters f32 and the cotangent leaves f32; the
separate scale/cast/convert fusions in the r4 profile are gone).

Layout: everything rides TRANSPOSED — ``p`` stacks and cotangents are
``[.., H, N]`` (H on sublanes) so per-(relation, node) scale vectors
broadcast as native f32 ``[1, N]`` rows and nothing pads H=64/32 minor
dims to 128 lanes.  Encoder weights for paired edge types are therefore
stored ``[2K, H, F]`` (``models/encoder.py``), which also shrinks the
physical bytes of every Adam/dropout/gradient pass over them by ~40%.

Capability parity target: the two ``tf.sparse_tensor_dense_matmul``
calls at reference ``decagon/deep/layers.py:89-90,114``.

Scope note: paired kernels are the SINGLE-CHIP production path.  Under
the (row, edge) mesh the output of one mask read lands in TWO different
row blocks (the direct half scatters to rows i, the transposed half to
rows j), which breaks the row-partitioned accumulation model the
sharded encoder is built on — multi-chip paired aggregation would need
a per-edge-type row-axis reduce-scatter of both halves' partials.  The
mesh path therefore keeps the dense/factored dispatch
(``parallel/sharded.py``); its T1 reference in ``scaling_model.json``
is the dense-stack step.
"""

from __future__ import annotations

import functools
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

if TYPE_CHECKING:  # pragma: no cover
    from decagon_tpu.graph.device import EdgeTypeAdj

# K is padded to a multiple of the kernel k-block at device-graph build
# time (zero masks / zero scales in the tail) so k-blocked grids never
# read garbage mask or scale data; only the p operand needs an in-kernel
# bounds guard.
PAIR_K_MULTIPLE = 8
# Square edge types wider than this use the 2D-blocked kernel (whole
# [N, N] mask slices no longer fit VMEM).
BIG_N_THRESHOLD = 4096
BIG_BLOCK = 1024


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# --------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------
#
# scale operands: sci rides the i-range (rows 0=a_e for xe's output
# columns, 3=b_o for po's input columns), scj rides the j-range (rows
# 1=a_o for xo's output columns, 2=b_e for pe's input columns).  For
# the small-N case i-range == j-range == everything.


def _fwd_kernel(*refs, kb, k_real, ni, nj, bi, bj, has_ds):
    if has_ds:
        (mask_ref, pe_ref, po_ref, sci_ref, scj_ref,
         dsi_ref, dsj_ref, out_ref) = refs
    else:
        mask_ref, pe_ref, po_ref, sci_ref, scj_ref, out_ref = refs
    kblk = pl.program_id(0)
    i = pl.program_id(1) if ni > 1 else 0
    j = pl.program_id(2) if nj > 1 else 0

    @pl.when((kblk == 0) & (i == 0) & (j == 0))
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    for kk in range(kb):
        # Guard: the p operand is NOT padded on the relation dim (it is
        # a view of the parameter-derived stack), so the final k-block
        # may fetch garbage rows — including NaN bit patterns that even
        # a zero mask would propagate (0 * NaN == NaN).
        @pl.when(kblk * kb + kk < k_real)
        def _one(kk=kk):
            b = mask_ref[kk].astype(jnp.bfloat16)        # [bi, bj]
            ae = sci_ref[kk, 0:1, :]                     # [1, bi] f32
            bo = sci_ref[kk, 3:4, :]                     # [1, bi] f32
            ao = scj_ref[kk, 1:2, :]                     # [1, bj] f32
            be = scj_ref[kk, 2:3, :]                     # [1, bj] f32
            if has_ds:
                # identity-feature fast path: the dropout keep-mask
                # (pre-scaled 0-or-1/keep) rides in kernel too — the
                # operand is the RAW weight stack, no XLA prep pass.
                be = be * dsj_ref[kk, 0:1, :]
                bo = bo * dsi_ref[kk, 1:2, :]
            pe = (pe_ref[0, kk] * be).astype(jnp.bfloat16)  # [H, bj]
            po = (po_ref[0, kk] * bo).astype(jnp.bfloat16)  # [H, bi]
            xe = jax.lax.dot_general(                    # [H, bi]
                pe, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            xo = jax.lax.dot_general(                    # [H, bj]
                po, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if ni == 1 and nj == 1:
                out_ref[:] += ae * xe + ao * xo
            else:
                out_ref[:, pl.ds(i * bi, bi)] += ae * xe
                out_ref[:, pl.ds(j * bj, bj)] += ao * xo


def _fwd_call(p4, mask, scales, *, kb, ds=None, interpret=False):
    """p4 [2, K, H, N] (f32 raw weights on the identity path, bf16
    projections otherwise); mask int8 [K8, Np, Np]; scales f32
    [K8, 4, Np]; ds optional dropout keep-scales f32 [K8, 2, Np].
    Returns outT f32 [H, Np]."""
    _, k_real, h, n = p4.shape
    k8, n_pad, _ = mask.shape
    big = n_pad > BIG_N_THRESHOLD
    bi = bj = BIG_BLOCK if big else n_pad
    ni, nj = _cdiv(n_pad, bi), _cdiv(n_pad, bj)
    if big and kb != 1:
        raise ValueError("2D-blocked paired kernel requires kb == 1")
    if n != n_pad:
        p4 = jnp.pad(p4, ((0, 0), (0, 0), (0, 0), (0, n_pad - n)))
    grid = (_cdiv(k_real, kb), ni, nj)
    kern = functools.partial(
        _fwd_kernel, kb=kb, k_real=k_real, ni=ni, nj=nj, bi=bi, bj=bj,
        has_ds=ds is not None,
    )
    in_specs = [
        pl.BlockSpec((kb, bi, bj), lambda k, i, j: (k, i, j)),
        pl.BlockSpec((1, kb, h, bj), lambda k, i, j: (0, k, 0, j)),
        pl.BlockSpec((1, kb, h, bi), lambda k, i, j: (1, k, 0, i)),
        pl.BlockSpec((kb, 4, bi), lambda k, i, j: (k, 0, i)),
        pl.BlockSpec((kb, 4, bj), lambda k, i, j: (k, 0, j)),
    ]
    args = [mask, p4, p4, scales, scales]
    if ds is not None:
        in_specs += [
            pl.BlockSpec((kb, 2, bi), lambda k, i, j: (k, 0, i)),
            pl.BlockSpec((kb, 2, bj), lambda k, i, j: (k, 0, j)),
        ]
        args += [ds, ds]
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((h, n_pad), lambda k, i, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, n_pad), jnp.float32),
        interpret=interpret,
    )(*args)


# --------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------
#
#   d_pe[k] = b_e[k] * (B_k^T @ (a_e[k] * ct))      (written [H, N])
#   d_po[k] = b_o[k] * (B_k   @ (a_o[k] * ct))


def _bwd_kernel_small(*refs, kb, k_real, has_ds):
    if has_ds:
        mask_ref, ct_ref, sc_ref, ds_ref, d_ref = refs
    else:
        mask_ref, ct_ref, sc_ref, d_ref = refs
    # Whole-N blocks, one (i, j) step per k-block: no accumulation.
    # mask/scales are zero-padded beyond k_real and ct is real data, so
    # padded relations produce exact-zero rows whose stores beyond K are
    # masked by the partial output block — no guard needed.
    ct = ct_ref[:]                                       # [H, N] f32
    for kk in range(kb):
        b = mask_ref[kk].astype(jnp.bfloat16)
        ae = sc_ref[kk, 0:1, :]
        ao = sc_ref[kk, 1:2, :]
        be = sc_ref[kk, 2:3, :]
        bo = sc_ref[kk, 3:4, :]
        if has_ds:
            # identity fast path: the output IS the weight gradient —
            # the dropout keep-scale folds in here and the store dtype
            # matches what Adam reads (no XLA cast/select pass).
            be = be * ds_ref[kk, 0:1, :]
            bo = bo * ds_ref[kk, 1:2, :]
        cta_e = (ae * ct).astype(jnp.bfloat16)
        cta_o = (ao * ct).astype(jnp.bfloat16)
        de = jax.lax.dot_general(                        # [H, N]
            cta_e, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        do = jax.lax.dot_general(                        # [H, N]
            cta_o, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_ref[0, kk] = (be * de).astype(d_ref.dtype)
        d_ref[1, kk] = (bo * do).astype(d_ref.dtype)


def _bwd_kernel_big(*refs, ni, nj, bi, bj, has_ds):
    # Accumulates DIRECTLY into the (revisited, f32) output block: a
    # separate VMEM scratch alongside the [2, H, N_pad] output block
    # blew the 16 MB scoped-VMEM budget at N_pad = 19456.
    if has_ds:
        (mask_ref, cte_ref, cto_ref, sci_ref, scj_ref,
         dsi_ref, dsj_ref, d_ref) = refs
    else:
        (mask_ref, cte_ref, cto_ref, sci_ref, scj_ref,
         d_ref) = refs
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when((i == 0) & (j == 0))
    def _init():
        d_ref[:] = jnp.zeros_like(d_ref)

    b = mask_ref[0].astype(jnp.bfloat16)                 # [bi, bj]
    ae = sci_ref[0, 0:1, :]                              # [1, bi]
    bo = sci_ref[0, 3:4, :]                              # [1, bi]
    ao = scj_ref[0, 1:2, :]                              # [1, bj]
    be = scj_ref[0, 2:3, :]                              # [1, bj]
    if has_ds:
        be = be * dsj_ref[0, 0:1, :]
        bo = bo * dsi_ref[0, 1:2, :]
    cta_e = (ae * cte_ref[:]).astype(jnp.bfloat16)       # [H, bi]
    cta_o = (ao * cto_ref[:]).astype(jnp.bfloat16)       # [H, bj]
    de = jax.lax.dot_general(                            # [H, bj]
        cta_e, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    do = jax.lax.dot_general(                            # [H, bi]
        cta_o, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d_ref[0, 0, :, pl.ds(j * bj, bj)] += be * de
    d_ref[1, 0, :, pl.ds(i * bi, bi)] += bo * do


def _bwd_call(ct_t, mask, scales, k_real, h, n, *, kb, ds=None,
              out_dtype=jnp.bfloat16, interpret=False):
    """ct_t [H, N] f32 -> d [2, K, H, N] (col scales + optional
    dropout keep-scales applied; on the identity path this IS the
    weight gradient)."""
    k8, n_pad, _ = mask.shape
    big = n_pad > BIG_N_THRESHOLD
    if n != n_pad:
        ct_t = jnp.pad(ct_t, ((0, 0), (0, n_pad - n)))
    if not big:
        in_specs = [
            pl.BlockSpec((kb, n_pad, n_pad), lambda k: (k, 0, 0)),
            pl.BlockSpec((h, n_pad), lambda k: (0, 0)),
            pl.BlockSpec((kb, 4, n_pad), lambda k: (k, 0, 0)),
        ]
        args = [mask, ct_t, scales]
        if ds is not None:
            in_specs.append(
                pl.BlockSpec((kb, 2, n_pad), lambda k: (k, 0, 0))
            )
            args.append(ds)
        d = pl.pallas_call(
            functools.partial(
                _bwd_kernel_small, kb=kb, k_real=k_real,
                has_ds=ds is not None,
            ),
            grid=(_cdiv(k_real, kb),),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (2, kb, h, n_pad), lambda k: (0, k, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct(
                (2, k_real, h, n_pad), out_dtype
            ),
            interpret=interpret,
        )(*args)
    else:
        bi = bj = BIG_BLOCK
        ni, nj = _cdiv(n_pad, bi), _cdiv(n_pad, bj)
        if k_real != 1:
            raise NotImplementedError(
                "2D-blocked paired backward supports K == 1 pairs"
            )
        in_specs = [
            pl.BlockSpec((1, bi, bj), lambda k, i, j: (0, i, j)),
            pl.BlockSpec((h, bi), lambda k, i, j: (0, i)),
            pl.BlockSpec((h, bj), lambda k, i, j: (0, j)),
            pl.BlockSpec((1, 4, bi), lambda k, i, j: (0, 0, i)),
            pl.BlockSpec((1, 4, bj), lambda k, i, j: (0, 0, j)),
        ]
        args = [mask, ct_t, ct_t, scales, scales]
        if ds is not None:
            in_specs += [
                pl.BlockSpec((1, 2, bi), lambda k, i, j: (0, 0, i)),
                pl.BlockSpec((1, 2, bj), lambda k, i, j: (0, 0, j)),
            ]
            args += [ds, ds]
        d = pl.pallas_call(
            functools.partial(
                _bwd_kernel_big, ni=ni, nj=nj, bi=bi, bj=bj,
                has_ds=ds is not None,
            ),
            grid=(1, ni, nj),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (2, 1, h, n_pad), lambda k, i, j: (0, 0, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((2, 1, h, n_pad), jnp.float32),
            interpret=interpret,
        )(*args)
        if out_dtype != jnp.float32:
            # trivial cast pass: a (0,0)-sized d is ~10 MB
            d = d.astype(out_dtype)
    if n != n_pad:
        d = d[:, :, :, :n]
    return d


# --------------------------------------------------------------------
# XLA reference (CPU path, parity oracle, and autodiff cross-check)
# --------------------------------------------------------------------


def paired_ref(p4, mask, scales):
    """Same math in jnp (bf16 matmuls, f32 accumulation): the CPU /
    parity implementation of the paired contract."""
    k = p4.shape[1]
    n = p4.shape[3]
    b = mask[:k, :n, :n].astype(jnp.bfloat16)
    ae = scales[:k, 0:1, :n]                             # [K, 1, N]
    ao = scales[:k, 1:2, :n]
    be = scales[:k, 2:3, :n]
    bo = scales[:k, 3:4, :n]
    pe = (p4[0] * be).astype(jnp.bfloat16)               # [K, H, N]
    po = (p4[1] * bo).astype(jnp.bfloat16)
    xe = jax.lax.dot_general(                            # [K, H, Ni]
        pe, b, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    xo = jax.lax.dot_general(                            # [K, H, Nj]
        po, b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return jnp.sum(ae * xe + ao * xo, axis=0)            # [H, N]


# --------------------------------------------------------------------
# custom_vjp wrapper + public entry
# --------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _paired_apply(p4, mask, scales, kb, use_kernel):
    if use_kernel:
        n = p4.shape[3]
        return _fwd_call(p4, mask, scales, kb=kb)[:, :n]
    return paired_ref(p4, mask, scales)


def _paired_fwd(p4, mask, scales, kb, use_kernel):
    out = _paired_apply(p4, mask, scales, kb, use_kernel)
    # residuals must be JAX values: a 0-length sentinel carries the
    # primal dtype (the cotangent must match it exactly)
    return out, (mask, scales, p4.shape, jnp.zeros((0,), p4.dtype))


def _paired_bwd(kb, use_kernel, res, ct):
    mask, scales, (two, k, h, n), dt = res
    p_dtype = dt.dtype
    if use_kernel:
        d = _bwd_call(
            ct, mask, scales, k, h, n, kb=kb, out_dtype=p_dtype
        )
    else:
        b = mask[:k, :n, :n].astype(jnp.bfloat16)
        cta_e = (scales[:k, 0:1, :n] * ct[None]).astype(jnp.bfloat16)
        cta_o = (scales[:k, 1:2, :n] * ct[None]).astype(jnp.bfloat16)
        de = jax.lax.dot_general(
            cta_e, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        do = jax.lax.dot_general(
            cta_o, b, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        d = jnp.stack([
            scales[:k, 2:3, :n] * de,
            scales[:k, 3:4, :n] * do,
        ])
    return d.astype(p_dtype), None, None


_paired_apply.defvjp(_paired_fwd, _paired_bwd)


def paired_ref_ds(p4, mask, scales, ds):
    """Reference math for the identity fast path: dropout keep-scales
    applied to the halves before the paired aggregation."""
    k, n = p4.shape[1], p4.shape[3]
    p4_eff = jnp.stack(
        [p4[0] * ds[:k, 0, :n][:, None, :], p4[1] * ds[:k, 1, :n][:, None, :]]
    )
    return paired_ref(p4_eff, mask, scales)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _paired_apply_ds(p4, mask, scales, ds, kb, use_kernel):
    """Identity-feature fast path: ``p4`` is the RAW f32 weight stack
    [2, K, H, F]; per-step dropout keep-scales ``ds`` [K8, 2, Np]
    (0 or 1/keep) are applied inside the kernels, so neither the
    dropout select nor any cast runs as an XLA pass — the forward
    consumes the weights directly and the backward emits the finished
    weight gradient."""
    if use_kernel:
        n = p4.shape[3]
        return _fwd_call(p4, mask, scales, kb=kb, ds=ds)[:, :n]
    return paired_ref_ds(p4, mask, scales, ds)


def _paired_ds_fwd(p4, mask, scales, ds, kb, use_kernel):
    out = _paired_apply_ds(p4, mask, scales, ds, kb, use_kernel)
    return out, (mask, scales, ds, p4.shape, jnp.zeros((0,), p4.dtype))


def _paired_ds_bwd(kb, use_kernel, res, ct):
    mask, scales, ds, (two, k, h, n), dt = res
    p_dtype = dt.dtype
    if use_kernel:
        d = _bwd_call(
            ct, mask, scales, k, h, n, kb=kb, ds=ds, out_dtype=p_dtype,
        )
    else:
        _, vjp = jax.vjp(
            lambda q: paired_ref_ds(q, mask, scales, ds),
            jnp.zeros((two, k, h, n), p_dtype),
        )
        (d,) = vjp(ct)
        d = d.astype(p_dtype)
    return d, None, None, None


_paired_apply_ds.defvjp(_paired_ds_fwd, _paired_ds_bwd)


def spmm_paired_identity(
    weights: jax.Array,
    dropscale,
    adj: "EdgeTypeAdj",
    impl: str = "auto",
) -> jax.Array:
    """Identity-feature layer-1 aggregation for a paired edge type.

    ``weights``: the raw [2, K, H, F] f32 encoder stack (identity
    features make the projection the weights themselves, reference
    ``layers.py:88``); ``dropscale``: per-step dropout keep-scales
    [K8, 2, Np] f32 (0 or 1/keep rows for the direct/transposed
    halves), or None for the deterministic forward.  Both the dropout
    and every scale/cast are applied inside the kernels — the forward
    reads the weights straight out of the parameter buffer and the
    backward writes the finished weight gradient.
    """
    if adj.pair_mask is None:
        raise ValueError(
            "edge type has no paired mask stack; build the device graph "
            "with dense_paired=True"
        )
    two, k, h, n = weights.shape
    on_tpu = jax.default_backend() == "tpu"
    use_kernel = impl in ("auto", "paired") and on_tpu
    if dropscale is None:
        if impl == "paired_interpret":
            out_t = _fwd_call(
                weights, adj.pair_mask, adj.pair_scales,
                kb=default_kb(k, n), interpret=True,
            )[:, :n]
            return out_t.T
        out_t = _paired_apply(
            weights, adj.pair_mask, adj.pair_scales,
            default_kb(k, n), use_kernel,
        )
        return out_t.T
    if impl == "paired_interpret":
        out_t = _fwd_call(
            weights, adj.pair_mask, adj.pair_scales,
            kb=default_kb(k, n), ds=dropscale, interpret=True,
        )[:, :n]
        return out_t.T
    out_t = _paired_apply_ds(
        weights, adj.pair_mask, adj.pair_scales, dropscale,
        default_kb(k, n), use_kernel,
    )
    return out_t.T


def default_kb(k_real: int, n: int) -> int:
    if n > BIG_N_THRESHOLD:
        return 1
    # kb=2 measured fastest at paper scale (281 GB/s logical vs 226 at
    # kb=4 — smaller blocks pipeline the mask DMA better); VMEM is well
    # under the 16 MB budget either way.
    return min(2, max(1, k_real))


def spmm_paired(
    p_t: jax.Array,
    adj: "EdgeTypeAdj",
    impl: str = "auto",
) -> jax.Array:
    """Aggregate ``sum_k A_k @ P_k`` for a transpose-paired edge type.

    ``p_t``: [2, K, H, N] per-relation projected features, TRANSPOSED
    pair layout (leading dim = direct/transposed half), f32 UNSCALED
    (all normalization scales live in ``adj.pair_scales`` and are
    applied in kernel).  Returns ``[N, H]`` f32 (standard orientation,
    like ``ops.segment.spmm``).  ``impl``: "auto" (kernel on TPU, XLA
    reference elsewhere), "paired" (same), "paired_ref" (force the XLA
    reference), "paired_interpret" (interpret-mode kernel; tests only).
    """
    if adj.pair_mask is None:
        raise ValueError(
            "edge type has no paired mask stack; build the device graph "
            "with dense_paired=True"
        )
    two, k, h, n = p_t.shape
    # bf16 at the op boundary: the f32->bf16 cast fuses into p's
    # producer (the dropout/projection fusion) and the bf16 cotangent's
    # convert fuses into the dW select — the kernels move half the
    # p/d bytes and no standalone cast pass survives (the pair layout
    # is reshape-free end to end; a bitcast here blocked those fusions).
    p4 = p_t.astype(jnp.bfloat16)
    on_tpu = jax.default_backend() == "tpu"
    if impl == "paired_interpret":
        out_t = _fwd_call(
            p4, adj.pair_mask, adj.pair_scales,
            kb=default_kb(k, n), interpret=True,
        )[:, :n]
    else:
        use_kernel = impl in ("auto", "paired") and on_tpu
        out_t = _paired_apply(
            p4, adj.pair_mask, adj.pair_scales,
            default_kb(k, n), use_kernel,
        )
    return out_t.T
