"""Isolate the slow part of the paired fwd kernel: time variants with
(a) both dots, (b) only the standard-orientation dot (contract 1x0),
(c) only the transposed-orientation dot (contract 1x1), (d) both dots
with the transposed one done as two small transposes instead, across kb
values.  Paper-scale (1,1) shapes: K=963 pairs, N=645, H=64.
"""
import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from decagon_tpu.timing import hard_sync
from jax.experimental import pallas as pl

K, N, H = 963, 645, 64
KPAD = 964


def make_kernel(mode, kb):
    def kernel(mask_ref, p_ref, sc_ref, out_ref):
        kblk = pl.program_id(0)

        @pl.when(kblk == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for kk in range(kb):
            @pl.when(kblk * kb + kk < K)
            def _one(kk=kk):
                b = mask_ref[kk]
                if b.dtype != jnp.bfloat16:
                    b = b.astype(jnp.bfloat16)
                pe = p_ref[0, kk]
                po = p_ref[1, kk]
                ae = sc_ref[kk, 0:1, :]
                ao = sc_ref[kk, 1:2, :]
                acc = jnp.zeros_like(out_ref)
                if mode in ("both", "xe_only"):
                    xe = jax.lax.dot_general(
                        pe, b, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = acc + ae * xe
                if mode in ("both", "xo_only"):
                    xo = jax.lax.dot_general(
                        po, b, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = acc + ao * xo
                if mode == "small_t":
                    peT = pe.T                     # [N, H] small transpose
                    xeT = jax.lax.dot_general(
                        b, peT, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [N, H]
                    xe = xeT.T                     # [H, N] small transpose
                    xo = jax.lax.dot_general(
                        po, b, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = ae * xe + ao * xo
                out_ref[:] += acc

    return kernel


def run(mode, kb, mask_dtype=np.int8):
    rng = np.random.default_rng(0)
    mask = jnp.asarray(
        (rng.random((KPAD, N, N)) < 0.01).astype(np.int8))
    if mask_dtype != np.int8:
        mask = mask.astype(jnp.bfloat16)
    p4 = jnp.asarray(
        rng.standard_normal((2, K, H, N)).astype(np.float32)
    ).astype(jnp.bfloat16)
    sc = jnp.asarray(rng.random((KPAD, 2, N)).astype(np.float32))

    @jax.jit
    def f(mask, p4, sc):
        return pl.pallas_call(
            make_kernel(mode, kb),
            grid=(-(-K // kb),),
            in_specs=[
                pl.BlockSpec((kb, N, N), lambda k: (k, 0, 0)),
                pl.BlockSpec((2, kb, H, N), lambda k: (0, k, 0, 0)),
                pl.BlockSpec((kb, 2, N), lambda k: (k, 0, 0)),
            ],
            out_specs=pl.BlockSpec((H, N), lambda k: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((H, N), jnp.float32),
        )(mask, p4, sc)

    o = f(mask, p4, sc); hard_sync(o)
    o = f(mask, p4, sc); hard_sync(o)
    t0 = time.perf_counter()
    for _ in range(10):
        o = f(mask, p4, sc)
    hard_sync(o)
    return (time.perf_counter() - t0) / 10 * 1e3


if __name__ == "__main__":
    out = {}
    import numpy as _np
    for mode in ("both",):
        for kb in (2, 4, 8):
            for dt, tag in ((_np.int8, "i8"), ("bf16", "bf16")):
                key = f"{mode}_{tag}_kb{kb}"
                try:
                    out[key] = round(run(mode, kb, dt), 3)
                except Exception as e:
                    out[key] = f"ERR {type(e).__name__}: {e}"[:120]
                print(f"{key}: {out[key]}", flush=True)
    print(json.dumps(out))
