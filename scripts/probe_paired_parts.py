"""Decompose the paired kernel cost: DMA-only, one dot, two dots,
M=128 single dot — paper-scale shapes."""
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


def timeit(f, *a, reps=10):
    o = f(*a); hard_sync(o)
    o = f(*a); hard_sync(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*a)
    hard_sync(o)
    return round((time.perf_counter() - t0) / reps * 1e3, 3)


def run(mode, kb=4):
    rng = np.random.default_rng(0)
    mask = jnp.asarray((rng.random((KPAD, N, N)) < 0.01).astype(np.int8))
    p4 = jnp.asarray(
        rng.standard_normal((2, K, H, N)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def kernel(mask_ref, p_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        for kk in range(kb):
            @pl.when(pl.program_id(0) * kb + kk < K)
            def _one(kk=kk):
                if mode == "dma_only":
                    # touch one sublane of the mask: forces the DMA,
                    # negligible compute
                    out_ref[:] += jnp.broadcast_to(
                        mask_ref[kk, 0:1, :].astype(jnp.float32), (H, N)
                    ) * 0.0 + p_ref[0, kk].astype(jnp.float32) * 0.0
                elif mode == "one_dot":
                    b = mask_ref[kk].astype(jnp.bfloat16)
                    xo = jax.lax.dot_general(
                        p_ref[1, kk], b, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    out_ref[:] += xo
                elif mode == "two_dots":
                    b = mask_ref[kk].astype(jnp.bfloat16)
                    xe = jax.lax.dot_general(
                        p_ref[0, kk], b, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    xo = jax.lax.dot_general(
                        p_ref[1, kk], b, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    out_ref[:] += xe + xo
                elif mode == "m128_dot":
                    b = mask_ref[kk].astype(jnp.bfloat16)
                    both = jnp.concatenate(
                        [p_ref[0, kk], p_ref[1, kk]], axis=0
                    )  # [128, N]
                    x = jax.lax.dot_general(
                        both, b, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    out_ref[:] += x[:H] + x[H:]

    @jax.jit
    def f(mask, p4):
        return pl.pallas_call(
            kernel,
            grid=(-(-K // kb),),
            in_specs=[
                pl.BlockSpec((kb, N, N), lambda k: (k, 0, 0)),
                pl.BlockSpec((2, kb, H, N), lambda k: (0, k, 0, 0)),
            ],
            out_specs=pl.BlockSpec((H, N), lambda k: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((H, N), jnp.float32),
        )(mask, p4)

    return timeit(f, mask, p4)


if __name__ == "__main__":
    out = {}
    for mode in ("dma_only", "one_dot", "two_dots", "m128_dot"):
        for kb in (4, 8):
            key = f"{mode}_kb{kb}"
            try:
                out[key] = run(mode, kb)
            except Exception as e:
                out[key] = f"ERR {type(e).__name__}: {e}"[:100]
            print(key, out[key], flush=True)
    print(json.dumps(out))
