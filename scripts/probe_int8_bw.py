"""Raw HBM read bandwidth for the paper-scale int8 mask stack.

Compares: XLA reduction over the int8 array; XLA reduction over a bf16
copy; Pallas sum-only kernels over both dtypes at several block sizes;
Pallas over a PRE-PADDED [K, 672, 768] int8 array (aligned tiles).
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')
from decagon_tpu.timing import hard_sync
from jax.experimental import pallas as pl

K, N = 964, 645


def timeit(f, *a, reps=10):
    o = f(*a); hard_sync(o)
    o = f(*a); hard_sync(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*a)
    hard_sync(o)
    return (time.perf_counter() - t0) / reps * 1e3


def pallas_sum(arr, kb, conv=False):
    n1, n2 = arr.shape[1], arr.shape[2]

    def kernel(x_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        for kk in range(kb):
            x = x_ref[kk]
            if conv:
                x = x.astype(jnp.bfloat16)
            o_ref[:] += jnp.sum(
                x.astype(jnp.float32), axis=0, keepdims=True
            )

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kernel,
            grid=(arr.shape[0] // kb,),
            in_specs=[pl.BlockSpec((kb, n1, n2), lambda k: (k, 0, 0))],
            out_specs=pl.BlockSpec((1, n2), lambda k: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, n2), jnp.float32),
        )(x)

    return timeit(f, arr)


def main():
    rng = np.random.default_rng(0)
    m8 = jnp.asarray((rng.random((K, N, N)) < 0.01).astype(np.int8))
    gb8 = K * N * N / 2**30
    out = {"logical_gb": round(gb8, 3)}

    xla_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    t = timeit(xla_sum, m8)
    out["xla_sum_int8_ms"] = round(t, 3)
    out["xla_sum_int8_gbps"] = round(gb8 / (t / 1e3), 1)

    m16 = m8.astype(jnp.bfloat16)
    t = timeit(xla_sum, m16)
    out["xla_sum_bf16_ms"] = round(t, 3)
    out["xla_sum_bf16_gbps"] = round(2 * gb8 / (t / 1e3), 1)

    for kb in (2, 8):
        t = pallas_sum(m8, kb)
        out[f"pl_sum_int8_kb{kb}_ms"] = round(t, 3)
        out[f"pl_sum_int8_kb{kb}_gbps"] = round(gb8 / (t / 1e3), 1)
    t = pallas_sum(m8, 8, conv=True)
    out["pl_sum_int8conv_kb8_ms"] = round(t, 3)
    for kb in (2, 8):
        t = pallas_sum(m16, kb)
        out[f"pl_sum_bf16_kb{kb}_ms"] = round(t, 3)
        out[f"pl_sum_bf16_kb{kb}_gbps"] = round(2 * gb8 / (t / 1e3), 1)

    # pre-padded aligned int8
    mp = jnp.zeros((K, 672, 768), jnp.int8).at[:, :N, :N].set(m8)
    gbp = K * 672 * 768 / 2**30
    for kb in (2, 8):
        t = pallas_sum(mp, kb)
        out[f"pl_sum_int8pad_kb{kb}_ms"] = round(t, 3)
        out[f"pl_sum_int8pad_kb{kb}_gbps"] = round(gbp / (t / 1e3), 1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
