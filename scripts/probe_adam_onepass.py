"""One-pass Pallas Adam vs the XLA two-fusion chain, measured
IN-PROGRAM (fori_loop) on the round-5 transposed leaf shapes.

The r4 negative result measured per-dispatch (inflated by the ~4 ms
axon overhead) on the 128-lane-padded [K, 645, 64] layout; round 5's
[1926, 64, 645] layout has no lane padding and the A/B below decides
whether the single read-modify-write pass (7 HBM passes vs the XLA
chain's 9) finally pays.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')
from decagon_tpu.timing import hard_sync
from jax.experimental import pallas as pl

L, R, C = 1926, 64, 645
B1, B2, EPS, LR = 0.9, 0.999, 1e-8, 1e-3


def adam_kernel(s_ref, g_ref, m_ref, v_ref, p_ref, mo_ref, vo_ref, po_ref,
                *, lb):
    s1 = s_ref[0, 0]
    s2 = s_ref[0, 1]
    g = g_ref[:].astype(jnp.float32)
    m = B1 * m_ref[:].astype(jnp.float32) + (1.0 - B1) * g
    v = B2 * v_ref[:].astype(jnp.float32) + (1.0 - B2) * (g * g)
    upd = (-LR) * (s1 * m) / (jnp.sqrt(s2 * v) + EPS)
    mo_ref[:] = m.astype(mo_ref.dtype)
    vo_ref[:] = v.astype(vo_ref.dtype)
    po_ref[:] = p_ref[:] + upd


def pallas_adam(scalars, g, m, v, p, lb):
    spec = pl.BlockSpec((lb, R, C), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(adam_kernel, lb=lb),
        grid=(-(-L // lb),),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY if False else None)
                  if False else pl.BlockSpec((1, 2), lambda i: (0, 0)),
                  spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((L, R, C), m.dtype),
            jax.ShapeDtypeStruct((L, R, C), v.dtype),
            jax.ShapeDtypeStruct((L, R, C), jnp.float32),
        ),
        input_output_aliases={2: 0, 3: 1, 4: 2},
    )(scalars, g, m, v, p)


def xla_adam(scalars, g, m, v, p):
    s1 = scalars[0, 0]
    s2 = scalars[0, 1]
    g32 = g.astype(jnp.float32)
    m2 = B1 * m.astype(jnp.float32) + (1.0 - B1) * g32
    v2 = B2 * v.astype(jnp.float32) + (1.0 - B2) * (g32 * g32)
    upd = (-LR) * (s1 * m2) / (jnp.sqrt(s2 * v2) + EPS)
    return m2.astype(m.dtype), v2.astype(v.dtype), p + upd


def bench(tag, fn, *args):
    @jax.jit
    def loop(scalars, g, m, v, p):
        def body(i, carry):
            m, v, p = carry
            return fn(scalars, g, m, v, p)
        return jax.lax.fori_loop(0, 20, body, (m, v, p))

    o = loop(*args); hard_sync(o)
    o = loop(*args); hard_sync(o)
    t0 = time.perf_counter()
    o = loop(*args); hard_sync(o)
    t = (time.perf_counter() - t0) / 20 * 1e3
    gb = (L * R * C) * (4 + 2 + 2 + 4 + 2 + 2 + 4) / 2**30
    print(f"{tag}: {t:.3f} ms ({gb / (t / 1e3):.0f} GB/s over 7 logical "
          f"passes)", flush=True)
    return t


def main():
    rng = np.random.default_rng(0)
    mk = lambda dt: jnp.asarray(
        rng.standard_normal((L, R, C)).astype(np.float32)
    ).astype(dt)
    g = mk(jnp.bfloat16)
    m = mk(jnp.bfloat16)
    v = jnp.abs(mk(jnp.bfloat16))
    p = mk(jnp.float32)
    scalars = jnp.asarray([[1.1, 1.05]], jnp.float32)

    # numerics first
    for lb in (2,):
        got = pallas_adam(scalars, g, m, v, p, lb)
        want = jax.jit(xla_adam)(scalars, g, m, v, p)
        for a, b, tag in zip(got, want, "mvp"):
            err = float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - b.astype(jnp.float32)
            )))
            assert err < 1e-2, (tag, err)
    print("numerics ok", flush=True)

    t_x = bench("xla chain", lambda s, g, m, v, p: xla_adam(s, g, m, v, p),
                scalars, g, m, v, p)
    for lb in (2, 4, 8):
        try:
            bench(f"pallas lb={lb}",
                  lambda s, g, m, v, p, lb=lb: pallas_adam(s, g, m, v, p, lb),
                  scalars, g, m, v, p)
        except Exception as e:
            print(f"lb={lb}: ERR {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
