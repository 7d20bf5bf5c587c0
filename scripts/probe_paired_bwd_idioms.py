"""Compile-probe the backward paired-SpMM idioms on the real chip.

  1. f32 [1, N] row sublane-broadcast multiply against [H, N]
  2. dot_general(ctaT, B) contract ((1,), (0,))   -> d_aug_eT = (B^T cta)^T
  3. dot_general(ctaT, B) contract ((1,), (1,))   -> d_aug_oT = (B cta)^T
  4. bf16 transposed output blocks [1, H, N]
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

N, H, K = 645, 64, 4


def kernel(mask_ref, ct_ref, sc_ref, de_ref, do_ref):
    b = mask_ref[0].astype(jnp.bfloat16)       # [N, N]
    ctT = ct_ref[:]                            # [H, N] f32
    ae = sc_ref[0, 0:1, :]                     # [1, N] f32
    ao = sc_ref[0, 1:2, :]
    cta_e = (ae * ctT).astype(jnp.bfloat16)    # sublane broadcast
    cta_o = (ao * ctT).astype(jnp.bfloat16)
    de = jax.lax.dot_general(                  # [H, N]: sum_i cta[h,i] B[i,j]
        cta_e, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    do = jax.lax.dot_general(                  # [H, N]: sum_j cta[h,j] B[i,j]
        cta_o, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    de_ref[0] = de.astype(jnp.bfloat16)
    do_ref[0] = do.astype(jnp.bfloat16)


@jax.jit
def paired_bwd(mask, ctT, scales):
    return pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, N, N), lambda k: (k, 0, 0)),
            pl.BlockSpec((H, N), lambda k: (0, 0)),
            pl.BlockSpec((1, 2, N), lambda k: (k, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, H, N), lambda k: (k, 0, 0)),
            pl.BlockSpec((1, H, N), lambda k: (k, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((K, H, N), jnp.bfloat16),
            jax.ShapeDtypeStruct((K, H, N), jnp.bfloat16),
        ),
    )(mask, ctT, scales)


def main():
    rng = np.random.default_rng(0)
    mask = (rng.random((K, N, N)) < 0.01).astype(np.int8)
    ct = rng.standard_normal((N, H)).astype(np.float32)
    sc = rng.random((K, 2, N)).astype(np.float32)
    de, do = paired_bwd(jnp.asarray(mask), jnp.asarray(ct.T), jnp.asarray(sc))
    de, do = np.asarray(de, np.float32), np.asarray(do, np.float32)
    for k in range(K):
        b = mask[k].astype(np.float32)
        we = (b.T @ (sc[k, 0][:, None] * ct)).T
        wo = (b @ (sc[k, 1][:, None] * ct)).T
        for got, want, tag in ((de[k], we, "e"), (do[k], wo, "o")):
            err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
            assert err < 2e-2, (k, tag, err)
    print("PAIRED BWD IDIOMS OK")


if __name__ == "__main__":
    main()
