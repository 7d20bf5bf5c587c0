"""Compile-probe the Mosaic idioms needed by the paired factored SpMM.

Run ON THE REAL CHIP (interpret mode will not catch Mosaic rejections —
.claude/skills/verify gotchas).  Probes, in one kernel shaped like the
planned forward:

  1. int8 [N, N] tile -> bf16 convert
  2. dot_general(B, p) contract ((1,), (0,))           (direct)
  3. dot_general(B, p) contract ((0,), (0,))           (B^T @ p)
  4. lane slice [:, H:H+1] of a bf16 tile -> f32 -> lane-broadcast mult
  5. f32 accumulation into a revisited output block across grid steps
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, H, K = 645, 64, 4


def kernel(mask_ref, pe_ref, po_ref, out_ref):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    b = mask_ref[0].astype(jnp.bfloat16)            # int8 -> bf16
    pe = pe_ref[0, :, 0:H]
    po = po_ref[0, :, 0:H]
    ae = pe_ref[0, :, H:H + 1].astype(jnp.float32)  # [N, 1] lane slice
    ao = po_ref[0, :, H:H + 1].astype(jnp.float32)
    xe = jax.lax.dot_general(
        b, pe, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xo = jax.lax.dot_general(
        b, po, (((0,), (0,)), ((), ())),  # B^T @ po
        preferred_element_type=jnp.float32,
    )
    out_ref[:, 0:H] += ae * xe + ao * xo            # [N,1] lane broadcast


@jax.jit
def paired(mask, pe_aug, po_aug):
    return pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, N, N), lambda k: (k, 0, 0)),
            pl.BlockSpec((1, N, 128), lambda k: (k, 0, 0)),
            pl.BlockSpec((1, N, 128), lambda k: (k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((N, 128), lambda k: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
    )(mask, pe_aug, po_aug)


def main():
    rng = np.random.default_rng(0)
    mask = (rng.random((K, N, N)) < 0.01).astype(np.int8)
    pe = rng.standard_normal((K, N, H)).astype(np.float32)
    po = rng.standard_normal((K, N, H)).astype(np.float32)
    ae = rng.random((K, N)).astype(np.float32)
    ao = rng.random((K, N)).astype(np.float32)
    pe_aug = np.zeros((K, N, 128), np.float32)
    po_aug = np.zeros((K, N, 128), np.float32)
    pe_aug[:, :, :H] = pe
    po_aug[:, :, :H] = po
    pe_aug[:, :, H] = ae
    po_aug[:, :, H] = ao
    out = paired(
        jnp.asarray(mask),
        jnp.asarray(pe_aug, jnp.bfloat16),
        jnp.asarray(po_aug, jnp.bfloat16),
    )
    out = np.asarray(out)[:, :H]
    # numpy oracle (bf16-ish tolerance)
    want = np.zeros((N, H), np.float32)
    for k in range(K):
        b = mask[k].astype(np.float32)
        want += ae[k][:, None] * (b @ pe[k]) + ao[k][:, None] * (b.T @ po[k])
    err = np.abs(out - want).max() / (np.abs(want).max() + 1e-9)
    print("max rel err:", err)
    assert err < 2e-2, err
    print("PAIRED IDIOMS OK")


if __name__ == "__main__":
    main()
