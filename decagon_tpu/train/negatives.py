"""In-jit degree-weighted negative sampling.

Parity spec: reference ``decagon/deep/optimizer.py:36-49`` —
``tf.nn.fixed_unigram_candidate_sampler`` draws ``batch_size`` row-node
indices per step from ``P(c) ∝ degree[c]^0.75`` (distortion 0.75,
non-unique) for the active relation.  TPU-native equivalent: the
normalized cumulative distribution per relation is precomputed on device
(``DeviceGraph.neg_cdf``) and sampled by inverse-CDF binary search —
O(B log N), fully inside the jitted step, no host round-trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_unigram(
    rng: jax.Array, cdf: jax.Array, num_samples: int
) -> jax.Array:
    """Draw ``num_samples`` indices from the distribution with CDF ``cdf``.

    ``cdf``: [N] nondecreasing, ending at 1.0.
    """
    u = jax.random.uniform(rng, (num_samples,), dtype=cdf.dtype)
    idx = jnp.searchsorted(cdf, u, side="right")
    return jnp.clip(idx, 0, cdf.shape[0] - 1).astype(jnp.int32)
