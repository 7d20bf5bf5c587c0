"""Probe: batched einsum [K,Ni,Nj]x[K,Nj,H] vs flat 2D GEMM [Ni,K*Nj]x
[K*Nj,H] for the dense aggregation at paper scale (hard-synced)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_polypharmacy_like_graph
from decagon_tpu.timing import timed_ms


def main():
    graph = make_polypharmacy_like_graph(
        n_proteins=19081, n_drugs=645, n_side_effects=963,
        min_edges_per_relation=500, total_drugdrug_edges=4_651_131,
        ppi_attachment=37, seed=7,
    )
    splits = split_graph(graph, val_frac=0.05, test_frac=0.05, seed=1)
    dg = build_device_graph(
        graph, splits, densify_max_cells=1_000_000_000,
        dense_dtype=jnp.bfloat16, build_fused=False,
    )
    for key in ("1,1", "0,0"):
        a = dg.adj[key]
        p = jax.jit(
            lambda r: jax.random.normal(
                r, (a.num_rel, a.n_cols, 64), jnp.bfloat16
            )
        )(jax.random.PRNGKey(1))
        d3 = a.dense
        d2 = jnp.reshape(
            jnp.transpose(d3, (1, 0, 2)), (a.n_rows, a.num_rel * a.n_cols)
        )

        @jax.jit
        def eins(p, d):
            return jnp.einsum(
                "kij,kjh->ih", d, p, preferred_element_type=jnp.float32
            )

        @jax.jit
        def mm2d(p, d):
            return jnp.dot(
                d, p.reshape(-1, p.shape[-1]),
                preferred_element_type=jnp.float32,
            )

        gb = d3.size * d3.dtype.itemsize / 2**30
        t_e = timed_ms(eins, p, d3)
        t_m = timed_ms(mm2d, p, d2)
        print(
            f"[{key}] stack {gb:.2f} GB: einsum {t_e:.2f} ms "
            f"({gb / (t_e / 1e3):.0f} GB/s), 2d {t_m:.2f} ms "
            f"({gb / (t_m / 1e3):.0f} GB/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
