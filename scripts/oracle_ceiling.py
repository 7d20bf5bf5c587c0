"""Oracle ceiling of the paper-scale synthetic quality proxy.

The quality graph plants each side effect's edges as the top-``size``
drug pairs of a low-rank bilinear score ``(z_a * d_s) . z_b + 0.3 eps``
(``graph/synthetic.py``).  The best ANY DistMult/DEDICOM-family learner
can do on held-out edges is therefore bounded by scoring them with the
TRUE planted factors — this script computes that oracle's pooled
val/test AUROC/AUPRC on the EXACT split the converged run trains
against (seed 8), giving the proxy's ceiling for
``artifacts/quality/QUALITY_NOTE.md``.

Pure numpy (no device); writes artifacts/quality/oracle_ceiling.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from sklearn import metrics as skmetrics

from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_polypharmacy_like_graph

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ceiling_for(noise: float) -> dict:
    planted = {}
    graph = make_polypharmacy_like_graph(
        n_proteins=19081, n_drugs=645, n_side_effects=963,
        min_edges_per_relation=500, total_drugdrug_edges=4_651_131,
        ppi_attachment=37, seed=7, planted_rank=16, planted_out=planted,
        planted_noise=noise,
    )
    splits = split_graph(graph, val_frac=0.05, test_frac=0.05, seed=8)
    z = planted["z"]
    ds = planted["d"]
    n_planted = len(ds)

    out = {}
    for tag, pos_attr, neg_attr in (
        ("val", "val", "val_false"), ("test", "test", "test_false"),
    ):
        scores, labels = [], []
        for key, split in splits.items():
            if key[:2] != (1, 1):
                continue
            k = key[2]
            # Transposes (k >= n_planted) share their partner's factors;
            # the planted score is symmetric so the orientation is moot.
            d = ds[k % n_planted]
            for edges, label in (
                (getattr(split, pos_attr), 1.0),
                (getattr(split, neg_attr), 0.0),
            ):
                if edges.size == 0:
                    continue
                s = np.einsum(
                    "er,er->e", z[edges[:, 0]] * d[None, :], z[edges[:, 1]]
                )
                scores.append(s)
                labels.append(np.full(len(s), label))
        scores = np.concatenate(scores)
        labels = np.concatenate(labels)
        out[tag] = {
            "oracle_auroc": round(
                float(skmetrics.roc_auc_score(labels, scores)), 5
            ),
            "oracle_auprc": round(
                float(skmetrics.average_precision_score(labels, scores)), 5
            ),
            "n_scored": int(len(scores)),
        }
        print(tag, out[tag], flush=True)

    return out


def main():
    noises = [0.3, 0.15, 0.1] if len(sys.argv) < 2 else [
        float(a) for a in sys.argv[1:]
    ]
    out = {f"noise_{n}": ceiling_for(n) for n in noises}
    out["note"] = (
        "scores held-out edges with the TRUE planted (z, d) factors on "
        "the converged run's exact split (seed 8); the planted selection "
        "noise and the negative-sampling scheme set the ceiling below "
        "1.0 — it bounds any learner in the decoder family.  At the 0.3 "
        "default the BASELINE 0.87 target is unreachable by "
        "construction; the reduced-noise proxy (ceiling >= 0.9) is the "
        "config that honestly supports it"
    )
    path = os.path.join(ROOT, "artifacts", "quality", "oracle_ceiling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
