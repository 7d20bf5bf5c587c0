"""Full-size public-data ingest proof (VERDICT r3 item 8).

The bio-decagon CSVs are not present in this environment, so this script
synthesizes a fixture with the REAL dataset's shape and formats —
4.65M combo rows (645 drugs, ~1200 side effects of which ~963 survive
the >=500-edge filter), 715k PPI rows over 19081 proteins, 18.6k
drug-target rows, 174k mono rows — in the reference's STITCH string
formats (``CID`` + 9 digits, ``C`` + 7 digits:
``main/Dtos/NodeIds.py:51-76``), then drives the ENTIRE ingest path:

  parse (native C++ vs Python fallback, timed) -> load_public_dataset
  -> split -> build_device_graph -> 2 train steps (CPU, COO path)

Writes artifacts/perf/ingest_fullsize.json with rows/s per parser and
end-to-end wall times.  CSVs land in /tmp (not checked in).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = "/tmp/decagon_ingest"
T0 = time.perf_counter()


def log(msg):
    print(f"[ingest +{time.perf_counter() - T0:.0f}s] {msg}", flush=True)


def _write_csv(path, header, cols_fmt, arrays, chunk=200_000):
    """Fast CSV writer: numpy -> formatted lines in chunks."""
    n = len(arrays[0])
    with open(path, "w") as f:
        f.write(header + "\n")
        for lo in range(0, n, chunk):
            rows = zip(*(a[lo : lo + chunk] for a in arrays))
            f.write("\n".join(cols_fmt % row for row in rows))
            f.write("\n")


def synthesize(rng):
    n_drugs, n_proteins = 645, 19081
    os.makedirs(OUT_DIR, exist_ok=True)

    # Drug/protein STITCH integer IDs: arbitrary sparse ints.
    drug_ids = np.sort(rng.choice(90_000_000, n_drugs, replace=False)) + 1
    protein_ids = np.sort(rng.choice(200_000, n_proteins, replace=False)) + 1

    # combo: ~963 relations with >=500 edges + ~250 below the filter.
    t = time.perf_counter()
    sizes_big = rng.integers(500, 11_000, 963)
    sizes_big = (
        sizes_big * (4_400_000 / sizes_big.sum())
    ).astype(np.int64) + 500
    sizes_small = rng.integers(5, 480, 250)
    sizes = np.concatenate([sizes_big, sizes_small])
    rel_ids = np.sort(rng.choice(9_999_999, len(sizes), replace=False))
    total = int(sizes.sum())
    a = rng.integers(0, n_drugs, total)
    b = rng.integers(0, n_drugs, total)
    fix = a == b
    b[fix] = (a[fix] + 1) % n_drugs
    rel = np.repeat(rel_ids, sizes)
    perm = rng.permutation(total)
    a, b, rel = a[perm], b[perm], rel[perm]
    _write_csv(
        os.path.join(OUT_DIR, "combo.csv"),
        "STITCH 1,STITCH 2,Polypharmacy Side Effect,Side Effect Name",
        "CID%09d,CID%09d,C%07d,synthetic effect",
        [drug_ids[a], drug_ids[b], rel],
    )
    log(f"combo.csv: {total} rows ({time.perf_counter() - t:.0f}s)")

    t = time.perf_counter()
    n_ppi = 715_612
    pa = rng.integers(0, n_proteins, n_ppi)
    pb = rng.integers(0, n_proteins, n_ppi)
    fix = pa == pb
    pb[fix] = (pa[fix] + 1) % n_proteins
    _write_csv(
        os.path.join(OUT_DIR, "ppi.csv"),
        "Gene 1,Gene 2", "%d,%d",
        [protein_ids[pa], protein_ids[pb]],
    )

    n_tgt = 18_596
    td = rng.integers(0, n_drugs, n_tgt)
    tp = rng.integers(0, n_proteins, n_tgt)
    _write_csv(
        os.path.join(OUT_DIR, "targets.csv"),
        "STITCH,Gene", "CID%09d,%d",
        [drug_ids[td], protein_ids[tp]],
    )

    n_mono, n_mono_se = 174_977, 10_184
    md = rng.integers(0, n_drugs, n_mono)
    ms = rng.integers(0, n_mono_se, n_mono)
    mono_ids = np.sort(rng.choice(9_999_999, n_mono_se, replace=False))
    _write_csv(
        os.path.join(OUT_DIR, "mono.csv"),
        "STITCH,Individual Side Effect,Side Effect Name",
        "CID%09d,C%07d,synthetic mono",
        [drug_ids[md], mono_ids[ms]],
    )
    log(f"ppi/targets/mono written ({time.perf_counter() - t:.0f}s)")
    return {
        "combo_rows": total, "ppi_rows": n_ppi,
        "targets_rows": n_tgt, "mono_rows": n_mono,
        "combo_bytes": os.path.getsize(os.path.join(OUT_DIR, "combo.csv")),
    }


def main():
    out = {"fixture": synthesize(np.random.default_rng(11))}
    combo = os.path.join(OUT_DIR, "combo.csv")

    # ---- parser timings ----------------------------------------------
    from decagon_tpu import native
    import decagon_tpu.data.public as public

    if native.get_library() is not None:
        t = time.perf_counter()
        arr = native.parse_edge_csv(combo, 3)
        native_s = time.perf_counter() - t
        out["native_parse"] = {
            "seconds": round(native_s, 2),
            "rows_per_s": round(arr.shape[0] / native_s),
            "rows": int(arr.shape[0]),
        }
        log(f"native parse: {out['native_parse']}")
    else:
        log("native library unavailable")

    os.environ["DECAGON_TPU_DISABLE_NATIVE"] = "1"
    native._LIB, native._TRIED = None, False
    t = time.perf_counter()
    arr_py = public._parse_int_csv(combo, 3)
    py_s = time.perf_counter() - t
    out["python_parse"] = {
        "seconds": round(py_s, 2),
        "rows_per_s": round(arr_py.shape[0] / py_s),
        "rows": int(arr_py.shape[0]),
    }
    log(f"python parse: {out['python_parse']}")
    if "native_parse" in out:
        np.testing.assert_array_equal(arr, arr_py)
        out["native_vs_python_equal"] = True
        out["native_speedup"] = round(py_s / native_s, 1)
    del os.environ["DECAGON_TPU_DISABLE_NATIVE"]
    native._LIB, native._TRIED = None, False

    # ---- full ingest -> device graph -> train steps (CPU) ------------
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from decagon_tpu.graph.device import build_device_graph
    from decagon_tpu.graph.split import split_graph
    from decagon_tpu.models.model import DecagonModel, ModelConfig
    from decagon_tpu.train.step import TrainConfig
    from decagon_tpu.train.trainer import Trainer

    t = time.perf_counter()
    ds = public.load_public_dataset(
        combo, os.path.join(OUT_DIR, "ppi.csv"),
        os.path.join(OUT_DIR, "targets.csv"),
        os.path.join(OUT_DIR, "mono.csv"),
    )
    graph = ds.graph
    out["load_public_dataset_s"] = round(time.perf_counter() - t, 1)
    dd = graph.relations[(1, 1)]
    out["relations_after_filter"] = sum(
        1 for r in dd if not getattr(r, "name", "").endswith("_T")
    )
    out["n_drugs"] = graph.num_nodes[1]
    out["n_proteins"] = graph.num_nodes[0]
    log(f"load_public_dataset: {out['load_public_dataset_s']}s, "
        f"{out['relations_after_filter']} relations kept")

    t = time.perf_counter()
    splits = split_graph(graph, val_frac=0.05, test_frac=0.05, seed=1)
    # COO layout (no densify): the CPU step must stay affordable.
    dg = build_device_graph(
        graph, splits, densify_max_cells=0, build_fused=False,
    )
    out["split_and_device_graph_s"] = round(time.perf_counter() - t, 1)

    model = DecagonModel(
        ModelConfig(hidden1=64, hidden2=32, dropout=0.1, spmm_impl="xla"),
        dg,
    )
    cfg = TrainConfig(batch_size=512, learning_rate=1e-3)
    trainer = Trainer(model, graph, splits, dg, cfg, seed=0)
    t = time.perf_counter()
    losses = []
    for batch in trainer.scheduler.epoch():
        losses.append(float(trainer.train_batch(batch)))
        if len(losses) >= 2:
            break
    out["two_cpu_train_steps_s"] = round(time.perf_counter() - t, 1)
    out["losses_finite"] = all(np.isfinite(l) for l in losses)
    log(f"2 CPU train steps: {out['two_cpu_train_steps_s']}s "
        f"losses {losses}")

    path = os.path.join(ROOT, "artifacts", "perf", "ingest_fullsize.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
