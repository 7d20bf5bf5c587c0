"""Native C++ host runtime vs Python fallbacks."""

import numpy as np
import pytest

from decagon_tpu import native
from decagon_tpu.ops import tiling


@pytest.fixture(scope="module")
def lib():
    lib = native.get_library()
    if lib is None:
        pytest.skip("native library unavailable (no toolchain)")
    return lib


def test_native_tiles_match_python(lib):
    rng = np.random.default_rng(0)
    e, n_src, n_dst = 5000, 700, 500
    src = rng.integers(0, n_src, e)
    dst = rng.integers(0, n_dst, e)
    vals = rng.normal(size=e).astype(np.float32)
    vals[::17] = 0.0  # exercise zero filtering

    got = tiling.build_tiles(src, dst, vals, n_src, n_dst, 128, 128, 128)

    import os
    os.environ["DECAGON_TPU_DISABLE_NATIVE"] = "1"
    native._TRIED, native._LIB = False, None
    try:
        want = tiling.build_tiles(src, dst, vals, n_src, n_dst, 128, 128, 128)
    finally:
        del os.environ["DECAGON_TPU_DISABLE_NATIVE"]
        native._TRIED, native._LIB = False, None

    assert got.num_tiles == want.num_tiles
    np.testing.assert_array_equal(np.asarray(got.row_ptr), np.asarray(want.row_ptr))
    np.testing.assert_array_equal(
        np.asarray(got.src_start), np.asarray(want.src_start)
    )
    np.testing.assert_array_equal(
        np.asarray(got.packed), np.asarray(want.packed)
    )
    # Window invariants: 8-aligned starts within bounds; all src-locals
    # inside the window.
    starts = np.asarray(got.src_start)
    assert np.all(starts % 8 == 0)
    assert np.all(starts >= 0) and np.all(starts + 128 <= got.n_src)
    src_local = np.asarray(got.packed)[:, 0, :] & 0xFFFF
    assert np.all(src_local < 128)


def test_native_false_edge_sampler(lib):
    rng = np.random.default_rng(1)
    n = 120
    pos = np.unique(rng.integers(0, n, (3000, 2)), axis=0)
    sampled = native.sample_false_edges(
        pos[:, 0].astype(np.int64), pos[:, 1].astype(np.int64),
        (n, n), 5000, seed=7,
    )
    assert sampled is not None and sampled.shape == (5000, 2)
    forbidden = {(int(r), int(c)) for r, c in pos}
    got = {(int(r), int(c)) for r, c in sampled}
    assert len(got) == 5000  # deduped
    assert got.isdisjoint(forbidden)
    # Deterministic under the same seed
    again = native.sample_false_edges(
        pos[:, 0].astype(np.int64), pos[:, 1].astype(np.int64),
        (n, n), 5000, seed=7,
    )
    np.testing.assert_array_equal(sampled, again)


def test_native_csv_parser(tmp_path, lib):
    path = tmp_path / "edges.csv"
    path.write_text(
        "STITCH 1,STITCH 2,Side Effect\n"
        "CID000000042,CID000000007,C0001234\n"
        "CID000000001,CID000000002,C0000099\n"
        "bad,row,here\n"
        "CID000000003,CID000000004,C0000001\n"
    )
    rows = native.parse_edge_csv(str(path), 3)
    np.testing.assert_array_equal(
        rows, [[42, 7, 1234], [1, 2, 99], [3, 4, 1]]
    )
    rows2 = native.parse_edge_csv(str(path), 2)
    assert rows2.shape[1] == 2 and rows2[0, 0] == 42
