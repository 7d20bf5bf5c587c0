"""ctypes bindings for the native host runtime (graphcore.cpp).

The shared library is compiled on first use (g++ -O3, cached next to
the source keyed by a content hash); every entry point has a pure-
Python/numpy fallback, so the framework works without a toolchain —
the native path exists because the host-side hot loops (CSV parsing,
negative rejection sampling, edge tiling) dominate startup time on the
full polypharmacy graph (millions of rows / edges).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "graphcore.cpp"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_F32P = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _build_library() -> Optional[ctypes.CDLL]:
    source = _SRC.read_bytes()
    digest = hashlib.sha256(source).hexdigest()[:16]
    cache_dir = Path(
        os.environ.get(
            "DECAGON_TPU_NATIVE_CACHE",
            Path.home() / ".cache" / "decagon_tpu",
        )
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    lib_path = cache_dir / f"libgraphcore-{digest}.so"
    if not lib_path.exists():
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            str(_SRC), "-o", str(lib_path) + ".tmp",
        ]
        try:
            subprocess.run(
                cmd, check=True, capture_output=True, timeout=120
            )
            os.replace(str(lib_path) + ".tmp", lib_path)
        except (subprocess.SubprocessError, OSError) as exc:
            sys.stderr.write(
                f"decagon_tpu.native: build failed ({exc}); "
                "using Python fallbacks\n"
            )
            return None
    lib = ctypes.CDLL(str(lib_path))

    lib.dt_sample_false_edges.restype = ctypes.c_int64
    lib.dt_sample_false_edges.argtypes = [
        _I64P, _I64P, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_uint64, _I64P, _I64P,
    ]
    lib.dt_normalize_square.restype = ctypes.c_int64
    lib.dt_normalize_square.argtypes = [
        _I64P, _I64P, ctypes.c_int64, ctypes.c_int64,
        _I64P, _I64P, _F32P,
    ]
    lib.dt_normalize_rect.restype = ctypes.c_int64
    lib.dt_normalize_rect.argtypes = [
        _I64P, _I64P, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        _I64P, _I64P, _F32P,
    ]
    lib.dt_tiles_prepare.restype = ctypes.c_int64
    lib.dt_tiles_prepare.argtypes = [
        _I64P, _I64P, _F32P, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.dt_tiles_fill.restype = ctypes.c_int64
    lib.dt_tiles_fill.argtypes = [_I32P, _I32P, _I32P]
    lib.dt_parse_edge_csv.restype = ctypes.c_int64
    lib.dt_parse_edge_csv.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        _I64P, _I64P, ctypes.c_void_p, ctypes.c_int64,
    ]
    return lib


def get_library() -> Optional[ctypes.CDLL]:
    """The shared library, or None when unavailable (fallbacks apply)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if not _TRIED:
            if os.environ.get("DECAGON_TPU_DISABLE_NATIVE"):
                _LIB = None
            else:
                _LIB = _build_library()
            _TRIED = True
    return _LIB


# ---------------------------------------------------------------------
# High-level wrappers (None return => caller should use its fallback).


def sample_false_edges(
    pos_rows: np.ndarray,
    pos_cols: np.ndarray,
    shape,
    count: int,
    seed: int,
) -> Optional[np.ndarray]:
    lib = get_library()
    if lib is None:
        return None
    pos_rows = np.ascontiguousarray(pos_rows, np.int64)
    pos_cols = np.ascontiguousarray(pos_cols, np.int64)
    out_rows = np.empty(count, np.int64)
    out_cols = np.empty(count, np.int64)
    got = lib.dt_sample_false_edges(
        pos_rows, pos_cols, len(pos_rows), shape[0], shape[1],
        count, np.uint64(seed), out_rows, out_cols,
    )
    if got != count:
        return None
    return np.stack([out_rows, out_cols], axis=1).astype(np.int32)


def build_tiles_arrays(
    src: np.ndarray,
    dst: np.ndarray,
    vals: np.ndarray,
    block_r: int,
    block_s: int,
    tile_c: int,
    num_dst_blocks: int,
    n_src_pad: int,
):
    """Returns (packed [T,2,C], src_start [T], row_ptr [B+1]) or None."""
    lib = get_library()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    vals = np.ascontiguousarray(vals, np.float32)
    num_tiles = lib.dt_tiles_prepare(
        src, dst, vals, len(src), block_r, block_s, tile_c,
        num_dst_blocks, n_src_pad,
    )
    if num_tiles < 0:
        return None
    if num_tiles == 0:
        # Single all-padding tile assigned to dst block 0 (mirrors the
        # Python build_tiles fallback for empty relations).
        row_ptr = np.concatenate(
            [np.zeros(1, np.int32), np.ones(num_dst_blocks, np.int32)]
        )
        return (
            np.zeros((1, 2, tile_c), np.int32),
            np.zeros(1, np.int32),
            row_ptr,
        )
    packed = np.zeros((num_tiles, 2, tile_c), np.int32)
    src_start = np.zeros(num_tiles, np.int32)
    row_ptr = np.zeros(num_dst_blocks + 1, np.int32)
    lib.dt_tiles_fill(
        packed.reshape(-1), src_start, row_ptr
    )
    return packed, src_start, row_ptr


def parse_edge_csv(
    path: str, n_fields: int
) -> Optional[np.ndarray]:
    """Parse an edge CSV into an [N, n_fields] int64 array (digits-only
    field codec, headers skipped)."""
    lib = get_library()
    if lib is None:
        return None
    data = Path(path).read_bytes()
    max_rows = data.count(b"\n") + 1
    out_a = np.empty(max_rows, np.int64)
    out_b = np.empty(max_rows, np.int64)
    out_c = np.empty(max_rows, np.int64) if n_fields > 2 else None
    got = lib.dt_parse_edge_csv(
        data, len(data), n_fields, out_a, out_b,
        out_c.ctypes.data if out_c is not None else None, max_rows,
    )
    cols = [out_a[:got], out_b[:got]]
    if n_fields > 2:
        cols.append(out_c[:got])
    return np.stack(cols, axis=1)
