"""TPU compute ops: SpMM / SDDMM and supporting primitives."""

from decagon_tpu.ops.segment import (  # noqa: F401
    dropout,
    l2_normalize_rows,
    spmm,
    spmm_segment,
)
from decagon_tpu.ops.sddmm import sddmm_pairs  # noqa: F401
