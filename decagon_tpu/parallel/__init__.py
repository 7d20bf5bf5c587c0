"""Multi-chip scaling: (row, edge) device meshes, sharded graphs,
sharded train/eval steps, multi-host init."""

from decagon_tpu.parallel.mesh import (  # noqa: F401
    AXES,
    initialize_distributed,
    make_mesh,
)
from decagon_tpu.parallel.rowshard import (  # noqa: F401
    ShardedGraph,
    build_sharded_device_graph,
    sharded_pspecs,
)
from decagon_tpu.parallel.sharded import (  # noqa: F401
    encode_sharded,
    make_sharded_embed_fn,
    make_sharded_train_step,
)
