"""Multi-chip scaling: device meshes, sharded graphs, sharded train steps."""

from decagon_tpu.parallel.mesh import (  # noqa: F401
    graph_pspecs,
    make_mesh,
    shard_device_graph,
)
from decagon_tpu.parallel.sharded import make_sharded_train_step  # noqa: F401
