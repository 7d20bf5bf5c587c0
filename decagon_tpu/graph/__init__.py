"""Multi-relational typed graph containers and preprocessing."""

from decagon_tpu.graph.container import Relation, RelationGraph  # noqa: F401
from decagon_tpu.graph.device import DeviceGraph  # noqa: F401
