"""Model family: multi-relational GCN encoders + tensor-factorization decoders."""

from decagon_tpu.models.model import DecagonModel, ModelConfig  # noqa: F401
from decagon_tpu.models.decoders import DECODER_NAMES  # noqa: F401
