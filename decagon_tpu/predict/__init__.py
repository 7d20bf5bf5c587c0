"""Offline prediction from exported checkpoint artifacts."""

from decagon_tpu.predict.predictor import (  # noqa: F401
    NpPredictor,
    PredictionsInfo,
    TrainingEdgeIterator,
)
