"""Training loop, minibatch scheduling, evaluation, logging, checkpointing."""
