from .data import DataConfig, encode_utterance, iter_batches, write_shards
from .step import (TrainState, create_train_state, flow_matching_loss,
                   make_optimizer, make_train_step)

__all__ = ["TrainState", "create_train_state", "flow_matching_loss",
           "make_optimizer", "make_train_step",
           "DataConfig", "encode_utterance", "iter_batches", "write_shards"]
