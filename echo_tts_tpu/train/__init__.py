from .data import DataConfig, encode_utterance, iter_batches, write_shards
from .distill import (distill, distill_loss, few_step_sampler_params,
                      make_distill_step)
from .step import (TrainState, create_train_state, flow_matching_loss,
                   make_optimizer, make_train_step)

__all__ = ["TrainState", "create_train_state", "flow_matching_loss",
           "make_optimizer", "make_train_step",
           "DataConfig", "encode_utterance", "iter_batches", "write_shards",
           "distill", "distill_loss", "few_step_sampler_params",
           "make_distill_step"]
