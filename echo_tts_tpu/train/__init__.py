from .data import DataConfig, encode_utterance, iter_batches, write_shards
# NOTE: the distill LOOP is echo_tts_tpu.train.distill.distill — not
# re-exported here because it would shadow the same-named submodule
# (repo rule; `import echo_tts_tpu.train.distill` must stay a module).
from .distill import distill_loss, few_step_sampler_params, make_distill_step
from .step import (TrainState, create_train_state, flow_matching_loss,
                   make_optimizer, make_train_step)

__all__ = ["TrainState", "create_train_state", "flow_matching_loss",
           "make_optimizer", "make_train_step",
           "DataConfig", "encode_utterance", "iter_batches", "write_shards",
           "distill_loss", "few_step_sampler_params", "make_distill_step"]
