from edgedict_tpu.parallel.train import (  # noqa: F401
    batch_sharding, make_beam_eval_step, make_eval_step, make_mesh,
    make_train_state, make_train_step, param_sharding, put_sharded,
    shard_batch, TrainState)
from edgedict_tpu.parallel.pipeline import (  # noqa: F401
    encoder_pipeline, make_train_step_pp, pipeline_split)
