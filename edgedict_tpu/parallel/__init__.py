from edgedict_tpu.parallel.train import (  # noqa: F401
    batch_sharding, make_eval_step, make_mesh, make_train_state,
    make_train_step, param_sharding, put_sharded, shard_batch, TrainState)
