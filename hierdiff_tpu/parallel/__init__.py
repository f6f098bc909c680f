from hierdiff_tpu.parallel.mesh import make_mesh, shard_batch, replicate  # noqa: F401
from hierdiff_tpu.parallel.train_step import TrainState, make_train_step, make_eval_step  # noqa: F401
