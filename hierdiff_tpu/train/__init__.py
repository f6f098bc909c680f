from hierdiff_tpu.train.trainer import Trainer, build_optimizer  # noqa: F401
