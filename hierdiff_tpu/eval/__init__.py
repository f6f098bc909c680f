from hierdiff_tpu.eval.metrics import mmd_rbf  # noqa: F401
