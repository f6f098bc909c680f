from hierdiff_tpu.ops import masked, schedules, losses, distributions  # noqa: F401
