from hierdiff_tpu.utils.profiling import profile_trace, timed  # noqa: F401
