from hierdiff_tpu.sampling.coarse import sample_coarse, make_masks_for_counts  # noqa: F401
