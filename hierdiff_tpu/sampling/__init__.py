from hierdiff_tpu.sampling.coarse import sample_coarse, make_masks_for_counts  # noqa: F401
from hierdiff_tpu.sampling.beam import TreeState, Expansion, PQBeamSearch  # noqa: F401
