from hierdiff_tpu.data.assets import (  # noqa: F401
    load_array_dict,
    load_geom_histogram,
    load_size_dict,
    load_vocab_fps,
    load_vocab_smiles,
)
