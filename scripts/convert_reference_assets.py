"""Convert the reference repo's data artifacts (vocab, fingerprints, size/array
dicts, node-count histogram) into self-contained JSON/CSV assets.

These are DATA (fragment vocabulary + statistics), not code; they define the
semantics the models are trained against (SURVEY.md §2.2). Run once:

    python scripts/convert_reference_assets.py [reference_root] [out_dir]
"""
import json
import pickle
import shutil
import sys
from pathlib import Path

import numpy as np
import yaml

ref = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
out = Path(sys.argv[2] if len(sys.argv) > 2 else "hierdiff_tpu/assets")
out.mkdir(parents=True, exist_ok=True)

# vocab + fingerprint tables: plain text/CSV, copy through
shutil.copy(ref / "dataset/vocab.txt", out / "vocab.txt")
shutil.copy(ref / "dataset/vocab_blur_fps_updated.csv", out / "vocab_prop_fps.csv")
shutil.copy(ref / "dataset/atom_embed.csv", out / "vocab_elem_fps.csv")

# size_dict: heavy-atom-count -> allowed vocab indices
sd = pickle.load(open(ref / "dataset/size_dict.pkl", "rb"))
json.dump({str(k): list(map(int, v)) for k, v in sd.items()},
          open(out / "size_dict.json", "w"))

# array_dict: [feature arrays, allowed vocab indices per bucket]
ad = pickle.load(open(ref / "dataset/atom_embed_dict.pkl", "rb"))
json.dump({
    "arrays": [list(map(float, a)) for a in ad[0]],
    "indices": [list(map(int, ix)) for ix in ad[1]],
}, open(out / "array_dict.json", "w"))

# GEOM fragment-count histogram (node-count prior)
hist = yaml.safe_load(open(ref / "endiffusion/conf/analyze/GEOM.yaml"))
json.dump({str(k): int(v) for k, v in hist.items()}, open(out / "geom_histogram.json", "w"))

# crossdock + QM9 histograms too, if present
for name in ("crossdock", "QM9"):
    f = ref / f"endiffusion/conf/analyze/{name}.yaml"
    if f.exists():
        hist = yaml.safe_load(open(f))
        json.dump({str(k): int(v) for k, v in hist.items()},
                  open(out / f"{name.lower()}_histogram.json", "w"))

print("assets written to", out)
