"""Export a trained workdir of this framework back to the reference's torch
state-dict layout.

  python scripts/export_reference_ckpt.py WORKDIR --out model.ckpt
      [--stage auto]

The inverse of scripts/import_reference_ckpt.py: loads the workdir's best
(EMA-preferred) params through the sampling CLI's own loader and writes a
``{'state_dict': ...}`` torch file that strict-loads into the reference's
DiffusionQM9 / Edge_denoise / Node2Vec modules (the roundtrip is pinned
bit-for-bit in tests/test_torch_import.py). Useful for comparing weights in
the reference's tooling or handing a model back to a torch pipeline.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("workdir", help="training/import workdir (config.json + checkpoints/)")
    p.add_argument("--out", required=True, help="output .ckpt path")
    p.add_argument("--stage", default="auto",
                   choices=["auto", "coarse", "denoise", "refine"])
    args = p.parse_args(argv)

    from hierdiff_tpu.sampling.cli import load_checkpoint_params
    from hierdiff_tpu.utils.torch_import import EXPORTERS

    # best-then-latest, EMA params preferred — the same weights the
    # sampling CLIs load
    params, cfg, step = load_checkpoint_params(args.workdir)
    stage = cfg.get("stage", "coarse") if args.stage == "auto" else args.stage
    if stage not in EXPORTERS:
        raise SystemExit(f"cannot export stage {stage!r}")
    sd = EXPORTERS[stage](params["params"])

    import numpy as np
    import torch

    state_dict = {k: torch.tensor(np.ascontiguousarray(v))
                  for k, v in sd.items()}
    torch.save({"state_dict": state_dict}, args.out)
    print(f"exported {stage} workdir @ step {step} -> {args.out} "
          f"({len(state_dict)} tensors)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
