"""Import a trained reference (HierDiff torch/PL) checkpoint as a sampling
workdir for this framework.

  python scripts/import_reference_ckpt.py CKPT --out WORKDIR [--stage auto]
      [--set coarse.timesteps=1000] [--set coarse.norm_values=1,1,1] ...

Produces WORKDIR/config.json + WORKDIR/checkpoints/<step 0> in the exact
layout the sampling CLIs load (hierdiff_tpu/sampling/cli.py
load_checkpoint_params), so a reference user's trained models drop straight
into `python -m hierdiff_tpu.sampling.cli coarse|generate`.

Architecture hyperparameters (layer counts, widths, attention, learned-vs-
predefined schedule) are inferred from the state dict itself
(hierdiff_tpu/utils/torch_import.py); semantics the weights cannot express
(timesteps, predefined-schedule family, norm values) default to the
reference live config (endiffusion/conf/model/ddpmgblur.yaml — T=1000,
learned schedule, norm_values [1,1,1]) and can be overridden with --set.

The weight mapping is the one the golden-parity suite proves correct
(tests/test_reference_parity_full.py); tests/test_torch_import.py pins
converter == parity-suite mapping bit-for-bit on freshly built reference
modules. Note the imported workdir is for SAMPLING — it carries no optimizer
state, so it is not a training resume point.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse
import json


def build_config(stage: str, inferred: dict, overrides):
    from hierdiff_tpu.config import Config, config_to_dict, load_config

    cfg = Config(stage=stage)
    if stage == "coarse":
        c = cfg.coarse
        c.n_layers = inferred["n_layers"]
        if "inv_sublayers" in inferred:
            c.inv_sublayers = inferred["inv_sublayers"]
        c.hidden_nf = inferred["hidden_nf"]
        c.attention = inferred["attention"]
        c.mode = inferred.get("mode", "egnn_dynamics")
        c.sin_embedding = inferred.get("sin_embedding", False)
        if "noise_schedule" in inferred:
            c.noise_schedule = inferred["noise_schedule"]
        elif not any(o.startswith("coarse.noise_schedule=") for o in overrides):
            # a predefined-schedule checkpoint carries only the gamma TABLE,
            # which does not identify the family — refusing beats writing a
            # config that claims 'learned' against a tree with no gamma params
            raise SystemExit(
                "checkpoint has no learned-gamma parameters (predefined "
                "noise schedule); pass the family explicitly, e.g. "
                "--set coarse.noise_schedule=polynomial_2")
        if inferred.get("pocket"):
            c.pocket = True
        # feature layout: prop = 8 feats (+ optional context channels),
        # elem = 3 (blur_utils.py:62-108); pocket crossdock adds context 1
        ipc = inferred["in_plus_context"]
        if ipc >= 8:
            c.node_coarse_type, c.context_node_nf = "prop", ipc - 8
        else:
            c.node_coarse_type, c.context_node_nf = "elem", ipc - 3
    elif stage == "denoise":
        for k, v in inferred.items():
            setattr(cfg.denoise, k, v)
    else:
        for k, v in inferred.items():
            setattr(cfg.refine, k, v)
    if overrides:
        # reuse the training CLI's dotted-override parser on the built cfg
        import tempfile

        import yaml

        with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
            yaml.safe_dump(config_to_dict(cfg), f)
            tmp = f.name
        cfg = load_config(tmp, overrides)
        Path(tmp).unlink()
    return cfg


def main(argv=None):
    from hierdiff_tpu.config import config_to_dict
    from hierdiff_tpu.utils.torch_import import (CONVERTERS, detect_stage,
                                                 load_torch_checkpoint)

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt", help="reference .ckpt/.pt file (PL or raw state dict)")
    p.add_argument("--out", required=True, help="workdir to create")
    p.add_argument("--stage", default="auto",
                   choices=["auto", "coarse", "denoise", "refine"])
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="config override, e.g. coarse.timesteps=1000")
    args = p.parse_args(argv)

    sd = load_torch_checkpoint(args.ckpt)
    stage = detect_stage(sd) if args.stage == "auto" else args.stage
    if stage is None:
        raise SystemExit("could not detect the model stage from the state "
                         "dict; pass --stage explicitly")
    params, inferred, leftovers = CONVERTERS[stage](sd)
    cfg = build_config(stage, inferred, args.overrides)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "config.json").write_text(json.dumps(config_to_dict(cfg), indent=2))

    import orbax.checkpoint as ocp

    mngr = ocp.CheckpointManager(
        (out / "checkpoints").resolve(),
        options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True))
    mngr.save(0, args=ocp.args.StandardSave({"params": {"params": params},
                                             "step": 0}))
    mngr.wait_until_finished()

    print(f"imported {stage} checkpoint -> {out}")
    print(f"  inferred: {inferred}")
    if leftovers:
        print(f"  WARNING: {len(leftovers)} unconsumed state-dict keys "
              f"(first 10): {sorted(leftovers)[:10]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
