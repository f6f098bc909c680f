"""Runbook command validation (VERDICT r2 missing #4 / next #7).

Every command in docs/RUNBOOK.md must at least parse/--help in CI, and the
training CLI must run a real micro-run from .npz trees on disk — the exact
hand-off format the preprocessing step writes — so the real-data path is
validated as far as an RDKit-less environment allows.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent


import os

_ENV = dict(os.environ, HIERDIFF_PLATFORM="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1")


def _run(args, timeout=240):
    return subprocess.run([sys.executable] + args, cwd=REPO, timeout=timeout,
                          capture_output=True, text=True, env=_ENV)


@pytest.mark.parametrize("mod", [
    "hierdiff_tpu.chem.preprocess",
    "hierdiff_tpu.train.cli",
    "hierdiff_tpu.sampling.cli",
])
def test_cli_help(mod):
    r = _run(["-m", mod, "--help"])
    assert r.returncode == 0, r.stderr
    assert "usage" in r.stdout.lower()


def test_split_tool_help():
    r = _run(["scripts/split_for_denoise.py", "--help"])
    assert r.returncode == 0, r.stderr


def test_import_ckpt_help():
    """RUNBOOK step 3b: reference-checkpoint importer."""
    r = _run(["scripts/import_reference_ckpt.py", "--help"])
    assert r.returncode == 0, r.stderr
    for flag in ("--stage", "--set", "--out"):
        assert flag in r.stdout


def test_export_ckpt_help():
    r = _run(["scripts/export_reference_ckpt.py", "--help"])
    assert r.returncode == 0, r.stderr
    assert "--stage" in r.stdout


def test_bench_help():
    r = _run(["bench.py", "--help"])
    assert r.returncode == 0, r.stderr
    for flag in ("--refine", "--gate-reject", "--steps"):
        assert flag in r.stdout


def test_preprocess_requires_rdkit_cleanly():
    """Without RDKit the preprocess CLI fails with the gating error, not a
    traceback-free crash or an import error at startup."""
    r = _run(["-m", "hierdiff_tpu.chem.preprocess", "--sdf", "x.sdf",
              "--out", "/tmp/nope"])
    assert r.returncode != 0
    assert "RDKit is required" in (r.stdout + r.stderr)


@pytest.mark.slow
def test_train_from_npz_trees(tmp_path):
    """RUNBOOK step 3 on-disk hand-off: train each stage a few steps from
    .npz trees (the preprocessing output format), with the denoise stage
    additionally consuming a split file (step 2)."""
    from hierdiff_tpu.data.synthetic import SyntheticTreeGenerator

    trees_dir = tmp_path / "trees"
    trees_dir.mkdir()
    gen = SyntheticTreeGenerator(seed=0)
    names = []
    for i, t in enumerate(gen.sample_trees(24)):
        name = f"{i:07d}.npz"
        np.savez_compressed(trees_dir / name, feats=t.feats, pos=t.pos,
                            adj=t.adj, wids=t.wids, sizes=t.sizes)
        names.append(name)

    split = tmp_path / "split.json"
    r = _run(["scripts/split_for_denoise.py", "--data-dir", str(trees_dir),
              "--out", str(split)])
    assert r.returncode == 0, r.stderr
    kept = json.loads(split.read_text())
    assert 0 < len(kept) <= len(names)

    tiny = ["coarse.hidden_nf=16", "coarse.n_layers=1", "coarse.timesteps=8",
            "denoise.hidden_nf=16", "denoise.n_layers_full=1",
            "denoise.n_layers_focal=1", "refine.hidden_size=16",
            "refine.n_layers=1", "train.batch_size=4", "train.max_steps=3",
            "train.eval_every=1000", "train.checkpoint_every=1000",
            "train.buckets=(8,16,24,32,48,64,96)",
            f"train.data={trees_dir}"]
    for stage, extra in (("coarse", []), ("refine", []),
                         ("denoise", [f"train.data_split={split}"])):
        r = _run(["-m", "hierdiff_tpu.train.cli", stage,
                  f"train.workdir={tmp_path / stage}"] + tiny + extra,
                 timeout=420)
        assert r.returncode == 0, f"{stage}:\n{r.stdout}\n{r.stderr}"
