"""Reference-checkpoint importer conformance (utils/torch_import.py).

Builds the reference torch models (same stub loader as the golden-parity
suite), round-trips their state dicts through the key-based converter, and
pins the result BIT-FOR-BIT against the parity suite's live-module weight
copiers — the mapping whose forward/loss correctness
tests/test_reference_parity_full.py proves end-to-end. Also drives the
import CLI to a workdir and loads it back through the sampling CLI's own
loader.
"""

import pickle
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference mount missing")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import test_reference_parity_full as tpf  # noqa: E402
from test_reference_parity_full import ref  # noqa: E402,F401  (fixture)

from hierdiff_tpu.utils.torch_import import (  # noqa: E402
    convert_coarse, convert_denoise, convert_refine, detect_stage,
    load_torch_checkpoint)


def sd_np(model_t):
    return {k: v.detach().numpy() for k, v in model_t.state_dict().items()}


def assert_trees_equal(converted, expected, path=""):
    assert set(converted) == set(expected), \
        f"{path}: keys {sorted(converted)} != {sorted(expected)}"
    for k in expected:
        c, e = converted[k], expected[k]
        if isinstance(e, dict):
            assert_trees_equal(c, e, f"{path}/{k}")
        else:
            np.testing.assert_array_equal(np.asarray(c), np.asarray(e),
                                          err_msg=f"{path}/{k}")


def make_coarse(ref, T=50, H=32, noise_schedule="learned", pocket=False,
                sin_embedding=False, mode="egnn_dynamics"):
    import yaml as pyyaml
    dyn = tpf.AttrDict(in_node_nf=0, context_node_nf=0, n_dims=3, hidden_nf=H,
                       n_layers=2, attention=True, condition_time=True,
                       tanh=True, mode=mode, norm_constant=0,
                       inv_sublayers=2, sin_embedding=sin_embedding,
                       normalization_factor=10, aggregation_method="sum",
                       act_fn="silu")
    import tempfile
    hist = Path(tempfile.mkdtemp()) / "hist.yaml"
    hist.write_text(pyyaml.dump({5: 10, 6: 20}))
    cfg = tpf.AttrDict(pocket=pocket, node_coarse_type="prop", dynamics=dyn,
                       loss_type="vlb", include_charges=0,
                       noise_schedule=noise_schedule, parametrization="eps",
                       dataset="geom", hcontinous=False, timesteps=T,
                       norm_values=[1.0, 1.0, 1.0], norm_biases=[0, 0, 0],
                       data_augmentation=False, analyze=str(hist),
                       pre_noise=tpf.AttrDict(noise_schedule=noise_schedule,
                                              timesteps=T, precision=1e-4))
    torch.manual_seed(23)
    return ref.diffusion.DiffusionQM9(cfg)


def test_convert_coarse_matches_parity_mapping(ref):
    model_t = make_coarse(ref)
    params, inferred, leftovers = convert_coarse(sd_np(model_t))
    expected = {"gamma": tpf._copy_gamma(model_t.gamma),
                "dynamics": {"egnn": tpf.copy_full_egnn(
                    model_t.dynamics.egnn, 32, 2, 2)}}
    assert_trees_equal(params, expected)
    assert inferred == {"n_layers": 2, "inv_sublayers": 2, "hidden_nf": 32,
                        "attention": True, "noise_schedule": "learned",
                        "in_plus_context": 8}
    assert leftovers == set()   # 'buffer' and schedule tables are ignored


def test_import_cli_coarse_roundtrip(ref, tmp_path):
    """CLI -> workdir -> sampling-CLI loader -> loss forward."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import import_reference_ckpt as cli

    model_t = make_coarse(ref)
    ckpt = tmp_path / "ref.ckpt"
    # PL wrapper layout with the 'model.' prefix consumers strip
    torch.save({"state_dict": {"model." + k: v
                               for k, v in model_t.state_dict().items()}},
               ckpt)
    wd = tmp_path / "imported"
    assert cli.main([str(ckpt), "--out", str(wd),
                     "--set", "coarse.timesteps=50"]) == 0

    from hierdiff_tpu.sampling.cli import (build_coarse_from_cfg,
                                           load_checkpoint_params)
    params, cfg, step = load_checkpoint_params(str(wd))
    assert cfg["coarse"]["hidden_nf"] == 32
    assert cfg["coarse"]["timesteps"] == 50
    assert cfg["coarse"]["noise_schedule"] == "learned"
    model = build_coarse_from_cfg(cfg)

    from hierdiff_tpu.sampling import make_masks_for_counts
    rng = np.random.default_rng(0)
    nm, em = make_masks_for_counts(np.array([5, 6]), 6)
    batch = {"positions": jnp.asarray(rng.standard_normal((2, 6, 3)).astype(np.float32)) * nm,
             "node_feature": jnp.asarray(rng.standard_normal((2, 6, 8)).astype(np.float32)) * nm,
             "atom_mask": jnp.asarray(nm), "edge_mask": jnp.asarray(em)}
    out = model.apply(params, batch, jax.random.PRNGKey(0), train=True)
    assert np.isfinite(float(out["loss"]))

    # converted params == live-module parity mapping, through the full
    # save/restore round trip
    expected = {"params": {"gamma": tpf._copy_gamma(model_t.gamma),
                           "dynamics": {"egnn": tpf.copy_full_egnn(
                               model_t.dynamics.egnn, 32, 2, 2)}}}
    assert_trees_equal(params, expected)


def test_convert_coarse_sin_embedding_variant(ref):
    """sin_embedding=True checkpoints import with the flag inferred from the
    24-wide edge-feature channel (egnn_new.py:173-179,245-258); the
    'frequencies' buffer is recognized, not a leftover."""
    model_t = make_coarse(ref, sin_embedding=True)
    params, inferred, leftovers = convert_coarse(sd_np(model_t))
    assert inferred["sin_embedding"] is True
    assert not leftovers
    expected = {"gamma": tpf._copy_gamma(model_t.gamma),
                "dynamics": {"egnn": tpf.copy_full_egnn(
                    model_t.dynamics.egnn, 32, 2, 2)}}
    assert_trees_equal(params, expected)


def test_convert_coarse_gnn_dynamics_variant(ref):
    """mode='gnn_dynamics' checkpoints (en_dynamics.py:25-30) import into
    the DenseGNN layout with the mode inferred and in_plus_context derived
    from the [x, h, time] input width."""
    model_t = make_coarse(ref, mode="gnn_dynamics")
    params, inferred, leftovers = convert_coarse(sd_np(model_t))
    assert inferred["mode"] == "gnn_dynamics"
    assert inferred["n_layers"] == model_t.dynamics.gnn.n_layers
    assert not leftovers
    expected = {"gamma": tpf._copy_gamma(model_t.gamma),
                "dynamics": {"gnn": tpf.copy_gnn(
                    model_t.dynamics.gnn, 32, model_t.dynamics.gnn.n_layers)}}
    assert_trees_equal(params, expected)
    # the inferred width reconstructs the model: in = 3 + feats + time
    in_cols = int(params["dynamics"]["gnn"]["embedding"]["kernel"].shape[0])
    assert inferred["in_plus_context"] == in_cols - 4


def test_convert_denoise_matches_parity_mapping(ref):
    torch.manual_seed(29)
    H = 32
    model_t = ref.edge_denoise.Edge_denoise(
        vocab_size=781, in_node_nf=8, hidden_nf=H, out_node_nf=780,
        array_dict=None, n_layers_full=2, n_layers_focal=2,
        focal_loss=5, edge_loss=1, node_loss=2, full_softmax=True)
    sd = sd_np(model_t)
    assert detect_stage(sd) == "denoise"
    params, inferred, leftovers = convert_denoise(sd)
    assert_trees_equal(params, tpf.copy_edge_denoise(model_t, H, 2, 2))
    assert inferred == {"hidden_nf": H, "in_node_nf": 8, "vocab_size": 781,
                        "out_node_nf": 780, "n_layers_full": 2,
                        "n_layers_focal": 2}
    assert leftovers == set()


def test_convert_refine_matches_parity_mapping(ref, tmp_path):
    torch.manual_seed(31)
    H, V = 32, 780
    size_dict = {s: [w for w in range(V) if w % 20 + 1 == s]
                 for s in range(1, 21)}
    sd_path = tmp_path / "size_dict.pkl"
    sd_path.write_bytes(pickle.dumps(size_dict))
    model_t = ref.model_refine.Node2Vec(
        size_dict=str(sd_path), vocab_size=V, feature_size=8,
        hidden_size=H, n_layers=2)
    sd = sd_np(model_t)
    assert detect_stage(sd) == "refine"
    params, inferred, leftovers = convert_refine(sd)
    expected = {
        "v_embedding": {"embedding": tpf.t2n(model_t.v_embedding.weight)},
        "size_embedding": {"embedding": tpf.t2n(model_t.size_embedding.weight)},
        "f_embedding": tpf.copy_sequential_head(model_t.f_embedding),
        "projection": tpf.copy_sequential_head(model_t.projection, (0, 2, 4)),
        "output": tpf.copy_sequential_head(model_t.output),
        **{f"gcl_{ph}{i}": tpf.copy_fine_egcl(model_t._modules[f"gcl_{ph}{i}"], H, 1)
           for ph in ("collect", "reverse", "back") for i in range(2)},
    }
    assert_trees_equal(params, expected)
    assert inferred == {"hidden_size": H, "feature_size": 8,
                        "vocab_size": V, "n_layers": 2}
    assert leftovers == set()


def test_predefined_schedule_requires_explicit_family(ref, tmp_path):
    """Predefined-schedule checkpoints carry only the gamma TABLE, which does
    not identify the family — the CLI must refuse without an explicit
    --set coarse.noise_schedule, and succeed with one."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import import_reference_ckpt as cli

    model_t = make_coarse(ref, noise_schedule="polynomial_2")
    params, inferred, leftovers = convert_coarse(sd_np(model_t))
    assert "noise_schedule" not in inferred and "gamma" not in params
    assert leftovers == set()   # the table buffer is a known ignore

    ckpt = tmp_path / "ref.ckpt"
    torch.save({"state_dict": model_t.state_dict()}, ckpt)
    with pytest.raises(SystemExit, match="noise_schedule"):
        cli.main([str(ckpt), "--out", str(tmp_path / "wd_fail")])
    wd = tmp_path / "wd"
    assert cli.main([str(ckpt), "--out", str(wd), "--set",
                     "coarse.noise_schedule=polynomial_2",
                     "--set", "coarse.timesteps=50"]) == 0
    import json
    cfg = json.loads((wd / "config.json").read_text())
    assert cfg["coarse"]["noise_schedule"] == "polynomial_2"


def test_pocket_checkpoint_imports(ref):
    """Crossdock pocket variants map pocket_embed and set coarse.pocket."""
    model_t = make_coarse(ref, pocket=True)
    params, inferred, leftovers = convert_coarse(sd_np(model_t))
    assert inferred["pocket"] is True
    assert leftovers == set()
    np.testing.assert_array_equal(
        np.asarray(params["pocket_embed"]["embedding"]),
        tpf.t2n(model_t.pocket_embed.weight))


def test_weights_only_fallback(ref, tmp_path):
    """Real reference PL checkpoints embed non-tensor hyperparameters that
    the weights-only unpickler rejects; the loader must fall back."""
    import argparse as ap

    model_t = make_coarse(ref)
    ckpt = tmp_path / "pl.ckpt"
    torch.save({"state_dict": model_t.state_dict(),
                "hyper_parameters": ap.Namespace(lr=1e-3)}, ckpt)
    with pytest.raises(Exception):
        torch.load(ckpt, map_location="cpu", weights_only=True)
    sd = load_torch_checkpoint(str(ckpt))
    assert "dynamics.egnn.embedding.weight" in sd


def test_flatten_reference_tuple_layout():
    """The reference pickles sample_batches' raw (results, test_names) tuple
    (diffusion_qm9.py:437); strings must be skipped, not recursed into."""
    from hierdiff_tpu.sampling.cli import _flatten_blur_pkl

    results = [{"x": np.zeros((3, 3)), "h": np.zeros((3, 8))},
               {"x": np.zeros((4, 3)), "h": np.zeros((4, 8))}]
    obj = (results, ["5ABC/lig", "7XYZ/lig"])
    flat = _flatten_blur_pkl(obj)
    assert len(flat) == 2 and all(isinstance(b, dict) for b in flat)


@pytest.mark.parametrize("stage", ["coarse", "denoise", "refine"])
def test_export_roundtrip(ref, tmp_path, stage):
    """export_* is the exact inverse of convert_*: state dict -> params ->
    state dict is the identity (up to non-parameter buffers)."""
    from hierdiff_tpu.utils.torch_import import CONVERTERS, EXPORTERS

    if stage == "coarse":
        model_t = make_coarse(ref, pocket=True)
        ignore = {"buffer"}
    elif stage == "denoise":
        torch.manual_seed(41)
        model_t = ref.edge_denoise.Edge_denoise(
            vocab_size=781, in_node_nf=8, hidden_nf=32, out_node_nf=780,
            array_dict=None, n_layers_full=2, n_layers_focal=2,
            focal_loss=5, edge_loss=1, node_loss=2, full_softmax=True)
        ignore = set()
    else:
        import pickle as pkl
        size_dict = {s: [w for w in range(780) if w % 20 + 1 == s]
                     for s in range(1, 21)}
        sd_path = tmp_path / "size_dict.pkl"
        sd_path.write_bytes(pkl.dumps(size_dict))
        torch.manual_seed(43)
        model_t = ref.model_refine.Node2Vec(
            size_dict=str(sd_path), vocab_size=780, feature_size=8,
            hidden_size=32, n_layers=2)
        ignore = set()

    sd = sd_np(model_t)
    params, _, _ = CONVERTERS[stage](sd)
    sd2 = EXPORTERS[stage](params)
    expected_keys = {k for k in sd if k not in ignore}
    assert set(sd2) == expected_keys, (
        sorted(set(sd2) ^ expected_keys))
    for k in sd2:
        np.testing.assert_array_equal(sd2[k], sd[k], err_msg=k)


def test_export_cli_roundtrip(ref, tmp_path):
    """import CLI -> workdir -> export CLI -> torch ckpt identical to the
    original (minus non-parameter buffers)."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import export_reference_ckpt as ecli
    import import_reference_ckpt as icli

    model_t = make_coarse(ref)
    ckpt = tmp_path / "ref.ckpt"
    torch.save({"state_dict": model_t.state_dict()}, ckpt)
    wd = tmp_path / "wd"
    assert icli.main([str(ckpt), "--out", str(wd),
                      "--set", "coarse.timesteps=50"]) == 0
    out = tmp_path / "exported.ckpt"
    assert ecli.main([str(wd), "--out", str(out)]) == 0

    sd_orig = {k: v.numpy() for k, v in model_t.state_dict().items()
               if k != "buffer"}
    sd_back = torch.load(out, map_location="cpu", weights_only=True)["state_dict"]
    assert set(sd_back) == set(sd_orig)
    for k, v in sd_back.items():
        np.testing.assert_array_equal(v.numpy(), sd_orig[k], err_msg=k)


def test_missing_key_reports_cleanly(ref):
    model_t = make_coarse(ref)
    sd = sd_np(model_t)
    del sd["dynamics.egnn.e_block_1.gcl_0.node_mlp.0.weight"]
    from hierdiff_tpu.utils.torch_import import ImportError_
    with pytest.raises(ImportError_, match="node_mlp.0.weight"):
        convert_coarse(sd)
