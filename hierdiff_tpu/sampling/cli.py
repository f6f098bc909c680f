"""Sampling CLIs: coarse point clouds and the full generation pipeline.

    # stage 1 only (sampler.py equivalent): pickle blurred point sets
    python -m hierdiff_tpu.sampling.cli coarse --workdir runs/coarse \\
        --num 64 --out samples.pkl

    # full pipeline (ar_sampling_nosize.py + reconstruct.py equivalent)
    python -m hierdiff_tpu.sampling.cli generate --workdir runs/coarse \\
        --denoise-workdir runs/denoise [--refine-workdir runs/refine] \\
        --num 64 --beam 5 --out molecules.pkl

Checkpoints come from the training CLIs' Orbax workdirs; EMA params are used
when present (sampling should see the averaged weights).
"""

from __future__ import annotations

import argparse
import json
import pickle
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def load_checkpoint_params(workdir: str, prefer_best: bool = True):
    """Orbax checkpoint from a training workdir -> (params, config).

    Prefers the protected best-metric checkpoint (checkpoints_best/, top-1 —
    the reference ships its monitored top-1 ckpt) and falls back to the
    latest periodic save; EMA params win when present."""
    candidates = (["checkpoints_best", "checkpoints"] if prefer_best
                  else ["checkpoints"])
    step = None
    for sub in candidates:
        ckpt_dir = (Path(workdir) / sub).resolve()
        if not ckpt_dir.exists():
            continue
        mngr = ocp.CheckpointManager(ckpt_dir)
        step = mngr.latest_step()
        if step is not None:
            break
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {workdir}")
    restored = mngr.restore(step)
    params = restored.get("ema_params") or restored["params"]
    cfg = json.loads((Path(workdir) / "config.json").read_text())
    return {"params": params["params"] if "params" in params else params}, cfg, step


def build_coarse_from_cfg(cfg: dict, use_pallas: Optional[bool] = None,
                          compute_dtype: Optional[str] = None):
    from hierdiff_tpu.models.diffusion import CoarseDiffusion

    m = cfg["coarse"]
    if use_pallas is None:
        use_pallas = bool(m.get("use_pallas", False))
    if compute_dtype is None:
        compute_dtype = m.get("compute_dtype")
    return CoarseDiffusion(
        use_pallas=use_pallas,
        compute_dtype=compute_dtype,
        pocket=m.get("pocket", False),
        pocket_cross_edges=m.get("pocket_cross_edges", True),
        in_node_nf=8 if m["node_coarse_type"] == "prop" else 3,
        int_nf=5 if m["node_coarse_type"] == "prop" else 3,
        cont_nf=3 if m["node_coarse_type"] == "prop" else 0,
        timesteps=m["timesteps"], loss_type=m["loss_type"],
        noise_schedule=m["noise_schedule"], noise_precision=m["noise_precision"],
        norm_values=tuple(m["norm_values"]), norm_biases=tuple(m["norm_biases"]),
        hidden_nf=m["hidden_nf"], n_layers=m["n_layers"],
        inv_sublayers=m["inv_sublayers"], attention=m["attention"], tanh=m["tanh"],
        coords_range=m["coords_range"], norm_constant=m["norm_constant"],
        normalization_factor=m["normalization_factor"],
        aggregation_method=m["aggregation_method"],
        condition_time=m["condition_time"], context_node_nf=m["context_node_nf"],
        mode=m.get("mode", "egnn_dynamics"),
        sin_embedding=m.get("sin_embedding", False))


def build_denoise_from_cfg(cfg: dict, compute_dtype: Optional[str] = None):
    from hierdiff_tpu.models.edge_denoise import EdgeDenoise

    m = cfg["denoise"]
    return EdgeDenoise(
        vocab_size=m["vocab_size"], out_node_nf=m["out_node_nf"],
        in_node_nf=m["in_node_nf"], hidden_nf=m["hidden_nf"],
        n_layers_full=m["n_layers_full"], n_layers_focal=m["n_layers_focal"],
        vocab_conditioning=m.get("vocab_conditioning", False),
        compute_dtype=compute_dtype)


def build_refine_from_cfg(cfg: dict):
    from hierdiff_tpu.models.refine import NodeRefine

    m = cfg["refine"]
    return NodeRefine(vocab_size=m["vocab_size"], feature_size=m["feature_size"],
                      hidden_size=m["hidden_size"], n_layers=m["n_layers"])


def cmd_coarse(args):
    from hierdiff_tpu.data.assets import load_histogram
    from hierdiff_tpu.ops.distributions import DistributionNodes
    from hierdiff_tpu.sampling.coarse import (make_masks_for_counts,
                                              sample_coarse,
                                              sample_coarse_pocket)

    params, cfg, step = load_checkpoint_params(args.workdir)
    # --no-bf16 must really force f32 even when the checkpoint cfg carries a
    # compute_dtype, so pass "float32" explicitly rather than None
    model = build_coarse_from_cfg(
        cfg, use_pallas=args.pallas or None,
        compute_dtype="bfloat16" if args.bf16 else "float32")
    print(f"loaded coarse checkpoint @ step {step}")

    pocket_batch = None
    if args.pocket_pdb:
        # pocket-conditioned (crossdock) sampling: residues within radius of
        # the given site center condition every molecule in the batch
        # (reference: diffusion_qm9.py:397-418 sample_batches + read_pdb)
        from hierdiff_tpu.chem.pocket import collate_pockets, pocket_from_pdb
        center = np.asarray([float(v) for v in args.pocket_center.split(",")])
        pocket = pocket_from_pdb(args.pocket_pdb, center.reshape(1, 3),
                                 radius=args.pocket_radius)
        if not pocket.residue_type:
            raise SystemExit(f"no pocket residues within {args.pocket_radius}A "
                             f"of {args.pocket_center} in {args.pocket_pdb}")
        print(f"pocket: {len(pocket.residue_type)} CA residues")
        pocket_batch = collate_pockets([pocket])

    dist = DistributionNodes(load_histogram(cfg["coarse"].get("dataset", "geom")))
    rng_np = np.random.default_rng(args.seed)
    results = []
    key = jax.random.PRNGKey(args.seed)
    for b in range(0, args.num, args.batch_size):
        k = min(args.batch_size, args.num - b)
        counts = dist.sample_np(rng_np, k)
        if args.max_nodes:
            counts = np.minimum(counts, args.max_nodes)
        nm, em = make_masks_for_counts(counts)
        if pocket_batch is not None:
            rep = lambda a: jnp.asarray(np.repeat(a, k, axis=0))
            x, h = sample_coarse_pocket(
                model, params, jax.random.fold_in(key, b),
                jnp.asarray(nm), jnp.asarray(em),
                rep(pocket_batch["protein_feat"]),
                rep(pocket_batch["protein_pos"]),
                rep(pocket_batch["protein_feat_mask"]),
                rep(pocket_batch["protein_edge_mask"]),
                steps=args.sample_steps or None)
        else:
            xh = np.asarray(sample_coarse(                 # one readback
                model, params, jax.random.fold_in(key, b), nm, em,
                steps=args.sample_steps or None, packed=True))
            x, h = xh[..., :3], xh[..., 3:]
        if pocket_batch is not None:
            x, h = np.asarray(x), np.asarray(h)
        for i, c in enumerate(counts):
            results.append({"x": x[i, :c], "h": h[i, :c]})
    with open(args.out, "wb") as f:
        pickle.dump([results], f)  # list-wrapped like the reference pkl layout
    print(f"{len(results)} point sets -> {args.out}")


def _fine_stage_setup(args):
    """Shared stage-2 CLI setup: denoise model, data mesh, assembly gate,
    pad-bucket set, refine hook (used by both `generate` and `assemble`)."""
    from hierdiff_tpu.chem import HAS_RDKIT

    dparams, dcfg, dstep = load_checkpoint_params(args.denoise_workdir)
    denoise = build_denoise_from_cfg(
        dcfg, compute_dtype="bfloat16" if args.fine_bf16 else None)
    print(f"denoise @ {dstep}")

    mesh = None
    if args.data_parallel and jax.device_count() > 1:
        from hierdiff_tpu.parallel import make_mesh
        mesh = make_mesh(jax.devices())
        print(f"data-parallel over {jax.device_count()} devices")

    vocab, gate = None, None
    if HAS_RDKIT:
        from hierdiff_tpu.chem.assemble_gate import make_assembly_gate
        from hierdiff_tpu.chem.mol_tree import Vocab
        vocab = Vocab()
        # per-candidate + final all-nodes assembly gate, memoized per
        # (fragment, neighbor set) (ar_sampling_nosize.py:199-200, 396-403)
        gate = make_assembly_gate(vocab)

    # SAMPLING_BUCKETS is the default since the round-4 TPU A/B (+16%,
    # BASELINE.md); --default-buckets restores the coarser set
    from hierdiff_tpu.data.collate import DEFAULT_BUCKETS, SAMPLING_BUCKETS
    sample_buckets = (DEFAULT_BUCKETS if getattr(args, "default_buckets", False)
                      else SAMPLING_BUCKETS)

    refine_hook = None
    if args.refine_workdir:
        from hierdiff_tpu.chem.mol_tree import Vocab
        from hierdiff_tpu.sampling.refine_hook import RefineHook

        rparams, rcfg, rstep = load_checkpoint_params(args.refine_workdir)
        refine = build_refine_from_cfg(rcfg)
        vocab_sizes = np.asarray((vocab or Vocab()).mol_sizes)
        # the gate makes check_tree swaps assembly-aware and activates
        # finalize()'s check_final_tree repair (model_refine.py:252-299)
        refine_hook = RefineHook(refine, rparams, vocab_sizes,
                                 can_assemble=gate, buckets=sample_buckets)
        print(f"refine @ {rstep}")
    return denoise, dparams, mesh, vocab, gate, sample_buckets, refine_hook


def _tree_to_dict(t):
    """TreeState -> the portable pickle form (pipeline.tree_dict_to_moltree's
    input)."""
    return None if t is None else {"wids": t.wids, "adj": t.adj, "pos": t.pos,
                                   "feats": t.feats, "logp": t.logp}


def cmd_generate(args):
    from hierdiff_tpu.chem import HAS_RDKIT
    from hierdiff_tpu.data.assets import load_histogram
    from hierdiff_tpu.sampling.pipeline import GenerationPipeline

    cparams, ccfg, cstep = load_checkpoint_params(args.workdir)
    coarse = build_coarse_from_cfg(
        ccfg, use_pallas=args.pallas or None,
        compute_dtype="bfloat16" if args.bf16 else "float32")
    print(f"coarse @ {cstep}")
    (denoise, dparams, mesh, vocab, gate, sample_buckets,
     refine_hook) = _fine_stage_setup(args)
    pipe = GenerationPipeline(coarse, cparams, denoise, dparams,
                              histogram=load_histogram(
                                  ccfg["coarse"].get("dataset", "geom")),
                              beam_size=args.beam, refine_hook=refine_hook,
                              vocab=vocab, can_assemble=gate,
                              max_n_cap=args.max_nodes or None,
                              mesh=mesh, sample_steps=args.sample_steps or None,
                              sample_buckets=sample_buckets)
    result = pipe.run(jax.random.PRNGKey(args.seed), args.num,
                      reconstruct=HAS_RDKIT, n_workers=args.workers)
    ok = [t for t in result.trees if t is not None]
    print(f"assembled {len(ok)}/{args.num} junction trees")
    if result.stats:
        print("reconstruction:", result.stats)
    payload = {
        "trees": [_tree_to_dict(t) for t in result.trees],
        "molecules": result.molecules,
        "stats": result.stats,
    }
    with open(args.out, "wb") as f:
        pickle.dump(payload, f)
    print(f"-> {args.out}")


def _flatten_blur_pkl(obj) -> list:
    """Coarse pickles are nested containers of {'x','h'} dicts — ours is
    list-wrapped (cmd_coarse), the reference pickles sample_batches' raw
    `(results, test_names)` tuple (diffusion_qm9.py:437, sampler.py:40-41).
    Flatten any list/tuple nesting down to the dicts; non-dict leaves (the
    pocket test_names strings) are skipped, never recursed into."""
    if isinstance(obj, dict):
        return [obj]
    if not isinstance(obj, (list, tuple)):
        return []
    out = []
    for item in obj:
        out.extend(_flatten_blur_pkl(item))
    return out


def cmd_assemble(args):
    """Stage 2 standalone: blur point sets (pickle) -> junction trees.

    The staged counterpart of cmd_generate's fine stage, matching the
    reference workflow where ar_sampling_nosize.py consumes sampler.py's
    sample_results.pkl (readme.md:40-66)."""
    from hierdiff_tpu.sampling.pipeline import (build_fine_sampler,
                                                round_int_features)

    (denoise, dparams, mesh, _vocab, gate, sample_buckets,
     refine_hook) = _fine_stage_setup(args)

    with open(args.coarse_pkl, "rb") as f:
        blur = _flatten_blur_pkl(pickle.load(f))
    if args.num:
        blur = blur[: args.num]
    if any("context" in b for b in blur):
        # the reference's global-context variant concatenates jt['context']
        # into h before assembly (ar_sampling_nosize.py:278-279); no live
        # config trains with context_nf > 0, so refuse rather than silently
        # dropping the conditioning
        raise SystemExit("coarse pickle carries global-context channels, "
                         "which this assemble path does not support")
    # integer blur dims round at the stage hand-off (ar_sampling_nosize.py:388)
    int_nf = 5 if denoise.in_node_nf == 8 else 3
    blur = [{"x": np.asarray(b["x"], np.float32),
             "h": round_int_features(np.asarray(b["h"], np.float32), int_nf)}
            for b in blur]

    sampler = build_fine_sampler(denoise, dparams, beam_size=args.beam,
                                 can_assemble=gate, refine_hook=refine_hook,
                                 mesh=mesh, buckets=sample_buckets)
    trees = sampler.sample(blur)
    if refine_hook is not None:
        trees = [refine_hook.finalize(t) if t is not None else None
                 for t in trees]
    ok = sum(t is not None for t in trees)
    print(f"assembled {ok}/{len(blur)} junction trees")
    payload = {"trees": [_tree_to_dict(t) for t in trees]}
    with open(args.out, "wb") as f:
        pickle.dump(payload, f)
    print(f"-> {args.out}")


def cmd_reconstruct(args):
    """Stage 3 standalone: junction trees (pickle) -> RDKit molecules.

    The staged counterpart of generation/reconstruct.py:54-106, printing the
    same valid/unique/avg-atom stats."""
    from hierdiff_tpu.chem import require_rdkit
    require_rdkit("reconstruction")
    from hierdiff_tpu.chem.mol_tree import Vocab
    from hierdiff_tpu.chem.reconstruct import reconstruct_batch
    from hierdiff_tpu.sampling.pipeline import tree_dict_to_moltree

    with open(args.trees_pkl, "rb") as f:
        payload = pickle.load(f)
    tree_dicts = payload["trees"] if isinstance(payload, dict) else payload
    vocab = Vocab()
    jt = [tree_dict_to_moltree(d, vocab) for d in tree_dicts if d is not None]
    print(f"{len(jt)} trees loaded from {args.trees_pkl}")
    molecules, stats = reconstruct_batch(jt, vocab, args.workers)
    print("reconstruction:", stats)
    with open(args.out, "wb") as f:
        pickle.dump({"molecules": molecules, "stats": stats}, f)
    print(f"-> {args.out}")


def main(argv=None):
    from hierdiff_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(description="HierDiff-TPU sampling")
    sub = p.add_subparsers(dest="cmd", required=True)

    pc = sub.add_parser("coarse", help="stage-1 blurred point sets")
    pc.add_argument("--workdir", required=True)
    pc.add_argument("--num", type=int, default=64)
    pc.add_argument("--batch-size", type=int, default=64)
    pc.add_argument("--max-nodes", type=int, default=0)
    pc.add_argument("--seed", type=int, default=2022)
    pc.add_argument("--bf16", action=argparse.BooleanOptionalAction, default=True,
                    help="bf16 EGNN edge pipeline (DEFAULT: 1.3-1.4x faster, "
                         "sampled distributions measured identical to f32 on "
                         "trained weights — BASELINE.md; --no-bf16 for the "
                         "f32 reference-exact path)")
    pc.add_argument("--pocket-pdb", default="",
                    help="PDB file for pocket-conditioned sampling "
                         "(crossdock family; model must be trained with "
                         "coarse.pocket=true)")
    pc.add_argument("--pocket-center", default="0,0,0",
                    help="x,y,z site center the pocket is extracted around")
    pc.add_argument("--pocket-radius", type=float, default=6.0)
    pc.add_argument("--sample-steps", type=int, default=0,
                    help="strided reverse-chain steps (0 = the model's full "
                         "T; 100 is ~7.5x faster with matched feature "
                         "distributions, see BASELINE.md)")
    pc.add_argument("--pallas", action="store_true",
                    help="fused Pallas EGNN kernels for the sampling scan")
    pc.add_argument("--out", default="sample_results.pkl")
    pc.set_defaults(fn=cmd_coarse)

    pg = sub.add_parser("generate", help="full 3-stage pipeline")
    pg.add_argument("--workdir", required=True, help="coarse training workdir")
    pg.add_argument("--denoise-workdir", required=True)
    pg.add_argument("--refine-workdir", default="")
    pg.add_argument("--num", type=int, default=64)
    pg.add_argument("--beam", type=int, default=5)
    pg.add_argument("--max-nodes", type=int, default=0)
    pg.add_argument("--workers", type=int, default=0)
    pg.add_argument("--seed", type=int, default=2022)
    pg.add_argument("--pallas", action="store_true")
    pg.add_argument("--bf16", action=argparse.BooleanOptionalAction, default=True)
    pg.add_argument("--fine-bf16", action="store_true",
                    help="bf16 dense GCL pipelines in the fine stage "
                         "(opt-in; f32 reference-exact by default)")
    pg.add_argument("--sample-steps", type=int, default=0)
    pg.add_argument("--data-parallel", action=argparse.BooleanOptionalAction,
                    default=True, help="shard generation over all devices")
    pg.add_argument("--fine-buckets", action="store_true",
                    help="(no-op: SAMPLING_BUCKETS is the default; "
                         "see --default-buckets)")
    pg.add_argument("--default-buckets", action="store_true",
                    help="restore the coarser DEFAULT_BUCKETS pad set "
                         "(fewer compiles, -16% measured throughput "
                         "(distribution-equivalent)")
    pg.add_argument("--out", default="generated.pkl")
    pg.set_defaults(fn=cmd_generate)

    pa = sub.add_parser(
        "assemble", help="stage 2 standalone: blur point sets -> trees "
        "(reference ar_sampling_nosize.py)")
    pa.add_argument("--coarse-pkl", required=True,
                    help="pickle from `coarse` (or a reference "
                         "sample_results.pkl)")
    pa.add_argument("--denoise-workdir", required=True)
    pa.add_argument("--refine-workdir", default="")
    pa.add_argument("--num", type=int, default=0, help="cap (0 = all)")
    pa.add_argument("--beam", type=int, default=5)
    pa.add_argument("--fine-bf16", action="store_true")
    pa.add_argument("--fine-buckets", action="store_true")
    pa.add_argument("--default-buckets", action="store_true")
    pa.add_argument("--data-parallel", action=argparse.BooleanOptionalAction,
                    default=True)
    pa.add_argument("--out", default="assembled_trees.pkl")
    pa.set_defaults(fn=cmd_assemble)

    pr = sub.add_parser(
        "reconstruct", help="stage 3 standalone: trees -> RDKit molecules "
        "(reference generation/reconstruct.py)")
    pr.add_argument("--trees-pkl", required=True,
                    help="pickle from `assemble` or `generate`")
    pr.add_argument("--workers", type=int, default=0)
    pr.add_argument("--out", default="reconstructed.pkl")
    pr.set_defaults(fn=cmd_reconstruct)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
