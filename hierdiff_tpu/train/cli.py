"""Training CLIs for all three stages.

    python -m hierdiff_tpu.train.cli coarse  [--config c.yaml] [k=v ...]
    python -m hierdiff_tpu.train.cli denoise ...
    python -m hierdiff_tpu.train.cli refine  ...

Replaces the reference entry points endiffusion/train.py,
train_edge_denoise_pl.py and train_refine_pl.py. Resumes automatically from
the workdir's latest checkpoint (like the reference's try_resume).
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp

from hierdiff_tpu.config import load_config
from hierdiff_tpu.train.data_iters import (coarse_iter, denoise_iter, finite,
                                           load_tree_pool, prefetch_to_device,
                                           refine_iter)
from hierdiff_tpu.train.trainer import Trainer


def _device_batch(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


def build_coarse(cfg):
    from hierdiff_tpu.models.diffusion import CoarseDiffusion

    m = cfg.coarse
    model = CoarseDiffusion(
        in_node_nf=m.in_node_nf, int_nf=m.int_nf, cont_nf=m.cont_nf,
        timesteps=m.timesteps, loss_type=m.loss_type,
        noise_schedule=m.noise_schedule, noise_precision=m.noise_precision,
        norm_values=m.norm_values, norm_biases=m.norm_biases,
        hidden_nf=m.hidden_nf, n_layers=m.n_layers, inv_sublayers=m.inv_sublayers,
        attention=m.attention, tanh=m.tanh, coords_range=m.coords_range,
        norm_constant=m.norm_constant, normalization_factor=m.normalization_factor,
        aggregation_method=m.aggregation_method, condition_time=m.condition_time,
        context_node_nf=m.context_node_nf, remat=m.remat,
        remat_edges=m.remat_edges, use_pallas=m.use_pallas,
        pallas_vjp=m.pallas_vjp,
        compute_dtype=m.compute_dtype, pocket=m.pocket,
        pocket_cross_edges=m.pocket_cross_edges,
        mode=m.mode, sin_embedding=m.sin_embedding)

    def loss_fn(params, batch, rng):
        out = model.apply(params, batch, rng, train=True)
        return out["loss"], {"error": jnp.mean(out["error"])}

    return model, loss_fn


def build_denoise(cfg):
    from hierdiff_tpu.models.edge_denoise import EdgeDenoise

    m = cfg.denoise
    model = EdgeDenoise(
        vocab_size=m.vocab_size, out_node_nf=m.out_node_nf, in_node_nf=m.in_node_nf,
        hidden_nf=m.hidden_nf, n_layers_full=m.n_layers_full,
        n_layers_focal=m.n_layers_focal, focal_weight=m.focal_loss,
        edge_weight=m.edge_loss, node_weight=m.node_loss,
        vocab_conditioning=m.vocab_conditioning)

    def loss_fn(params, batch, rng):
        out = model.apply(params, batch)
        aux = {k: v for k, v in out.items() if k != "total_loss"}
        return out["total_loss"], aux

    return model, loss_fn


def build_refine(cfg):
    from hierdiff_tpu.models.refine import NodeRefine

    m = cfg.refine
    model = NodeRefine(vocab_size=m.vocab_size, feature_size=m.feature_size,
                       hidden_size=m.hidden_size, n_layers=m.n_layers)

    def loss_fn(params, batch, rng):
        out = model.apply(params, batch)
        return out["loss"], {"accuracy": out["accuracy"]}

    return model, loss_fn


BUILDERS = {"coarse": (build_coarse, coarse_iter),
            "denoise": (build_denoise, denoise_iter),
            "refine": (build_refine, refine_iter)}


def main(argv=None):
    import os
    if os.environ.get("HIERDIFF_PLATFORM"):
        # debug/CI platform override (reference: trainer/debug.yaml CPU
        # mode). Must land before first backend use; plain JAX_PLATFORMS is
        # not enough on hosts whose sitecustomize pins the platform list.
        jax.config.update("jax_platforms", os.environ["HIERDIFF_PLATFORM"])
    from hierdiff_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="HierDiff-TPU training")
    parser.add_argument("stage", choices=list(BUILDERS))
    parser.add_argument("--config", default=None)
    parser.add_argument("--find-lr", action="store_true",
                        help="LR sweep instead of training (writes lr_find.csv; "
                             "reference find_lr mode, endiffusion/train.py:93-125)")
    parser.add_argument("--wandb", action="store_true",
                        help="log to Weights & Biases when installed (the "
                             "reference's default logger composition)")
    parser.add_argument("overrides", nargs="*", help="dotted overrides: train.max_steps=100")
    args = parser.parse_args(argv)

    cfg = load_config(args.config, args.overrides)
    cfg.stage = args.stage
    from hierdiff_tpu.utils.log import print_config
    print_config(cfg)
    build_model, make_iter = BUILDERS[args.stage]
    model, loss_fn = build_model(cfg)

    pool = load_tree_pool(cfg, seed=cfg.train.seed)
    raw_train = make_iter(cfg, pool, seed=cfg.train.seed)
    # double-buffered async host->device pipeline (data_iters.prefetch_to_device)
    train_it = prefetch_to_device(raw_train, size=2)
    rng = jax.random.PRNGKey(cfg.train.seed)

    # init from the first batch (jitted: unjitted flax init dispatches every
    # op individually — minutes over a remote-TPU tunnel)
    first = next(train_it)
    if args.stage == "coarse":
        params = jax.jit(lambda r, b, r2: model.init(r, b, r2, train=True))(
            rng, first, jax.random.PRNGKey(0))
    else:
        params = jax.jit(model.init)(rng, first)

    trainer = Trainer(cfg, loss_fn, params, monitor="loss", wandb=args.wandb)
    if args.find_lr:
        trainer.find_lr(train_it, rng)
        return
    if trainer.try_resume():
        print(f"resumed from step {int(trainer.state.step)}")

    def eval_iter():
        it = map(_device_batch, make_iter(cfg, pool, seed=cfg.train.seed + 1))
        return finite(it, 4)

    trainer.fit(train_it, eval_iter=eval_iter, rng=rng)
    print("training complete:", cfg.train.workdir)


if __name__ == "__main__":
    main()
