"""Head-wiring regression: the fine-stage heads must LEARN a planted signal.

VERDICT r2 weak #4: denoise node acc 10% / refine acc 12.5% on the default
synthetic data were explained as "the information ceiling of the synthetic
features" — plausible but unproven (and in fact 750/780 prop fingerprints
are unique, so that ceiling argument was wrong). These tests plant a
deterministic feature->type signal (SyntheticTreeGenerator(planted=True):
one unique-fingerprint vocab id per tree) and train briefly; accuracies far
above chance prove the heads, losses, and gradients are wired correctly.
Reference training semantics: models/edge_denoise.py:203-234 (node CE),
models/model_refine.py:104-110 (size-restricted CE).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hierdiff_tpu.data.denoise import make_denoise_batch
from hierdiff_tpu.data.refine import make_refine_batch
from hierdiff_tpu.data.synthetic import SyntheticTreeGenerator
from hierdiff_tpu.models.edge_denoise import EdgeDenoise
from hierdiff_tpu.models.refine import NodeRefine


def _train(model, batches, loss_key, lr=2e-3):
    tx = optax.adamw(lr)
    params = model.init(jax.random.PRNGKey(0), batches[0])
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch):
        def loss_fn(p):
            out = model.apply(p, batch)
            return out[loss_key], out

        (_, out), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, out

    out = None
    for batch in batches:
        params, opt, out = step(params, opt, batch)
    return params, out


def test_planted_signal_statistics():
    gen = SyntheticTreeGenerator(seed=0, planted=True, planted_k=8)
    trees = gen.sample_trees(16)
    for t in trees:
        assert len(set(t.wids.tolist())) == 1          # one type per tree
        assert t.wids[0] in gen.planted_wids
        # the planted fp rows are unique in the full table
        row = gen.fp_table[t.wids[0]]
        assert (gen.fp_table == row).all(axis=1).sum() == 1


@pytest.mark.slow
def test_denoise_node_head_learns_planted_signal():
    """Node-type accuracy must climb far above chance (1/780) and above the
    round-2 plateau (10%) when the type is recoverable from the visible
    blur fingerprint."""
    gen = SyntheticTreeGenerator(seed=0, planted=True, planted_k=16)
    rng = random.Random(0)
    model = EdgeDenoise(hidden_nf=64, n_layers_full=1, n_layers_focal=1)
    batches = [
        {k: jnp.asarray(v) for k, v in
         make_denoise_batch(gen.sample_trees(16, n=6), rng, max_n=8).items()}
        for _ in range(250)
    ]
    _, out = _train(model, batches, "total_loss")
    acc = float(out["node_accuracy"])
    assert acc > 0.6, f"node head failed to learn the planted signal: {acc:.3f}"


@pytest.mark.slow
def test_refine_head_learns_planted_signal():
    """Masked-node recovery from neighbors (all neighbors share the masked
    node's type in planted mode)."""
    gen = SyntheticTreeGenerator(seed=0, planted=True, planted_k=16)
    rng = random.Random(0)
    model = NodeRefine(hidden_size=64, n_layers=1)
    batches = [
        {k: jnp.asarray(v) for k, v in
         make_refine_batch(gen.sample_trees(16, n=6), rng, max_n=8).items()}
        for _ in range(250)
    ]
    _, out = _train(model, batches, "loss")
    acc = float(out["accuracy"])
    assert acc > 0.6, f"refine head failed to learn the planted signal: {acc:.3f}"
