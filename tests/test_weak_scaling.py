"""Weak-scaling SHAPE validation on the virtual 8-device mesh (VERDICT r2 #8).

This host has one physical core, so virtual-mesh wall-clock "scaling" would
only measure core contention. What CAN be validated without real chips is
the structure that determines weak scaling on hardware:

- the sharded SAMPLING program contains ZERO cross-device collectives
  (reverse diffusion of distinct molecules is embarrassingly parallel), so
  per-chip throughput is device-count-independent by construction;
- the sharded TRAIN step's collectives are exactly the gradient/metric
  all-reduces, whose payload (= parameter size) is independent of the
  per-device batch, giving the standard DP weak-scaling model;
- per-device buffer sizes actually shrink with mesh size (the batch really
  is partitioned, not replicated).

BASELINE.md records the v5e-8 projection built on these invariants.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hierdiff_tpu.models import CoarseDiffusion
from hierdiff_tpu.sampling.coarse import make_masks_for_counts, sample_coarse

COLLECTIVE_RE = re.compile(
    r"all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all")


def _model_and_masks(per_device_batch, n_devices, n=8):
    model = CoarseDiffusion(in_node_nf=8, timesteps=10, hidden_nf=32, n_layers=1)
    b = per_device_batch * n_devices
    nm, em = make_masks_for_counts(np.full(b, n - 2), n)
    batch = {"positions": jnp.zeros((b, n, 3)), "node_feature": jnp.zeros((b, n, 8)),
             "atom_mask": jnp.asarray(nm), "edge_mask": jnp.asarray(em)}
    params = jax.jit(lambda r, bt, r2: model.init(r, bt, r2, train=True))(
        jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
    return model, params, nm, em, batch


@pytest.mark.parametrize("d", [1, 2, 4, 8])
def test_sampling_shards_with_zero_collectives(d):
    devices = jax.devices()[:d]
    mesh = Mesh(np.asarray(devices), ("data",))
    model, params, nm, em, _ = _model_and_masks(4, d)
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    nm_s = jax.device_put(jnp.asarray(nm), data)
    em_s = jax.device_put(jnp.asarray(em), data)
    params_s = jax.device_put(params, repl)

    fn = jax.jit(lambda p, k, a, b: sample_coarse(model, p, k, a, b))
    lowered = fn.lower(params_s, jax.random.PRNGKey(0), nm_s, em_s)
    hlo = lowered.compile().as_text()
    assert not COLLECTIVE_RE.search(hlo), (
        f"sampling on a {d}-device mesh emitted collectives")
    x, h = fn(params_s, jax.random.PRNGKey(0), nm_s, em_s)
    assert x.shape[0] == 4 * d
    # the output really is partitioned: each shard holds batch/d rows
    assert len(x.sharding.device_set) == d
    shard_rows = {s.data.shape[0] for s in x.addressable_shards}
    assert shard_rows == {4}


def test_train_step_collectives_are_gradient_allreduce_only():
    from hierdiff_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from hierdiff_tpu.parallel.train_step import TrainState, make_train_step
    import optax

    d = len(jax.devices())
    mesh = make_mesh()
    model, params, nm, em, batch = _model_and_masks(2, d)

    def loss_fn(p, b, rng):
        out = model.apply(p, b, rng, train=True)
        return out["loss"], {}

    state = TrainState.create(params, optax.adamw(1e-4))
    state = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    step = make_train_step(loss_fn, mesh=mesh, donate_state=False)
    hlo = step.lower(state, batch_s, jax.random.PRNGKey(0)).compile().as_text()
    n_ar = len(re.findall(r"all-reduce(?:-start)?\(", hlo))
    assert n_ar >= 1, "no gradient all-reduce in the sharded train step"
    assert not re.search(r"all-gather|all-to-all", hlo), (
        "unexpected collectives beyond the DP all-reduce/reduce-scatter")
    new_state, metrics = step(state, batch_s, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_allreduce_payload_independent_of_batch():
    """The DP weak-scaling model: collective payload == parameter bytes,
    constant as per-device batch grows."""
    from hierdiff_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from hierdiff_tpu.parallel.train_step import TrainState, make_train_step
    import optax

    mesh = make_mesh()
    d = len(jax.devices())

    def payload(per_dev_batch):
        model, params, nm, em, batch = _model_and_masks(per_dev_batch, d)

        def loss_fn(p, b, rng):
            out = model.apply(p, b, rng, train=True)
            return out["loss"], {}

        state = replicate(TrainState.create(params, optax.adamw(1e-4)), mesh)
        step = make_train_step(loss_fn, mesh=mesh, donate_state=False)
        hlo = step.lower(state, shard_batch(batch, mesh),
                         jax.random.PRNGKey(0)).compile().as_text()
        # sum all-reduce operand element counts f32[...] from the HLO text
        total = 0
        for m in re.finditer(r"all-reduce(?:-start)?\(", hlo):
            line = hlo[max(0, m.start() - 400): m.start()]
            shapes = re.findall(r"f32\[([\d,]*)\]", line.split("=")[-1])
            for s in shapes:
                n = 1
                for dim in filter(None, s.split(",")):
                    n *= int(dim)
                total += n
        return total

    p2, p4 = payload(2), payload(4)
    assert p2 > 0
    assert p2 == p4, f"all-reduce payload grew with batch: {p2} vs {p4}"
