"""Jitted data-parallel train/eval steps.

Gradient reduction across the mesh is implicit: the batch is sharded over
``data``, params are replicated, so XLA emits the all-reduce (psum over ICI)
for the gradients inside the single jitted step — the TPU-native equivalent
of the reference's DDP wrapper (SURVEY §2.5).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from hierdiff_tpu.parallel.mesh import batch_sharding, replicate_sharding

Array = jax.Array


class TrainState(flax.struct.PyTreeNode):
    """Minimal train state: step / params / opt state (+ optional EMA).

    EMA mirrors the reference's (unused there) EMA helper
    (endiffusion/models/utils.py:17-30) but wired in for real: sampling and
    eval should use ``ema_params`` when ``ema_decay > 0``.
    """

    step: Array
    params: Any
    opt_state: Any
    ema_params: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.0)

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, ema_decay: float = 0.0):
        # EMA starts as a deep COPY — aliasing params would make buffer
        # donation in the jitted step donate the same buffer twice.
        ema = jax.tree_util.tree_map(jnp.copy, params) if ema_decay > 0 else None
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=ema,
            tx=tx,
            ema_decay=ema_decay,
        )

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        if self.ema_params is not None:
            d = self.ema_decay
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + (1.0 - d) * p, self.ema_params, new_params)
        else:
            new_ema = None
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state, ema_params=new_ema)


def make_train_step(
    loss_fn: Callable[[Any, Dict[str, Array], Array], Tuple[Array, Dict[str, Array]]],
    mesh: Optional[Mesh] = None,
    donate_state: bool = True,
) -> Callable[[TrainState, Dict[str, Array], Array], Tuple[TrainState, Dict[str, Array]]]:
    """Build a jitted step from ``loss_fn(params, batch, rng) -> (loss, metrics)``.

    With a mesh, in/out shardings are annotated so batches stay sharded over
    ``data`` and state stays replicated.
    """

    def step(state: TrainState, batch: Dict[str, Array], rng: Array):
        step_rng = jax.random.fold_in(rng, state.step)

        def wrapped(params):
            return loss_fn(params, batch, step_rng)

        (loss, metrics), grads = jax.value_and_grad(wrapped, has_aux=True)(state.params)
        gnorm = optax.global_norm(grads)
        state = state.apply_gradients(grads=grads)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = gnorm
        return state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate_state else ())

    repl = replicate_sharding(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, bsh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )


def make_eval_step(
    loss_fn: Callable[[Any, Dict[str, Array], Array], Tuple[Array, Dict[str, Array]]],
    mesh: Optional[Mesh] = None,
):
    def step(params, batch, rng):
        loss, metrics = loss_fn(params, batch, rng)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    if mesh is None:
        return jax.jit(step)
    repl = replicate_sharding(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(repl, bsh, repl), out_shardings=repl)
