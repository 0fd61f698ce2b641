"""Train state and jit-compiled train/eval steps.

One ``pjit``-compiled function is the whole training step (SURVEY.md §7
stage 5): forward (contrastive + optional MLM/classification loss), backward,
optimizer update. Batches are sharded over the ``data`` mesh axis and params
over ``model``; XLA inserts gradient psums and the contrastive similarity
matmul's all-gathers over ICI automatically because the loss is written
against the global logical batch.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import batch_shardings, param_shardings, replicated


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(
    model, tx: optax.GradientTransformation, rng, example_batch: dict, method=None
) -> TrainState:
    params = model.init(rng, **example_batch, **({"method": method} if method is not None else {}))
    opt_state = tx.init(params["params"])
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_key: str = "loss",
    method=None,
) -> Callable:
    """Build the pure train-step function (jit/pjit it at the call site).

    ``method`` selects an alternative module forward (e.g.
    ``CM3PModule.forward_packed`` for packed-window training).
    """

    def train_step(state: TrainState, batch: dict, dropout_rng) -> tuple[TrainState, dict]:
        step_rng = jax.random.fold_in(dropout_rng, state.step)

        def loss_fn(params):
            out = model.apply(
                {"params": params},
                **batch,
                deterministic=False,
                rngs={"dropout": step_rng},
                **({"method": method} if method is not None else {}),
            )
            loss = getattr(out, loss_key)
            return loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params["params"])
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params["params"])
        new_params = optax.apply_updates(state.params["params"], updates)
        grad_norm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": grad_norm}
        new_state = TrainState(
            step=state.step + 1,
            params={"params": new_params},
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return train_step


def make_eval_step(model, method=None) -> Callable:
    def eval_step(state: TrainState, batch: dict):
        out = model.apply(
            state.params, **batch, deterministic=True,
            **({"method": method} if method is not None else {}),
        )
        return out

    return eval_step


def shard_train_step(train_step: Callable, mesh, state: TrainState, example_batch: dict):
    """jit the train step with explicit state/batch shardings on ``mesh``."""
    state_sharding = TrainState(
        step=replicated(mesh),
        params=param_shardings(mesh, state.params),
        opt_state=param_shardings(mesh, state.opt_state),
    )
    batch_sharding = batch_shardings(mesh, example_batch)
    return (
        jax.jit(
            train_step,
            in_shardings=(state_sharding, batch_sharding, replicated(mesh)),
            out_shardings=(state_sharding, replicated(mesh)),
            donate_argnums=(0,),
        ),
        state_sharding,
        batch_sharding,
    )
