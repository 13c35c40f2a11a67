"""Training / evaluation steps for GNN models.

The reference is inference-only (weights random, SURVEY.md §5.4); we keep
its inference path but add a real training loop — cross-entropy +
optax — since a production framework needs one. The aggregate used under
training is the unquantized path (``agg_dtype=None``): ``round()`` has zero
gradient, matching the standard practice of quantizing only for inference.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from pygim_tpu.nn.models import GNN, gnn_apply


def softmax_cross_entropy(logits, labels, mask=None):
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if mask is not None:
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)
    return jnp.mean(nll)


def accuracy(logits, labels, mask=None):
    hit = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
    if mask is not None:
        return jnp.sum(hit * mask) / jnp.maximum(jnp.sum(mask), 1)
    return jnp.mean(hit)


def make_train_step(
    model: GNN,
    aggregate: Callable,
    optimizer: optax.GradientTransformation,
):
    """Returns ``(params, opt_state, x, labels, mask, rng) -> (params,
    opt_state, loss)`` — jittable; ``aggregate`` may be a sharded 2D-mesh
    product (psum inside shard_map differentiates cleanly).

    NOTE: jitting this closes over whatever device arrays ``aggregate``
    captured. For large graphs on remote-compile backends use
    :func:`make_train_step_threaded`, which passes the prepared tables
    through the jit as arguments instead of baking them into the HLO.
    """

    from pygim_tpu.nn.models import merge_bn_stats

    def loss_fn(params, x, labels, mask, rng):
        logits, bn_stats = gnn_apply(
            params, x, aggregate, conv=model.conv,
            num_layers=model.num_layers, dropout_rate=model.dropout,
            agg_dtype=None, training=True, rng=rng, return_bn_stats=True,
        )
        return softmax_cross_entropy(logits, labels, mask), bn_stats

    def train_step(params, opt_state, x, labels, mask, rng):
        (loss, bn_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, labels, mask, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = merge_bn_stats(params, bn_stats)
        return params, opt_state, loss

    return train_step


def make_train_step_threaded(
    model: GNN,
    prep,
    optimizer: optax.GradientTransformation,
):
    """Train step with the prepared sparse tables as explicit jit
    ARGUMENTS (``prep.dev_arrays`` / ``prep.raw_mul``) — never baked into
    the HLO as constants; the inference-path fix (bench/runners.py)
    applied to training. Returns ``(step_fn, dev)``; call
    ``jax.jit(step_fn)(params, opt_state, x, labels, mask, rng, dev)``."""

    from pygim_tpu.nn.models import merge_bn_stats

    def loss_fn(params, x, labels, mask, rng, dev):
        logits, bn_stats = gnn_apply(
            params, x, lambda v: prep.raw_mul(v, dev), conv=model.conv,
            num_layers=model.num_layers, dropout_rate=model.dropout,
            agg_dtype=None, training=True, rng=rng, return_bn_stats=True,
        )
        return softmax_cross_entropy(logits, labels, mask), bn_stats

    def train_step(params, opt_state, x, labels, mask, rng, dev):
        (loss, bn_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, labels, mask, rng, dev
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = merge_bn_stats(params, bn_stats)
        return params, opt_state, loss

    return train_step, prep.dev_arrays


def make_eval_step(model: GNN, aggregate: Callable):
    def eval_step(params, x, labels, mask):
        logits = gnn_apply(
            params, x, aggregate, conv=model.conv,
            num_layers=model.num_layers, dropout_rate=model.dropout,
            agg_dtype=model.agg_dtype, training=False,
        )
        return accuracy(logits, labels, mask), logits

    return eval_step
