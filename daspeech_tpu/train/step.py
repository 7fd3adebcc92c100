"""Data-parallel training step over a `jax.sharding.Mesh`.

Replaces the reference's whole distributed stack — LegacyDistributedDataParallel
bucketed all-reduce, fast-stat-sync, NCCL process groups
(``fairseq/fairseq/distributed/``, ``fairseq/fairseq/trainer.py:797-1130``) —
with a single jitted function: grads and metrics are averaged/summed by XLA
collectives over the ICI as a consequence of sharding annotations; there is
no wrapper class, no bucketing, no manual all-reduce.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_train_step(
    loss_fn: Callable,
    tx,
    accum_steps: int = 1,
    nan_guard: bool = True,
):
    """Build a jitted train step.

    ``loss_fn(params_dict, batch, rng, step) -> (loss, aux)`` where aux
    carries ``metrics`` (dict of scalars) and optional ``batch_stats``.

    ``accum_steps > 1`` implements ``--update-freq`` gradient accumulation
    (``fairseq_cli/train.py:270-279``): every batch leaf must then carry a
    leading microbatch axis [A, ...]; grads are averaged over A before the
    optimizer update.

    ``nan_guard`` replaces the reference's NanDetector + AMP-overflow retry
    machinery (``trainer.py:977-1009``): a non-finite loss or grad-norm
    skips the parameter/optimizer update for that step (params keep their
    values, metrics record ``skipped=1``) instead of corrupting the run.
    """

    def train_step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def lossf(params, mb, key):
            return loss_fn(
                {"params": params, "batch_stats": state.batch_stats},
                mb, key, state.step)

        if accum_steps == 1:
            (loss, aux), grads = jax.value_and_grad(
                lossf, has_aux=True)(state.params, batch, rng)
        else:
            def micro(carry, inputs):
                acc, loss_acc = carry
                mb, key = inputs
                (l, aux), g = jax.value_and_grad(lossf, has_aux=True)(
                    state.params, mb, key)
                acc = jax.tree.map(jnp.add, acc, g)
                return (acc, loss_acc + l), aux

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            keys = jax.random.split(rng, accum_steps)
            (grads, loss_sum), auxs = jax.lax.scan(
                micro, (zeros, 0.0),
                (batch, keys))
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            loss = loss_sum / accum_steps
            aux = jax.tree.map(lambda x: x[-1], auxs)
            aux["metrics"] = jax.tree.map(
                lambda x: jnp.mean(x.astype(jnp.float32)), auxs["metrics"])

        gnorm = optax_global_norm(grads)
        ok = (jnp.isfinite(loss) & jnp.isfinite(gnorm)) if nan_guard \
            else jnp.bool_(True)
        fused = getattr(tx, "fused_update", None)
        if fused is not None:
            # single-pass clip+Adam+wd+lr+guard (train_state.py). Measured
            # NEUTRAL vs the optax chain + tree-wide select at the recipe
            # shape (65.3 vs 65.5 ms/step) — XLA already fuses the select
            # into the chain — but it guarantees the one-pass structure
            # at any model size and keeps both schedule counts exact.
            new_params, new_opt = fused(
                state.params, state.opt_state, grads, gnorm, ok)
        else:
            updates, new_opt = tx.update(
                grads, state.opt_state, state.params)
            new_params = jax.tree.map(
                lambda p, u: (p + u).astype(p.dtype), state.params, updates)
            if nan_guard:
                # tree-wide where, NOT lax.cond: a scalar-predicate
                # conditional was measured SLOWER here (83.3 vs 78.9
                # ms/step) — XLA materializes both branch operand tuples,
                # copying the whole params+Adam tree, where the select
                # fuses into the update.
                new_params = jax.tree.map(
                    lambda new, old: jnp.where(ok, new, old),
                    new_params, state.params)
                new_opt = jax.tree.map(
                    lambda new, old: jnp.where(ok, new, old),
                    new_opt, state.opt_state)
        skipped = (~ok).astype(jnp.float32) if nan_guard \
            else jnp.zeros(())

        metrics = dict(aux["metrics"])
        metrics["gnorm"] = gnorm
        metrics["skipped"] = skipped
        new_bs = aux.get("batch_stats") or state.batch_stats
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_bs, opt_state=new_opt)
        return new_state, metrics

    return train_step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))


def shard_batch_specs(batch: Dict[str, jnp.ndarray], mesh: Mesh,
                      axis: str = "data", batch_dim: int = 0,
                      seq_axis=None, seq_keys=("fbank",)):
    """NamedShardings splitting the batch dim over the mesh.

    ``batch_dim=1`` is the --update-freq layout, where leaves carry a
    leading microbatch axis [A, B, ...]: the scan axis A stays replicated
    and the per-microbatch batch B is split across devices.

    ``seq_axis`` additionally shards the frame axis of ``seq_keys``
    entries (sequence parallelism for the encoder input, whose frame
    count runs to 6000 — used by ``parallel.jit_sharded``).
    """
    def spec(k, v):
        dims = [None] * v.ndim
        if v.ndim > batch_dim and axis in mesh.axis_names:
            dims[batch_dim] = axis
        if (seq_axis and seq_axis in mesh.axis_names and k in seq_keys
                and v.ndim > batch_dim + 1):
            dims[batch_dim + 1] = seq_axis
        return NamedSharding(mesh, P(*dims))

    return {k: spec(k, v) for k, v in batch.items()}


def jit_data_parallel(
    train_step: Callable, mesh: Mesh, axis: str = "data",
    batch_dim: int = 0,
) -> Callable:
    """pjit the step: params/opt state replicated, batch sharded on `axis`.
    XLA inserts the grad all-reduce (psum over ICI) automatically."""
    replicated = NamedSharding(mesh, P())

    def wrapped(state, batch, rng):
        batch = jax.lax.with_sharding_constraint(
            batch, shard_batch_specs(batch, mesh, axis, batch_dim))
        return train_step(state, batch, rng)

    return jax.jit(
        wrapped,
        in_shardings=(replicated, None, replicated),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
    )
