"""Training state, optimizer, and LR schedule.

Replaces the reference's FP16Optimizer + DynamicLossScaler + Adam +
InverseSquareRootSchedule stack (``fairseq/fairseq/optim/``): on TPU we train
with bf16 compute / fp32 params and need no loss scaling, so the whole
fp16 machinery collapses into an optax chain.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax


def inverse_sqrt_schedule(
    lr: float, warmup_updates: int, warmup_init_lr: float = 1e-7
) -> optax.Schedule:
    """``InverseSquareRootSchedule``
    (``fairseq/fairseq/optim/lr_scheduler/inverse_square_root_schedule.py:72-85``):
    linear warmup from warmup_init_lr to lr, then lr * sqrt(warmup/step)."""

    def schedule(step):
        step = jnp.maximum(step, 1)
        warm = warmup_init_lr + (lr - warmup_init_lr) * (
            step / max(warmup_updates, 1))
        decay = lr * jnp.sqrt(warmup_updates / jnp.maximum(
            step, warmup_updates))
        return jnp.where(step < warmup_updates, warm, decay)

    return schedule


def make_optimizer(
    lr: float = 5e-4,
    warmup_updates: int = 10000,
    warmup_init_lr: float = 1e-7,
    b1: float = 0.9,
    b2: float = 0.999,
    weight_decay: float = 0.01,
    clip_norm: float = 1.0,
) -> optax.GradientTransformation:
    """Adam + decoupled weight decay + global-norm clipping, matching the
    recipe flags (``README.md:243-246``)."""
    sched = inverse_sqrt_schedule(lr, warmup_updates, warmup_init_lr)
    chain = []
    if clip_norm and clip_norm > 0:
        chain.append(optax.clip_by_global_norm(clip_norm))
    chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8))
    if weight_decay and weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_learning_rate(sched))
    return optax.chain(*chain)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables: Dict[str, Any],
               tx: optax.GradientTransformation) -> "TrainState":
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        )

    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def parse_anneal(schedule: str):
    """``parse_anneal_argument`` (``DASpeech/criterions/utilities.py:17-37``):
    '0.5:0.1@100k' -> (start, end, steps); '0.3' -> constant."""
    def _num(s):
        s = s.strip()
        if s.endswith("k"):
            return float(s[:-1]) * 1000
        return float(s)

    if "@" in schedule:
        vals, steps = schedule.split("@")
    else:
        vals, steps = schedule, "0"
    if ":" in vals:
        start, end = (float(x) for x in vals.split(":"))
    else:
        start = end = float(vals)
    return start, end, _num(steps)


def anneal_value(params, step):
    """``get_anneal_value``: linear interpolation, clamped at the end."""
    start, end, steps = params
    if steps <= 0:
        return jnp.asarray(start, jnp.float32)
    frac = jnp.clip(step / steps, 0.0, 1.0)
    return jnp.asarray(start + (end - start) * frac, jnp.float32)
