"""Training state, optimizer, and LR schedule.

Replaces the reference's FP16Optimizer + DynamicLossScaler + Adam +
InverseSquareRootSchedule stack (``fairseq/fairseq/optim/``): on TPU we train
with bf16 compute / fp32 params and need no loss scaling, so the whole
fp16 machinery collapses into an optax chain.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional

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


class FusedGradientTransformation(NamedTuple):
    """optax.GradientTransformation plus a single-pass guarded apply.

    ``init``/``update`` are the stock optax chain (state pytree is
    IDENTICAL — checkpoints are interchangeable).  ``fused_update(params,
    opt_state, grads, gnorm, ok)`` fuses clip + Adam + weight decay + lr +
    the NaN skip-step guard into ONE read and write of (p, mu, nu) per
    leaf: the chain + tree-wide post-select walks the ~600 MB Adam state
    twice more than necessary (measured ~4.6 ms optimizer tail of a
    65.8 ms step; the floor for one pass is ~1.8 ms at 52.6M params).
    ``ok=False`` (non-finite loss/grad-norm) leaves params, moments, and
    both counts untouched — exactly the old select semantics."""

    init: Callable
    update: Callable
    fused_update: Callable


def _fused_guarded_adam(params, opt_state, grads, gnorm, ok, *,
                        b1, b2, eps, wd, clip, sched):
    """Single-pass equivalent of
    chain([clip_by_global_norm,] scale_by_adam, [add_decayed_weights,]
    scale_by_learning_rate) + tree-wide where(ok) — bit-compatible with
    the optax chain (same op order: optax `transform.py::scale_by_adam`,
    `clipping.py::clip_by_global_norm`).  The state layout matches the
    chain actually built for the flags (no placeholder states), so
    checkpoints from any earlier flag combination restore unchanged."""
    state = list(opt_state)
    adam_idx = 1 if clip is not None else 0
    adam_st = state[adam_idx]
    sched_st = state[-1]

    max_i32 = jnp.iinfo(jnp.int32).max
    safe_inc = lambda c: jnp.where(c == max_i32, c, c + 1)
    count_inc = safe_inc(adam_st.count)
    f32 = jnp.float32
    # clip_by_global_norm: scale only when gnorm exceeds the max norm
    if clip is not None and clip > 0:
        scale = jnp.where(gnorm < clip, f32(1.0), clip / gnorm)
    else:
        scale = f32(1.0)
    lr = sched(sched_st.count)          # schedule reads its OLD count
    bc1 = 1.0 - b1 ** count_inc.astype(f32)
    bc2 = 1.0 - b2 ** count_inc.astype(f32)

    def leaf(p, m, v, g):
        g = g.astype(f32) * scale
        m_new = b1 * m + (1.0 - b1) * g
        v_new = b2 * v + (1.0 - b2) * (g * g)
        u = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
        if wd:
            u = u + wd * p
        p_new = (p - lr * u).astype(p.dtype)
        # select (not arithmetic gating): g may be inf/nan when ~ok
        return (jnp.where(ok, p_new, p),
                jnp.where(ok, m_new, m).astype(m.dtype),
                jnp.where(ok, v_new, v).astype(v.dtype))

    is3 = lambda x: isinstance(x, tuple)
    out = jax.tree.map(leaf, params, adam_st.mu, adam_st.nu, grads)
    new_params = jax.tree.map(lambda t: t[0], out, is_leaf=is3)
    new_mu = jax.tree.map(lambda t: t[1], out, is_leaf=is3)
    new_nu = jax.tree.map(lambda t: t[2], out, is_leaf=is3)
    state[adam_idx] = adam_st._replace(
        count=jnp.where(ok, count_inc, adam_st.count),
        mu=new_mu, nu=new_nu)
    state[-1] = sched_st._replace(
        count=jnp.where(ok, safe_inc(sched_st.count), sched_st.count))
    return new_params, tuple(state)


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
    recipe flags (``README.md:243-246``).  The returned transformation also
    carries ``fused_update`` (see :class:`FusedGradientTransformation`);
    ``train/step.py`` uses it when present."""
    sched = inverse_sqrt_schedule(lr, warmup_updates, warmup_init_lr)
    chain = []
    has_clip = bool(clip_norm and clip_norm > 0)
    if has_clip:
        chain.append(optax.clip_by_global_norm(clip_norm))
    chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8))
    if weight_decay and weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_learning_rate(sched))
    tx = optax.chain(*chain)
    fused = functools.partial(
        _fused_guarded_adam, b1=b1, b2=b2, eps=1e-8,
        wd=(weight_decay if weight_decay and weight_decay > 0 else 0.0),
        clip=(clip_norm if has_clip else None), sched=sched)
    return FusedGradientTransformation(tx.init, tx.update, fused)


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
