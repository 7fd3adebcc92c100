"""Reference (pure-JAX, `lax.scan`) implementations of the DAG dynamic programs.

These are the correctness oracles for the Pallas TPU kernels in
``dag_pallas.py`` and are themselves TPU-efficient: each scan step is a
batched exp/matmul ("streaming logsumexp-matvec") that maps onto the MXU,
instead of the CUDA anti-diagonal wavefront of the reference
(``DASpeech/custom_ops/dag_loss.cu:41-274``).

Semantics match the reference exactly (ictnlp/DASpeech):

- ``match_all[b, t, j] = log P(y_t | v_j)`` over a padded ``[B, T, L]`` grid
  (``DASpeech/custom_ops/dag_loss.py:80-96``).
- ``links[b, i, j] = log P(v_i -> v_j)``, a full ``[B, L, L]`` strictly
  upper-triangular log-transition matrix (the *torch-version* layout,
  ``DASpeech/custom_ops/dag_loss.py:330-337``; banded conversions live in
  ``links_utils.py``).
- alpha recursion (``dag_loss.cu:95-139``):
      alpha[0, 0] = match_all[0, 0];  alpha[0, j>0] = -inf
      alpha[t, j] = logsumexp_i(alpha[t-1, i] + links[i, j]) + match_all[t, j]
- beta recursion (``dag_loss.cu:208-274``), with beta *including* the
  emission term at its own position:
      beta[T-1, j] = match_all[T-1, j] if j == output_length-1 else -inf
      beta[t, j]   = logsumexp_k(beta[t+1, k] + links[j, k]) + match_all[t, j]
- ``logZ = alpha[target_length-1, output_length-1] = beta[0, 0]``.
- closed-form gradients (``dag_loss.cu:398,474``):
      d logZ / d match_all[t, j] = exp(alpha[t,j] + beta[t,j] - match[t,j] - logZ)
      d logZ / d links[i, j]     = sum_t exp(alpha[t,i] + beta[t+1,j]
                                             + links[i,j] - logZ)

All computation is float32; the reference warns half precision breaks the DP
(``DASpeech/custom_ops/dag_loss.py:86``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30  # used only where a true -inf would propagate NaNs


def _finite_max(x: jnp.ndarray, axis: int = -1, keepdims: bool = True) -> jnp.ndarray:
    """max along axis, replacing -inf (all-masked rows) with 0 so that
    ``x - m`` never produces NaN (-inf - -inf)."""
    m = jnp.max(x, axis=axis, keepdims=keepdims)
    return jnp.where(jnp.isfinite(m), m, 0.0)


def _alpha_scan(match_all: jnp.ndarray, exp_links: jnp.ndarray) -> jnp.ndarray:
    """Forward DP. match_all: [B, T, L] (f32, log), exp_links: [B, L, L]
    (f32, prob space). Returns alpha: [B, T, L]."""
    B, T, L = match_all.shape

    f0 = jnp.full((B, L), -jnp.inf, dtype=jnp.float32)
    f0 = f0.at[:, 0].set(match_all[:, 0, 0])

    def step(f, match_t):
        c = _finite_max(f)                      # [B, 1]
        p = jnp.exp(f - c)                      # [B, L], <= 1
        nxt = jnp.einsum("bi,bij->bj", p, exp_links,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
        f_next = jnp.log(nxt) + c + match_t     # log(0) = -inf is fine
        return f_next, f_next

    match_rest = jnp.swapaxes(match_all[:, 1:], 0, 1)  # [T-1, B, L]
    _, alphas = jax.lax.scan(step, f0, match_rest)
    return jnp.concatenate([f0[:, None], jnp.swapaxes(alphas, 0, 1)], axis=1)


def _beta_scan(
    match_all: jnp.ndarray,
    exp_links: jnp.ndarray,
    output_length: jnp.ndarray,
    target_length: jnp.ndarray,
) -> jnp.ndarray:
    """Backward DP with a per-sample reset at t == target_length-1 (handles
    ragged targets inside one padded scan). Returns beta: [B, T, L]."""
    B, T, L = match_all.shape
    pos = jnp.arange(L)[None, :]                          # [1, L]
    final_onehot = pos == (output_length[:, None] - 1)    # [B, L]

    b_init = jnp.full((B, L), -jnp.inf, dtype=jnp.float32)

    def step(b, inputs):
        t, match_t = inputs
        c = _finite_max(b)
        p = jnp.exp(b - c)                                # [B, L]
        # beta[t, j] = logsumexp_k(beta[t+1, k] + links[j, k]) + match[t, j]
        nxt = jnp.einsum("bk,bjk->bj", p, exp_links,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
        propagated = jnp.log(nxt) + c + match_t
        is_last = (t == target_length - 1)[:, None]       # [B, 1]
        init_t = jnp.where(final_onehot, match_t, -jnp.inf)
        b_next = jnp.where(is_last, init_t, propagated)
        return b_next, b_next

    ts = jnp.arange(T - 1, -1, -1)
    match_rev = jnp.swapaxes(match_all, 0, 1)[::-1]       # [T, B, L]
    _, betas = jax.lax.scan(step, b_init, (ts, match_rev))
    return jnp.swapaxes(betas, 0, 1)[:, ::-1]


def dag_loss_forward(
    match_all: jnp.ndarray,
    links: jnp.ndarray,
    output_length: jnp.ndarray,
    target_length: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compute (logprob [B], alpha [B,T,L], beta [B,T,L])."""
    match_all = match_all.astype(jnp.float32)
    links = links.astype(jnp.float32)
    exp_links = jnp.exp(links)
    alpha = _alpha_scan(match_all, exp_links)
    beta = _beta_scan(match_all, exp_links, output_length, target_length)
    logprob = beta[:, 0, 0]
    return logprob, alpha, beta


def _dag_loss_bwd_grads(
    match_all: jnp.ndarray,
    links: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: jnp.ndarray,
    g: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form cotangents (mirrors ``dag_loss.cu:378-485``)."""
    logZ = beta[:, 0, 0][:, None, None]                    # [B, 1, 1]
    expo = alpha + beta - match_all - logZ                 # <= 0 for valid cells
    grad_match = jnp.where(
        jnp.isinf(match_all) | ~jnp.isfinite(expo), 0.0, jnp.exp(expo)
    ) * g[:, None, None]

    # S[b,i,j] = sum_t exp(alpha[t,i] + beta[t+1,j] - logZ), computed as a
    # single MXU contraction over t with per-t max shifts for stability.
    w = _finite_max(alpha[:, :-1], axis=2)                 # [B, T-1, 1]
    a_sh = jnp.exp(alpha[:, :-1] - w)                      # <= 1
    b_sh = jnp.exp(beta[:, 1:] + w - logZ)
    b_sh = jnp.where(jnp.isfinite(b_sh), b_sh, 0.0)
    S = jnp.einsum("bti,btj->bij", a_sh, b_sh,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)     # [B, L, L]
    grad_links = S * jnp.exp(links) * g[:, None, None]
    grad_links = jnp.where(jnp.isfinite(grad_links), grad_links, 0.0)
    grad_match = jnp.where(jnp.isfinite(grad_match), grad_match, 0.0)
    return grad_match, grad_links


@jax.custom_vjp
def dag_loss(match_all, links, output_length, target_length):
    """DAG marginal log-likelihood: logsumexp over all DAG paths.

    Equivalent of the reference ``dag_loss`` CUDA op
    (``DASpeech/custom_ops/dag_loss.py:66-121``), with links in the *full*
    [B, L, L] layout of ``torch_dag_loss``.

    Returns ``logprob [B]``; differentiable w.r.t. match_all and links.
    """
    logprob, _, _ = dag_loss_forward(match_all, links, output_length, target_length)
    return logprob


def _dag_loss_fwd(match_all, links, output_length, target_length):
    logprob, alpha, beta = dag_loss_forward(
        match_all, links, output_length, target_length)
    res = (match_all.astype(jnp.float32), links.astype(jnp.float32), alpha, beta)
    return logprob, res


def _dag_loss_bwd_impl(res, g):
    match_all, links, alpha, beta = res
    gm, gl = _dag_loss_bwd_grads(match_all, links, alpha, beta, g)
    return gm, gl, None, None


dag_loss.defvjp(_dag_loss_fwd, _dag_loss_bwd_impl)


@jax.custom_vjp
def dag_loss_with_alpha_beta(match_all, links, output_length, target_length):
    """Like :func:`dag_loss` but additionally returns (alpha, beta).

    As in the reference (``DASpeech/custom_ops/dag_loss.py:123-185``), the
    cotangents arriving through alpha/beta are *discarded* — only the scalar
    logprob output contributes gradient (the ``expect`` training strategy
    treats the posterior weights as constants).
    """
    logprob, alpha, beta = dag_loss_forward(
        match_all, links, output_length, target_length)
    return logprob, alpha, beta


def _dlab_fwd(match_all, links, output_length, target_length):
    logprob, alpha, beta = dag_loss_forward(
        match_all, links, output_length, target_length)
    res = (match_all.astype(jnp.float32), links.astype(jnp.float32), alpha, beta)
    return (logprob, alpha, beta), res


def _dlab_bwd(res, gs):
    g, _g_alpha_unused, _g_beta_unused = gs
    match_all, links, alpha, beta = res
    gm, gl = _dag_loss_bwd_grads(match_all, links, alpha, beta, g)
    return gm, gl, None, None


dag_loss_with_alpha_beta.defvjp(_dlab_fwd, _dlab_bwd)


def dag_best_alignment(
    match_all: jnp.ndarray,
    links: jnp.ndarray,
    output_length: jnp.ndarray,
    target_length: jnp.ndarray,
) -> jnp.ndarray:
    """Viterbi best alignment through the DAG.

    Equivalent of ``dag_best_alignment`` (``DASpeech/custom_ops/
    dag_best_alignment.cu:40-185`` / ``dag_loss.py:388-419``): a max-plus
    forward pass keeping argmax traces, then a backtrace.

    Returns ``path [B, L]`` int32: ``path[b, j] = t`` if vertex j emits target
    token t on the best path, else -1. Non-differentiable.
    """
    match_all = match_all.astype(jnp.float32)
    links = links.astype(jnp.float32)
    B, T, L = match_all.shape

    f0 = jnp.full((B, L), -jnp.inf, dtype=jnp.float32)
    f0 = f0.at[:, 0].set(match_all[:, 0, 0])

    def fwd_step(f, match_t):
        # scores[b, i, j] = f[b, i] + links[b, i, j]
        scores = f[:, :, None] + links
        best = jnp.max(scores, axis=1)
        arg = jnp.argmax(scores, axis=1).astype(jnp.int32)   # [B, L]
        f_next = best + match_t
        return f_next, (f_next, arg)

    match_rest = jnp.swapaxes(match_all[:, 1:], 0, 1)
    _, (_, traces) = jax.lax.scan(fwd_step, f0, match_rest)
    # traces[t-1, b, j] = argmax_i for step t (t = 1..T-1)
    traces = jnp.swapaxes(traces, 0, 1)                      # [B, T-1, L]

    # Backtrace from (t = target_length-1, j = output_length-1) down to t=0.
    # The scan carries only the [B] cursor and STACKS the visited vertex per
    # step; the [B, L] path is built afterwards in one vectorized pass — a
    # per-step [B, L] where-update cost ~2 ms/step of dynamic_update_slice
    # HBM traffic in the train-step trace.
    cur0 = jnp.zeros((B,), dtype=jnp.int32)

    def back_step(cur, t):
        is_start = t == (target_length - 1)                  # [B]
        cur = jnp.where(is_start, output_length - 1, cur).astype(jnp.int32)
        visited = cur                                        # vertex at step t
        # hop: cur <- traces[t-1, cur] (for t >= 1)
        t_idx = jnp.maximum(t - 1, 0)
        prev = jnp.take_along_axis(
            traces[:, t_idx], cur[:, None], axis=1)[:, 0]
        active = t <= (target_length - 1)
        cur = jnp.where(active & (t >= 1), prev, cur).astype(jnp.int32)
        return cur, visited

    ts = jnp.arange(T - 1, -1, -1)
    _, visited = jax.lax.scan(back_step, cur0, ts)           # [T, B]
    # path[b, j] = smallest marked t (the scan iterated t descending with
    # last-write-wins, which is the same min-t on any degenerate input)
    active = ts[:, None] <= (target_length[None, :] - 1)     # [T, B]
    mark = ((visited[:, :, None] == jnp.arange(L)[None, None, :])
            & active[:, :, None])                            # [T, B, L]
    path = jnp.min(jnp.where(mark, ts[:, None, None], T), axis=0)
    return jax.lax.stop_gradient(jnp.where(path == T, -1, path)
                                 .astype(jnp.int32))


def dag_logsoftmax_gather(
    word_ins_out: jnp.ndarray, select_idx: jnp.ndarray
) -> jnp.ndarray:
    """Fused ``log_softmax(logits, -1).gather(-1, select_idx)``.

    Equivalent of the reference's memory-critical in-place CUDA op
    (``DASpeech/custom_ops/logsoftmax_gather.cu``); here XLA fuses the
    normalizer with the gather so the [B, L, V] float32 log-probs are never
    materialized. Differentiable (softmax/scatter-add VJP is automatic).

    Args:
      word_ins_out: [B, L, V] logits (any float dtype; normalized in f32).
      select_idx:   [B, L, T] int32 token indices to gather.

    Returns:
      match: [B, L, T] float32 gathered log-probabilities.
    """
    logits = word_ins_out.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1, keepdims=True)       # [B, L, 1]
    picked = jnp.take_along_axis(logits, select_idx, axis=-1)     # [B, L, T]
    return picked - logz


def dag_logsoftmax_gather_tokens(
    word_ins_out: jnp.ndarray,    # [B, L, V] logits
    tgt_tokens: jnp.ndarray,      # [B, T] int32 target tokens
    onehot_max_vocab: int = 4096,
) -> jnp.ndarray:
    """``dag_logsoftmax_gather`` specialized to the criterion's actual
    access pattern: every graph vertex gathers the SAME [B, T] target row
    (``nat_dag_loss.py:130-132`` broadcasts the target over prelen).

    For small vocabularies the gather becomes a one-hot matmul — on TPU a
    [B,L,V]x[B,V,T] batched matmul on the MXU with a matmul VJP, instead of
    a per-element gather with a scatter-add VJP (measured 15.4 ms -> MXU
    noise at recipe shapes, and the gather runs twice per GLAT step). For
    V > onehot_max_vocab the one-hot would dominate memory; fall back to
    the gather (or use ``ops/fused_vocab.py`` which never materializes
    logits at all).

    Returns match [B, L, T] float32 log-probabilities.
    """
    B, L, V = word_ins_out.shape
    logits = word_ins_out.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1, keepdims=True)       # [B, L, 1]
    if V <= onehot_max_vocab:
        onehot = jax.nn.one_hot(tgt_tokens, V, dtype=jnp.float32)  # [B, T, V]
        picked = jnp.einsum("blv,btv->blt", logits, onehot,
                            preferred_element_type=jnp.float32)
    else:
        T = tgt_tokens.shape[1]
        picked = jnp.take_along_axis(
            logits, jnp.broadcast_to(tgt_tokens[:, None, :], (B, L, T)),
            axis=-1)
    return picked - logz


def torch_style_dag_loss(match_all, links, output_length, target_length):
    """Non-custom-VJP scan version (autodiff-through-scan); used in tests to
    cross-check the closed-form gradients, mirroring the reference's
    CUDA-vs-torch dual-implementation harness
    (``DASpeech/custom_ops/dag_loss.py:432-704``)."""
    logprob, _, _ = dag_loss_forward_autodiff(
        match_all, links, output_length, target_length)
    return logprob


def dag_loss_forward_autodiff(match_all, links, output_length, target_length):
    """Same recursion, but written without custom_vjp so JAX differentiates
    through the scan directly. -inf inputs are floored to a large negative
    finite value so reverse-mode AD never sees 0 * inf; forward values agree
    with :func:`dag_loss` to float32 precision."""
    floor = -1e9
    match_all = jnp.maximum(match_all.astype(jnp.float32), floor)
    links = jnp.maximum(links.astype(jnp.float32), floor)
    B, T, L = match_all.shape

    f0 = jnp.full((B, L), floor, dtype=jnp.float32)
    f0 = f0.at[:, 0].set(match_all[:, 0, 0])

    def step(f, match_t):
        # explicit logsumexp over the [B, L, L] edge tensor: its VJP is a
        # softmax, which stays finite for arbitrarily negative inputs.
        scores = f[:, :, None] + links                     # [B, L, L]
        f_next = jax.nn.logsumexp(scores, axis=1) + match_t
        f_next = jnp.maximum(f_next, floor)
        return f_next, f_next

    match_rest = jnp.swapaxes(match_all[:, 1:], 0, 1)
    _, alphas = jax.lax.scan(step, f0, match_rest)
    alpha = jnp.concatenate([f0[:, None], jnp.swapaxes(alphas, 0, 1)], axis=1)
    batch = jnp.arange(B)
    logprob = alpha[batch, target_length - 1, output_length - 1]
    return logprob, alpha, None
