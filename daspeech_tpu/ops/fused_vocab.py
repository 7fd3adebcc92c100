"""Fused vocab-projection + log-softmax + target-gather, streaming over
vocab tiles.

SURVEY.md §7 hard part #2: the reference's ``logsoftmax_gather`` CUDA op
mutates the B*L*|V| logits in place to save memory
(``DASpeech/custom_ops/logsoftmax_gather.cu``); with a functional XLA
program and a multilingual subword vocab (|V| ~ 10k, B=80, L=240 -> 768 MB
of fp32 logits just for the forward) that buffer must never exist. This op
computes

    match[b, t, j] = (feat[b,j] . W[:, y_t] + bias[y_t]) - logZ[b, j]
    logZ[b, j]     = logsumexp_v(feat[b,j] . W[:, v] + bias[v])

with the normalizer accumulated over vocab chunks (streaming max/sum, the
same two-pass-free scheme as online softmax), so peak memory is
O(B*L*chunk). The custom VJP recomputes chunk softmaxes instead of storing
them:

    d feat[b,j] = sum_t g[b,t,j] W[:, y_t]  -  G[b,j] * (p[b,j,:] @ W^T)
    d W[:, v]   = sum_{b,j} feat[b,j] (scatter_t g at y_t)[v]
                  - sum_{b,j} G[b,j] p[b,j,v] feat[b,j]
    d bias[v]   = scatter(g at y) - sum_{b,j} G[b,j] p[b,j,v]
    with G = sum_t g.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


def _chunked_logz(feat2d: jnp.ndarray, W: jnp.ndarray, bias: jnp.ndarray,
                  chunk: int) -> jnp.ndarray:
    """feat2d [N, D] -> logZ [N] via streaming logsumexp over vocab tiles."""
    N, D = feat2d.shape
    V = W.shape[1]
    pad = (-V) % chunk
    if pad:
        W = jnp.pad(W, ((0, 0), (0, pad)))
        bias = jnp.pad(bias, (0, pad), constant_values=-jnp.inf)
    n_chunks = W.shape[1] // chunk
    Wc = W.reshape(D, n_chunks, chunk)
    bc = bias.reshape(n_chunks, chunk)

    def step(carry, inputs):
        m, s = carry
        Wi, bi = inputs
        logits = jnp.dot(feat2d, Wi, precision=_PREC,
                         preferred_element_type=jnp.float32) + bi[None, :]
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(logits - m_new[:, None]), axis=-1)
        return (m_new, s), None

    m0 = jnp.full((N,), -jnp.inf, jnp.float32)
    s0 = jnp.zeros((N,), jnp.float32)
    (m, s), _ = jax.lax.scan(
        step, (m0, s0), (jnp.moveaxis(Wc, 1, 0), bc))
    return jnp.log(s) + m


def _gathered_logits(feat: jnp.ndarray, W: jnp.ndarray, bias: jnp.ndarray,
                     targets: jnp.ndarray) -> jnp.ndarray:
    """[B, L, D], [D, V], [V], [B, T] -> unnormalized match [B, T, L]."""
    W_y = jnp.take(W, targets, axis=1)                 # [D, B, T]
    W_y = jnp.moveaxis(W_y, 1, 0)                      # [B, D, T]
    un = jnp.einsum("bld,bdt->btl", feat, W_y, precision=_PREC,
                    preferred_element_type=jnp.float32)
    return un + jnp.take(bias, targets, axis=0)[:, :, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_logsoftmax_gather(feat, W, bias, targets, vocab_chunk=2048):
    """match [B, T, L] = log_softmax(feat @ W + bias)[..., y_t] without ever
    materializing [B, L, V] logits. Differentiable w.r.t feat/W/bias."""
    match, _ = _fused_fwd_impl(feat, W, bias, targets, vocab_chunk)
    return match


def _fused_fwd_impl(feat, W, bias, targets, vocab_chunk):
    feat = feat.astype(jnp.float32)
    W = W.astype(jnp.float32)
    bias = bias.astype(jnp.float32)
    B, L, D = feat.shape
    logz = _chunked_logz(feat.reshape(B * L, D), W, bias,
                         vocab_chunk).reshape(B, L)
    un = _gathered_logits(feat, W, bias, targets)
    match = un - logz[:, None, :]
    return match, logz


def _fused_fwd(feat, W, bias, targets, vocab_chunk):
    feat = feat.astype(jnp.float32)
    W = W.astype(jnp.float32)
    bias = bias.astype(jnp.float32)
    match, logz = _fused_fwd_impl(feat, W, bias, targets, vocab_chunk)
    return match, (feat, W, bias, targets, logz)


def _fused_bwd(vocab_chunk, res, g):
    feat, W, bias, targets, logz = res
    B, L, D = feat.shape
    V = W.shape[1]
    T = targets.shape[1]
    g = g.astype(jnp.float32)                          # [B, T, L]

    # --- gather-side terms
    # d feat += sum_t g[b,t,j] * W[:, y_t]
    W_y = jnp.moveaxis(jnp.take(W, targets, axis=1), 1, 0)   # [B, D, T]
    dfeat = jnp.einsum("btl,bdt->bld", g, W_y, precision=_PREC,
                       preferred_element_type=jnp.float32)
    # scatter coefficients: c[b, v] accumulated per (b, t); for dW we need
    # per-(b, j) weights too: s_g[b, j, t] = g -> dW += feat^T @ scatter(g)
    # dW[:, y_t] += sum_j g[b,t,j] feat[b,j]
    gf = jnp.einsum("btl,bld->btd", g, feat, precision=_PREC,
                    preferred_element_type=jnp.float32)      # [B, T, D]
    dW_gather = jnp.zeros((V, D), jnp.float32).at[targets.reshape(-1)].add(
        gf.reshape(B * T, D))                                # [V, D]
    dbias = jnp.zeros((V,), jnp.float32).at[targets.reshape(-1)].add(
        jnp.sum(g, axis=2).reshape(-1))

    # --- softmax-side terms (streamed over vocab tiles)
    G = jnp.sum(g, axis=1)                                   # [B, L]
    feat2d = feat.reshape(B * L, D)
    Gf = G.reshape(B * L)
    logz2 = logz.reshape(B * L)

    pad = (-V) % vocab_chunk
    Wp = jnp.pad(W, ((0, 0), (0, pad))) if pad else W
    bp = (jnp.pad(bias, (0, pad), constant_values=-jnp.inf) if pad else bias)
    n_chunks = Wp.shape[1] // vocab_chunk
    Wc = jnp.moveaxis(Wp.reshape(D, n_chunks, vocab_chunk), 1, 0)
    bc = bp.reshape(n_chunks, vocab_chunk)

    def step(carry, inputs):
        dfeat_acc = carry
        Wi, bi = inputs                                      # [D, C], [C]
        logits = jnp.dot(feat2d, Wi, precision=_PREC,
                         preferred_element_type=jnp.float32) + bi[None, :]
        p = jnp.exp(logits - logz2[:, None])                 # [N, C]
        gp = p * Gf[:, None]                                 # [N, C]
        dfeat_acc = dfeat_acc + jnp.dot(gp, Wi.T, precision=_PREC,
                                        preferred_element_type=jnp.float32)
        dW_i = jnp.dot(gp.T, feat2d, precision=_PREC,
                       preferred_element_type=jnp.float32)   # [C, D]
        db_i = jnp.sum(gp, axis=0)                           # [C]
        return dfeat_acc, (dW_i, db_i)

    dfeat_soft, (dW_soft, db_soft) = jax.lax.scan(
        step, jnp.zeros((B * L, D), jnp.float32), (Wc, bc))
    dW_soft = dW_soft.reshape(n_chunks * vocab_chunk, D)[:V]
    db_soft = db_soft.reshape(-1)[:V]

    dfeat = dfeat - dfeat_soft.reshape(B, L, D)
    dW = (dW_gather - dW_soft).T                             # [D, V]
    dbias = dbias - db_soft
    return dfeat, dW, dbias, None


fused_logsoftmax_gather.defvjp(_fused_fwd, _fused_bwd)


def streaming_argmax_and_match(feat, W, bias, targets, vocab_chunk=2048):
    """No-grad helper for the GLAT glancing pass: (argmax tokens [B, L],
    match [B, T, L]) without materializing [B, L, V] logits."""
    feat = jax.lax.stop_gradient(feat.astype(jnp.float32))
    W = jax.lax.stop_gradient(W.astype(jnp.float32))
    bias = jax.lax.stop_gradient(bias.astype(jnp.float32))
    B, L, D = feat.shape
    V = W.shape[1]
    feat2d = feat.reshape(B * L, D)

    pad = (-V) % vocab_chunk
    Wp = jnp.pad(W, ((0, 0), (0, pad))) if pad else W
    bp = (jnp.pad(bias, (0, pad), constant_values=-jnp.inf) if pad else bias)
    n_chunks = Wp.shape[1] // vocab_chunk
    Wc = jnp.moveaxis(Wp.reshape(D, n_chunks, vocab_chunk), 1, 0)
    bc = bp.reshape(n_chunks, vocab_chunk)

    def step(carry, inputs):
        m, s, best, best_ix, base = carry
        Wi, bi = inputs
        logits = jnp.dot(feat2d, Wi, precision=_PREC,
                         preferred_element_type=jnp.float32) + bi[None, :]
        cmax = jnp.max(logits, axis=-1)
        carg = jnp.argmax(logits, axis=-1).astype(jnp.int32) + base
        better = cmax > best
        best = jnp.where(better, cmax, best)
        best_ix = jnp.where(better, carg, best_ix)
        m_new = jnp.maximum(m, cmax)
        s = s * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(logits - m_new[:, None]), axis=-1)
        return (m_new, s, best, best_ix, base + vocab_chunk), None

    N = B * L
    init = (jnp.full((N,), -jnp.inf), jnp.zeros((N,)),
            jnp.full((N,), -jnp.inf), jnp.zeros((N,), jnp.int32),
            jnp.zeros((), jnp.int32))
    (m, s, _, best_ix, _), _ = jax.lax.scan(step, init, (Wc, bc))
    logz = (jnp.log(s) + m).reshape(B, L)
    un = _gathered_logits(feat, W, bias, targets)
    match = un - logz[:, None, :]
    return best_ix.reshape(B, L), match
