"""Jitted DAG decoding strategies: greedy, lookahead, viterbi, joint-viterbi.

TPU-native rebuild of ``DASpeech/models/s2t_conformer_dag.py:319-433`` /
``s2s_conformer_dag_fastspeech2.py:210-305``. The reference's per-sentence
Python pointer-chase (a DEVICE->HOST sync per batch) becomes a batched
``lax.scan`` over graph hops that stays on device; the tensorized Viterbi DP
maps to a scan almost 1:1 with the backtrace as a second scan.

All functions return fixed-shape padded outputs:
  tokens   [B, L]  (pad-filled), token_lengths [B]
  feat_idx [B, L]  vertex index supplying the hidden state for each output
                   slot (slot 0 = <bos> has no feature; see
                   ``s2s_conformer_dag_fastspeech2.py:224-243``),
  feat_lengths [B] = token_lengths - 1.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class DecodeResult(NamedTuple):
    tokens: jnp.ndarray        # [B, L] int32, pad-filled
    lengths: jnp.ndarray       # [B] int32 number of emitted tokens
    feat_idx: jnp.ndarray      # [B, L] int32 vertex per slot (-1 = none)
    feat_lengths: jnp.ndarray  # [B] int32 (= lengths - 1)


def _emit_scan(
    start_j: jnp.ndarray,        # [B] starting vertex
    hops: jnp.ndarray,           # [B, L] next-vertex pointers
    unreduced_tokens: jnp.ndarray,  # [B, L] per-vertex argmax token
    stop_at: jnp.ndarray,        # [B] vertex index that terminates the walk
    num_steps: int,
    pad: int,
) -> DecodeResult:
    """Shared pointer-chase: walk ``hops`` from ``start_j``, emitting the
    vertex token whenever it differs from the previous vertex's token and is
    not pad (consecutive-duplicate collapse, ``s2t_conformer_dag.py:327-337``).
    """
    B, L = hops.shape
    first_tok = jnp.take_along_axis(
        unreduced_tokens, start_j[:, None], axis=1)[:, 0]

    tokens0 = jnp.full((B, L), pad, dtype=jnp.int32)
    tokens0 = tokens0.at[:, 0].set(first_tok)
    feat0 = jnp.full((B, L), -1, dtype=jnp.int32)

    def step(carry, _):
        j, last, count, done, tokens, feat_idx = carry
        active = ~done
        nj = jnp.take_along_axis(hops, j[:, None], axis=1)[:, 0]
        nj = jnp.where(active, nj, j)
        tok = jnp.take_along_axis(unreduced_tokens, nj[:, None], axis=1)[:, 0]
        emit = active & (tok != pad) & (tok != last)
        slot = count                                       # [B]
        onehot = (jnp.arange(L)[None, :] == slot[:, None]) & emit[:, None]
        tokens = jnp.where(onehot, tok[:, None], tokens)
        feat_idx = jnp.where(onehot, nj[:, None], feat_idx)
        count = count + emit.astype(jnp.int32)
        last = jnp.where(active, tok, last)
        done = done | (nj == stop_at)
        return (nj, last, count, done, tokens, feat_idx), None

    init = (start_j, first_tok, jnp.ones((B,), jnp.int32),
            start_j == stop_at, tokens0, feat0)
    (j, last, count, done, tokens, feat_idx), _ = jax.lax.scan(
        step, init, None, length=num_steps)
    return DecodeResult(tokens, count, feat_idx, count - 1)


def greedy_or_lookahead_decode(
    logits: jnp.ndarray,          # [B, L, V]
    links: jnp.ndarray,           # [B, L, L] full log transitions
    output_length: jnp.ndarray,   # [B] graph sizes
    pad: int,
    decode_beta: float = 1.0,
    lookahead: bool = True,
) -> DecodeResult:
    """``lookahead``/``greedy`` (``s2t_conformer_dag.py:319-342``)."""
    B, L, V = logits.shape
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    unreduced_logits = jnp.max(logp, axis=-1)
    unreduced_tokens = jnp.argmax(logp, axis=-1).astype(jnp.int32)

    if lookahead:
        score = links + decode_beta * unreduced_logits[:, None, :]
    else:
        score = links
    hops = jnp.argmax(score, axis=-1).astype(jnp.int32)    # [B, L]

    start = jnp.zeros((B,), jnp.int32)
    stop = (output_length - 1).astype(jnp.int32)
    return _emit_scan(start, hops, unreduced_tokens, stop, L, pad)


def viterbi_decode(
    logits: jnp.ndarray,          # [B, L, V]
    links: jnp.ndarray,           # [B, L, L]
    output_length: jnp.ndarray,   # [B]
    pad: int,
    decode_beta: float = 1.0,
    viterbibeta: float = 1.0,
    joint: bool = True,
    max_length: int = 0,
) -> DecodeResult:
    """``viterbi``/``jointviterbi`` (``s2t_conformer_dag.py:343-395``):
    length-penalized best-path DP over output lengths 1..max_length, then a
    backtrace emitting tokens right-to-left with duplicate collapse.

    ``max_length`` defaults to the reference's ``graph_len / 8 /
    upsample_scale`` heuristic if 0 — pass it explicitly for static shapes.
    """
    B, L, V = logits.shape
    if max_length <= 0:
        max_length = max(2, L // 4)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    unreduced_logits = jnp.max(logp, axis=-1)              # [B, L]
    unreduced_tokens = jnp.argmax(logp, axis=-1).astype(jnp.int32)

    links = jnp.maximum(links.astype(jnp.float32), -1e9)   # NaN-free maxes
    tokscore = decode_beta * unreduced_logits

    alpha0 = links[:, 0] + tokscore
    if joint:
        alpha0 = alpha0 + tokscore[:, 0][:, None]

    def dp_step(alpha, _):
        nxt = jnp.max(alpha[:, :, None] + links, axis=1)
        idx = jnp.argmax(alpha[:, :, None] + links, axis=1).astype(jnp.int32)
        if joint:
            nxt = nxt + tokscore
        return nxt, (nxt, idx)

    _, (alphas, indexs) = jax.lax.scan(
        dp_step, alpha0, None, length=max_length - 1)
    # scores[s] = alpha after s+1 emissions; indexs[s] = argmax backpointers
    scores = jnp.concatenate([alpha0[None], alphas], axis=0)  # [S, B, L]

    last_onehot = (jnp.arange(L)[None, :] ==
                   (output_length - 1)[:, None])           # [B, L]
    # links[b, j, ol-1] via one-hot max (avoids gather over last axis)
    link_last = jnp.max(
        jnp.where(last_onehot[:, None, :], links, -1e9), axis=-1)  # [B, L]
    total = scores + link_last[None]                       # [S, B, L]

    best_per_len, max_idx = jnp.max(total, axis=-1), jnp.argmax(total, axis=-1)
    length_penalty = (jnp.arange(max_length, dtype=jnp.float32) + 1.0
                      ) ** viterbibeta
    penalized = best_per_len / length_penalty[:, None]     # [S, B]
    pred_len = jnp.argmax(penalized, axis=0).astype(jnp.int32) + 1   # [B]

    initial_j = jnp.take_along_axis(
        max_idx, (pred_len - 1)[None, :], axis=0)[0].astype(jnp.int32)  # [B]

    # Backtrace: walk backpointers pred_len-1 times, emitting right-to-left
    # with duplicate collapse, then left-align.
    rev_tokens0 = jnp.full((B, L), pad, dtype=jnp.int32)
    rev_feat0 = jnp.full((B, L), -1, dtype=jnp.int32)
    first_tok = jnp.take_along_axis(
        unreduced_tokens, initial_j[:, None], axis=1)[:, 0]
    rev_tokens0 = rev_tokens0.at[:, 0].set(first_tok)
    rev_feat0 = rev_feat0.at[:, 0].set(initial_j)

    def back_step(carry, k):
        j, last, count, tokens, feat_idx = carry
        # step index into indexs: length - k - 2 (k = 0 .. pred_len-2)
        active = k < (pred_len - 1)
        s_idx = jnp.clip(pred_len - k - 2, 0, max_length - 2)   # [B]
        bp = indexs[s_idx, jnp.arange(B)]                       # [B, L]
        pj = jnp.take_along_axis(bp, j[:, None], axis=1)[:, 0]
        pj = jnp.where(active, pj, j)
        tok = jnp.take_along_axis(unreduced_tokens, pj[:, None], axis=1)[:, 0]
        emit = active & (tok != pad) & (tok != last)
        onehot = (jnp.arange(L)[None, :] == count[:, None]) & emit[:, None]
        tokens = jnp.where(onehot, tok[:, None], tokens)
        feat_idx = jnp.where(onehot, pj[:, None], feat_idx)
        count = count + emit.astype(jnp.int32)
        last = jnp.where(active, tok, last)
        return (pj, last, count, tokens, feat_idx), None

    init = (initial_j, first_tok, jnp.ones((B,), jnp.int32),
            rev_tokens0, rev_feat0)
    (j, last, count, rev_tokens, rev_feat), _ = jax.lax.scan(
        back_step, init, jnp.arange(max_length - 1))

    # reverse the first `count` slots per row: out[i] = rev[count-1-i]
    idx = count[:, None] - 1 - jnp.arange(L)[None, :]
    valid = idx >= 0
    idx_c = jnp.clip(idx, 0, L - 1)
    tokens = jnp.where(valid, jnp.take_along_axis(rev_tokens, idx_c, axis=1),
                       pad)
    feat_idx = jnp.where(valid,
                         jnp.take_along_axis(rev_feat, idx_c, axis=1), -1)
    # NOTE: unlike lookahead, the reference's viterbi path keeps the first
    # emitted vertex's feature too (``res_features`` starts non-empty,
    # ``s2s_conformer_dag_fastspeech2.py:286-288``), so feature slots align
    # with token slots and feat_lengths == lengths; callers use
    # ``gather_path_features(..., skip_first=False)``.
    return DecodeResult(tokens.astype(jnp.int32), count,
                        feat_idx.astype(jnp.int32), count)


def path_score(
    unreduced_logits: jnp.ndarray,   # [B, L] max token logprob per vertex
    result: DecodeResult,
    include_start: bool = True,
) -> jnp.ndarray:
    """Mean per-token logprob along the decoded path — the "score" used to
    pick among length-beam candidates (``s2t_nat_generator.py:97-118``:
    score = positional_scores.mean()). ``include_start`` adds the start
    vertex's token (slot 0 carries no feat_idx under lookahead/greedy)."""
    B, L = unreduced_logits.shape
    idx = result.feat_idx
    valid = idx >= 0
    safe = jnp.clip(idx, 0, L - 1)
    picked = jnp.take_along_axis(unreduced_logits, safe, axis=1)
    total = jnp.sum(jnp.where(valid, picked, 0.0), axis=1)
    if include_start:
        total = total + unreduced_logits[:, 0]
    return total / jnp.maximum(result.lengths.astype(total.dtype), 1)


def gather_path_features(
    features: jnp.ndarray,     # [B, L, D]
    result: DecodeResult,
    skip_first: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Collect decoder hidden states along the decoded path, left-aligned:
    returns (feats [B, L, D], feat_pad_mask [B, L] True=pad).

    With ``skip_first`` the slot-0 token (<bos> for lookahead) contributes no
    feature, matching ``s2s_conformer_dag_fastspeech2.py:224-243``.
    """
    B, L, D = features.shape
    idx = result.feat_idx
    if skip_first:
        idx = jnp.concatenate([idx[:, 1:], jnp.full((B, 1), -1, idx.dtype)],
                              axis=1)
        n = result.feat_lengths
    else:
        n = result.lengths
    safe = jnp.clip(idx, 0, L - 1)
    feats = jnp.take_along_axis(features, safe[:, :, None], axis=1)
    mask = jnp.arange(L)[None, :] >= n[:, None]
    return jnp.where(mask[:, :, None], 0.0, feats), mask
