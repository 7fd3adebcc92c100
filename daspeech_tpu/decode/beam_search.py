"""Jitted DAG beam search.

The reference's ``beamsearch`` strategy calls an external C++ ``dag_search``
binary that upstream DASpeech does not vendor
(``s2t_conformer_dag.py:396-433``; SURVEY.md §2c). This module provides the
same decode surface natively in JAX:

- per-vertex candidate preparation identical to the reference's
  (``s2t_conformer_dag.py:404-417``): for each source vertex i, the top
  ``top_cand_n`` (next-vertex, token) pairs by
  ``links[i, j] + beta * logP(y | v_j)``, with optional nucleus (top-p)
  truncation over the candidate set;
- a fixed-width beam over partial paths; a hypothesis finalizes when it
  transitions into the final vertex (graph EOS), scored with the length
  penalty ``score / |Y|^alpha`` as in the upstream searcher;
- optional consecutive-duplicate collapse (``decode_dedup``).

Differences from the upstream C++ searcher (documented, intentional):
no n-gram LM fusion (``decode_gamma`` requires an LM file the recipes never
provide) and no per-length beam quota (``decode_max_beam_per_length``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from daspeech_tpu.decode.dag_decode import DecodeResult

NEG = -1e30


class BeamState(NamedTuple):
    vertex: jnp.ndarray      # [B, K] current vertex per beam
    score: jnp.ndarray       # [B, K] accumulated path score
    length: jnp.ndarray      # [B, K] emitted token count
    last_tok: jnp.ndarray    # [B, K]
    tokens: jnp.ndarray      # [B, K, MAXLEN]
    alive: jnp.ndarray       # [B, K] bool
    best_score: jnp.ndarray  # [B] best finalized (penalized) score
    best_tokens: jnp.ndarray  # [B, MAXLEN]
    best_len: jnp.ndarray    # [B]


def beam_search_decode(
    logits: jnp.ndarray,          # [B, L, V]
    links: jnp.ndarray,           # [B, L, L] full log transitions
    output_length: jnp.ndarray,   # [B]
    pad: int,
    bos: int,
    beam_size: int = 16,
    top_cand_n: int = 5,
    decode_beta: float = 1.0,
    decode_alpha: float = 1.1,
    top_p: float = 0.9,
    dedup: bool = False,
    max_steps: int = 0,
) -> DecodeResult:
    B, L, V = logits.shape
    K = beam_size
    C = top_cand_n
    if max_steps <= 0:
        max_steps = max(2, L // 2)
    MAXLEN = max_steps + 1

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    top_logits, top_tokens = jax.lax.top_k(logp, C)          # [B, L, C]
    links = jnp.maximum(links.astype(jnp.float32), NEG)

    # candidate prep (``s2t_conformer_dag.py:404-417``): for source vertex i,
    # scores over (next vertex j, token rank c) = links[i, j] + beta * top_logits[j, c]
    cand = links[:, :, :, None] + decode_beta * top_logits[:, None, :, :]
    cand = cand.reshape(B, L, L * C)
    cand_score, cand_flat = jax.lax.top_k(cand, C)           # [B, L, C]
    cand_next = cand_flat // C                               # next vertex
    cand_tok = jnp.take_along_axis(
        top_tokens.reshape(B, L * C), cand_flat.reshape(B, L * C), axis=1
    ).reshape(B, L, C)

    if top_p < 1.0:
        # nucleus truncation over each vertex's candidate set (decode_top_p)
        probs = jax.nn.softmax(cand_score, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = cum - probs < top_p                            # always keep 1st
        cand_score = jnp.where(keep, cand_score, NEG)

    final_onehot = (jnp.arange(L)[None, :] ==
                    (output_length - 1)[:, None])             # [B, L]
    bos_tok = jnp.take_along_axis(
        jnp.argmax(logp, axis=-1), jnp.zeros((B, 1), jnp.int32), axis=1
    )[:, 0].astype(jnp.int32)                                 # token at vertex 0

    # init: beam 0 at vertex 0 with the <bos> emission
    vertex0 = jnp.zeros((B, K), jnp.int32)
    score0 = jnp.broadcast_to(
        jnp.where(jnp.arange(K)[None, :] == 0, 0.0, NEG), (B, K))
    length0 = jnp.ones((B, K), jnp.int32)
    last0 = jnp.broadcast_to(bos_tok[:, None], (B, K)).astype(jnp.int32)
    tokens0 = jnp.full((B, K, MAXLEN), pad, jnp.int32)
    tokens0 = tokens0.at[:, :, 0].set(last0)
    alive0 = jnp.arange(K)[None, :] == 0
    state = BeamState(
        vertex0, score0, length0, last0, tokens0,
        jnp.broadcast_to(alive0, (B, K)),
        jnp.full((B,), NEG), jnp.full((B, MAXLEN), pad, jnp.int32),
        jnp.zeros((B,), jnp.int32))

    batch_ix = jnp.arange(B)[:, None]

    def step(state, _):
        # expand: [B, K, C]
        v = state.vertex
        c_score = cand_score[batch_ix, v]                     # [B, K, C]
        c_next = cand_next[batch_ix, v]
        c_tok = cand_tok[batch_ix, v]

        new_score = state.score[:, :, None] + c_score
        new_score = jnp.where(state.alive[:, :, None], new_score, NEG)

        is_final = c_next == (output_length[:, None, None] - 1)
        if dedup:
            emit = (c_tok != pad) & (c_tok != state.last_tok[:, :, None])
        else:
            emit = c_tok != pad
        new_len = state.length[:, :, None] + emit.astype(jnp.int32)

        # finalize candidates that land on the eos vertex
        pen = jnp.maximum(new_len.astype(jnp.float32), 1.0) ** decode_alpha
        fin_score = jnp.where(is_final, new_score / pen, NEG)  # [B, K, C]
        flat_fin = fin_score.reshape(B, K * C)
        best_new = jnp.max(flat_fin, axis=-1)
        best_arg = jnp.argmax(flat_fin, axis=-1)
        bk, bc = best_arg // C, best_arg % C
        improved = best_new > state.best_score

        # materialize the improved best hypothesis' token buffer
        chosen_tokens = state.tokens[jnp.arange(B), bk]        # [B, MAXLEN]
        chosen_emit = emit[jnp.arange(B), bk, bc]
        chosen_tok = c_tok[jnp.arange(B), bk, bc]
        chosen_len = state.length[jnp.arange(B), bk]
        slot_onehot = (jnp.arange(MAXLEN)[None, :] == chosen_len[:, None])
        cand_tokens = jnp.where(
            slot_onehot & chosen_emit[:, None], chosen_tok[:, None],
            chosen_tokens)
        best_tokens = jnp.where(improved[:, None], cand_tokens,
                                state.best_tokens)
        best_len = jnp.where(
            improved, chosen_len + chosen_emit.astype(jnp.int32),
            state.best_len)
        best_score = jnp.maximum(state.best_score, best_new)

        # continue: non-final candidates compete for the K beam slots
        cont_score = jnp.where(is_final, NEG, new_score).reshape(B, K * C)
        top_score, top_ix = jax.lax.top_k(cont_score, K)
        src_k, src_c = top_ix // C, top_ix % C

        def g(x):
            return x[jnp.arange(B)[:, None], src_k]

        sel_next = c_next[jnp.arange(B)[:, None], src_k, src_c]
        sel_tok = c_tok[jnp.arange(B)[:, None], src_k, src_c]
        sel_emit = emit[jnp.arange(B)[:, None], src_k, src_c]
        sel_len = g(state.length)
        sel_tokens = g(state.tokens)                           # [B, K, MAXLEN]
        slot = (jnp.arange(MAXLEN)[None, None, :] == sel_len[:, :, None])
        sel_tokens = jnp.where(slot & sel_emit[:, :, None],
                               sel_tok[:, :, None], sel_tokens)
        new_state = BeamState(
            vertex=sel_next.astype(jnp.int32),
            score=top_score,
            length=sel_len + sel_emit.astype(jnp.int32),
            last_tok=jnp.where(sel_emit, sel_tok, g(state.last_tok)
                               ).astype(jnp.int32),
            tokens=sel_tokens,
            alive=top_score > NEG / 2,
            best_score=best_score,
            best_tokens=best_tokens,
            best_len=best_len,
        )
        return new_state, None

    state, _ = jax.lax.scan(step, state, None, length=max_steps)

    feat_idx = jnp.full((B, MAXLEN), -1, jnp.int32)
    return DecodeResult(
        tokens=state.best_tokens,
        lengths=state.best_len,
        feat_idx=feat_idx,                    # beam search is S2T-only here
        feat_lengths=jnp.maximum(state.best_len - 1, 0),
    )
