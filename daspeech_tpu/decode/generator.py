"""Generators: the inference engines returning finalized hypotheses.

Rebuild of ``DASpeech/generator/s2t_nat_generator.py`` and
``s2s_nat_generator.py``. The default is one ``forward_decoder`` pass per
(strategy, bucket shape) jit — every DASpeech recipe decodes single-pass —
with the reference's iterative refinement loop
(``iter_decode_max_iter`` + adaptive ``is_a_loop`` termination) available
on top: fixed-shape passes reuse the same compiled program and terminated
rows keep their accepted result by masking rather than the reference's
shrink-the-batch gathers. Mel gcmvn-denormalization and the vocoder run
on the final features exactly like ``s2s_nat_generator.py:242-285``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from daspeech_tpu.core.config import DecodeConfig
from daspeech_tpu.decode.dag_decode import (
    DecodeResult,
    gather_path_features,
    greedy_or_lookahead_decode,
    path_score,
    viterbi_decode,
)
from daspeech_tpu.decode.speech_generator import _vocode_in_jit, make_vocode_fn


def _strategy_decode(cfg: DecodeConfig, vocab, logits, links, prev):
    """Dispatch one decode strategy on [B, L, V] logits / [B, L, L] links."""
    ol = jnp.sum(prev != vocab.pad, axis=1)
    if cfg.strategy in ("lookahead", "greedy"):
        return greedy_or_lookahead_decode(
            logits, links, ol, vocab.pad, cfg.beta,
            lookahead=cfg.strategy == "lookahead")
    if cfg.strategy in ("viterbi", "jointviterbi"):
        return viterbi_decode(
            logits, links, ol, vocab.pad, cfg.beta, cfg.viterbibeta,
            joint=cfg.strategy == "jointviterbi",
            max_length=cfg.max_output_length or max(2, prev.shape[1] // 4))
    if cfg.strategy == "beamsearch":
        from daspeech_tpu.decode.beam_search import beam_search_decode

        return beam_search_decode(
            logits, links, ol, vocab.pad, vocab.bos,
            beam_size=int(cfg.beamsize),
            top_cand_n=int(cfg.top_cand_n),
            decode_beta=cfg.beta, decode_alpha=cfg.alpha,
            top_p=cfg.top_p, dedup=cfg.dedup,
            max_steps=cfg.max_output_length or 0)
    raise NotImplementedError(cfg.strategy)


def rerank_scores(reranker, rparams, fbank, src_lengths, tokens, pad, eos,
                  beam):
    """Length-beam candidate scores under an external AR reranker model
    (``iterative_refinement_generator.py:313-359``, reached from
    ``s2t_nat_generator.py:212-216`` where the LAST ensemble checkpoint is
    the reranker): candidate position 0 is overwritten with EOS (fairseq AR
    decoders start from EOS), the reranker decoder is teacher-forced on
    ``candidate[:-1]``, and the score is the pad-masked MEAN logprob of
    ``candidate[1:]`` — which then REPLACES the decode score before the
    beam argmax. ``tokens`` is [B*beam, L] pad-filled; the reranker
    encoder runs once at [B] and its output is tiled beam-wise.

    The reranker follows the ``S2SMultiDecoderModel`` protocol
    (``forward_encoder(fbank, src_lengths)`` + ``mt_decode(prev, enc,
    enc_pad)``) — the in-repo AR speech-to-text family.
    """
    enc, enc_pad = reranker.apply(rparams, fbank, src_lengths,
                                  method=reranker.forward_encoder)
    enc = jnp.repeat(enc, beam, axis=0)
    enc_pad = jnp.repeat(enc_pad, beam, axis=0)
    cand = tokens.at[:, 0].set(eos)
    logits, _ = reranker.apply(rparams, cand[:, :-1], enc, enc_pad,
                               method=reranker.mt_decode)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = cand[:, 1:]
    sc = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    mask = tgt != pad
    return (jnp.sum(jnp.where(mask, sc, 0.0), axis=1)
            / jnp.maximum(jnp.sum(mask, axis=1), 1))


def dag_forward_decode(model, params, fbank, src_lengths, prev, vocab,
                       cfg: DecodeConfig, reranker=None,
                       reranker_params=None):
    """Encoder -> (length-beam expanded) decoder -> decode strategy.

    ``cfg.length_beam > 1`` implements the NAT length beam
    (``s2t_nat_generator.py:59-76`` + ``regenerate_length_beam``,
    ``nonautoregressive_transformer.py:177-196``): the encoder runs ONCE
    and its output is tiled (the reference's ``reorder_encoder_out``);
    ``length_beam`` graph sizes around lambda*src_len are decoded and the
    candidate with the best mean per-token logprob survives — the
    reference's no-reranker selection ``argmax(score)``
    (``s2t_nat_generator.py:217-230``). Passing ``reranker`` (+ its
    params) replaces that score with an AR model's teacher-forced mean
    logprob per candidate (``rerank_scores``) before the argmax — the
    reference's ``--iter-decode-with-external-reranker``. Returns
    (DecodeResult, features), both at the original batch size.
    """
    from daspeech_tpu.models import initialize_output_tokens

    beam = max(1, int(cfg.length_beam))
    if beam > 1 and cfg.strategy == "beamsearch":
        # beam_search_decode carries no per-path feat_idx, so the
        # mean-logprob candidate score would be identically 0 and argmax
        # would silently pick the shortest graph every time
        raise ValueError("length_beam > 1 is not supported with the "
                         "beamsearch strategy; use lookahead/viterbi")
    enc, enc_pad, _ = model.apply(
        params, fbank, src_lengths, method=model.encode)
    if beam > 1:
        B, L = prev.shape
        glen = jnp.sum(prev != vocab.pad, axis=1)
        offs = jnp.arange(beam, dtype=glen.dtype) - beam // 2
        glen_b = jnp.clip((glen[:, None] + offs[None, :]).reshape(-1), 2, L)
        prev = initialize_output_tokens(glen_b, L, vocab)
        enc = jnp.repeat(enc, beam, axis=0)
        enc_pad = jnp.repeat(enc_pad, beam, axis=0)
    logits, links, feats = model.apply(
        params, prev, enc, enc_pad, method=model.decode)
    res = _strategy_decode(cfg, vocab, logits, links, prev)
    if beam > 1:
        if reranker is not None:
            sc = rerank_scores(reranker, reranker_params, fbank,
                               src_lengths, res.tokens, vocab.pad,
                               vocab.eos, beam)
        else:
            logp_max = jnp.max(
                jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
                axis=-1)
            sc = path_score(
                logp_max, res,
                include_start=cfg.strategy in ("lookahead", "greedy"))
        best = jnp.argmax(sc.reshape(-1, beam), axis=1)
        rows = jnp.arange(best.shape[0]) * beam + best
        res = DecodeResult(*(x[rows] for x in res))
        feats = feats[rows]
    return res, feats


class S2TNATGenerator:
    """DAG decoding to target tokens, optionally with iterative refinement
    (``S2TNATGenerator``, ``s2t_nat_generator.py:50-230``)."""

    def __init__(self, model, vocab, decode_cfg: DecodeConfig,
                 reranker=None, reranker_params=None):
        if (decode_cfg.length_beam > 1
                and decode_cfg.iter_decode_max_iter > 0):
            # the reference refines ALL B*beam candidates and reduces the
            # beam after the loop (iterative_refinement_generator.py);
            # here the beam reduces inside each decode pass, so feeding the
            # winner back would re-initialize its graph from length alone
            # and silently discard the fed-back token identities. Every
            # recipe pins iter_decode_max_iter=0; refuse the combination
            # rather than diverge silently.
            raise ValueError(
                "length_beam > 1 cannot be combined with "
                "iter_decode_max_iter > 0: the length beam reduces inside "
                "each pass, so refinement would not see the fed-back "
                "tokens. Use one or the other.")
        self.model = model
        self.vocab = vocab
        self.cfg = decode_cfg
        self.reranker = reranker
        self.reranker_params = reranker_params
        self._jitted = {}

    def _decode_fn(self):
        cfg, vocab, model = self.cfg, self.vocab, self.model
        reranker = self.reranker

        @jax.jit
        def run(params, rparams, fbank, src_lengths, prev):
            return dag_forward_decode(
                model, params, fbank, src_lengths, prev, vocab, cfg,
                reranker=reranker, reranker_params=rparams)

        return run

    def _refine(self, params, fbank, src_lengths, prev):
        """Iterative refinement (``s2t_nat_generator.py:120-215``): re-run
        the decoder with its own (padded) output as the next graph input,
        up to ``iter_decode_max_iter`` extra passes. Per-sample adaptive
        termination mirrors the reference's ``is_a_loop`` — a sample is
        done once its output equals its input — realized with fixed shapes
        (terminated rows keep their accepted result via ``np.where``
        instead of the reference's shrink-the-batch gather, so every pass
        reuses ONE compiled program). Returns (DecodeResult as numpy,
        accepted_input) where decode(accepted_input) reproduces the
        accepted output (the decoder is deterministic in eval mode).
        """
        run = self._jitted["decode"]
        res, _ = run(params, self.reranker_params, fbank, src_lengths, prev)
        max_iter = int(self.cfg.iter_decode_max_iter)
        adaptive = not self.cfg.iter_decode_force_max_iter
        accepted = [np.asarray(x) for x in res]
        accepted_input = np.asarray(prev)
        B = accepted_input.shape[0]
        terminated = np.zeros((B,), bool)
        for _ in range(max_iter):
            cur_input = accepted[0]            # previous pass's tokens
            res2, _ = run(params, self.reranker_params, fbank, src_lengths,
                          jnp.asarray(cur_input))
            new = [np.asarray(x) for x in res2]
            if adaptive:
                done_now = np.all(new[0] == cur_input, axis=1)
            else:
                done_now = np.zeros((B,), bool)
            live = ~terminated
            for i in range(len(accepted)):
                m = live if accepted[i].ndim == 1 else live[:, None]
                accepted[i] = np.where(m, new[i], accepted[i])
            accepted_input = np.where(live[:, None], cur_input,
                                      accepted_input)
            terminated |= done_now
            if adaptive and terminated.all():
                break
        return DecodeResult(*accepted), accepted_input

    def generate(self, params, batch: Dict[str, np.ndarray]) -> List[Dict]:
        if "decode" not in self._jitted:
            self._jitted["decode"] = self._decode_fn()
        if self.cfg.iter_decode_max_iter > 0:
            res, _ = self._refine(
                params, batch["fbank"], batch["src_lengths"],
                batch["prev_output_tokens"])
        else:
            res, _ = self._jitted["decode"](
                params, self.reranker_params, batch["fbank"],
                batch["src_lengths"], batch["prev_output_tokens"])
        tokens = np.asarray(res.tokens)
        lengths = np.asarray(res.lengths)
        out = []
        for b in range(tokens.shape[0]):
            out.append({"tokens": tokens[b, : lengths[b]]})
        return out


class S2SNATGenerator(S2TNATGenerator):
    """Two-pass generation: DAG decode -> hidden-state gather -> adaptor +
    FastSpeech2 -> (optional gcmvn denorm) -> (optional vocoder)
    (``S2SNATGenerator``, ``s2s_nat_generator.py:49-285``)."""

    def __init__(self, model, vocab, decode_cfg: DecodeConfig,
                 max_mel_len: int = 1024, vocoder=None,
                 vocoder_params=None, gcmvn=None, d_factor: float = 1.0,
                 reranker=None, reranker_params=None):
        super().__init__(model, vocab, decode_cfg, reranker=reranker,
                         reranker_params=reranker_params)
        self.max_mel_len = max_mel_len
        self.vocoder = vocoder
        self.vocoder_params = vocoder_params
        self.gcmvn = gcmvn
        self.d_factor = d_factor

    def _s2s_fn(self):
        cfg, vocab, model = self.cfg, self.vocab, self.model
        if cfg.strategy == "beamsearch":
            # beam_search_decode returns feat_idx = -1 everywhere (S2T-only,
            # ``beam_search.py``); feeding that to gather_path_features
            # would synthesize from a constant vertex-0 feature
            raise NotImplementedError(
                "beamsearch does not track path features for the TTS pass; "
                "use lookahead, viterbi, or jointviterbi for S2S")
        skip_first = cfg.strategy in ("lookahead", "greedy")
        M = self.max_mel_len
        voc = self.vocoder
        vparams = self.vocoder_params
        d_factor = self.d_factor
        # the vocoder was trained on raw (unnormalized) mels: gcmvn
        # denormalization must happen BEFORE vocoding, inside the jit
        # (``s2s_nat_generator.py:242-285`` denormalizes then get_waveform)
        gstats = (None if self.gcmvn is None else
                  (jnp.asarray(self.gcmvn.mean), jnp.asarray(self.gcmvn.std)))
        reranker = self.reranker

        @jax.jit
        def run(params, rparams, fbank, src_lengths, prev):
            res, feats = dag_forward_decode(
                model, params, fbank, src_lengths, prev, vocab, cfg,
                reranker=reranker, reranker_params=rparams)
            z, zmask = gather_path_features(feats, res, skip_first=skip_first)
            mel, mel_post, mel_lens, _, _, _ = model.apply(
                params, z, zmask, M, method=model.synthesize,
                d_factor=d_factor)
            mel_final = mel_post if mel_post is not None else mel
            wav = None
            if _vocode_in_jit(voc):
                mel_voc = (mel_final if gstats is None
                           else mel_final * gstats[1] + gstats[0])
                wav = voc.apply(vparams, mel_voc)
            return res, mel_final, mel_lens, wav

        return run

    def generate(self, params, batch: Dict[str, np.ndarray],
                 generate_waveform: bool = True) -> List[Dict]:
        if "s2s" not in self._jitted:
            self._jitted["s2s"] = self._s2s_fn()
        prev = batch["prev_output_tokens"]
        if self.cfg.iter_decode_max_iter > 0:
            # refine on tokens first (decode-only jit), then synthesize
            # from each sample's accepted graph input: the decoder is
            # deterministic in eval mode, so one s2s pass on
            # accepted_input reproduces the accepted tokens AND yields
            # their path features for the TTS pass
            # (``s2s_nat_generator.py:130-215`` refines before synthesis).
            if "decode" not in self._jitted:
                self._jitted["decode"] = self._decode_fn()
            _, prev = self._refine(
                params, batch["fbank"], batch["src_lengths"], prev)
            prev = jnp.asarray(prev)
        res, mel, mel_lens, wav = self._jitted["s2s"](
            params, self.reranker_params, batch["fbank"],
            batch["src_lengths"], prev)
        if wav is None and generate_waveform and self.vocoder is not None:
            if getattr(self, "_vocode_fn", None) is None:
                self._vocode_fn = make_vocode_fn(
                    self.vocoder, self.vocoder_params, self.gcmvn)
            wav = self._vocode_fn(mel)
        tokens = np.asarray(res.tokens)
        lengths = np.asarray(res.lengths)
        mel = np.asarray(mel)
        mel_lens = np.asarray(mel_lens)
        wav_np = None if wav is None else np.asarray(wav)  # one transfer
        hop = 256
        out = []
        for b in range(tokens.shape[0]):
            m = mel[b, : mel_lens[b]]
            if self.gcmvn is not None:
                m = self.gcmvn.denormalize(m)
            hypo = {
                "tokens": tokens[b, : lengths[b]],
                "feature": m,
            }
            if wav_np is not None and generate_waveform:
                hypo["waveform"] = wav_np[b, : mel_lens[b] * hop]
            out.append(hypo)
        return out
