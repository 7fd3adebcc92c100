"""Generators: the inference engines returning finalized hypotheses.

Rebuild of ``DASpeech/generator/s2t_nat_generator.py`` and
``s2s_nat_generator.py``. The DAG decodes in a single pass
(iter_decode_max_iter = 0 in every recipe), so the reference's iterative
refinement loop degenerates to one ``forward_decoder`` — here one jitted
function per (strategy, bucket shape). Mel gcmvn-denormalization and the
vocoder run on the final features exactly like
``s2s_nat_generator.py:242-285``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from daspeech_tpu.core.config import DecodeConfig
from daspeech_tpu.decode.dag_decode import (
    gather_path_features,
    greedy_or_lookahead_decode,
    viterbi_decode,
)


class S2TNATGenerator:
    """Single-pass DAG decoding to target tokens
    (``S2TNATGenerator``, ``s2t_nat_generator.py:50-230``)."""

    def __init__(self, model, vocab, decode_cfg: DecodeConfig):
        self.model = model
        self.vocab = vocab
        self.cfg = decode_cfg
        self._jitted = {}

    def _decode_fn(self):
        cfg, vocab, model = self.cfg, self.vocab, self.model

        @jax.jit
        def run(params, fbank, src_lengths, prev):
            logits, links, feats = model.apply(
                params, fbank, src_lengths, prev)
            ol = jnp.sum(prev != vocab.pad, axis=1)
            if cfg.strategy in ("lookahead", "greedy"):
                res = greedy_or_lookahead_decode(
                    logits, links, ol, vocab.pad, cfg.beta,
                    lookahead=cfg.strategy == "lookahead")
            elif cfg.strategy in ("viterbi", "jointviterbi"):
                res = viterbi_decode(
                    logits, links, ol, vocab.pad, cfg.beta, cfg.viterbibeta,
                    joint=cfg.strategy == "jointviterbi",
                    max_length=cfg.max_output_length or max(2, prev.shape[1] // 4))
            elif cfg.strategy == "beamsearch":
                from daspeech_tpu.decode.beam_search import beam_search_decode

                res = beam_search_decode(
                    logits, links, ol, vocab.pad, vocab.bos,
                    beam_size=int(cfg.beamsize),
                    top_cand_n=int(cfg.top_cand_n),
                    decode_beta=cfg.beta, decode_alpha=cfg.alpha,
                    top_p=cfg.top_p, dedup=cfg.dedup,
                    max_steps=cfg.max_output_length or 0)
            else:
                raise NotImplementedError(cfg.strategy)
            return res, feats

        return run

    def generate(self, params, batch: Dict[str, np.ndarray]) -> List[Dict]:
        if "decode" not in self._jitted:
            self._jitted["decode"] = self._decode_fn()
        res, _ = self._jitted["decode"](
            params, batch["fbank"], batch["src_lengths"],
            batch["prev_output_tokens"])
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
                 vocoder_params=None, gcmvn=None, d_factor: float = 1.0):
        super().__init__(model, vocab, decode_cfg)
        self.max_mel_len = max_mel_len
        self.vocoder = vocoder
        self.vocoder_params = vocoder_params
        self.gcmvn = gcmvn
        self.d_factor = d_factor

    def _s2s_fn(self):
        cfg, vocab, model = self.cfg, self.vocab, self.model
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

        @jax.jit
        def run(params, fbank, src_lengths, prev):
            logits, links, feats = model.apply(
                params, fbank, src_lengths, prev)
            ol = jnp.sum(prev != vocab.pad, axis=1)
            if cfg.strategy in ("lookahead", "greedy"):
                res = greedy_or_lookahead_decode(
                    logits, links, ol, vocab.pad, cfg.beta,
                    lookahead=cfg.strategy == "lookahead")
            else:
                res = viterbi_decode(
                    logits, links, ol, vocab.pad, cfg.beta, cfg.viterbibeta,
                    joint=cfg.strategy == "jointviterbi",
                    max_length=cfg.max_output_length or max(2, prev.shape[1] // 4))
            z, zmask = gather_path_features(feats, res, skip_first=skip_first)
            mel, mel_post, mel_lens, _, _, _ = model.apply(
                params, z, zmask, M, method=model.synthesize,
                d_factor=d_factor)
            mel_final = mel_post if mel_post is not None else mel
            wav = None
            if voc is not None:
                mel_voc = (mel_final if gstats is None
                           else mel_final * gstats[1] + gstats[0])
                wav = voc.apply(vparams, mel_voc)
            return res, mel_final, mel_lens, wav

        return run

    def generate(self, params, batch: Dict[str, np.ndarray],
                 generate_waveform: bool = True) -> List[Dict]:
        if "s2s" not in self._jitted:
            self._jitted["s2s"] = self._s2s_fn()
        res, mel, mel_lens, wav = self._jitted["s2s"](
            params, batch["fbank"], batch["src_lengths"],
            batch["prev_output_tokens"])
        tokens = np.asarray(res.tokens)
        lengths = np.asarray(res.lengths)
        mel = np.asarray(mel)
        mel_lens = np.asarray(mel_lens)
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
            if wav is not None and generate_waveform:
                hypo["waveform"] = np.asarray(wav)[b, : mel_lens[b] * hop]
            out.append(hypo)
        return out
