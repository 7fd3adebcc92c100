"""Speech generators for TTS-only inference paths.

Rebuild of ``DASpeech/generator/speech_generator_modified.py`` /
``fairseq/fairseq/speech_generator.py``'s non-autoregressive path: run
FastSpeech2 from phoneme tokens with predicted durations, gcmvn-denormalize
the mel, optionally vocode to a waveform. (The reference's autoregressive
Tacotron-style generator exists only for its AR baselines, which are not
part of the DASpeech model family; the NAR path below is the one its
recipes exercise.)
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class NonAutoregressiveSpeechGenerator:
    """``NonAutoregressiveSpeechGenerator`` with the ``generate_waveform``
    flag of the modified variant (``speech_generator_modified.py:96-150``)."""

    def __init__(self, model, vocab, max_mel_len: int = 2048,
                 vocoder=None, vocoder_params=None, gcmvn=None,
                 d_factor: float = 1.0, hop: int = 256):
        self.model = model
        self.vocab = vocab
        self.max_mel_len = max_mel_len
        self.vocoder = vocoder
        self.vocoder_params = vocoder_params
        self.gcmvn = gcmvn
        self.d_factor = d_factor
        self.hop = hop
        self._fn = None

    def _build(self):
        model, M, d_factor = self.model, self.max_mel_len, self.d_factor
        voc, vparams = self.vocoder, self.vocoder_params
        # vocoder input must be gcmvn-DEnormalized (raw-mel domain), as in
        # ``speech_generator.py``'s gcmvn_denormalize -> get_waveform order
        gstats = (None if self.gcmvn is None else
                  (jnp.asarray(self.gcmvn.mean), jnp.asarray(self.gcmvn.std)))

        @jax.jit
        def run(params, src_tokens):
            mel, mel_post, out_lens, _, _, _ = model.apply(
                params, src_tokens=src_tokens, max_out_len=M,
                d_factor=d_factor)
            mel_final = mel_post if mel_post is not None else mel
            wav = None
            if voc is not None:
                mel_voc = (mel_final if gstats is None
                           else mel_final * gstats[1] + gstats[0])
                wav = voc.apply(vparams, mel_voc)
            return mel_final, out_lens, wav

        return run

    def generate(self, params, batch: Dict[str, jnp.ndarray],
                 generate_waveform: bool = True) -> List[Dict]:
        if self._fn is None:
            self._fn = self._build()
        mel, out_lens, wav = self._fn(params, batch["src_tokens"])
        mel = np.asarray(mel)
        out_lens = np.asarray(out_lens)
        out = []
        for b in range(mel.shape[0]):
            m = mel[b, : out_lens[b]]
            if self.gcmvn is not None:
                m = self.gcmvn.denormalize(m)
            hypo = {"feature": m}
            if wav is not None and generate_waveform:
                hypo["waveform"] = np.asarray(
                    wav)[b, : out_lens[b] * self.hop]
            out.append(hypo)
        return out


class AutoRegressiveSpeechGenerator:
    """AR mel generation with the ``generate_waveform`` flag
    (``speech_generator_modified.py:14-95``): scan-based frame-by-frame
    decoding with stop prediction, gcmvn denorm, optional vocoder."""

    def __init__(self, model, vocab, max_mel_len: int = 1024,
                 vocoder=None, vocoder_params=None, gcmvn=None,
                 stop_threshold: float = 0.5, hop: int = 256):
        self.model = model
        self.vocab = vocab
        self.max_mel_len = max_mel_len
        self.vocoder = vocoder
        self.vocoder_params = vocoder_params
        self.gcmvn = gcmvn
        self.stop_threshold = stop_threshold
        self.hop = hop
        self._fn = None

    def _build(self):
        model, M, thr = self.model, self.max_mel_len, self.stop_threshold
        voc, vparams = self.vocoder, self.vocoder_params
        gstats = (None if self.gcmvn is None else
                  (jnp.asarray(self.gcmvn.mean), jnp.asarray(self.gcmvn.std)))

        @jax.jit
        def run(params, src_tokens):
            mel, lens = model.apply(
                params, src_tokens, M, thr, method=model.generate)
            wav = None
            if voc is not None:
                mel_voc = (mel if gstats is None
                           else mel * gstats[1] + gstats[0])
                wav = voc.apply(vparams, mel_voc)
            return mel, lens, wav

        return run

    def generate(self, params, batch, generate_waveform: bool = True):
        if self._fn is None:
            self._fn = self._build()
        mel, lens, wav = self._fn(params, batch["src_tokens"])
        mel = np.asarray(mel)
        lens = np.asarray(lens)
        out = []
        for b in range(mel.shape[0]):
            m = mel[b, : lens[b]]
            if self.gcmvn is not None:
                m = self.gcmvn.denormalize(m)
            hypo = {"feature": m}
            if wav is not None and generate_waveform:
                hypo["waveform"] = np.asarray(wav)[b, : lens[b] * self.hop]
            out.append(hypo)
        return out
