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


def make_vocode_fn(voc, vparams, gcmvn):
    """jitted mel -> waveform closure for vocoding OUTSIDE a generator's
    fused jit (gcmvn denormalization happens inside, before the vocoder,
    as in ``speech_generator.py``'s gcmvn_denormalize -> get_waveform).

    Exists for the int8 serving vocoder (``HiFiGANGenerator(
    quant_int8=True)``): its static activation scales are calibrated on
    the first real mel batch at the Python level — a traced mel inside
    the fused generation jit could not produce concrete scales. The
    fp32 vocoder keeps its fused in-jit path and never comes through
    here."""
    if voc is None:
        return None
    gstats = (None if gcmvn is None else
              (jnp.asarray(gcmvn.mean), jnp.asarray(gcmvn.std)))
    params = (vparams.get("params", vparams)
              if isinstance(vparams, dict) else vparams)

    @jax.jit
    def serve(variables, mel):
        mel_voc = mel if gstats is None else mel * gstats[1] + gstats[0]
        return voc.apply(variables, mel_voc)

    if not getattr(voc, "quant_int8", False):
        variables = vparams
        return lambda mel: serve(variables, mel)

    calib = voc.clone(calibrate=True)

    @jax.jit
    def calibrate(mel):
        mel_voc = mel if gstats is None else mel * gstats[1] + gstats[0]
        _, upd = calib.apply({"params": params}, mel_voc,
                             mutable=["quant"])
        return upd["quant"]

    state = {}

    def fn(mel):
        if "v" not in state:
            state["v"] = {"params": params, "quant": calibrate(mel)}
        return serve(state["v"], mel)

    return fn


def _vocode_in_jit(voc) -> bool:
    """True when the vocoder can run inside the fused generation jit
    (everything except the lazily-calibrated int8 serving mode)."""
    return voc is not None and not getattr(voc, "quant_int8", False)


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
        def run(params, src_tokens, speaker):
            mel, mel_post, out_lens, _, _, _ = model.apply(
                params, src_tokens=src_tokens, max_out_len=M,
                d_factor=d_factor, speaker=speaker)
            mel_final = mel_post if mel_post is not None else mel
            wav = None
            if _vocode_in_jit(voc):
                mel_voc = (mel_final if gstats is None
                           else mel_final * gstats[1] + gstats[0])
                wav = voc.apply(vparams, mel_voc)
            return mel_final, out_lens, wav

        return run

    def generate(self, params, batch: Dict[str, jnp.ndarray],
                 generate_waveform: bool = True) -> List[Dict]:
        if self._fn is None:
            self._fn = self._build()
        speaker = batch.get("speaker")
        if speaker is None:
            speaker = jnp.zeros((batch["src_tokens"].shape[0],), jnp.int32)
        mel, out_lens, wav = self._fn(params, batch["src_tokens"], speaker)
        if wav is None and generate_waveform and self.vocoder is not None:
            if getattr(self, "_vocode_fn", None) is None:
                self._vocode_fn = make_vocode_fn(
                    self.vocoder, self.vocoder_params, self.gcmvn)
            wav = self._vocode_fn(mel)
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


class MultiDecoderSpeechGenerator:
    """Two-pass AR generation for the UnitY-style
    :class:`...s2s_multidecoder.S2SMultiDecoderModel`
    (``MultiDecoderSpeechGeneratorModified``,
    ``speech_generator_modified.py:151-306``):

    1. greedy AR text decode with the MT decoder (the reference decodes
       with beam via its text generator; the recipes use beam 1),
    2. re-run the MT decoder teacher-forced on the hypothesis to extract
       hidden states (prefixed with <eos> like the reference's
       ``prev_output_tokens_mt``),
    3. synthesizer-encode them,
    4. AR mel decoding with stop prediction,
    5. gcmvn denormalization, then the vocoder.
    """

    def __init__(self, model, vocab, max_text_len: int = 64,
                 max_mel_len: int = 512, vocoder=None, vocoder_params=None,
                 gcmvn=None, stop_threshold: float = 0.5, hop: int = 256):
        self.model = model
        self.vocab = vocab
        self.max_text_len = max_text_len
        self.max_mel_len = max_mel_len
        self.vocoder = vocoder
        self.vocoder_params = vocoder_params
        self.gcmvn = gcmvn
        self.stop_threshold = stop_threshold
        self.hop = hop
        self._fn = None

    def _build(self):
        model, vocab = self.model, self.vocab
        TL, M, thr = self.max_text_len, self.max_mel_len, self.stop_threshold
        voc, vparams = self.vocoder, self.vocoder_params
        gstats = (None if self.gcmvn is None else
                  (jnp.asarray(self.gcmvn.mean), jnp.asarray(self.gcmvn.std)))

        @jax.jit
        def run(params, fbank, src_lengths):
            B = fbank.shape[0]
            enc, enc_pad = model.apply(
                params, fbank, src_lengths, method=model.forward_encoder)

            # ---- 1. greedy AR text decode (<eos>-prefixed, fairseq style)
            buf0 = jnp.full((B, TL + 1), vocab.pad, jnp.int32)
            buf0 = buf0.at[:, 0].set(vocab.eos)
            done0 = jnp.zeros((B,), bool)
            lens0 = jnp.full((B,), TL, jnp.int32)

            def text_step(carry, t):
                buf, done, lens = carry
                logits, _ = model.apply(
                    params, buf[:, :TL], enc, enc_pad,
                    method=model.mt_decode)
                tok = jnp.argmax(
                    jnp.take_along_axis(
                        logits, jnp.full((B, 1, 1), t), axis=1)[:, 0],
                    axis=-1).astype(jnp.int32)
                tok = jnp.where(done, vocab.pad, tok)
                buf = buf.at[:, t + 1].set(tok)
                newly = (~done) & (tok == vocab.eos)
                lens = jnp.where(newly, t + 1, lens)
                return (buf, done | newly, lens), None

            (buf, _, text_lens), _ = jax.lax.scan(
                text_step, (buf0, done0, lens0), jnp.arange(TL))

            # ---- 2. teacher-forced MT features on the hypothesis
            # the reference strips the hypothesis's trailing <eos> before
            # the teacher-forced pass (``speech_generator_modified.py``:
            # ``if tmp[-1] == eos: tmp = tmp[:-1]``) — keep slots
            # 0..text_lens-1 = [<eos>, w_1..w_{K-1}]
            idx = jnp.arange(TL)[None, :]
            prev_mt = jnp.where(idx < text_lens[:, None], buf[:, :TL],
                                vocab.pad)
            _, features = model.apply(params, prev_mt, enc, enc_pad,
                                      method=model.mt_decode)
            mt_pad = prev_mt == vocab.pad

            # ---- 3. synthesizer encoder
            synth = model.apply(params, features, mt_pad,
                                method=model.synthesize_encode)

            # ---- 4. AR mel decode with stop prediction
            mbuf0 = jnp.zeros((B, M + 1, 80), jnp.float32)
            mdone0 = jnp.zeros((B,), bool)
            mlens0 = jnp.full((B,), M, jnp.int32)

            def mel_step(carry, t):
                mbuf, done, lens = carry
                mel, stop = model.apply(
                    params, mbuf[:, :M], synth, mt_pad,
                    method=model.tts_decode)
                frame = jnp.take_along_axis(
                    mel, jnp.full((B, 1, 1), t), axis=1)[:, 0]
                stop_t = jnp.take_along_axis(
                    stop, jnp.full((B, 1), t), axis=1)[:, 0]
                mbuf = jax.lax.dynamic_update_slice_in_dim(
                    mbuf, frame[:, None, :], t + 1, axis=1)
                newly = (~done) & (jax.nn.sigmoid(stop_t) > thr)
                lens = jnp.where(newly, t + 1, lens)
                return (mbuf, done | newly, lens), None

            (mbuf, _, mel_lens), _ = jax.lax.scan(
                mel_step, (mbuf0, mdone0, mlens0), jnp.arange(M))
            mel = mbuf[:, 1:]

            wav = None
            if voc is not None:
                mel_voc = (mel if gstats is None
                           else mel * gstats[1] + gstats[0])
                wav = voc.apply(vparams, mel_voc)
            return buf[:, 1:], text_lens, mel, mel_lens, wav

        return run

    def generate(self, params, batch: Dict[str, jnp.ndarray],
                 generate_waveform: bool = True) -> List[Dict]:
        if self._fn is None:
            self._fn = self._build()
        tokens, text_lens, mel, mel_lens, wav = self._fn(
            params, batch["fbank"], batch["src_lengths"])
        tokens = np.asarray(tokens)
        text_lens = np.asarray(text_lens)
        mel = np.asarray(mel)
        mel_lens = np.asarray(mel_lens)
        wav_np = None if wav is None else np.asarray(wav)  # one transfer
        out = []
        for b in range(mel.shape[0]):
            m = mel[b, : mel_lens[b]]
            if self.gcmvn is not None:
                m = self.gcmvn.denormalize(m)
            hypo = {"tokens": tokens[b, : text_lens[b]], "feature": m}
            if wav_np is not None and generate_waveform:
                hypo["waveform"] = wav_np[b, : mel_lens[b] * self.hop]
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
            if _vocode_in_jit(voc):
                mel_voc = (mel if gstats is None
                           else mel * gstats[1] + gstats[0])
                wav = voc.apply(vparams, mel_voc)
            return mel, lens, wav

        return run

    def generate(self, params, batch, generate_waveform: bool = True):
        if self._fn is None:
            self._fn = self._build()
        mel, lens, wav = self._fn(params, batch["src_tokens"])
        if wav is None and generate_waveform and self.vocoder is not None:
            if getattr(self, "_vocode_fn", None) is None:
                self._vocode_fn = make_vocode_fn(
                    self.vocoder, self.vocoder_params, self.gcmvn)
            wav = self._vocode_fn(mel)
        mel = np.asarray(mel)
        lens = np.asarray(lens)
        wav_np = None if wav is None else np.asarray(wav)  # one transfer
        out = []
        for b in range(mel.shape[0]):
            m = mel[b, : lens[b]]
            if self.gcmvn is not None:
                m = self.gcmvn.denormalize(m)
            hypo = {"feature": m}
            if wav_np is not None and generate_waveform:
                hypo["waveform"] = wav_np[b, : lens[b] * self.hop]
            out.append(hypo)
        return out
