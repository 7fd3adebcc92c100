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

import logging
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def make_vocode_fn(voc, vparams, gcmvn, calib_batches: int | None = None,
                   saturation_margin: float = 1.25):
    """jitted mel -> waveform closure for vocoding OUTSIDE a generator's
    fused jit (gcmvn denormalization happens inside, before the vocoder,
    as in ``speech_generator.py``'s gcmvn_denormalize -> get_waveform).

    Serves two opt-in vocoder modes the fused in-jit path cannot:

    * **int8** (``HiFiGANGenerator(quant_int8=True)``): static activation
      scales need concrete values — a traced mel inside the fused
      generation jit could not produce them. Scales are calibrated over
      the FIRST ``calib_batches`` served batches (a running per-site max;
      one quiet first utterance no longer fixes the clip range for the
      whole session; default from the vocoder's ``serve_calib_batches``
      field); calibration passes serve with dynamic per-tensor
      quantization, then the scales freeze. After freezing, each batch's
      input amax is compared against the calibration-time maximum and a
      warning is logged when it exceeds it by ``saturation_margin`` —
      the signal that the frozen scales are saturating at the int8 clip.
    * **chunked** (``serve_chunk > 0`` on the vocoder): exact fixed-window
      streaming vocoding via ``models.hifigan.vocode_chunked`` — the mel
      is gcmvn-denormalized in one jit, then vocoded chunk by chunk with
      a memoized window jit, so first-audio latency is one chunk. Stacks
      with int8 (frozen scales are position-independent).

    The plain fp32 vocoder keeps its fused in-jit path and never comes
    through here."""
    if voc is None:
        return None
    from daspeech_tpu.models.hifigan import make_chunked_run, vocode_chunked

    chunk = int(getattr(voc, "serve_chunk", 0) or 0)
    if calib_batches is None:
        calib_batches = int(getattr(voc, "serve_calib_batches", 4))
    gstats = (None if gcmvn is None else
              (jnp.asarray(gcmvn.mean), jnp.asarray(gcmvn.std)))
    params = (vparams.get("params", vparams)
              if isinstance(vparams, dict) else vparams)

    def _denorm(mel):
        return mel if gstats is None else mel * gstats[1] + gstats[0]

    def _chunked_server(variables):
        denorm_j = jax.jit(lambda mel: (_denorm(mel),
                                        jnp.max(jnp.abs(_denorm(mel)))))
        run = make_chunked_run(voc, variables)

        def serve_chunked(mel):
            mel_voc, amax = denorm_j(mel)
            return vocode_chunked(voc, variables, mel_voc, chunk=chunk,
                                  run=run), amax

        return serve_chunked

    if not getattr(voc, "quant_int8", False):
        variables = vparams
        if chunk:
            ck = _chunked_server(variables)
            return lambda mel: ck(mel)[0]

        @jax.jit
        def serve_fp(mel):
            return voc.apply(variables, _denorm(mel))

        return serve_fp

    calib = voc.clone(calibrate=True)

    @jax.jit
    def calibrate(quant, mel):
        # dynamic-quantization forward that also refines the running
        # per-site amax (act_scale takes a max, so order is irrelevant)
        mel_voc = _denorm(mel)
        v = {"params": params} if quant is None else {"params": params,
                                                      "quant": quant}
        wav, upd = calib.apply(v, mel_voc, mutable=["quant"])
        return wav, upd["quant"], jnp.max(jnp.abs(mel_voc))

    @jax.jit
    def serve(variables, mel):
        mel_voc = _denorm(mel)
        return voc.apply(variables, mel_voc), jnp.max(jnp.abs(mel_voc))

    state = {"n": 0, "quant": None, "amax": 0.0, "warned": False}

    def fn(mel):
        if state["n"] < max(1, calib_batches):
            # flax specializes on the pytree structure, so quant=None and
            # quant=<tree> are two traces of `calibrate`, both cached
            wav, q, amax = calibrate(state["quant"], mel)
            state["quant"] = q
            state["amax"] = max(state["amax"], float(amax))
            state["n"] += 1
            if state["n"] >= max(1, calib_batches):
                state["v"] = {"params": params, "quant": state["quant"]}
                if chunk:
                    state["serve"] = _chunked_server(state["v"])
            return wav
        wav, amax = (state["serve"](mel) if chunk
                     else serve(state["v"], mel))
        if (float(amax) > saturation_margin * state["amax"]
                and not state["warned"]):
            state["warned"] = True
            logger.warning(
                "int8 vocoder: served batch input amax %.3g exceeds the "
                "calibration-time maximum %.3g by more than %.0f%% — the "
                "frozen activation scales are likely saturating at the "
                "int8 clip; consider more --vocoder-calib-batches.",
                float(amax), state["amax"],
                (saturation_margin - 1) * 100)
        return wav

    return fn


def _vocode_in_jit(voc) -> bool:
    """True when the vocoder can run inside the fused generation jit
    (everything except the lazily-calibrated int8 serving mode and
    chunked streaming serving, which both go through make_vocode_fn)."""
    return (voc is not None and not getattr(voc, "quant_int8", False)
            and not getattr(voc, "serve_chunk", 0))


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
            if _vocode_in_jit(voc):
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
        if wav is None and generate_waveform and self.vocoder is not None:
            if getattr(self, "_vocode_fn", None) is None:
                self._vocode_fn = make_vocode_fn(
                    self.vocoder, self.vocoder_params, self.gcmvn)
            wav = self._vocode_fn(mel)
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
