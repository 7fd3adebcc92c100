"""ASR-BLEU evaluation toolkit.

Rebuild of ``/root/reference/asr_bleu/compute_asr_bleu.py``: transcribe
generated waveforms with a CTC wav2vec2 ASR model and score sacrebleu (13a
tokenizer, lowercased) against references.

The reference downloads fairseq/HF ASR checkpoints at eval time
(``asr_model_cfgs.json``); this host is zero-egress, so the HF model is
loaded strictly from the local cache — ``asr_available()`` reports whether
scoring can run. The BLEU pipeline (normalization, corpus scoring) is
testable without the ASR by passing transcripts directly.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Iterable, List, Optional, Sequence

import numpy as np

DEFAULT_ASR_MODEL = "facebook/wav2vec2-large-960h-lv60-self"


def normalize_transcript(text: str) -> str:
    """Lowercase + strip punctuation, as ``compute_asr_bleu.py`` does before
    scoring (the en ASR emits uppercase; references are lowercased)."""
    text = text.lower()
    text = re.sub(r"[^a-z0-9' ]", " ", text)
    return " ".join(text.split())


def corpus_bleu(hyps: Sequence[str], refs: Sequence[str]) -> float:
    """sacrebleu corpus BLEU, 13a tokenizer, lowercase
    (``compute_asr_bleu.py:120-235``)."""
    import sacrebleu

    bleu = sacrebleu.corpus_bleu(
        [normalize_transcript(h) for h in hyps],
        [[normalize_transcript(r) for r in refs]],
        tokenize="13a", lowercase=True)
    return float(bleu.score)


def asr_available(model_name: str = DEFAULT_ASR_MODEL) -> bool:
    try:
        from transformers import Wav2Vec2Processor

        Wav2Vec2Processor.from_pretrained(model_name, local_files_only=True)
        return True
    except Exception:
        return False


class Wav2Vec2Transcriber:
    """HF wav2vec2 CTC transcription (the reference's HF path,
    ``asr_bleu/utils.py``)."""

    def __init__(self, model_name: str = DEFAULT_ASR_MODEL,
                 device: str = "cpu"):
        import torch
        from transformers import Wav2Vec2ForCTC, Wav2Vec2Processor

        self.processor = Wav2Vec2Processor.from_pretrained(
            model_name, local_files_only=True)
        self.model = Wav2Vec2ForCTC.from_pretrained(
            model_name, local_files_only=True).to(device).eval()
        self.device = device
        self.torch = torch

    def transcribe(self, wav: np.ndarray, sample_rate: int = 16000) -> str:
        torch = self.torch
        if sample_rate != 16000:
            wav = resample_linear(wav, sample_rate, 16000)
        inputs = self.processor(
            wav, sampling_rate=16000, return_tensors="pt")
        with torch.no_grad():
            logits = self.model(
                inputs.input_values.to(self.device)).logits
        ids = torch.argmax(logits, dim=-1)
        return self.processor.batch_decode(ids)[0]


def resample_linear(wav: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation resampler (sufficient for ASR input; avoids a
    librosa/torchaudio dependency)."""
    if sr_in == sr_out:
        return wav
    n_out = int(round(len(wav) * sr_out / sr_in))
    x_out = np.linspace(0.0, len(wav) - 1, n_out)
    return np.interp(x_out, np.arange(len(wav)), wav).astype(np.float32)


def compute_asr_bleu(
    wav_paths: Sequence, reference_texts: Sequence[str],
    model_name: str = DEFAULT_ASR_MODEL, sample_rate: int = 22050,
) -> dict:
    """Transcribe each waveform and score corpus BLEU
    (``compute_asr_bleu.py`` main path)."""
    from daspeech_tpu.cli.generate import read_wav

    tr = Wav2Vec2Transcriber(model_name)
    hyps: List[str] = []
    for p in wav_paths:
        if isinstance(p, (str, Path)):
            wav, sr = read_wav(p)
        else:
            wav, sr = p, sample_rate
        hyps.append(tr.transcribe(wav, sr))
    score = corpus_bleu(hyps, list(reference_texts))
    return {"bleu": score, "hypotheses": hyps}
