"""Eval metric tests: BLEU normalization, MCD."""

import numpy as np
import pytest

from daspeech_tpu.eval import corpus_bleu, normalize_transcript, resample_linear
from daspeech_tpu.eval.mcd import (
    batch_mel_cepstral_distortion,
    mel_cepstral_distortion,
)


class TestBleu:
    def test_normalize(self):
        assert normalize_transcript("HELLO, World!") == "hello world"

    def test_corpus_bleu_perfect(self):
        hyps = ["the cat sat on the mat", "a quick brown fox jumps over"]
        assert corpus_bleu(hyps, hyps) == pytest.approx(100.0)

    def test_corpus_bleu_degrades(self):
        refs = ["the cat sat on the mat today okay"]
        good = corpus_bleu(["the cat sat on the mat today okay"], refs)
        bad = corpus_bleu(["a dog ran in a park every day"], refs)
        assert good > bad


class TestResample:
    def test_preserves_tone(self):
        sr1, sr2 = 22050, 16000
        t = np.arange(sr1) / sr1
        wav = np.sin(2 * np.pi * 5 * t).astype(np.float32)
        out = resample_linear(wav, sr1, sr2)
        assert len(out) == sr2
        t2 = np.arange(sr2) / sr2
        np.testing.assert_allclose(out, np.sin(2 * np.pi * 5 * t2), atol=1e-3)


class TestMCD:
    def test_zero_for_identical(self):
        rng = np.random.default_rng(0)
        mel = rng.normal(size=(30, 80)).astype(np.float32)
        assert mel_cepstral_distortion(mel, mel) == pytest.approx(0.0, abs=1e-5)

    def test_positive_and_orders(self):
        rng = np.random.default_rng(1)
        ref = rng.normal(size=(30, 80)).astype(np.float32)
        near = ref + 0.01 * rng.normal(size=ref.shape).astype(np.float32)
        far = ref + 1.0 * rng.normal(size=ref.shape).astype(np.float32)
        d_near = mel_cepstral_distortion(near, ref)
        d_far = mel_cepstral_distortion(far, ref)
        assert 0 < d_near < d_far

    def test_handles_length_mismatch(self):
        rng = np.random.default_rng(2)
        ref = rng.normal(size=(25, 80)).astype(np.float32)
        hyp = np.repeat(ref, 2, axis=0)[:40]   # stretched
        d = mel_cepstral_distortion(hyp, ref)
        assert np.isfinite(d)
        assert batch_mel_cepstral_distortion([hyp], [ref]) == pytest.approx(d)


class TestMultilingualASRTable:
    def test_lang_table_matches_reference(self):
        """Every HF row of the reference's asr_model_cfgs.json resolves."""
        import json

        from daspeech_tpu.eval.asr_bleu import ASR_MODELS, asr_model_for_lang

        ref = json.loads(
            open("/root/reference/asr_bleu/asr_model_cfgs.json").read())
        for lang, v in ref.items():
            cfg = v.get("oct22", {})
            if cfg.get("model_type") == "hf":
                assert asr_model_for_lang(lang) == cfg["model_path"], lang
        assert asr_model_for_lang("en")  # fairseq row -> HF equivalent
        import pytest

        with pytest.raises(ValueError):
            asr_model_for_lang("xx")

    def test_normalize_lang_aware(self):
        from daspeech_tpu.eval.asr_bleu import normalize_transcript

        assert normalize_transcript("Héllo, World!", "en") == "h llo world"
        assert normalize_transcript("Héllo, Wörld!", "de") == "héllo, wörld!"

    def test_zh_tokenizer(self):
        import pytest

        from daspeech_tpu.eval.asr_bleu import corpus_bleu

        s = corpus_bleu(["你好世界"], ["你好世界"], lang="zh")
        assert s == pytest.approx(100.0)
