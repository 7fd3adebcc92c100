"""Data-prep pipeline tests: fbank/mel extraction, YIN pitch, durations,
gcmvn, end-to-end manifest creation."""

import numpy as np
import pytest

from daspeech_tpu.data.audio_utils import kaldi_fbank, log_mel_spectrogram
from daspeech_tpu.preprocess.prep_data import (
    average_by_duration,
    compute_gcmvn_stats,
    create_s2s_tsv,
    durations_from_intervals,
    extract_s2t_features,
    extract_tts_features,
    frame_energy,
    yin_pitch,
)


def make_tone(freq, seconds, sr):
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestFeatures:
    def test_fbank_shape(self):
        wav = make_tone(220, 0.5, 16000)
        fb = kaldi_fbank(wav, 16000)
        # 25ms window / 10ms shift, snip edges: 1 + (8000-400)//160 = 48
        assert fb.shape == (48, 80)
        assert np.isfinite(fb).all()

    def test_logmel_shape(self):
        wav = make_tone(220, 0.5, 22050)
        mel = log_mel_spectrogram(wav, 22050)
        assert mel.shape[1] == 80
        assert abs(mel.shape[0] - len(wav) // 256) <= 1

    def test_yin_pitch_on_tone(self):
        sr = 22050
        wav = make_tone(220, 0.4, sr)
        f0 = yin_pitch(wav, sr)
        voiced = f0[f0 > 0]
        assert len(voiced) > 10
        assert np.median(voiced) == pytest.approx(220, rel=0.03)

    def test_energy_positive(self):
        wav = make_tone(150, 0.3, 22050)
        e = frame_energy(wav)
        assert (e > 0).all()


class TestAlignment:
    def test_durations_from_intervals(self):
        ivs = [(0.0, 0.1), (0.1, 0.25), (0.25, 0.5)]
        d = durations_from_intervals(ivs, hop=256, sample_rate=22050,
                                     total_frames=43)
        assert d.sum() == 43
        assert (d >= 0).all() and len(d) == 3

    def test_average_by_duration(self):
        vals = np.array([1, 1, 0, 4, 4, 4], np.float32)
        out = average_by_duration(vals, [3, 3])
        np.testing.assert_allclose(out, [1.0, 4.0])   # zeros excluded
        out2 = average_by_duration(vals, [3, 3], exclude_zeros=False)
        np.testing.assert_allclose(out2, [2.0 / 3, 4.0])


class TestEndToEnd:
    def test_manifest_pipeline(self, tmp_path):
        sr = 22050
        rng = np.random.default_rng(0)
        wavs = [make_tone(200 + 50 * i, 0.3 + 0.1 * i, sr) for i in range(3)]
        names = [f"utt{i}" for i in range(3)]
        s2t_rows = extract_s2t_features(
            [w[:: sr // 16000 or 1] for w in wavs], names, 16000,
            tmp_path / "fbank.zip")
        ivs = [[("AA", 0.0, 0.15), ("K", 0.15, 0.3)] for _ in range(3)]
        tts_rows, gcmvn = extract_tts_features(
            wavs, names, ivs, sr, tmp_path / "mel.zip")
        assert gcmvn["mean"].shape == (80,)
        s2s = create_s2s_tsv(s2t_rows, tts_rows)
        assert len(s2s) == 3
        row = s2s[0]
        assert set(row) == {"id", "src_audio", "src_n_frames", "tgt_text",
                            "tgt_audio", "tgt_n_frames", "duration",
                            "pitch", "energy"}
        # durations (+ eos 0) align with tgt_text (+ eos)
        n_ph = len(row["tgt_text"].split())
        assert len(row["duration"].split()) == n_ph + 1
        # features readable back through the data layer
        from daspeech_tpu.data import get_features_or_waveform
        mel = get_features_or_waveform(row["tgt_audio"])
        assert mel.shape[1] == 80
        assert int(row["tgt_n_frames"]) == len(mel)


class TestConfigYaml:
    def test_write_config_yaml_round_trips_through_data_cfg(self, tmp_path):
        from daspeech_tpu.data.data_cfg import S2TDataConfig
        from daspeech_tpu.preprocess.prep_data import write_config_yaml

        write_config_yaml(tmp_path, gcmvn_stats="gcmvn_stats.npz",
                          vocoder={"type": "hifigan",
                                   "checkpoint": "hifigan_ckpt"})
        cfg = S2TDataConfig(tmp_path / "config.yaml")
        assert cfg.vocab_filename == "vocab.txt"
        assert cfg.transform_names("train", True) == [
            "utterance_cmvn", "specaugment"]
        assert cfg.transform_names("test", False) == ["utterance_cmvn"]
        assert cfg.vocoder["type"] == "hifigan"


class TestStonemaskRefine:
    def test_refines_harmonic_tone(self):
        """On a synthetic harmonic tone the refined F0 error is far below
        the raw YIN error (the point of the pyworld stonemask stage)."""
        from daspeech_tpu.preprocess.prep_data import (
            stonemask_refine, yin_pitch, yin_stonemask_pitch)

        sr, f_true = 22050, 137.3
        t = np.arange(int(1.0 * sr)) / sr
        wav = sum((0.6 / k) * np.sin(2 * np.pi * f_true * k * t)
                  for k in range(1, 4)).astype(np.float32)
        coarse = yin_pitch(wav, sr)
        refined = stonemask_refine(wav, coarse, sr)
        v = coarse > 0
        assert v.sum() > 10
        err_coarse = np.abs(coarse[v] - f_true).mean()
        err_refined = np.abs(refined[v] - f_true).mean()
        assert err_refined < err_coarse
        assert err_refined < 0.5   # Hz

        # the combined default matches chaining the two stages
        both = yin_stonemask_pitch(wav, sr)
        np.testing.assert_allclose(both[v], refined[v], rtol=1e-6)

    def test_unvoiced_passthrough(self):
        from daspeech_tpu.preprocess.prep_data import stonemask_refine

        rng = np.random.default_rng(0)
        wav = rng.normal(size=22050).astype(np.float32) * 0.01
        f0 = np.zeros(40, np.float32)
        out = stonemask_refine(wav, f0, 22050)
        assert (out == 0).all()


class TestMakePitchFn:
    """Pitch backend resolution (``prep_data.make_pitch_fn``): pyworld is
    opt-in explicit and HARD-fails when absent — a silent fallback would
    silently change stage-2/3 training targets vs reference-prepped data
    (``data_utils.py:88-96``). Deviation numbers: tools/quantify_pitch.py,
    documented in COVERAGE.md."""

    def test_yin_default_tracks_tone(self):
        from daspeech_tpu.preprocess.prep_data import make_pitch_fn

        sr = 22050
        wav = make_tone(150.0, 1.0, sr)
        f0 = make_pitch_fn("yin")(wav, sr)
        voiced = f0 > 0
        assert voiced.mean() > 0.8
        np.testing.assert_allclose(f0[voiced], 150.0, atol=1.0)

    def test_pyworld_hard_fails_when_absent(self):
        from daspeech_tpu.preprocess.prep_data import make_pitch_fn

        try:
            import pyworld  # noqa: F401
            import pytest
            pytest.skip("pyworld present on this host")
        except ImportError:
            pass
        import pytest
        with pytest.raises(ImportError, match="pyworld"):
            make_pitch_fn("pyworld")

    def test_unknown_name_raises(self):
        from daspeech_tpu.preprocess.prep_data import make_pitch_fn

        import pytest
        with pytest.raises(ValueError, match="unknown pitch_fn"):
            make_pitch_fn("crepe")
