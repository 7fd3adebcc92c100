"""AR Transformer-TTS: teacher-forced shapes, causal masking, generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from testutils import fast_init

from daspeech_tpu.models.tts_transformer import TTSTransformer

pytestmark = pytest.mark.slow


def tiny_model():
    return TTSTransformer(vocab_size=12, embed_dim=16, ffn_dim=32,
                          encoder_layers=1, decoder_layers=1, num_heads=2,
                          dropout=0.0, prenet_dim=16, out_dim=8)


class TestTTSTransformer:
    def _setup(self):
        model = tiny_model()
        rng = np.random.default_rng(0)
        B, S, T = 2, 5, 7
        tokens = jnp.asarray(rng.integers(2, 12, size=(B, S)),
                             dtype=jnp.int32)
        prev = jnp.asarray(rng.normal(size=(B, T, 8)).astype(np.float32))
        params = fast_init(model, jax.random.key(0), tokens, prev)
        return model, params, tokens, prev

    def test_teacher_forced_shapes(self):
        model, params, tokens, prev = self._setup()
        mel, stop = model.apply(params, tokens, prev)
        assert mel.shape == (2, 7, 8) and stop.shape == (2, 7)
        assert np.isfinite(np.asarray(mel)).all()

    def test_causality(self):
        """Changing future input frames must not change earlier outputs."""
        model, params, tokens, prev = self._setup()
        mel1, _ = model.apply(params, tokens, prev)
        prev2 = prev.at[:, 4:].add(10.0)
        mel2, _ = model.apply(params, tokens, prev2)
        np.testing.assert_allclose(np.asarray(mel1)[:, :4],
                                   np.asarray(mel2)[:, :4],
                                   rtol=1e-5, atol=1e-6)
        assert np.abs(np.asarray(mel1)[:, 5:] -
                      np.asarray(mel2)[:, 5:]).max() > 0

    def test_generate_consistency(self):
        """AR generation frame t must equal the teacher-forced output given
        the generated prefix (full-recompute decode is self-consistent)."""
        model, params, tokens, prev = self._setup()
        mel, lens = model.apply(params, tokens, 6, 1.1,  # thr > 1: no stop
                                method=model.generate)
        assert mel.shape == (2, 6, 8)
        # replay: teacher-force with the generated prefix
        go = jnp.zeros((2, 1, 8))
        tf_in = jnp.concatenate([go, mel[:, :5]], axis=1)
        mel_tf, _ = model.apply(params, tokens, tf_in)
        np.testing.assert_allclose(np.asarray(mel), np.asarray(mel_tf),
                                   rtol=1e-4, atol=1e-5)

    def test_generator_wrapper(self):
        from daspeech_tpu.core.config import VocabConfig
        from daspeech_tpu.decode.speech_generator import (
            AutoRegressiveSpeechGenerator)

        model, params, tokens, _ = self._setup()
        gen = AutoRegressiveSpeechGenerator(
            model, VocabConfig(size=12), max_mel_len=6)
        hypos = gen.generate(params, {"src_tokens": tokens},
                             generate_waveform=False)
        assert len(hypos) == 2
        assert hypos[0]["feature"].shape[1] == 8
