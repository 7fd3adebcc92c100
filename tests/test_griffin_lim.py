"""Griffin-Lim fallback vocoder (``vocoder.py:30-165`` equivalent): phase
recovery must reconstruct a tone from its own log-mel with high correlation
and no checkpoint."""

import numpy as np
import pytest

import jax.numpy as jnp

from daspeech_tpu.data.audio_utils import log_mel_spectrogram
from daspeech_tpu.models.griffin_lim import GriffinLimVocoder, _istft, _stft


class TestSTFTRoundTrip:
    def test_istft_inverts_stft(self):
        rng = np.random.default_rng(0)
        wav = jnp.asarray(rng.normal(size=(2, 4096)).astype(np.float32))
        window = jnp.asarray(np.hanning(1025)[:-1].astype(np.float32))
        mag, phase = _stft(wav, 1024, 256, window)
        rec = _istft(mag, phase, 1024, 256, window)
        n = min(rec.shape[1], wav.shape[1])
        # perfect reconstruction away from the edges (COLA + wsq norm)
        np.testing.assert_allclose(np.asarray(rec)[:, 512:n - 512],
                                   np.asarray(wav)[:, 512:n - 512],
                                   atol=1e-4)


class TestGriffinLim:
    def test_mel_consistency_of_reconstruction(self):
        """Griffin-Lim guarantees magnitude consistency: the mel of the
        reconstructed waveform must match the input mel (the pseudo-inverse
        smears a pure tone across the mel triangle in ANY implementation,
        so the invariant lives in the mel domain, not the linear one)."""
        sr, hop = 22050, 256
        t = np.arange(sr) / sr                        # 1 s
        wav = (0.5 * np.sin(2 * np.pi * 440 * t)
               + 0.25 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
        mel_in = log_mel_spectrogram(wav, sample_rate=sr)   # [M, 80]
        voc = GriffinLimVocoder(n_iter=32)
        out = np.asarray(voc.apply({}, jnp.asarray(mel_in)[None]))[0]
        assert out.shape == (mel_in.shape[0] * hop,)
        assert np.isfinite(out).all()
        mel_out = log_mel_spectrogram(out, sample_rate=sr)
        n = min(len(mel_in), len(mel_out))
        a = np.exp(mel_in[:n].ravel())
        b = np.exp(mel_out[:n].ravel())
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.9, corr

    def test_batched_matches_single(self):
        """The reference warns its batched ISTFT is noisy; ours must be
        exact across the batch axis."""
        rng = np.random.default_rng(1)
        mel = rng.normal(-2.0, 1.0, size=(3, 40, 80)).astype(np.float32)
        voc = GriffinLimVocoder(n_iter=4)
        batched = np.asarray(voc.apply({}, jnp.asarray(mel)))
        single = np.stack([
            np.asarray(voc.apply({}, jnp.asarray(mel[i:i + 1])))[0]
            for i in range(3)])
        scale = np.abs(single).max()
        np.testing.assert_allclose(batched / scale, single / scale,
                                   atol=1e-4)
