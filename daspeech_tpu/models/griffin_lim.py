"""Griffin-Lim fallback vocoder: log-mel -> waveform with no checkpoint.

Rebuild of the reference's ``PseudoInverseMelScale`` + ``GriffinLim`` +
``GriffinLimVocoder`` (``fairseq/fairseq/models/text_to_speech/
vocoder.py:30-165``, the ``get_vocoder`` "griffin_lim" branch ``:297-305``),
TPU-idiomatic: the whole pipeline — mel pseudo-inverse, batched STFT via a
framing gather + XLA rfft, overlap-add ISTFT via a scatter-add, and the
``n_iter`` phase-recovery loop as ``lax.fori_loop`` — is one jittable
function. The reference recommends one utterance at a time because its
batched conv-transpose ISTFT is noisy; here the batch axis is exact (the
scatter-add overlap-add has no cross-batch interaction), so batched calls
are safe.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from daspeech_tpu.data.audio_utils import _slaney_mel


def _stft(wav: jnp.ndarray, n_fft: int, hop: int, window: jnp.ndarray):
    """Centered magnitude/phase STFT. wav [B, N] -> [B, F, n_fft//2+1]."""
    pad = n_fft // 2
    wav = jnp.pad(wav, ((0, 0), (pad, pad)))
    n_frames = 1 + (wav.shape[1] - n_fft) // hop
    idx = (jnp.arange(n_fft)[None, :]
           + hop * jnp.arange(n_frames)[:, None])          # [F, n_fft]
    frames = wav[:, idx] * window[None, None, :]
    spec = jnp.fft.rfft(frames, n=n_fft)
    return jnp.abs(spec), jnp.angle(spec)


def _istft(mag: jnp.ndarray, phase: jnp.ndarray, n_fft: int, hop: int,
           window: jnp.ndarray) -> jnp.ndarray:
    """Overlap-add inverse with window-sum-square normalization
    (``GriffinLim.inverse``/``get_window_sum_square``, ``vocoder.py:90-109``).
    mag/phase [B, F, n_fft//2+1] -> wav [B, (F-1)*hop] (center-trimmed)."""
    B, F, _ = mag.shape
    spec = mag * jnp.exp(1j * phase)
    frames = jnp.fft.irfft(spec, n=n_fft) * window[None, None, :]
    total = n_fft + hop * (F - 1)
    idx = (jnp.arange(n_fft)[None, :]
           + hop * jnp.arange(F)[:, None])                  # [F, n_fft]
    wav = jnp.zeros((B, total), frames.dtype).at[:, idx].add(frames)
    wsq = jnp.zeros((total,), frames.dtype).at[idx].add(
        (window ** 2)[None, :] * jnp.ones((F, 1), frames.dtype))
    wav = wav / jnp.maximum(wsq, 1.1754944e-38)[None, :]
    pad = n_fft // 2
    return wav[:, pad:-pad]


@dataclass
class GriffinLimVocoder:
    """Duck-typed like the flax vocoder modules: ``voc.apply(params, mel)``
    with ``mel`` [B, M, num_mels] *natural-log* mel (the domain
    ``data/audio_utils.py::log_mel_spectrogram`` produces and the reference
    ``x.exp()``s, ``vocoder.py:158-160``); params are ignored (there are
    none). Returns wav [B, M * hop]."""

    sample_rate: int = 22050
    n_fft: int = 1024
    win_length: int = 1024
    hop_length: int = 256
    num_mels: int = 80
    fmin: float = 0.0
    fmax: float = 8000.0
    n_iter: int = 32
    _fn: object = field(default=None, repr=False, compare=False)

    def __post_init__(self):
        fb = _slaney_mel(self.num_mels, self.n_fft, self.sample_rate,
                         self.fmin, self.fmax)               # [freq, mel]
        inv_basis = np.linalg.pinv(fb).astype(np.float32)    # [mel, freq]
        window = np.hanning(self.win_length + 1)[:-1].astype(np.float32)
        if self.win_length < self.n_fft:
            lpad = (self.n_fft - self.win_length) // 2
            window = np.pad(window,
                            (lpad, self.n_fft - self.win_length - lpad))
        n_fft, hop, n_iter = self.n_fft, self.hop_length, self.n_iter
        inv_basis_j = jnp.asarray(inv_basis)
        window_j = jnp.asarray(window)

        @jax.jit
        def run(log_mel):
            mel = jnp.exp(log_mel.astype(jnp.float32))       # [B, M, mels]
            spec = jnp.maximum(mel @ inv_basis_j, 0.0)       # [B, M, freq]
            # random-phase start as in the reference (zero phase is a
            # symmetric fixed point Griffin-Lim cannot escape); a fixed key
            # keeps the function pure and deterministic
            # drawn per-frame (not per-batch) so batched and single-utt
            # calls are bit-identical
            phase0 = jnp.broadcast_to(
                jax.random.uniform(jax.random.key(0), spec.shape[1:],
                                   minval=-jnp.pi, maxval=jnp.pi),
                spec.shape)

            def body(_, phase):
                wav = _istft(spec, phase, n_fft, hop, window_j)
                _, phase = _stft(wav, n_fft, hop, window_j)
                # STFT of the (F-1)*hop-long wav yields F frames again
                return phase

            phase = jax.lax.fori_loop(0, n_iter, body, phase0)
            wav = _istft(spec, phase, n_fft, hop, window_j)
            # [B, (M-1)*hop] -> pad to M*hop for the generators' uniform
            # mel_len*hop trimming
            return jnp.pad(wav, ((0, 0), (0, hop)))

        self._fn = run

    def apply(self, params, log_mel: jnp.ndarray) -> jnp.ndarray:
        del params
        return self._fn(log_mel)
