"""FastSpeech 2 training loss (TTS pretraining stage).

Rebuild of ``fairseq/fairseq/criterions/fastspeech2_loss.py``:
L1(mel) [+ L1(postnet mel)] + MSE(log duration) + MSE(pitch) + MSE(energy),
each averaged over valid (unpadded) positions.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over positions where mask is True (mask broadcast over
    trailing dims)."""
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    w = jnp.broadcast_to(mask, x.shape).astype(jnp.float32)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def fastspeech2_losses(
    mel_out: jnp.ndarray,            # [B, M, 80]
    mel_post: jnp.ndarray,           # [B, M, 80] or None
    log_dur_out: jnp.ndarray,        # [B, T]
    pitch_out: jnp.ndarray,          # [B, T]
    energy_out: jnp.ndarray,         # [B, T]
    mel_tgt: jnp.ndarray,            # [B, M, 80]
    durations: jnp.ndarray,          # [B, T] int
    pitches: jnp.ndarray,            # [B, T]
    energies: jnp.ndarray,           # [B, T]
    src_mask: jnp.ndarray,           # [B, T] True = valid
    mel_mask: jnp.ndarray,           # [B, M] True = valid
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """``FastSpeech2Loss.forward`` (``fastspeech2_loss.py:30-100``) /
    the TTS part of ``s2s_dag_fastspeech2_loss.py:300-345``."""
    l1 = masked_mean(jnp.abs(mel_out - mel_tgt), mel_mask)
    if mel_post is not None:
        l1 = l1 + masked_mean(jnp.abs(mel_post - mel_tgt), mel_mask)

    log_dur_tgt = jnp.log(durations.astype(jnp.float32) + 1.0)
    dur_loss = masked_mean(jnp.square(log_dur_out - log_dur_tgt), src_mask)
    pitch_loss = masked_mean(jnp.square(pitch_out - pitches), src_mask)
    energy_loss = masked_mean(jnp.square(energy_out - energies), src_mask)

    total = l1 + dur_loss + pitch_loss + energy_loss
    return total, {
        "tts-loss": total,
        "l1-loss": l1,
        "dur-loss": dur_loss,
        "pitch-loss": pitch_loss,
        "energy-loss": energy_loss,
    }
