"""HiFi-GAN vocoder training smoke test (tiny generator, real discriminator
topology, short segments)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daspeech_tpu.core.config import HiFiGANConfig
from daspeech_tpu.train.vocoder_train import VocoderTrainer

pytestmark = pytest.mark.slow


class TestVocoderTrainer:
    def test_alternating_step_moves_both_networks(self):
        cfg = HiFiGANConfig(
            upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
            upsample_initial_channel=16, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3, 5),), hop_size=16)
        # toy mel_fn: fixed random projection of folded waveform windows
        rng = np.random.default_rng(0)
        W = jnp.asarray(rng.normal(size=(16, 80)).astype(np.float32) * 0.1)

        def mel_fn(wav):
            frames = wav.reshape(wav.shape[0], -1, 16)
            return frames @ W

        trainer = VocoderTrainer(cfg, mel_fn=mel_fn, segment_size=256)
        state = trainer.init_state(jax.random.key(0))

        B, frames = 2, trainer.segment_frames
        mel = jnp.asarray(rng.normal(size=(B, frames, 80)).astype(np.float32))
        wav = jnp.asarray(
            rng.normal(size=(B, frames * cfg.hop_size)).astype(np.float32) * 0.1)

        step = jax.jit(trainer.train_step)
        g0 = jax.tree.leaves(state.gen_params)[0].copy()
        state, metrics = step(state, mel, wav)
        state, metrics = step(state, mel, wav)
        assert int(state.step) == 2
        for k in ("d_loss", "g_loss", "g_fm", "g_mel"):
            assert np.isfinite(float(metrics[k])), k
        g1 = jax.tree.leaves(state.gen_params)[0]
        assert float(jnp.abs(g1 - g0).max()) > 0
