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

    def _setup(self, gen_fold=0, **trainer_kwargs):
        cfg = HiFiGANConfig(
            upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
            upsample_initial_channel=16, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3, 5),), hop_size=16)
        rng = np.random.default_rng(0)
        W = jnp.asarray(rng.normal(size=(16, 80)).astype(np.float32) * 0.1)

        def mel_fn(wav):
            return wav.reshape(wav.shape[0], -1, 16) @ W

        trainer = VocoderTrainer(cfg, mel_fn=mel_fn, segment_size=256,
                                 gen_fold=gen_fold, **trainer_kwargs)
        state = trainer.init_state(jax.random.key(0))
        B, frames = 2, trainer.segment_frames
        mel = jnp.asarray(rng.normal(size=(B, frames, 80)).astype(np.float32))
        wav = jnp.asarray(rng.normal(size=(B, frames * cfg.hop_size))
                          .astype(np.float32) * 0.1)
        return trainer, state, mel, wav

    def test_split_step_equals_fused(self):
        """make_step_fns (two jits) must compute exactly the fused
        train_step's math — same params after one update."""
        trainer, state, mel, wav = self._setup()
        fused = jax.jit(trainer.train_step)
        s_fused, m_fused = fused(state, mel, wav)
        d_step, g_step = trainer.make_step_fns()
        s_mid, d_loss = d_step(state, mel, wav)
        s_split, m_split = g_step(s_mid, mel, wav)
        np.testing.assert_allclose(float(d_loss), float(m_fused["d_loss"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree.leaves(s_fused.gen_params),
                        jax.tree.leaves(s_split.gen_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree.leaves(s_fused.disc_params),
                        jax.tree.leaves(s_split.disc_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_pair_batch_discriminator_exactness(self):
        """pair_batch=True (one concat([y, y_hat]) forward per
        sub-discriminator) computes the same sums — convs are
        batch-parallel — so losses and raw grads must agree up to float
        reassociation (batch reductions fuse differently over 2B vs B+B;
        post-Adam params are NOT compared because step-1 Adam normalizes
        by |g|, amplifying reassociation noise on near-zero grads)."""
        tr0, s0, mel, wav = self._setup()
        trp, sp, _, _ = self._setup(pair_batch=True)
        assert (jax.tree.structure(s0.disc_params)
                == jax.tree.structure(sp.disc_params))

        def d_loss(trainer, dparams, y_hat):
            from daspeech_tpu.models.hifigan_discriminators import (
                discriminator_loss)
            rs_p, gs_p, _, _ = trainer.mpd.apply(
                {"params": dparams["mpd"]}, wav, y_hat)
            rs_s, gs_s, _, _ = trainer.msd.apply(
                {"params": dparams["msd"]}, wav, y_hat)
            return (discriminator_loss(rs_p, gs_p)
                    + discriminator_loss(rs_s, gs_s))

        y_hat = tr0.gen.apply(s0.gen_params, mel)
        dparams = {"mpd": s0.disc_params["mpd"]["params"],
                   "msd": s0.disc_params["msd"]["params"]}
        l0, g0 = jax.value_and_grad(
            lambda p: d_loss(tr0, p, y_hat))(dparams)
        lp, gp = jax.value_and_grad(
            lambda p: d_loss(trp, p, y_hat))(dparams)
        np.testing.assert_allclose(float(l0), float(lp), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(gp)):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1e-3)
            np.testing.assert_allclose(a, b, rtol=1e-4,
                                       atol=1e-5 * scale)

    def test_pair_batch_d_wiring(self):
        """``pair_batch_d`` (default ON) must route d_update through the
        pair-batched discriminator clones while init/g_update keep the
        unpaired modules — and the D loss must agree with the fully
        unpaired trainer from the same (bit-identical) init."""
        tr0, s0, mel, wav = self._setup(pair_batch_d=False)
        trd, sd, _, _ = self._setup()  # default pair_batch_d=True
        assert tr0.mpd_d.pair_batch is False
        assert trd.mpd_d.pair_batch and trd.msd_d.pair_batch
        assert not (trd.mpd.pair_batch or trd.msd.pair_batch)
        # same modules + same keys -> bit-identical inits
        for a, b in zip(jax.tree.leaves(s0.disc_params),
                        jax.tree.leaves(sd.disc_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        _, l0 = jax.jit(tr0.d_update)(s0, mel, wav)
        ad, ld = jax.jit(trd.d_update)(sd, mel, wav)
        np.testing.assert_allclose(float(l0), float(ld), rtol=1e-5)
        for leaf in jax.tree.leaves(ad.disc_params):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_bf16_discriminator_trains(self):
        """disc_dtype=bf16: params stay f32, losses are finite f32, both
        networks move, and one update stays close to the f32-D update
        (same init; bf16 D compute is a rounding perturbation)."""
        tr0, s0, mel, wav = self._setup()
        trb, sb, _, _ = self._setup(disc_dtype=jnp.bfloat16)
        sb = sb.replace(gen_params=s0.gen_params,
                        disc_params=s0.disc_params,
                        gen_opt=s0.gen_opt, disc_opt=s0.disc_opt)
        for leaf in jax.tree.leaves(sb.disc_params):
            assert leaf.dtype == jnp.float32
        a0, m0 = jax.jit(tr0.train_step)(s0, mel, wav)
        ab, mb = jax.jit(trb.train_step)(sb, mel, wav)
        for k in ("d_loss", "g_loss", "g_fm", "g_mel"):
            assert mb[k].dtype == jnp.float32
            assert np.isfinite(float(mb[k])), k
        np.testing.assert_allclose(float(mb["d_loss"]),
                                   float(m0["d_loss"]), rtol=0.05)
        g0 = jax.tree.leaves(sb.gen_params)[0]
        g1 = jax.tree.leaves(ab.gen_params)[0]
        assert float(jnp.abs(g1 - g0).max()) > 0

    def test_gen_fold_training_parity(self):
        """gen_fold=128 (folded space-to-depth generator execution) is the
        same math: identical param tree, and one full update from the same
        init lands on the same parameters up to float reassociation."""
        tr0, s0, mel, wav = self._setup(gen_fold=0)
        trf, sf, _, _ = self._setup(gen_fold=128)
        assert (jax.tree.structure(s0.gen_params)
                == jax.tree.structure(sf.gen_params))
        # same init for both (init differs across layouts only by rng
        # consumption order, so copy the unfolded init into the folded run)
        sf = sf.replace(gen_params=s0.gen_params,
                        disc_params=s0.disc_params,
                        gen_opt=s0.gen_opt, disc_opt=s0.disc_opt)
        a0, _ = jax.jit(tr0.train_step)(s0, mel, wav)
        af, _ = jax.jit(trf.train_step)(sf, mel, wav)
        for a, b in zip(jax.tree.leaves(a0.gen_params),
                        jax.tree.leaves(af.gen_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-5)
