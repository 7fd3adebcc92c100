"""HiFi-GAN vocoder training step (generator + MPD/MSD adversarial).

Rebuild of ``/root/reference/hifi-gan/train.py``: alternating D and G
updates with AdamW (b1 0.8, b2 0.99), LSGAN losses, feature matching, and
L1 mel loss x 45; segment-cropped waveforms (segment_size 8192).

Two execution forms, same math:

* ``train_step`` — both updates fused into one jit (original form).
* ``make_step_fns()`` — the D update and the G update as TWO jits. The
  fused form compiled in ~206 s on a v5e (the worst compile in the bench
  suite: G fwd + 8 discriminator fwds x2 + two backwards + two Adams in
  one XLA program); splitting compiles each half independently and lets
  a rerun reuse either half from the persistent cache.

``gen_fold=128`` runs the training generator through the folded
(space-to-depth) execution path that the serving analysis built
(``models/hifigan.py``): identical parameters and sums, ~2x faster on the
low-channel tail of config_v1, now applied to G fwd AND G bwd.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from daspeech_tpu.core.config import HiFiGANConfig
from daspeech_tpu.models.hifigan import HiFiGANGenerator
from daspeech_tpu.models.hifigan_discriminators import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)


@flax.struct.dataclass
class VocoderTrainState:
    step: jnp.ndarray
    gen_params: Any
    disc_params: Any            # {"mpd": ..., "msd": ...}
    gen_opt: Any
    disc_opt: Any


def make_vocoder_optimizer(lr: float = 2e-4, b1: float = 0.8,
                           b2: float = 0.99, lr_decay: float = 0.999):
    """AdamW + exponential decay per epoch approximated per-step
    (``train.py``: ExponentialLR gamma=0.999 stepped per epoch; here decay
    is applied smoothly)."""
    sched = optax.exponential_decay(lr, transition_steps=1000,
                                    decay_rate=lr_decay)
    return optax.adamw(sched, b1=b1, b2=b2, weight_decay=0.0)


class VocoderTrainer:
    def __init__(self, cfg: HiFiGANConfig, mel_fn=None,
                 segment_size: int = 8192, mel_loss_weight: float = 45.0,
                 gen_fold: int = 0, disc_dtype=jnp.float32,
                 pair_batch: bool = False, pair_batch_d: bool = True):
        self.cfg = cfg
        self.gen = HiFiGANGenerator(cfg, fold_to=gen_fold)
        # disc_dtype=bf16 runs D compute in bfloat16 (params stay f32 and
        # loss means accumulate in f32). pair_batch runs each
        # sub-discriminator once on concat([y, y_hat]) — the same sums
        # (float reassociation only), half the conv calls. Measured in
        # situ (tools/profile_vocoder_train.py, v5e, B=16 x 8192): a win
        # ONLY for the D update (64.5 -> 54.9 ms, both halves need weight
        # grads so the 2B backward is exactly the needed work) and a LOSS
        # for the G update (52.3 -> 61.9 ms: the wav half needs no
        # backward, but pair-batching forces the conv bwd over the full
        # 2B) — so `pair_batch_d` (default ON) pairs the D update only,
        # while `pair_batch` A/Bs both. Same params tree either way.
        self.mpd = MultiPeriodDiscriminator(dtype=disc_dtype,
                                            pair_batch=pair_batch)
        self.msd = MultiScaleDiscriminator(dtype=disc_dtype,
                                           pair_batch=pair_batch)
        pd = pair_batch or pair_batch_d
        self.mpd_d = MultiPeriodDiscriminator(dtype=disc_dtype,
                                              pair_batch=pd)
        self.msd_d = MultiScaleDiscriminator(dtype=disc_dtype,
                                             pair_batch=pd)
        self.segment_frames = segment_size // cfg.hop_size
        self.mel_loss_weight = mel_loss_weight
        # mel_fn: waveform [B, T] -> mel [B, frames, num_mels] (jax)
        self.mel_fn = mel_fn
        self.gen_tx = make_vocoder_optimizer()
        self.disc_tx = make_vocoder_optimizer()

    def init_state(self, rng) -> VocoderTrainState:
        frames = self.segment_frames
        mel = jnp.zeros((1, frames, self.cfg.num_mels))
        wav = jnp.zeros((1, frames * self.cfg.hop_size))
        k1, k2, k3 = jax.random.split(rng, 3)
        gen_params = self.gen.init(k1, mel)
        disc_params = {
            "mpd": self.mpd.init(k2, wav, wav),
            "msd": self.msd.init(k3, wav, wav),
        }
        return VocoderTrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt=self.gen_tx.init(gen_params["params"]),
            disc_opt=self.disc_tx.init(
                jax.tree.map(lambda x: x, {
                    "mpd": disc_params["mpd"]["params"],
                    "msd": disc_params["msd"]["params"]})),
        )

    # ---- the two halves of the alternating update -----------------------

    def d_update(self, state: VocoderTrainState, mel: jnp.ndarray,
                 wav: jnp.ndarray) -> Tuple[VocoderTrainState, jnp.ndarray]:
        """Discriminator update against the (detached) current generator
        output (``train.py:118-133``)."""
        gen, mpd, msd = self.gen, self.mpd_d, self.msd_d
        y_hat = jax.lax.stop_gradient(gen.apply(state.gen_params, mel))

        def d_loss_fn(dparams):
            rs_p, gs_p, _, _ = mpd.apply(
                {"params": dparams["mpd"]}, wav, y_hat)
            rs_s, gs_s, _, _ = msd.apply(
                {"params": dparams["msd"]}, wav, y_hat)
            return discriminator_loss(rs_p, gs_p) + discriminator_loss(
                rs_s, gs_s)

        dparams = {"mpd": state.disc_params["mpd"]["params"],
                   "msd": state.disc_params["msd"]["params"]}
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(dparams)
        d_updates, d_opt = self.disc_tx.update(d_grads, state.disc_opt,
                                               dparams)
        dparams = optax.apply_updates(dparams, d_updates)
        new_disc = {"mpd": {"params": dparams["mpd"]},
                    "msd": {"params": dparams["msd"]}}
        return (VocoderTrainState(
            step=state.step, gen_params=state.gen_params,
            disc_params=new_disc, gen_opt=state.gen_opt,
            disc_opt=d_opt), d_loss)

    def g_update(self, state: VocoderTrainState, mel: jnp.ndarray,
                 wav: jnp.ndarray) -> Tuple[VocoderTrainState, Dict]:
        """Generator update against the UPDATED discriminators, matching
        the reference's sequencing (``train.py:135-171``)."""
        gen, mpd, msd = self.gen, self.mpd, self.msd
        dparams = {"mpd": state.disc_params["mpd"]["params"],
                   "msd": state.disc_params["msd"]["params"]}

        def g_loss_fn(gparams):
            y_g = gen.apply(gparams, mel)
            _, gs_p, fr_p, fg_p = mpd.apply(
                {"params": dparams["mpd"]}, wav, y_g)
            _, gs_s, fr_s, fg_s = msd.apply(
                {"params": dparams["msd"]}, wav, y_g)
            loss_fm = feature_loss(fr_p, fg_p) + feature_loss(fr_s, fg_s)
            loss_adv = generator_loss(gs_p) + generator_loss(gs_s)
            if self.mel_fn is not None:
                mel_hat = self.mel_fn(y_g)
                mel_ref = self.mel_fn(wav)
                loss_mel = jnp.mean(jnp.abs(mel_hat - mel_ref))
            else:
                loss_mel = 0.0
            total = loss_adv + loss_fm + self.mel_loss_weight * loss_mel
            return total, {"g_adv": loss_adv, "g_fm": loss_fm,
                           "g_mel": loss_mel}

        (g_loss, g_metrics), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.gen_params)
        g_updates, g_opt = self.gen_tx.update(
            g_grads["params"], state.gen_opt, state.gen_params["params"])
        gen_params = {"params": optax.apply_updates(
            state.gen_params["params"], g_updates)}
        new_state = VocoderTrainState(
            step=state.step + 1, gen_params=gen_params,
            disc_params=state.disc_params, gen_opt=g_opt,
            disc_opt=state.disc_opt)
        return new_state, {"g_loss": g_loss, **g_metrics}

    def train_step(self, state: VocoderTrainState, mel: jnp.ndarray,
                   wav: jnp.ndarray) -> Tuple[VocoderTrainState, Dict]:
        """One alternating D/G update (``train.py:118-171``), fused.

        mel: [B, frames, num_mels]; wav: [B, frames * hop] aligned segment.
        """
        state, d_loss = self.d_update(state, mel, wav)
        state, g_metrics = self.g_update(state, mel, wav)
        return state, {"d_loss": d_loss, **g_metrics}

    def make_step_fns(self):
        """(jitted d_update, jitted g_update) — two smaller XLA programs
        instead of one fused step. A full update is
        ``state, d = d_step(state, mel, wav); state, m = g_step(...)``."""
        return jax.jit(self.d_update), jax.jit(self.g_update)
