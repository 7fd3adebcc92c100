"""HiFi-GAN vocoder training CLI.

Rebuild of ``/root/reference/hifi-gan/train.py``: random waveform segments
(segment_size samples), on-the-fly log-mel conditioning, alternating D/G
updates. Data: a TSV with columns ``id`` and ``audio`` where audio is a
WAV path or a zip-packed ``.npy`` waveform (``file.zip:offset:len``).

  python -m daspeech_tpu.cli.train_vocoder DATA.tsv \
      --save-dir checkpoints/hifigan --max-update 100000
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from daspeech_tpu.core.config import HiFiGANConfig
from daspeech_tpu.data.audio_utils import log_mel_spectrogram
from daspeech_tpu.data.datasets import load_tsv
from daspeech_tpu.train.checkpoint import CheckpointManager
from daspeech_tpu.train.metrics import JsonProgressLogger, MetricsAggregator
from daspeech_tpu.train.vocoder_train import VocoderTrainer


def load_waveform(path: str) -> np.ndarray:
    if str(path).endswith(".wav"):
        from daspeech_tpu.cli.generate import read_wav

        wav, _ = read_wav(path)
        return wav
    from daspeech_tpu.data.audio_utils import get_features_or_waveform

    return np.asarray(get_features_or_waveform(path)).reshape(-1)


def parse_args(argv=None):
    p = argparse.ArgumentParser("daspeech-train-vocoder")
    p.add_argument("data", help="TSV with id/audio columns")
    p.add_argument("--save-dir", default="checkpoints/hifigan")
    p.add_argument("--max-update", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--segment-size", type=int, default=8192)
    p.add_argument("--sample-rate", type=int, default=22050)
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--save-interval-updates", type=int, default=5000)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--gen-fold", type=int, default=128,
                   help="run the training generator through the folded "
                        "space-to-depth execution path (identical math, "
                        "~faster G fwd+bwd on the low-channel tail; "
                        "models/hifigan.py). 0 = reference-exact layout")
    p.add_argument("--fused-step", action="store_true",
                   help="compile D+G as ONE jit instead of two (the two-"
                        "jit default compiles much faster and runs the "
                        "same math)")
    p.add_argument("--compilation-cache-dir", default=None,
                   help="persist XLA executables here across runs (default "
                        "$DASPEECH_COMPILE_CACHE or ~/.cache/daspeech_tpu/"
                        "xla; pass '' to disable)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from daspeech_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache(args.compilation_cache_dir)
    cfg = HiFiGANConfig()
    rows = load_tsv(args.data)
    wavs = [load_waveform(r["audio"]) for r in rows]
    wavs = [w for w in wavs if len(w) >= args.segment_size]
    if not wavs:
        raise SystemExit("no waveforms longer than segment_size")

    hop = cfg.hop_size
    seg_frames = args.segment_size // hop

    # jax-side mel for the generator loss (differentiable)
    from daspeech_tpu.data.audio_utils import _slaney_mel

    mel_basis = jnp.asarray(_slaney_mel(cfg.num_mels, 1024, args.sample_rate,
                                        0.0, 8000.0))
    win = jnp.asarray(np.hanning(1025)[:-1].astype(np.float32))

    def mel_fn(wav):
        pad = (1024 - hop) // 2
        w = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = 1 + (w.shape[1] - 1024) // hop
        idx = (jnp.arange(1024)[None, :]
               + hop * jnp.arange(n_frames)[:, None])
        frames = w[:, idx] * win[None, None, :]
        spec = jnp.abs(jnp.fft.rfft(frames, axis=-1))
        mel = jnp.einsum("btf,fm->btm", spec, mel_basis)
        return jnp.log(jnp.maximum(mel, 1e-5))

    trainer = VocoderTrainer(cfg, mel_fn=mel_fn,
                             segment_size=args.segment_size,
                             gen_fold=args.gen_fold)
    state = trainer.init_state(jax.random.key(args.seed))
    ckpt = CheckpointManager(args.save_dir, keep_last=3)
    if args.fused_step:
        step = jax.jit(trainer.train_step)
    else:
        d_step, g_step = trainer.make_step_fns()

        def step(state, mel_b, wav_b):
            state, d_loss = d_step(state, mel_b, wav_b)
            state, m = g_step(state, mel_b, wav_b)
            return state, {"d_loss": d_loss, **m}

    rng = np.random.default_rng(args.seed)
    logger = JsonProgressLogger(log_interval=args.log_interval,
                                tag="vocoder")
    agg = MetricsAggregator()

    update = 0
    while update < args.max_update:
        segs = []
        for _ in range(args.batch_size):
            w = wavs[rng.integers(len(wavs))]
            start = rng.integers(0, len(w) - args.segment_size + 1)
            segs.append(w[start: start + args.segment_size])
        wav_b = jnp.asarray(np.stack(segs))
        mel_b = mel_fn(wav_b)[:, :seg_frames]
        state, metrics = step(state, mel_b, wav_b)
        update = int(state.step)
        for k, v in metrics.items():
            agg.log_scalar(k, float(v))
        agg.log_speed("ups")
        logger.log(agg.get_smoothed_values(), update)
        if update % args.save_interval_updates == 0:
            ckpt.save(state, update)
    ckpt.save(state, update)
    logger.print({"done": True, **agg.get_smoothed_values()}, update)
    return 0


if __name__ == "__main__":
    sys.exit(main())
