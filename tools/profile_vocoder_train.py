"""Per-phase timing + roofline of the HiFi-GAN vocoder TRAINING step on
the real chip (the treatment VERDICT r4 item 2 asked for: the serving
path got per-level rooflines in round 3/4; the training step had only a
single 121 ms number).

Phases measured as separate jits (XLA-counted FLOPs from cost_analysis):

  g_fwd     generator forward (folded path, stop-grad — the y_hat build
            inside d_update)
  mpd_fwd   MultiPeriodDiscriminator fwd on (wav, y_hat)
  msd_fwd   MultiScaleDiscriminator fwd on (wav, y_hat)
  d_grad    value_and_grad of the D loss (fwd+bwd, no Adam)
  g_grad    value_and_grad of the G loss (G fwd + D fwds + full bwd)
  d_update  d_grad + Adam    (the served D half)
  g_update  g_grad + Adam    (the served G half)

Flags A/B the two discriminator execution options in situ:
  --disc-dtype bf16   D compute in bfloat16 (f32 params + f32 loss means)
  --pair-batch        one concat([y, y_hat]) forward per sub-discriminator
                      (bit-identical sums; halves the conv-call count)
  --gen-fold N        folded generator (default 128, as the bench uses)

Reference: /root/reference/hifi-gan/train.py:113-180, models.py:128-254.
Usage: python tools/profile_vocoder_train.py [--B 16] [--seg 8192] ...
"""

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")

from bench import timeit  # noqa: E402

V5E_BF16_PEAK = 197e12


def flops_of(comp):
    try:
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def bench_jit(name, fn, *args, n=10):
    t0 = time.perf_counter()
    comp = jax.jit(fn).lower(*args).compile()
    t_c = time.perf_counter() - t0
    dt = timeit(lambda: comp(*args), n=n)
    fl = flops_of(comp)
    tf = fl / dt / 1e12 if fl else float("nan")
    mfu = fl / dt / V5E_BF16_PEAK if fl else float("nan")
    print(f"{name:<10s} {dt*1e3:8.2f} ms  {tf:7.1f} TF/s  "
          f"mfu {mfu:5.1%}  (compile {t_c:.0f}s)")
    return dt, fl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--seg", type=int, default=8192)
    ap.add_argument("--gen-fold", type=int, default=128)
    ap.add_argument("--disc-dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--pair-batch", action="store_true")
    ap.add_argument("--no-pair-batch-d", dest="pair_batch_d",
                    action="store_false", default=True,
                    help="disable pair-batching of the D update (it is "
                         "ON by default: measured win for d_update only)")
    ap.add_argument("--n", type=int, default=10)
    args = ap.parse_args()

    from daspeech_tpu.core.config import HiFiGANConfig
    from daspeech_tpu.data.audio_utils import _slaney_mel
    from daspeech_tpu.train.vocoder_train import VocoderTrainer

    cfg = HiFiGANConfig()
    hop = cfg.hop_size
    mel_basis = jnp.asarray(
        _slaney_mel(cfg.num_mels, 1024, 22050, 0.0, 8000.0))
    win = jnp.asarray(np.hanning(1025)[:-1].astype(np.float32))

    def mel_fn(wav):
        pad = (1024 - hop) // 2
        w = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = 1 + (w.shape[1] - 1024) // hop
        idx = (jnp.arange(1024)[None, :] + hop * jnp.arange(n_frames)[:, None])
        frames = w[:, idx] * win[None, None, :]
        spec = jnp.abs(jnp.fft.rfft(frames, axis=-1))
        mel = jnp.einsum("btf,fm->btm", spec, mel_basis)
        return jnp.log(jnp.maximum(mel, 1e-5))

    dd = jnp.bfloat16 if args.disc_dtype == "bf16" else jnp.float32
    trainer = VocoderTrainer(cfg, mel_fn=mel_fn, segment_size=args.seg,
                             gen_fold=args.gen_fold, disc_dtype=dd,
                             pair_batch=args.pair_batch,
                             pair_batch_d=args.pair_batch_d)
    state = trainer.init_state(jax.random.key(0))
    B, seg = args.B, args.seg
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.normal(size=(B, seg // hop, cfg.num_mels)).astype(np.float32))
    wav = jnp.asarray((0.1 * rng.normal(size=(B, seg))).astype(np.float32))

    print(f"B={B} seg={seg} gen_fold={args.gen_fold} "
          f"disc_dtype={args.disc_dtype} pair_batch={args.pair_batch} "
          f"pair_batch_d={args.pair_batch_d}")

    gen, mpd, msd = trainer.gen, trainer.mpd, trainer.msd
    gp = state.gen_params
    dp = {"mpd": state.disc_params["mpd"]["params"],
          "msd": state.disc_params["msd"]["params"]}

    # ---- forward phases -------------------------------------------------
    y_hat = jax.jit(gen.apply)(gp, mel)
    y_hat.block_until_ready()
    bench_jit("g_fwd", lambda p, m: gen.apply(p, m), gp, mel, n=args.n)
    bench_jit("mpd_fwd",
              lambda p, w, yh: mpd.apply({"params": p}, w, yh)[0],
              dp["mpd"], wav, y_hat, n=args.n)
    bench_jit("msd_fwd",
              lambda p, w, yh: msd.apply({"params": p}, w, yh)[0],
              dp["msd"], wav, y_hat, n=args.n)

    # ---- grad phases (no Adam); all operands are ARGS, never captured
    # constants — embedded-constant programs blow the remote compile
    # service's request-size limit (HTTP 413)
    def d_loss_fn(dparams, w, yh):
        from daspeech_tpu.models.hifigan_discriminators import (
            discriminator_loss)
        rs_p, gs_p, _, _ = mpd.apply({"params": dparams["mpd"]}, w, yh)
        rs_s, gs_s, _, _ = msd.apply({"params": dparams["msd"]}, w, yh)
        return (discriminator_loss(rs_p, gs_p)
                + discriminator_loss(rs_s, gs_s))

    bench_jit("d_grad",
              lambda p, w, yh: jax.value_and_grad(d_loss_fn)(p, w, yh),
              dp, wav, y_hat, n=args.n)

    def g_loss_fn(gparams, dparams, m, w):
        from daspeech_tpu.models.hifigan_discriminators import (
            feature_loss, generator_loss)
        y_g = gen.apply(gparams, m)
        _, gs_p, fr_p, fg_p = mpd.apply({"params": dparams["mpd"]}, w, y_g)
        _, gs_s, fr_s, fg_s = msd.apply({"params": dparams["msd"]}, w, y_g)
        loss = (generator_loss(gs_p) + generator_loss(gs_s)
                + feature_loss(fr_p, fg_p) + feature_loss(fr_s, fg_s))
        mel_hat = mel_fn(y_g)
        mel_ref = mel_fn(w)
        return loss + 45.0 * jnp.mean(jnp.abs(mel_hat - mel_ref))

    bench_jit("g_grad",
              lambda p, d, m, w: jax.grad(g_loss_fn)(p, d, m, w),
              gp, dp, mel, wav, n=args.n)

    # ---- the two served update halves -----------------------------------
    dt_d, fl_d = bench_jit("d_update", trainer.d_update, state, mel, wav,
                           n=args.n)
    dt_g, fl_g = bench_jit("g_update", trainer.g_update, state, mel, wav,
                           n=args.n)
    dt = dt_d + dt_g
    fl = (fl_d or 0) + (fl_g or 0)
    print(f"{'step':<10s} {dt*1e3:8.2f} ms  {fl/dt/1e12:7.1f} TF/s  "
          f"mfu {fl/dt/V5E_BF16_PEAK:5.1%}")


if __name__ == "__main__":
    main()
