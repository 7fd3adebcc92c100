"""Per-level timing + roofline of the HiFi-GAN folded serving path on the
real chip (the treatment VERDICT r3 asked for: publish per-level ms,
XLA-counted FLOPs, TFLOP/s and MFU).

Each "level" = transposed-conv upsample + 3 MRF ResBlocks + average
(``/root/reference/hifi-gan/models.py:101-113``). Levels are measured as
prefix forwards (stop_at_level=...); differences give per-level cost.

Usage: python tools/profile_vocoder.py [--fold-to 128] [--B 8] [--M 416]
"""

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")

from bench import fast_init, timeit  # noqa: E402

V5E_BF16_PEAK = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fold-to", type=int, default=128)
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--M", type=int, default=416)
    ap.add_argument("--fused", action="store_true",
                    help="fused Pallas MRF levels (ops/fused_mrf.py)")
    ap.add_argument("--quant", action="store_true",
                    help="int8 serving path (quant_int8=True)")
    ap.add_argument("--mrf-tile", type=int, default=1024)
    ap.add_argument("--dilated-backend", default=None,
                    choices=["im2col", "direct", "decimated"],
                    help="force an alternate formulation for the d>1 convs "
                         "(A/B vs the dense folded default, in situ)")
    args = ap.parse_args()

    from daspeech_tpu.core.config import HiFiGANConfig
    from daspeech_tpu.models import HiFiGANGenerator

    if args.dilated_backend:
        from daspeech_tpu.models import hifigan as _hg

        _hg.FORCE_DILATED_BACKEND = args.dilated_backend

    cfg = HiFiGANConfig()
    voc = HiFiGANGenerator(cfg, fold_to=args.fold_to, fused_mrf=args.fused,
                           mrf_tile=args.mrf_tile, quant_int8=args.quant)
    B, M = args.B, args.M
    mel = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, M, 80)).astype(np.float32))
    vparams = fast_init(voc, jax.random.key(1), lambda m: m(mel))
    if args.quant:
        # replace fast_init's junk amax leaves with a real calibration pass
        calib = HiFiGANGenerator(cfg, fold_to=args.fold_to, quant_int8=True,
                                 calibrate=True)
        _, upd = jax.jit(
            lambda v, m: calib.apply(v, m, mutable=["quant"]))(vparams, mel)
        vparams = {"params": vparams["params"], "quant": upd["quant"]}
    audio_s = B * M * 256 / 22050.0

    stops = [-2] + list(range(len(cfg.upsample_rates))) + [-1]
    names = ["conv_pre"] + [
        f"level{i} (up{cfg.upsample_rates[i]} ch"
        f"{cfg.upsample_initial_channel >> (i + 1)})"
        for i in range(len(cfg.upsample_rates))] + ["conv_post+tanh"]

    prev_ms, prev_fl = 0.0, 0.0
    rows = []
    for stop, name in zip(stops, names):
        fn = jax.jit(lambda mel, s=stop: voc.apply(vparams, mel,
                                                   stop_at_level=s))
        lowered = fn.lower(mel)
        compiled = lowered.compile()
        fl = 0.0
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            fl = float(ca.get("flops", 0.0))
        except Exception:
            pass
        ms = timeit(lambda: compiled(mel), n=20) * 1e3
        d_ms, d_fl = ms - prev_ms, fl - prev_fl
        rows.append((name, d_ms, d_fl))
        prev_ms, prev_fl = ms, fl
        tf = d_fl / (d_ms * 1e-3) / 1e12 if d_ms > 0 else 0.0
        print(f"{name:28s} cum {ms:7.2f} ms  Δ {d_ms:7.2f} ms  "
              f"Δ {d_fl/1e9:7.1f} GFLOP  {tf:6.1f} TFLOP/s  "
              f"MFU {tf*1e12/V5E_BF16_PEAK:5.1%}", flush=True)

    tot_ms = sum(r[1] for r in rows)
    tot_fl = sum(r[2] for r in rows)
    print(f"\n{'TOTAL':28s} {tot_ms:7.2f} ms  {tot_fl/1e9:7.1f} GFLOP  "
          f"{tot_fl/(tot_ms*1e-3)/1e12:6.1f} TFLOP/s  "
          f"MFU {tot_fl/(tot_ms*1e-3)/V5E_BF16_PEAK:5.1%}")
    print(f"audio {audio_s:.2f} s -> RTF {audio_s/(tot_ms*1e-3):,.0f}x")


if __name__ == "__main__":
    main()
