"""Quantify the YIN pitch fallback against known ground truth.

The reference preps pitch with pyworld dio+stonemask
(``fairseq/examples/speech_synthesis/data_utils.py:88-96``); this image has
no pyworld, so offline prep defaults to the pure-numpy YIN+StoneMask
analogue (``preprocess/prep_data.py``). This script measures the fallback's
frame-level and per-phoneme-averaged error on synthetic signals with
ANALYTIC ground truth (steady harmonics, vibrato, glides, speech-like pulse
trains with formants + noise) — the deviation bound documented in
COVERAGE.md. pyworld's own dio+stonemask tracks these signals to <2 Hz, so
the YIN-vs-truth numbers bound the YIN-vs-pyworld delta up to pyworld's own
voicing/octave decisions on real speech.

Usage: python tools/quantify_pitch.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from daspeech_tpu.preprocess.prep_data import (  # noqa: E402
    average_by_duration, yin_stonemask_pitch)

SR = 22050
HOP = 256


def harmonics(f0_track, n_harm=8, decay=0.7, noise=0.0, seed=0):
    """Additive harmonic signal following a per-sample f0 track."""
    rng = np.random.default_rng(seed)
    phase = 2 * np.pi * np.cumsum(f0_track) / SR
    sig = sum((decay ** k) * np.sin((k + 1) * phase) for k in range(n_harm))
    if noise:
        sig = sig + noise * rng.normal(size=len(sig))
    return (sig / np.max(np.abs(sig))).astype(np.float64)


def frame_truth(f0_track, n_frames, win=1024):
    centers = np.arange(n_frames) * HOP + win // 2
    centers = np.clip(centers, 0, len(f0_track) - 1)
    return f0_track[centers]


def eval_case(name, f0_track, **kw):
    wav = harmonics(f0_track, **kw)
    est = yin_stonemask_pitch(wav, SR)
    truth = frame_truth(f0_track, len(est))
    voiced = est > 0
    if not voiced.any():
        print(f"{name:28s} NO VOICED FRAMES")
        return None
    err_hz = np.abs(est[voiced] - truth[voiced])
    cents = 1200 * np.abs(np.log2(np.maximum(est[voiced], 1e-6)
                                  / truth[voiced]))
    # per-phoneme averaging (the quantity training actually consumes):
    # 12-frame pseudo-phonemes, zeros excluded as in the reference prep
    n_ph = len(est) // 12
    durs = [12] * n_ph
    ph_est = average_by_duration(est, durs)
    ph_truth = average_by_duration(np.where(voiced, truth, 0.0), durs)
    ok = ph_truth > 0
    ph_err = np.abs(ph_est[ok] - ph_truth[ok])
    print(f"{name:28s} frames: mean {err_hz.mean():6.2f} Hz "
          f"p95 {np.percentile(err_hz, 95):6.2f} Hz "
          f"({np.percentile(cents, 95):5.1f} cents p95)   "
          f"per-phoneme: mean {ph_err.mean():5.2f} Hz "
          f"max {ph_err.max():5.2f} Hz  voiced {voiced.mean():4.0%}")
    return err_hz.mean(), ph_err.mean()


def main():
    dur = 2.0
    n = int(SR * dur)
    t = np.arange(n) / SR

    for f0 in (80.0, 120.0, 220.0, 350.0):
        eval_case(f"steady {f0:.0f} Hz", np.full(n, f0))
    eval_case("vibrato 150Hz +-3% @5Hz",
              150.0 * (1 + 0.03 * np.sin(2 * np.pi * 5 * t)))
    eval_case("glide 120->220 Hz", np.linspace(120.0, 220.0, n))
    eval_case("glide + noise 10%", np.linspace(120.0, 220.0, n), noise=0.1)
    eval_case("speechy 110Hz + noise 20%",
              110.0 * (1 + 0.05 * np.sin(2 * np.pi * 3.1 * t)),
              n_harm=12, decay=0.85, noise=0.2)


if __name__ == "__main__":
    main()
