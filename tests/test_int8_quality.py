"""int8 vocoder quality tied to an END metric (VERDICT r4 item 5).

Round 4 characterized int8 only as waveform SNR. Here the int8 paths are
scored with MCD (``eval/mcd.py`` — the same mel-cepstral distortion fairseq
uses for TTS eval-inference) between the log-mel of the int8 waveform and
the log-mel of the fp32 waveform, on a REALISTIC mel (harmonic synthetic
speech-like signal, not white noise), and the ``quant_skip_levels=1``
mitigation (level 0 in fp32) is pinned to strictly improve both MCD and
SNR over full int8. The measured full-config_v1 speed/quality ladder lives
in COVERAGE.md.

Reference precedent for MCD eval-inference:
``/root/reference/fairseq/fairseq/tasks/text_to_speech.py``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

from daspeech_tpu.core.config import HiFiGANConfig
from daspeech_tpu.data.audio_utils import log_mel_spectrogram
from daspeech_tpu.eval.mcd import mel_cepstral_distortion
from daspeech_tpu.models.hifigan import HiFiGANGenerator


def realistic_mel(frames=96, seed=0, hop=64, sr=22050 // 4):
    """Log-mel of a harmonic 'vowel-like' signal with a pitch glide plus
    noise floor — much closer to speech statistics than white noise."""
    rng = np.random.default_rng(seed)
    n = frames * hop
    t = np.arange(n) / sr
    f0 = 120.0 + 60.0 * np.sin(2 * np.pi * 0.7 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    wav = sum((0.4 / k) * np.sin(k * phase) for k in range(1, 6))
    wav = (wav * (0.5 + 0.5 * np.sin(2 * np.pi * 1.3 * t))
           + 0.01 * rng.normal(size=n)).astype(np.float32)
    m = log_mel_spectrogram(wav, sample_rate=22050, n_fft=256,
                            hop_length=hop, win_length=256, num_mels=80,
                            fmax=None)
    return jnp.asarray(m[None, :frames])


def snr_db(ref, got):
    ref, got = np.asarray(ref), np.asarray(got)
    return 10 * np.log10(np.sum(ref ** 2)
                         / max(np.sum((got - ref) ** 2), 1e-30))


def wav_mcd(ref_wav, got_wav):
    """MCD between the log-mels of two waveforms (22.05k params scaled to
    the test hop)."""
    a = log_mel_spectrogram(np.asarray(ref_wav)[0], n_fft=256,
                            hop_length=64, win_length=256, fmax=None)
    b = log_mel_spectrogram(np.asarray(got_wav)[0], n_fft=256,
                            hop_length=64, win_length=256, fmax=None)
    return mel_cepstral_distortion(b, a)


@pytest.fixture(scope="module")
def ladder():
    cfg = HiFiGANConfig(
        upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=256,
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        resblock="1")
    mel = realistic_mel()
    base = HiFiGANGenerator(cfg, fold_to=128)
    params = base.init(jax.random.PRNGKey(0), mel)
    out = {"fp32": np.asarray(jax.jit(
        lambda m: base.apply(params, m))(mel))}
    bf16 = HiFiGANGenerator(cfg, fold_to=128, dtype=jnp.bfloat16)
    out["bf16"] = np.asarray(jax.jit(
        lambda m: bf16.apply(params, m))(mel), np.float32)
    for name, skip in (("int8", 0), ("int8_skip1", 1)):
        q = HiFiGANGenerator(cfg, fold_to=128, quant_int8=True,
                             quant_skip_levels=skip)
        qc = q.clone(calibrate=True)
        _, upd = qc.apply({"params": params["params"]}, mel,
                          mutable=["quant"])
        v = {"params": params["params"], "quant": upd["quant"]}
        out[name] = np.asarray(jax.jit(lambda m: q.apply(v, m))(mel))
    return out


class TestInt8QualityLadder:
    def test_fp32_self_mcd_zero(self, ladder):
        assert wav_mcd(ladder["fp32"], ladder["fp32"]) == 0.0

    def test_int8_mcd_finite_and_bounded(self, ladder):
        mcd = wav_mcd(ladder["fp32"], ladder["int8"])
        assert np.isfinite(mcd) and mcd > 0.0

    def test_skip1_strictly_improves_quality(self, ladder):
        """The mitigation ladder: level-0-in-fp32 must beat full int8 on
        BOTH the end metric (MCD vs the fp32 output) and SNR."""
        mcd_full = wav_mcd(ladder["fp32"], ladder["int8"])
        mcd_skip = wav_mcd(ladder["fp32"], ladder["int8_skip1"])
        assert mcd_skip < mcd_full, (mcd_skip, mcd_full)
        snr_full = snr_db(ladder["fp32"], ladder["int8"])
        snr_skip = snr_db(ladder["fp32"], ladder["int8_skip1"])
        assert snr_skip > snr_full, (snr_skip, snr_full)

    def test_ladder_ordering_bf16_beats_int8(self, ladder):
        """The serving ladder's quality ordering: bf16 (halved HBM traffic,
        near-fp32) must beat both int8 rungs on MCD and SNR."""
        mcd_b = wav_mcd(ladder["fp32"], ladder["bf16"])
        assert mcd_b < wav_mcd(ladder["fp32"], ladder["int8_skip1"])
        assert (snr_db(ladder["fp32"], ladder["bf16"])
                > snr_db(ladder["fp32"], ladder["int8_skip1"]))

    def test_skip_levels_param_tree_compatible(self, ladder):
        """quant_skip_levels must still load plain fp32 checkpoints: the
        params collection is unchanged (only `quant` shrinks)."""
        cfg = HiFiGANConfig(
            upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
            upsample_initial_channel=256,
            resblock_kernel_sizes=(3, 7),
            resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
            resblock="1")
        mel = realistic_mel()
        base = HiFiGANGenerator(cfg, fold_to=128)
        params = base.init(jax.random.PRNGKey(0), mel)
        q = HiFiGANGenerator(cfg, fold_to=128, quant_int8=True,
                             quant_skip_levels=1)
        qv = q.init(jax.random.PRNGKey(0), mel)
        assert (jax.tree.structure(params["params"])
                == jax.tree.structure(qv["params"]))
        # level-0 sites are NOT in the quant collection, level-1 sites are
        quant_keys = str(jax.tree.structure(qv["quant"]))
        assert "ups_0" not in quant_keys
        assert "ups_1" in quant_keys
