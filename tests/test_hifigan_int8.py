"""int8 vocoder serving mode (``HiFiGANGenerator(quant_int8=True)``).

Opt-in W8A8 quantized execution of the folded serving path: per-output-
channel weight scales, static per-site activation scales calibrated into
the ``quant`` variable collection (``models/hifigan.py::act_scale``),
int32 MXU accumulation. Measured on one v5e (tools/profile_vocoder.py
--quant): 22.4 -> 14.3 ms on the B=8 x 4.8 s serving batch (1,724x ->
2,699x RT) at ~27 dB SNR vs the fp32 path on full config_v1. NOT the
default — the fp32 folded path keeps the 2.5e-4 torch waveform parity.

Reference for the serving pipeline being quantized:
``/root/reference/hifi-gan/models.py:75-125`` (the reference has no
quantized mode; this is a TPU-serving addition).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from daspeech_tpu.core.config import HiFiGANConfig
from daspeech_tpu.models.hifigan import HiFiGANGenerator


def small_cfg():
    # two levels: ch 128 (f=1, direct int8 dilated convs) and 64 (f=2,
    # folded dense int8 taps) — both quantized execution branches
    return HiFiGANConfig(
        upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=256,
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        resblock="1")


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(2, 96, 80)).astype(np.float32))
    ref_model = HiFiGANGenerator(cfg, fold_to=128)
    params = ref_model.init(jax.random.PRNGKey(0), mel)
    return cfg, mel, ref_model, params


def snr_db(ref, got):
    ref, got = np.asarray(ref), np.asarray(got)
    return 10 * np.log10(np.sum(ref ** 2) / np.sum((got - ref) ** 2))


class TestInt8Vocoder:
    def test_param_tree_unchanged(self, setup):
        """quant_int8 must load fp32 checkpoints as-is: identical params
        collection, plus only the new `quant` scale collection."""
        cfg, mel, ref_model, params = setup
        q = HiFiGANGenerator(cfg, fold_to=128, quant_int8=True)
        qv = q.init(jax.random.PRNGKey(0), mel)
        assert set(qv) == {"params", "quant"}
        assert (jax.tree.structure(params["params"])
                == jax.tree.structure(qv["params"]))
        # every quant site was calibrated by init (positive running amax)
        assert all(float(s) > 0 for s in jax.tree.leaves(qv["quant"]))

    def test_calibrated_static_matches_fp32(self, setup):
        """Calibrate on one mel, serve statically on another: output must
        stay close to fp32 (the measured full-config SNR is ~27 dB; the
        small config is cleaner). Also: a second serve pass is
        deterministic (static scales, no running state)."""
        cfg, mel, ref_model, params = setup
        rng = np.random.default_rng(1)
        mel2 = jnp.asarray(rng.normal(size=(2, 96, 80)).astype(np.float32))
        q = HiFiGANGenerator(cfg, fold_to=128, quant_int8=True)
        qc = HiFiGANGenerator(cfg, fold_to=128, quant_int8=True,
                              calibrate=True)
        _, upd = qc.apply(params, mel, mutable=["quant"])
        v = {"params": params["params"], "quant": upd["quant"]}
        want = ref_model.apply(params, mel2)
        got = q.apply(v, mel2)
        assert snr_db(want, got) > 22.0
        got2 = q.apply(v, mel2)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))

    def test_calibrate_running_max(self, setup):
        """A second calibration pass only ever raises the stored amax."""
        cfg, mel, _, params = setup
        qc = HiFiGANGenerator(cfg, fold_to=128, quant_int8=True,
                              calibrate=True)
        _, u1 = qc.apply(params, mel, mutable=["quant"])
        _, u2 = qc.apply({"params": params["params"], "quant": u1["quant"]},
                         mel * 2.0, mutable=["quant"])
        for a, b in zip(jax.tree.leaves(u1["quant"]),
                        jax.tree.leaves(u2["quant"])):
            assert float(b) >= float(a)

    def test_calibrate_requires_mutable(self, setup):
        cfg, mel, _, params = setup
        qc = HiFiGANGenerator(cfg, fold_to=128, quant_int8=True,
                              calibrate=True)
        _, upd = qc.apply(params, mel, mutable=["quant"])
        with pytest.raises(ValueError, match="mutable"):
            qc.apply({"params": params["params"], "quant": upd["quant"]},
                     mel)

    def test_make_vocode_fn_lazy_calibration(self, setup):
        """decode/speech_generator.make_vocode_fn: first call calibrates,
        later calls reuse frozen scales (bit-identical on the same mel)."""
        from daspeech_tpu.decode.speech_generator import make_vocode_fn

        cfg, mel, ref_model, params = setup
        q = HiFiGANGenerator(cfg, fold_to=128, quant_int8=True)
        fn = make_vocode_fn(q, {"params": params["params"]}, gcmvn=None)
        w1 = np.asarray(fn(mel))
        w2 = np.asarray(fn(mel))
        np.testing.assert_array_equal(w1, w2)
        assert snr_db(ref_model.apply(params, mel), w1) > 22.0

    def test_resblock2_quant_branch(self):
        """ResBlock2 configs go through the same quantized conv path."""
        cfg = HiFiGANConfig(
            upsample_rates=(2,), upsample_kernel_sizes=(4,),
            upsample_initial_channel=64,
            resblock_kernel_sizes=(3, 5), resblock_dilation_sizes=(
                (1, 3), (1, 3)), resblock="2")
        rng = np.random.default_rng(2)
        mel = jnp.asarray(rng.normal(size=(1, 64, 80)).astype(np.float32))
        ref = HiFiGANGenerator(cfg, fold_to=128)
        params = ref.init(jax.random.PRNGKey(0), mel)
        q = HiFiGANGenerator(cfg, fold_to=128, quant_int8=True)
        qv = q.init(jax.random.PRNGKey(0), mel)
        v = {"params": params["params"], "quant": qv["quant"]}
        assert snr_db(ref.apply(params, mel), q.apply(v, mel)) > 20.0
